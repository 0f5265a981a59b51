"""CompVis first-stage converter: config inference + weight mapping parity
against the actual reference Encoder/Decoder modules
(ldm_exp/ldm/modules/diffusionmodules/model.py), incl. down/up-block
attention (attn_resolutions) and the first-stage preset zoo."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.vae import (AutoencoderConfig, AutoencoderKL,
                                         FIRST_STAGE_PRESETS, VQModel,
                                         first_stage_config, make_first_stage)
from diff_pruning_tpu.utils.convert import (compvis_vae_state_dict_to_params,
                                            infer_compvis_vae_config,
                                            torch_discriminator_state_dict_to_params)

torch = pytest.importorskip("torch")


def _compvis_modules():
    import sys

    if "/root/reference/ldm_exp" not in sys.path:
        sys.path.insert(0, "/root/reference/ldm_exp")
    from ldm.modules.diffusionmodules import model as compvis

    return compvis


DDCONFIG = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=2,
                attn_resolutions=[16], dropout=0.0, resamp_with_conv=True,
                in_channels=3, resolution=32, z_channels=4)


def _synthetic_first_stage_sd(double_z, n_embed=None):
    compvis = _compvis_modules()
    torch.manual_seed(0)
    enc = compvis.Encoder(double_z=double_z, **DDCONFIG)
    dec = compvis.Decoder(**DDCONFIG)
    z, embed = DDCONFIG["z_channels"], DDCONFIG["z_channels"]
    enc_out = 2 * z if double_z else z
    quant = torch.nn.Conv2d(enc_out, 2 * embed if double_z else embed, 1)
    post = torch.nn.Conv2d(embed, z, 1)
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec),
                        ("quant_conv", quant), ("post_quant_conv", post)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    if n_embed:
        emb = torch.nn.Embedding(n_embed, embed)
        emb.weight.data.uniform_(-1.0 / n_embed, 1.0 / n_embed)
        sd["quantize.embedding.weight"] = emb.weight.data
    # loss.* keys must be ignored by the converter
    sd["loss.logvar"] = torch.zeros(())
    return sd, enc, dec, quant, post


def test_infer_config_vq_and_kl():
    sd, *_ = _synthetic_first_stage_sd(double_z=False, n_embed=16)
    cfg = infer_compvis_vae_config(sd, resolution=32)
    assert cfg.block_out_channels == (32, 64)
    assert cfg.layers_per_block == 2
    assert cfg.latent_channels == 4 and cfg.num_vq_embeddings == 16
    assert cfg.attn_resolutions == (16,)
    assert cfg.mid_block_attention

    sd2, *_ = _synthetic_first_stage_sd(double_z=True)
    cfg2 = infer_compvis_vae_config(sd2, resolution=32)
    assert cfg2.num_vq_embeddings is None
    assert cfg2.latent_channels == 4


def test_compvis_vq_forward_parity():
    sd, enc, dec, quant, post = _synthetic_first_stage_sd(double_z=False,
                                                          n_embed=16)
    cfg = infer_compvis_vae_config(sd, resolution=32)
    params = compvis_vae_state_dict_to_params(
        sd, num_levels=len(cfg.block_out_channels))
    model = VQModel(cfg)
    model.graph.validate(params)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        h_ref = quant(enc(torch.from_numpy(x))).numpy()
        dec_ref = dec(post(torch.from_numpy(h_ref))).numpy()
    with jax.default_matmul_precision("float32"):
        h = model.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        out = model.decode(params, h, force_not_quantize=True)
    np.testing.assert_allclose(np.asarray(h).transpose(0, 3, 1, 2), h_ref,
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), dec_ref,
                               atol=5e-3, rtol=5e-3)


def test_compvis_kl_forward_parity():
    sd, enc, dec, quant, post = _synthetic_first_stage_sd(double_z=True)
    cfg = infer_compvis_vae_config(sd, resolution=32)
    params = compvis_vae_state_dict_to_params(
        sd, num_levels=len(cfg.block_out_channels))
    model = AutoencoderKL(cfg)
    model.graph.validate(params)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        moments_ref = quant(enc(torch.from_numpy(x))).numpy()
        mean_ref = moments_ref[:, :4]
        dec_ref = dec(post(torch.from_numpy(mean_ref))).numpy()
    with jax.default_matmul_precision("float32"):
        mean = model.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        out = model.decode(params, mean)
    np.testing.assert_allclose(np.asarray(mean).transpose(0, 3, 1, 2),
                               mean_ref, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), dec_ref,
                               atol=5e-3, rtol=5e-3)


def test_first_stage_presets_match_reference_ddconfigs():
    """Param counts of the presets vs CompVis modules instantiated with the
    exact ddconfigs of models/first_stage_models/*/config.yaml."""
    compvis = _compvis_modules()
    zoo = {
        "kl-f8": dict(double_z=True, z_channels=4, ch_mult=(1, 2, 4, 4),
                      attn_resolutions=[], n_embed=None, embed_dim=4),
        "vq-f8": dict(double_z=False, z_channels=4, ch_mult=(1, 2, 2, 4),
                      attn_resolutions=[32], n_embed=16384, embed_dim=4),
        "vq-f16": dict(double_z=False, z_channels=8, ch_mult=(1, 1, 2, 2, 4),
                       attn_resolutions=[16], n_embed=16384, embed_dim=8),
    }
    for name, dd in zoo.items():
        cfg = first_stage_config(name)
        model = make_first_stage(cfg)
        p = model.init(jax.random.key(0))
        ours = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p))

        common = dict(ch=128, out_ch=3, num_res_blocks=2, dropout=0.0,
                      in_channels=3, resolution=256,
                      ch_mult=dd["ch_mult"],
                      attn_resolutions=list(dd["attn_resolutions"]),
                      z_channels=dd["z_channels"])
        enc = compvis.Encoder(double_z=dd["double_z"], **common)
        dec = compvis.Decoder(**common)
        z = dd["z_channels"]
        mult = 2 if dd["double_z"] else 1
        theirs = (sum(v.numel() for v in enc.state_dict().values())
                  + sum(v.numel() for v in dec.state_dict().values())
                  + (mult * z) * (mult * dd["embed_dim"]) + mult * dd["embed_dim"]
                  + dd["embed_dim"] * z + z)
        if dd["n_embed"]:
            theirs += dd["n_embed"] * dd["embed_dim"]
        assert ours == theirs, (name, ours, theirs)


def test_discriminator_converter_layout():
    from diff_pruning_tpu.models.discriminator import NLayerDiscriminator

    n_layers, ndf = 3, 8
    widths = [ndf] + [ndf * min(2 ** n, 8) for n in range(1, n_layers + 1)]
    sd = {}
    seq = 0
    cin = 3
    sd[f"main.{seq}.weight"] = np.zeros((widths[0], cin, 4, 4), np.float32)
    sd[f"main.{seq}.bias"] = np.zeros((widths[0],), np.float32)
    seq = 2
    for b in range(1, n_layers + 1):
        sd[f"main.{seq}.weight"] = np.zeros((widths[b], widths[b - 1], 4, 4),
                                            np.float32)
        sd[f"main.{seq + 1}.weight"] = np.ones((widths[b],), np.float32)
        sd[f"main.{seq + 1}.bias"] = np.zeros((widths[b],), np.float32)
        seq += 3
    sd[f"main.{seq}.weight"] = np.zeros((1, widths[-1], 4, 4), np.float32)
    sd[f"main.{seq}.bias"] = np.zeros((1,), np.float32)

    params = torch_discriminator_state_dict_to_params(sd, n_layers=n_layers)
    disc = NLayerDiscriminator(input_nc=3, ndf=ndf, n_layers=n_layers)
    ref = disc.init(jax.random.key(0))
    flat_a = jax.tree_util.tree_structure(params)
    flat_b = jax.tree_util.tree_structure(ref)
    assert flat_a == flat_b
    y = disc(params, jnp.ones((1, 32, 32, 3)))
    assert y.shape[-1] == 1
