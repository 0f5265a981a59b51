"""VQModel / AutoencoderKL parity vs the reference diffusers modules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.vae import AutoencoderConfig, AutoencoderKL, VQModel
from diff_pruning_tpu.utils.convert import torch_state_dict_to_params

torch = pytest.importorskip("torch")


def _shim():
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import huggingface_hub

    if not hasattr(huggingface_hub, "cached_download"):
        huggingface_hub.cached_download = huggingface_hub.hf_hub_download
    if not hasattr(jax.random, "KeyArray"):
        jax.random.KeyArray = jax.Array


def _cfg():
    return AutoencoderConfig(
        in_channels=3, out_channels=3, block_out_channels=(32, 64),
        layers_per_block=1, latent_channels=4, norm_num_groups=8,
        num_vq_embeddings=None)


def test_vq_model_parity():
    _shim()
    from diffusers.models.vq_model import VQModel as TorchVQ

    torch.manual_seed(0)
    cfg = _cfg()
    cfg = AutoencoderConfig(**{**cfg.__dict__, "num_vq_embeddings": 16,
                               "latent_channels": 3, "channel_sizes": {}})
    ref = TorchVQ(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2,
        block_out_channels=list(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block,
        latent_channels=cfg.latent_channels,
        num_vq_embeddings=16,
        norm_num_groups=cfg.norm_num_groups,
    ).eval()
    params = torch_state_dict_to_params(ref.state_dict())
    model = VQModel(cfg)
    model.graph.validate(params)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        h_ref = ref.encode(torch.from_numpy(x)).latents.numpy()
        dec_ref = ref.decode(torch.from_numpy(h_ref), force_not_quantize=True).sample.numpy()
    with jax.default_matmul_precision("float32"):
        h = model.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        dec = model.decode(params, h, force_not_quantize=True)
    np.testing.assert_allclose(
        np.asarray(h).transpose(0, 3, 1, 2), h_ref, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 3, 1, 2), dec_ref, atol=5e-3, rtol=5e-3)


def test_kl_model_parity():
    _shim()
    from diffusers.models.autoencoder_kl import AutoencoderKL as TorchKL

    torch.manual_seed(1)
    cfg = _cfg()
    ref = TorchKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2,
        block_out_channels=list(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block,
        latent_channels=cfg.latent_channels,
        norm_num_groups=cfg.norm_num_groups,
    ).eval()
    params = torch_state_dict_to_params(ref.state_dict())
    model = AutoencoderKL(cfg)
    model.graph.validate(params)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        post = ref.encode(torch.from_numpy(x)).latent_dist
        mean_ref = post.mean.numpy()
        dec_ref = ref.decode(torch.from_numpy(mean_ref)).sample.numpy()
    with jax.default_matmul_precision("float32"):
        mean = model.encode(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        dec = model.decode(params, mean)
    np.testing.assert_allclose(
        np.asarray(mean).transpose(0, 3, 1, 2), mean_ref, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(dec).transpose(0, 3, 1, 2), dec_ref, atol=5e-3, rtol=5e-3)


def test_vq_quantize_roundtrip():
    cfg = AutoencoderConfig(block_out_channels=(16,), layers_per_block=1,
                            latent_channels=3, norm_num_groups=4,
                            num_vq_embeddings=8)
    model = VQModel(cfg)
    params = model.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (1, 4, 4, 3))
    zq, idx = model.quantize(params, z)
    emb = np.asarray(params["quantize"]["embedding"]["weight"])
    # every quantized vector must be an actual codebook row
    flat = np.asarray(zq).reshape(-1, 3)
    ids = np.asarray(idx).reshape(-1)
    np.testing.assert_allclose(flat, emb[ids], rtol=1e-6)


def test_ldm_uncond_pipeline_integration():
    """The LDMPipeline path (pipeline_latent_diffusion_uncond.py:93-101):
    latent DDIM with a UNet2D + VQ decode, on tiny models — prune the UNet,
    rebuild, and the whole pipeline still runs."""
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, UNet2DConfig
    from diff_pruning_tpu.pruning.importance import make_importance
    from diff_pruning_tpu.pruning.pruner import apply_pruning, prune
    from diff_pruning_tpu.sampling.ddim_sampler import SamplerConfig, make_sampler
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule

    ucfg = UNet2DConfig(
        sample_size=8, in_channels=3, out_channels=3,
        block_out_channels=(32, 64),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=8, norm_num_groups=8)
    vcfg = AutoencoderConfig(block_out_channels=(16, 32), layers_per_block=1,
                             latent_channels=3, norm_num_groups=4,
                             num_vq_embeddings=32)
    unet = UNet2D(ucfg)
    vq = VQModel(vcfg)
    uparams = unet.init(jax.random.key(0))
    vparams = vq.init(jax.random.key(1))

    # head-grouped pruning (ldm_prune.py:75-81 semantics are structural here)
    res = prune(unet.graph, uparams, make_importance("magnitude"),
                sparsity=0.25, round_to=2)
    up2 = apply_pruning(uparams, unet.graph, res)
    unet2 = UNet2D(ucfg.with_channel_sizes(res.channel_sizes))
    unet2.graph.validate(up2)
    # attention inner vars kept head-divisible
    for v in unet2.graph.prunable_vars():
        if v.name.endswith("/inner"):
            assert v.size % v.group_div == 0

    sched = DiffusionSchedule.create(beta_schedule="scaled_linear",
                                     beta_start=0.0015, beta_end=0.0195)
    sampler = make_sampler(unet2, up2, sched,
                           SamplerConfig(num_inference_steps=4,
                                         clip_sample=False))
    lat = sampler(jax.random.key(2), 2, 8, 3)
    img = vq.decode(vparams, (lat * 2.0 - 1.0), force_not_quantize=True)
    assert img.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()
