"""Inpainting workflow (scripts/inpaint.py rebuild): concat-mode sampler +
end-to-end CLI on tiny models."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.latent_diffusion import (ldm_schedule,
                                                      make_concat_sampler)
from diff_pruning_tpu.models.unet_cond import UNetCond, UNetCondConfig
from diff_pruning_tpu.models.vae import AutoencoderConfig, VQModel
from diff_pruning_tpu.utils.checkpoint import save_model


def _tiny_inpaint_cfg():
    # in = 3 latent + 3 masked-latent + 1 mask, like inpainting_big
    return UNetCondConfig(
        image_size=8, in_channels=7, out_channels=3, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, context_dim=None, use_spatial_transformer=False,
        resblock_updown=True, norm_num_groups=8)


def _perturb(params, key, scale=0.05):
    """Freshly-initialized UNetConds output exactly zero (openaimodel
    zero_module on every out conv, replicated by our init) — nudge all
    params so conditioning has an observable effect."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [l + scale * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])


def test_concat_sampler_conditioning_matters():
    unet = UNetCond(_tiny_inpaint_cfg())
    p = _perturb(unet.init(jax.random.key(0)), jax.random.key(42))
    s = make_concat_sampler(unet, p, ldm_schedule(linear_end=0.0205),
                            ddim_steps=3)
    c0 = jnp.zeros((1, 8, 8, 4))
    c1 = jnp.ones((1, 8, 8, 4))
    a = s(jax.random.key(1), c0)
    b = s(jax.random.key(1), c1)
    assert a.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(a)).all()
    # same noise, different conditioning -> different result
    assert float(jnp.abs(a - b).max()) > 1e-4


def test_concat_sampler_plms():
    unet = UNetCond(_tiny_inpaint_cfg())
    p = unet.init(jax.random.key(0))
    s = make_concat_sampler(unet, p, ldm_schedule(linear_end=0.0205),
                            ddim_steps=4, method="plms")
    lat = s(jax.random.key(1), jnp.zeros((2, 8, 8, 4)))
    assert lat.shape == (2, 8, 8, 3) and np.isfinite(np.asarray(lat)).all()


def test_inpaint_cli_end_to_end(tmp_path):
    from PIL import Image

    from diff_pruning_tpu.cli.inpaint import main

    # model dir: tiny unet + tiny VQ-f2 first stage (one downsample, 16->8)
    ucfg = _tiny_inpaint_cfg()
    unet = UNetCond(ucfg)
    vcfg = AutoencoderConfig(block_out_channels=(8, 8), layers_per_block=1,
                             latent_channels=3, norm_num_groups=4,
                             num_vq_embeddings=16, mid_block_attention=False,
                             sample_size=16)
    vq = VQModel(vcfg)
    mdir = tmp_path / "model"
    save_model(str(mdir), ucfg, unet.init(jax.random.key(0)), subfolder="unet")
    save_model(str(mdir), vcfg, vq.init(jax.random.key(1)),
               subfolder="first_stage")

    indir = tmp_path / "in"
    indir.mkdir()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    mask = np.zeros((16, 16), np.uint8)
    mask[4:12, 4:12] = 255
    Image.fromarray(img, "RGB").save(indir / "a.png")
    Image.fromarray(mask, "L").save(indir / "a_mask.png")

    outdir = tmp_path / "out"
    main(["--indir", str(indir), "--outdir", str(outdir),
          "--model_path", str(mdir), "--steps", "2"])

    out = np.asarray(Image.open(outdir / "a.png"))
    assert out.shape == (16, 16, 3)
    # outside the mask the composite must reproduce the input exactly
    # (up to the [0,1] round trip)
    keep = np.ones((16, 16), bool)
    keep[4:12, 4:12] = False
    np.testing.assert_allclose(out[keep], img[keep], atol=1)
    # inside, the model generated something different
    assert np.abs(out[~keep].astype(int) - img[~keep].astype(int)).max() > 2
