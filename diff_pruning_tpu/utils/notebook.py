"""Notebook/demo helpers — the reference's ldm_exp/notebook_helpers.py
(:19-268) and the latent_imagenet_diffusion.ipynb workflow, TPU-native.

The reference notebook does three things: fetch + load a model
(download_models/get_model, :19-57), sample class-conditionally with CFG
(the ipynb body), and run conditioned tasks (superres/inpainting) over a
selected conditioning image (run/make_convolutional_sample, :131-268).
Equivalents here:

  get_model(path_or_preset)        checkpoint dir or preset name -> (ldm, params)
  sample_classes(...)              CFG DDIM/PLMS grid over chosen ImageNet classes
  run_superres(...) / run_inpaint(...)  concat-conditioned sampling tasks
  to_pil(images)                   [0,1] float NHWC -> PIL grid for display

Downloads are zero-egress-blocked in this environment: get_model takes a
local checkpoint dir (tools/convert_checkpoints.py output) or falls back to
a random-init preset so the notebook flow itself is runnable anywhere.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def get_model(path_or_preset: str = "cin256-v2", seed: int = 0):
    """Load (LatentDiffusion, params) from a checkpoint dir, else build the
    named preset random-init (notebook_helpers.py get_model(:52-57); the
    heibox download itself cannot run here)."""
    from ..cli.ldm_prune import load_ldm

    if os.path.isdir(path_or_preset):
        return load_ldm(path_or_preset, None, seed)
    import jax

    from ..models import unet_cond as uc
    from ..models.latent_diffusion import LatentDiffusion

    preset_fns = {
        name[: -len("_config")]: getattr(uc, name)
        for name in dir(uc) if name.endswith("_config")}
    key = path_or_preset.replace("-", "_")
    if key not in preset_fns:
        raise ValueError(
            f"{path_or_preset!r} is neither a checkpoint dir nor a preset; "
            f"presets: {sorted(preset_fns)}")
    ldm = LatentDiffusion(preset_fns[key]())
    return ldm, ldm.init(jax.random.key(seed))


def sample_classes(ldm, params, classes: Sequence[int] = (25, 187, 448, 992),
                   n_per_class: int = 4, ddim_steps: int = 20,
                   scale: float = 3.0, eta: float = 0.0,
                   method: str = "ddim", seed: int = 42) -> np.ndarray:
    """The latent_imagenet_diffusion.ipynb body: CFG-sample a grid of
    ImageNet classes and decode. Returns [0,1] float NHWC images,
    len(classes)*n_per_class rows-major."""
    import jax
    import jax.numpy as jnp

    sampler = ldm.make_cfg_sampler(params, ddim_steps=ddim_steps,
                                   guidance_scale=scale, eta=eta,
                                   method=method,
                                   latent_hw=ldm.unet.cfg.image_size,
                                   latent_ch=ldm.unet.cfg.in_channels)
    rows = []
    for i, cls in enumerate(classes):
        labels = jnp.full((n_per_class,), int(cls), jnp.int32)
        lat = sampler(jax.random.key(seed + i), labels, n_per_class)
        if ldm.first_stage is not None:
            rows.append(np.asarray(ldm.decode_first_stage(params, lat)))
        else:
            rows.append(np.clip(np.asarray(lat) * 0.5 + 0.5, 0.0, 1.0))
    return np.concatenate(rows, axis=0)


def _concat_task(unet, unet_params, cond: np.ndarray, *, ddim_steps: int,
                 eta: float, seed: int):
    import jax

    from ..models.latent_diffusion import ldm_schedule, make_concat_sampler

    latent_ch = unet.cfg.in_channels - cond.shape[-1]
    sampler = make_concat_sampler(unet, unet_params, ldm_schedule(),
                                  ddim_steps=ddim_steps, eta=eta,
                                  latent_ch=latent_ch)
    return np.asarray(sampler(jax.random.key(seed), cond))


def _unet_and_params(model, params):
    """Accept either (LatentDiffusion, {'unet': ...}) or a bare
    (UNetCond, unet_params) — concat-task models (inpainting_big, bsr) have
    no cond stage, so users typically hold the bare UNet."""
    unet = getattr(model, "unet", model)
    up = params["unet"] if isinstance(params, dict) and "unet" in params else params
    return unet, up


def run_superres(model, params, lowres: np.ndarray, *, ddim_steps: int = 100,
                 eta: float = 1.0, seed: int = 0) -> np.ndarray:
    """Super-resolution task (notebook_helpers.py run(:131) with task='bsr'):
    the conditioning is the (bicubic-upsampled) low-res image concatenated
    onto the latent channels. ``lowres`` is [0,1] float NHWC at the model's
    sample size (upsample first: data/sr.py interpolations)."""
    unet, up = _unet_and_params(model, params)
    cond = (np.asarray(lowres, np.float32) * 2.0 - 1.0)
    return _concat_task(unet, up, cond, ddim_steps=ddim_steps, eta=eta,
                        seed=seed)


def run_inpaint(model, params, image: np.ndarray, mask: np.ndarray, *,
                ddim_steps: int = 100, eta: float = 1.0,
                seed: int = 0) -> np.ndarray:
    """Inpainting task: masked image + mask concat conditioning (the
    inpainting_big contract — cli/inpaint.py owns the full CLI version)."""
    unet, up = _unet_and_params(model, params)
    img = np.asarray(image, np.float32) * 2.0 - 1.0
    m = np.asarray(mask, np.float32)
    if m.ndim == 3:
        m = m[..., None]
    cond = np.concatenate([img * (1.0 - m), m], axis=-1)
    return _concat_task(unet, up, cond, ddim_steps=ddim_steps, eta=eta,
                        seed=seed)


def to_pil(images: np.ndarray, nrow: int = 4):
    """[0,1] float NHWC batch -> one PIL grid image (display(...) it)."""
    from PIL import Image

    from ..sampling.ddim_sampler import to_uint8

    arr = to_uint8(images)
    n, h, w, c = arr.shape
    nr = (n + nrow - 1) // nrow
    pad = 2
    grid = np.full(((h + pad) * nr + pad, (w + pad) * nrow + pad, c), 255,
                   np.uint8)
    for i in range(n):
        r, col = divmod(i, nrow)
        y0, x0 = pad + r * (h + pad), pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = arr[i]
    return Image.fromarray(grid.squeeze())
