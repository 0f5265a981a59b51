"""SSIM — the paper's same-seed consistency metric.

Port of pytorch_msssim's gaussian-window SSIM as used by
ddpm_exp/compute_ssim.py:39-52 (window 11, sigma 1.5, data_range 1,
size_average). Inputs NHWC in [0,1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def _filter2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise valid 2-D filter over NHWC."""
    c = x.shape[-1]
    k = jnp.asarray(kernel, x.dtype)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    # eval metric: force true-f32 accumulation (the build's DEFAULT matmul
    # precision is bf16-grade, which shifts SSIM by ~2e-4)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("size_average",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, *, data_range: float = 1.0,
         size_average: bool = True) -> jnp.ndarray:
    """SSIM over NHWC batches; size_average -> scalar else per-image."""
    win = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mu1 = _filter2d(x, win)
    mu2 = _filter2d(y, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(x * x, win) - mu1_sq
    s2 = _filter2d(y * y, win) - mu2_sq
    s12 = _filter2d(x * y, win) - mu12
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    m = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    per_image = m.mean(axis=(1, 2, 3))
    return per_image.mean() if size_average else per_image


def pairwise_ssim_mse(dir1: str, dir2: str, *, batch_size: int = 256):
    """compute_ssim.py equivalent: mean SSIM + MSE between same-named images."""
    import os

    from ..data.datasets import list_image_files

    files1 = {os.path.basename(f): f for f in list_image_files(dir1)}
    files2 = {os.path.basename(f): f for f in list_image_files(dir2)}
    common = sorted(set(files1) & set(files2))
    if not common:
        raise ValueError("no matching filenames between the two dirs")
    from PIL import Image

    ssims, mses = [], []
    for i in range(0, len(common), batch_size):
        names = common[i:i + batch_size]
        a = np.stack([np.asarray(Image.open(files1[n]).convert("RGB")) for n in names])
        b = np.stack([np.asarray(Image.open(files2[n]).convert("RGB")) for n in names])
        a = jnp.asarray(a, jnp.float32) / 255.0
        b = jnp.asarray(b, jnp.float32) / 255.0
        ssims.append(np.asarray(ssim(a, b, size_average=False)))
        mses.append(np.asarray(((a - b) ** 2).mean(axis=(1, 2, 3))))
    return float(np.concatenate(ssims).mean()), float(np.concatenate(mses).mean())
