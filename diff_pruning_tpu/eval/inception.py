"""InceptionV3 (FID variant) in JAX — port of the reference's inception.py.

Architecture: torchvision inception_v3 with the pytorch-fid modifications
(reference inception.py:168-340): FID InceptionA/C use average pooling with
count_include_pad=False, Mixed_7b is FIDInceptionE_1 (avg pool branch),
Mixed_7c is FIDInceptionE_2 (MAX pool branch). Output is the 2048-d pool3
feature (reference block index 3, inception.py:24-29).

Weights: converted from the pt_inception-2015-12-05 checkpoint
(FID_WEIGHTS_URL, inception.py:13) via tools/convert_inception.py when
available locally — this zero-egress environment cannot download them, so
:func:`load_fid_inception_params` accepts any local .pth/.npz copy. Random
init is supported for architecture parity tests.

Input: float images in [0,1], NHWC; resized to 299 bilinear and scaled to
[-1,1] (inception.py:33-34,69-70). BN is inference-mode (folded running
stats, eps=1e-3).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, p, stride=1, padding=(0, 0)):
    if isinstance(padding, int):
        padding = (padding, padding)
    # FID features must be computed at true f32 (DEFAULT precision is
    # bf16-grade on this build and would shift FID scores)
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        [(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


def basic_conv(x, p, stride=1, padding=(0, 0)):
    """BasicConv2d: conv(no bias) + BN(eps=1e-3, running stats) + relu."""
    x = _conv(x, p, stride, padding)
    scale = p["bn_scale"] * jax.lax.rsqrt(p["bn_var"] + 1e-3)
    x = x * scale.astype(x.dtype) + (p["bn_bias"] - p["bn_mean"] * scale).astype(x.dtype)
    return jax.nn.relu(x)


def max_pool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def avg_pool_3x3_nocountpad(x):
    """3x3 stride-1 avg pool, count_include_pad=False (FID blocks)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / cnt


def avg_pool_3x3_countpad(x):
    """Standard torch AvgPool2d(3,1,1) with count_include_pad=True
    (used by stock InceptionB/D pass-through paths: none; kept for clarity)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


def inception_a(x, p, count_include_pad=False):
    b1 = basic_conv(x, p["branch1x1"])
    b5 = basic_conv(x, p["branch5x5_1"])
    b5 = basic_conv(b5, p["branch5x5_2"], padding=2)
    b3 = basic_conv(x, p["branch3x3dbl_1"])
    b3 = basic_conv(b3, p["branch3x3dbl_2"], padding=1)
    b3 = basic_conv(b3, p["branch3x3dbl_3"], padding=1)
    pool = avg_pool_3x3_countpad(x) if count_include_pad else avg_pool_3x3_nocountpad(x)
    bp = basic_conv(pool, p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def inception_b(x, p):
    b3 = basic_conv(x, p["branch3x3"], stride=2)
    bd = basic_conv(x, p["branch3x3dbl_1"])
    bd = basic_conv(bd, p["branch3x3dbl_2"], padding=1)
    bd = basic_conv(bd, p["branch3x3dbl_3"], stride=2)
    mp = max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, mp], axis=-1)


def inception_c(x, p, count_include_pad=False):
    b1 = basic_conv(x, p["branch1x1"])
    b7 = basic_conv(x, p["branch7x7_1"])
    b7 = basic_conv(b7, p["branch7x7_2"], padding=(0, 3))
    b7 = basic_conv(b7, p["branch7x7_3"], padding=(3, 0))
    bd = basic_conv(x, p["branch7x7dbl_1"])
    bd = basic_conv(bd, p["branch7x7dbl_2"], padding=(3, 0))
    bd = basic_conv(bd, p["branch7x7dbl_3"], padding=(0, 3))
    bd = basic_conv(bd, p["branch7x7dbl_4"], padding=(3, 0))
    bd = basic_conv(bd, p["branch7x7dbl_5"], padding=(0, 3))
    pool = avg_pool_3x3_countpad(x) if count_include_pad else avg_pool_3x3_nocountpad(x)
    bp = basic_conv(pool, p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def inception_d(x, p):
    b3 = basic_conv(x, p["branch3x3_1"])
    b3 = basic_conv(b3, p["branch3x3_2"], stride=2)
    b7 = basic_conv(x, p["branch7x7x3_1"])
    b7 = basic_conv(b7, p["branch7x7x3_2"], padding=(0, 3))
    b7 = basic_conv(b7, p["branch7x7x3_3"], padding=(3, 0))
    b7 = basic_conv(b7, p["branch7x7x3_4"], stride=2)
    mp = max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, mp], axis=-1)


def inception_e(x, p, pool_kind="avg_nocount"):
    b1 = basic_conv(x, p["branch1x1"])
    b3 = basic_conv(x, p["branch3x3_1"])
    b3 = jnp.concatenate([
        basic_conv(b3, p["branch3x3_2a"], padding=(0, 1)),
        basic_conv(b3, p["branch3x3_2b"], padding=(1, 0)),
    ], axis=-1)
    bd = basic_conv(x, p["branch3x3dbl_1"])
    bd = basic_conv(bd, p["branch3x3dbl_2"], padding=1)
    bd = jnp.concatenate([
        basic_conv(bd, p["branch3x3dbl_3a"], padding=(0, 1)),
        basic_conv(bd, p["branch3x3dbl_3b"], padding=(1, 0)),
    ], axis=-1)
    if pool_kind == "max":  # FIDInceptionE_2 (inception.py:316-320)
        pool = max_pool(x, 3, 1, pad=1)
    elif pool_kind == "avg_nocount":  # FIDInceptionE_1 (inception.py:288-292)
        pool = avg_pool_3x3_nocountpad(x)
    else:
        pool = avg_pool_3x3_countpad(x)
    bp = basic_conv(pool, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params: dict, images: jnp.ndarray, *,
                    resize: bool = True, normalize: bool = True) -> jnp.ndarray:
    """images: NHWC float in [0,1] -> (N, 2048) pool3 features."""
    x = images
    if resize:
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), "bilinear")
    if normalize:
        x = 2.0 * x - 1.0
    x = basic_conv(x, params["Conv2d_1a_3x3"], stride=2)
    x = basic_conv(x, params["Conv2d_2a_3x3"])
    x = basic_conv(x, params["Conv2d_2b_3x3"], padding=1)
    x = max_pool(x, 3, 2)
    x = basic_conv(x, params["Conv2d_3b_1x1"])
    x = basic_conv(x, params["Conv2d_4a_3x3"])
    x = max_pool(x, 3, 2)
    x = inception_a(x, params["Mixed_5b"])
    x = inception_a(x, params["Mixed_5c"])
    x = inception_a(x, params["Mixed_5d"])
    x = inception_b(x, params["Mixed_6a"])
    x = inception_c(x, params["Mixed_6b"])
    x = inception_c(x, params["Mixed_6c"])
    x = inception_c(x, params["Mixed_6d"])
    x = inception_c(x, params["Mixed_6e"])
    x = inception_d(x, params["Mixed_7a"])
    x = inception_e(x, params["Mixed_7b"], pool_kind="avg_nocount")
    x = inception_e(x, params["Mixed_7c"], pool_kind="max")
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1


# -- weight conversion --------------------------------------------------------

def torch_inception_state_dict_to_params(sd) -> dict:
    """torchvision/pytorch-fid inception state_dict -> nested JAX params."""
    out: Dict[str, dict] = {}
    for name, tensor in sd.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = name.split(".")
        if parts[0] == "AuxLogits":
            continue
        if parts[0] == "fc":
            # classifier head kept for the Inception Score (eval/fidelity.py)
            d = out.setdefault("fc", {})
            if parts[1] == "weight":
                d["kernel"] = arr.transpose(1, 0)  # (1008, 2048) -> (in, out)
            else:
                d["bias"] = arr
            continue
        if parts[0].startswith("Mixed"):
            block, branch, kind, leaf = parts[0], parts[1], parts[2], parts[3]
            dst = out.setdefault(block, {}).setdefault(branch, {})
        else:
            block, kind, leaf = parts[0], parts[1], parts[2]
            dst = out.setdefault(block, {})
        if kind == "conv" and leaf == "weight":
            dst["kernel"] = arr.transpose(2, 3, 1, 0)
        elif kind == "bn":
            dst["bn_" + {"weight": "scale", "bias": "bias",
                         "running_mean": "mean", "running_var": "var"}[leaf]] = arr
    return out


def random_init_fid_inception_params(seed: int = 0) -> dict:
    """Seeded random-init params with the exact pt_inception shapes.

    For zero-egress environments where the FID weights
    (pt_inception-2015-12-05, reference inception.py:13) cannot be fetched:
    a fixed-seed random CNN is a deterministic feature extractor, so the
    Fréchet distance it induces is a valid *relative* two-sample distance
    (compare two sample sets against each other) — it is NOT comparable to
    published FID numbers. The channel plan is torchvision inception_v3's
    (the reference wires the same blocks). ``seed`` may also be a
    ``np.random.Generator``."""
    rng = seed if isinstance(seed, np.random.Generator) else np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def conv(name, cin, cout, kh, kw):
        sd[f"{name}.conv.weight"] = (
            rng.standard_normal((cout, cin, kh, kw)).astype(np.float32) * 0.05)
        sd[f"{name}.bn.weight"] = np.abs(rng.standard_normal(cout)).astype(np.float32) + 0.5
        sd[f"{name}.bn.bias"] = rng.standard_normal(cout).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_mean"] = rng.standard_normal(cout).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_var"] = np.abs(rng.standard_normal(cout)).astype(np.float32) + 1.0

    conv("Conv2d_1a_3x3", 3, 32, 3, 3)
    conv("Conv2d_2a_3x3", 32, 32, 3, 3)
    conv("Conv2d_2b_3x3", 32, 64, 3, 3)
    conv("Conv2d_3b_1x1", 64, 80, 1, 1)
    conv("Conv2d_4a_3x3", 80, 192, 3, 3)

    def block_a(name, cin, pool):
        conv(f"{name}.branch1x1", cin, 64, 1, 1)
        conv(f"{name}.branch5x5_1", cin, 48, 1, 1)
        conv(f"{name}.branch5x5_2", 48, 64, 5, 5)
        conv(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
        conv(f"{name}.branch3x3dbl_2", 64, 96, 3, 3)
        conv(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        conv(f"{name}.branch_pool", cin, pool, 1, 1)

    block_a("Mixed_5b", 192, 32)
    block_a("Mixed_5c", 256, 64)
    block_a("Mixed_5d", 288, 64)
    conv("Mixed_6a.branch3x3", 288, 384, 3, 3)
    conv("Mixed_6a.branch3x3dbl_1", 288, 64, 1, 1)
    conv("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 3)
    conv("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)

    def block_c(name, c7):
        conv(f"{name}.branch1x1", 768, 192, 1, 1)
        conv(f"{name}.branch7x7_1", 768, c7, 1, 1)
        conv(f"{name}.branch7x7_2", c7, c7, 1, 7)
        conv(f"{name}.branch7x7_3", c7, 192, 7, 1)
        conv(f"{name}.branch7x7dbl_1", 768, c7, 1, 1)
        conv(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        conv(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        conv(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        conv(f"{name}.branch7x7dbl_5", c7, 192, 1, 7)
        conv(f"{name}.branch_pool", 768, 192, 1, 1)

    block_c("Mixed_6b", 128)
    block_c("Mixed_6c", 160)
    block_c("Mixed_6d", 160)
    block_c("Mixed_6e", 192)
    conv("Mixed_7a.branch3x3_1", 768, 192, 1, 1)
    conv("Mixed_7a.branch3x3_2", 192, 320, 3, 3)
    conv("Mixed_7a.branch7x7x3_1", 768, 192, 1, 1)
    conv("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    conv("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    conv("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)

    def block_e(name, cin):
        conv(f"{name}.branch1x1", cin, 320, 1, 1)
        conv(f"{name}.branch3x3_1", cin, 384, 1, 1)
        conv(f"{name}.branch3x3_2a", 384, 384, 1, 3)
        conv(f"{name}.branch3x3_2b", 384, 384, 3, 1)
        conv(f"{name}.branch3x3dbl_1", cin, 448, 1, 1)
        conv(f"{name}.branch3x3dbl_2", 448, 384, 3, 3)
        conv(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        conv(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        conv(f"{name}.branch_pool", cin, 192, 1, 1)

    block_e("Mixed_7b", 1280)
    block_e("Mixed_7c", 2048)
    return torch_inception_state_dict_to_params(sd)


def load_fid_inception_params(path: Optional[str] = None) -> Optional[dict]:
    """Load FID inception weights from a local file (.pth or .npz).

    Search order: explicit path, $FID_INCEPTION_WEIGHTS, the torch hub cache
    (pt_inception-2015-12-05-6726825d.pth). Returns None when unavailable.
    """
    import os

    candidates = []
    if path:
        candidates.append(path)
    if os.environ.get("FID_INCEPTION_WEIGHTS"):
        candidates.append(os.environ["FID_INCEPTION_WEIGHTS"])
    hub = os.path.expanduser("~/.cache/torch/hub/checkpoints")
    candidates.append(os.path.join(hub, "pt_inception-2015-12-05-6726825d.pth"))
    for c in candidates:
        if not os.path.exists(c):
            continue
        if c.endswith(".npz"):
            from ..utils.checkpoint import load_params_npz

            return load_params_npz(c)
        import torch

        sd = torch.load(c, map_location="cpu", weights_only=True)
        return torch_inception_state_dict_to_params(sd)
    return None
