"""LPIPS perceptual distance in JAX — the reference's first-stage training
perceptual loss (taming `modules/losses/lpips.py`, used by
`ldm_exp/ldm/modules/losses/contperceptual.py:17` and
`vqperceptual.py:57`).

Architecture: frozen torchvision VGG16 `features` trunk tapped at
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 (channels 64/128/256/512/512),
unit-normalized feature differences squared, learned 1x1 "lin" heads,
spatial mean, summed over the five taps. Input images are in [-1, 1]
(the ScalingLayer maps them to VGG's ImageNet normalization).

Weights: the reference downloads torchvision's ImageNet VGG16 plus the
Heidelberg "vgg_lpips" lin-head checkpoint — both zero-egress-blocked
here; `tools/convert_checkpoints.py lpips` converts locally supplied
copies to a params .npz. Random init is supported for tests and for
experiments where a *relative* perceptual distance is acceptable.

Layout: NHWC activations, HWIO kernels, like the rest of the framework.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features conv indices and their (cin, cout); pooling sits
# between the slice boundaries below.
VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
VGG16_CONV_CH = ((3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
                 (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
                 (512, 512), (512, 512), (512, 512))
# features[i] index AFTER whose relu a tap is taken (relu1_2 ... relu5_3)
TAP_AFTER_CONV = (2, 7, 14, 21, 28)
TAP_CHANNELS = (64, 128, 256, 512, 512)
# pools sit before convs 5, 10, 17, 24 (features idx 4, 9, 16, 23)
POOL_BEFORE_CONV = (5, 10, 17, 24)

# ScalingLayer constants (taming lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv3x3(x, p):
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + p["bias"].astype(x.dtype)


def _max_pool_2x2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1),
                                 [(0, 0)] * 4)


def vgg16_taps(params: Dict, x: jnp.ndarray):
    """Run the VGG16 trunk, returning the five tapped relu activations."""
    taps = []
    for i in VGG16_CONV_IDX:
        if i in POOL_BEFORE_CONV:
            x = _max_pool_2x2(x)
        x = jax.nn.relu(_conv3x3(x, params["features"][str(i)]))
        if i in TAP_AFTER_CONV:
            taps.append(x)
    return taps


def _normalize(x, eps=1e-10):
    # taming lpips.py normalize_tensor: x / (||x||_channels + eps)
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (n + eps)


def lpips(params: Dict, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-image LPIPS distance, shape (N,).

    `x`, `y`: NHWC images in [-1, 1] (matches the reference call sites,
    which feed [-1,1] `inputs`/`reconstructions`). Equals torch LPIPS's
    (N,1,1,1) output squeezed.
    """
    shift = jnp.asarray(_SHIFT, x.dtype)
    scale = jnp.asarray(_SCALE, x.dtype)
    t0 = vgg16_taps(params, (x - shift) / scale)
    t1 = vgg16_taps(params, (y - shift) / scale)
    val = 0.0
    for k in range(len(TAP_CHANNELS)):
        d = jnp.square(_normalize(t0[k]) - _normalize(t1[k]))
        w = params["lins"][str(k)]["kernel"].astype(d.dtype)  # (C,)
        # NetLinLayer is a 1x1 conv to 1 channel without bias -> a dot over C
        val = val + jnp.mean(d @ w, axis=(1, 2))  # spatial_average
    return val


def init_lpips_params(key) -> Dict:
    """Random init (architecture tests / relative-distance experiments).

    Lin-head weights are |N(0,0.1)| — LPIPS lin weights are non-negative in
    the trained checkpoint, and non-negativity keeps the random-init variant
    a valid pseudo-metric (sum of non-negatively weighted squared terms).
    """
    feats = {}
    for i, (cin, cout) in zip(VGG16_CONV_IDX, VGG16_CONV_CH):
        key, k1, k2 = jax.random.split(key, 3)
        std = float(np.sqrt(2.0 / (3 * 3 * cin)))
        feats[str(i)] = {
            "kernel": jax.random.normal(k1, (3, 3, cin, cout)) * std,
            "bias": jnp.zeros((cout,)),
        }
    lins = {}
    for k_i, c in enumerate(TAP_CHANNELS):
        key, k1 = jax.random.split(key)
        lins[str(k_i)] = {"kernel": jnp.abs(jax.random.normal(k1, (c,))) * 0.1}
    return {"features": feats, "lins": lins}


def torch_lpips_state_dicts_to_params(vgg_sd, lin_sd) -> Dict:
    """Convert (torchvision vgg16 state_dict, taming vgg_lpips state_dict).

    vgg_sd keys: features.{i}.weight (OIHW) / .bias for i in VGG16_CONV_IDX
    (a full torchvision vgg16 state dict also works — classifier.* ignored).
    lin_sd keys: lin{k}.model.1.weight with shape (1, C, 1, 1)
    (reference NetLinLayer: Dropout at .0, Conv2d at .1).
    """

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    feats = {}
    for i, (cin, cout) in zip(VGG16_CONV_IDX, VGG16_CONV_CH):
        w = arr(vgg_sd[f"features.{i}.weight"])
        assert w.shape == (cout, cin, 3, 3), (i, w.shape)
        feats[str(i)] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(arr(vgg_sd[f"features.{i}.bias"]))}
    lins = {}
    for k, c in enumerate(TAP_CHANNELS):
        w = arr(lin_sd[f"lin{k}.model.1.weight"])
        assert w.shape == (1, c, 1, 1), (k, w.shape)
        lins[str(k)] = {"kernel": jnp.asarray(w[0, :, 0, 0])}
    return {"features": feats, "lins": lins}


def load_lpips_params(path: Optional[str]) -> Dict:
    """Load converted params from .npz (tools/convert_checkpoints.py lpips)."""
    data = np.load(path)
    out: Dict = {"features": {}, "lins": {}}
    for name in data.files:
        parts = name.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(data[name])
    return out
