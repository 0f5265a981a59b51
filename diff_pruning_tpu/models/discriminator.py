"""PatchGAN discriminator + ActNorm for first-stage autoencoder training.

Re-creates `taming/modules/discriminator/model.py` (NLayerDiscriminator, the
pix2pix PatchGAN) and `taming/modules/util.py` ActNorm, which the reference's
`LPIPSWithDiscriminator` / `VQLPIPSWithDiscriminator` losses instantiate
(`ldm_exp/ldm/modules/losses/contperceptual.py:22-25`,
`vqperceptual.py:67-71`).

TPU-first notes:
- NHWC activations / HWIO kernels like every model here.
- The discriminator only ever runs in train mode inside the GAN step, where
  torch BatchNorm uses *batch* statistics — implemented directly; the torch
  running buffers are never consumed by the training workflow (they would
  only matter for an eval-mode discriminator, which the reference never
  runs), so they are not tracked.
- Every param axis is registered in a ChannelGraph, so the discriminator is
  itself prunable like the rest of the zoo.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..pruning.graph import ChannelGraph
from .layers import Scope


def _batch_stats_norm(p, x, eps=1e-5):
    """torch.nn.BatchNorm2d in training mode (per-batch statistics)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.var(xf, axis=(0, 1, 2))
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def actnorm_apply(p, x):
    """ActNorm affine: scale * (x + loc) per channel (taming util.ActNorm)."""
    return p["scale"].astype(x.dtype) * (x + p["loc"].astype(x.dtype))


def actnorm_initialize(p, x):
    """Data-dependent init from the first batch (ActNorm.initialize):
    loc = -mean, scale = 1/(std+1e-6) per channel. Returns new params."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    std = jnp.std(xf, axis=(0, 1, 2))
    return {"loc": -mean, "scale": 1.0 / (std + 1e-6)}


@dataclasses.dataclass
class NLayerDiscriminator:
    """4x4-conv PatchGAN: C64(s2) - C128(s2) - C256(s2) - C512(s1) - C1(s1)
    for the default n_layers=3, LeakyReLU(0.2), BatchNorm (or ActNorm) on
    every block but the first and last."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False

    def __post_init__(self):
        g = self.graph = ChannelGraph()
        root = Scope(g)
        self.widths: List[int] = [self.ndf]
        for n in range(1, self.n_layers + 1):
            self.widths.append(self.ndf * min(2 ** n, 8))
        self.v_in = g.var("in_img", self.input_nc, prunable=False)
        self.v_out = g.var("logits", 1, prunable=False)
        self.vars = [g.var(f"main/{i}/out", w) for i, w in enumerate(self.widths)]
        prev = self.v_in
        for i, v in enumerate(self.vars):
            s = root(f"main/{i}/conv")
            s.ref("kernel", 2, prev, "in")
            s.ref("kernel", 3, v, "out")
            # first block and ActNorm blocks keep the conv bias (torch:
            # use_bias = norm is ActNorm); BatchNorm blocks drop it
            if i == 0 or self.use_actnorm:
                s.ref("bias", 0, v, "bias")
            if i > 0:
                ns = root(f"main/{i}/norm")
                ns.ref("scale", 0, v, "norm")
                ns.ref("bias" if not self.use_actnorm else "loc", 0, v, "bias")
            prev = v
        s = root("main/out/conv")
        s.ref("kernel", 2, prev, "in")
        s.ref("kernel", 3, self.v_out, "out")
        s.ref("bias", 0, self.v_out, "bias")

    def init(self, key):
        """weights_init semantics (taming model.py): conv kernels N(0, 0.02),
        norm scale N(1, 0.02), norm bias 0."""
        p = {"main": {}}
        cin = self.v_in.size
        for i, v in enumerate(self.vars):
            key, k1, k2 = jax.random.split(key, 3)
            blk = {"conv": {"kernel": 0.02 * jax.random.normal(
                k1, (4, 4, cin, v.size))}}
            if i == 0 or self.use_actnorm:
                blk["conv"]["bias"] = jnp.zeros((v.size,))
            if i > 0:
                if self.use_actnorm:
                    blk["norm"] = {"scale": jnp.ones((v.size,)),
                                   "loc": jnp.zeros((v.size,))}
                else:
                    blk["norm"] = {"scale": 1.0 + 0.02 * jax.random.normal(
                        k2, (v.size,)), "bias": jnp.zeros((v.size,))}
            p["main"][str(i)] = blk
            cin = v.size
        key, k1, k2 = jax.random.split(key, 3)
        p["main"]["out"] = {"conv": {
            "kernel": 0.02 * jax.random.normal(k1, (4, 4, cin, 1)),
            "bias": jnp.zeros((1,))}}
        return p

    def _conv(self, p, x, stride):
        y = jax.lax.conv_general_dilated(
            x, p["kernel"].astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y

    @property
    def min_input_size(self) -> int:
        """Smallest H/W with a non-empty logits map: n_layers stride-2 k4p1
        convs halve exactly, then two stride-1 k4p1 convs each shave one —
        H / 2^n - 2 >= 1."""
        return 3 * (2 ** self.n_layers)

    def __call__(self, p, x):
        """(N, H, W, input_nc) -> patch logits (N, h, w, 1)."""
        if min(x.shape[1], x.shape[2]) < self.min_input_size:
            # an undersized input yields a ZERO-SIZE logits map and the GAN
            # losses (means over it) silently become NaN — fail loudly
            raise ValueError(
                f"input {x.shape[1]}x{x.shape[2]} too small for a "
                f"{self.n_layers}-layer PatchGAN (needs >= "
                f"{self.min_input_size}); reduce n_layers")
        h = x
        for i in range(len(self.vars)):
            blk = p["main"][str(i)]
            stride = 2 if i < self.n_layers else 1
            h = self._conv(blk["conv"], h, stride)
            if i > 0:
                if self.use_actnorm:
                    h = actnorm_apply(blk["norm"], h)
                else:
                    h = _batch_stats_norm(blk["norm"], h)
            h = jax.nn.leaky_relu(h, 0.2)
        return self._conv(p["main"]["out"]["conv"], h, 1)
