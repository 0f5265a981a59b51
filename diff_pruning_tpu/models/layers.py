"""Graph-registering functional layers (NHWC, HWIO kernels).

Each layer is a small dataclass constructed at model-definition time with
*resolved* channel sizes (pruned or not). Construction registers the layer's
parameter axes into a :class:`~diff_pruning_tpu.pruning.graph.ChannelGraph`;
``init`` produces the param subtree; ``__call__`` is the pure apply function.

Layout: activations NHWC (TPU-native: C maps to the 128-wide lane dimension),
conv kernels HWIO — the torch checkpoint converter permutes OIHW->HWIO
(tools/convert.py). Reference layer semantics follow the vendored diffusers
0.17 modules cited on each class.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..pruning.graph import CatVar, ChannelGraph, ChannelVar, VarLike


class Scope:
    """Hierarchical path helper binding layers to graph param paths."""

    def __init__(self, graph: ChannelGraph, path: str = ""):
        self.graph = graph
        self.path = path

    def __call__(self, name: str) -> "Scope":
        return Scope(self.graph, f"{self.path}/{name}" if self.path else name)

    def ref(self, leaf: str, axis: int, var: VarLike, role: str) -> None:
        self.graph.ref(f"{self.path}/{leaf}" if self.path else leaf, axis, var, role)


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # Matches torch's default Conv2d/Linear init (kaiming_uniform a=sqrt(5))
    # so randomly-initialized models have comparable scale to the reference.
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


@dataclasses.dataclass
class Conv2D:
    """3x3/1x1 conv, stride/padding per diffusers usage (resnet.py:531,552)."""

    scope: Scope
    cin: VarLike
    cout: ChannelVar
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1  # symmetric; asymmetric handled by caller (Downsample2D)
    use_bias: bool = True

    def __post_init__(self):
        self.scope.ref("kernel", 2, self.cin, "in")
        self.scope.ref("kernel", 3, self.cout, "out")
        if self.use_bias:
            self.scope.ref("bias", 0, self.cout, "bias")

    def init(self, key):
        k = self.kernel_size
        fan_in = self.cin.size * k * k
        kkey, bkey = jax.random.split(key)
        p = {"kernel": _kaiming_uniform(kkey, (k, k, self.cin.size, self.cout.size), fan_in)}
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            p["bias"] = jax.random.uniform(bkey, (self.cout.size,), jnp.float32, -bound, bound)
        return p

    def __call__(self, p, x):
        pad = [(self.padding, self.padding)] * 2
        y = jax.lax.conv_general_dilated(
            x,
            p["kernel"].astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + p["bias"].astype(x.dtype)
        return y


@dataclasses.dataclass
class Linear:
    scope: Scope
    din: VarLike
    dout: ChannelVar
    use_bias: bool = True

    def __post_init__(self):
        self.scope.ref("kernel", 0, self.din, "in")
        self.scope.ref("kernel", 1, self.dout, "out")
        if self.use_bias:
            self.scope.ref("bias", 0, self.dout, "bias")

    def init(self, key):
        kkey, bkey = jax.random.split(key)
        p = {"kernel": _kaiming_uniform(kkey, (self.din.size, self.dout.size), self.din.size)}
        if self.use_bias:
            bound = 1.0 / math.sqrt(self.din.size)
            p["bias"] = jax.random.uniform(bkey, (self.dout.size,), jnp.float32, -bound, bound)
        return p

    def __call__(self, p, x):
        y = x @ p["kernel"].astype(x.dtype)
        if self.use_bias:
            y = y + p["bias"].astype(x.dtype)
        return y


@dataclasses.dataclass
class GroupNorm:
    """GroupNorm over the channel axis of (..., C) activations.

    torch.nn.GroupNorm semantics (normalize over each group's channels x all
    spatial positions). Registering tightens the var's group_div so pruning
    removes channels uniformly per group — the reference relies on
    metapruner.py:123-124 auto-detecting this; here it is structural.
    Stats in float32 regardless of activation dtype.
    """

    scope: Scope
    var: VarLike
    num_groups: int
    eps: float = 1e-6

    def __post_init__(self):
        # On a concatenated input (up-block norm1 over cat([h, skip])), the
        # divisibility constraint devolves onto each part: if every part is
        # pruned uniformly across `num_groups` blocks, each stays divisible
        # by num_groups and so does the concat — the same net constraint
        # torch_pruning reaches via its group-membership walk.
        if isinstance(self.var, CatVar):
            for p in self.var.parts:
                p.require_group_div(self.num_groups)
        else:
            self.var.require_group_div(self.num_groups)
        self.scope.ref("scale", 0, self.var, "norm")
        self.scope.ref("bias", 0, self.var, "bias")

    def init(self, key):
        del key
        return {"scale": jnp.ones((self.var.size,)), "bias": jnp.zeros((self.var.size,))}

    def __call__(self, p, x):
        orig_dtype = x.dtype
        c = x.shape[-1]
        g = self.num_groups
        xf = x.astype(jnp.float32)
        # (..., C) -> (batch, -1, g, C//g): normalize over all dims except batch & group
        b = x.shape[0]
        xg = xf.reshape(b, -1, g, c // g)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        varr = jnp.var(xg, axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(varr + self.eps)
        y = xg.reshape(x.shape)
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
        return y.astype(orig_dtype)


@dataclasses.dataclass
class SelfAttention2D:
    """Spatial self-attention matching diffusers Attention with
    ``_from_deprecated_attn_block=True`` (attention_processor.py:36-150,
    AttnProcessor at :415-470): GN over channels, q/k/v/out Linear (bias=True),
    residual connection, softmax in float32.

    For DDPM UNets ``attention_head_dim=None`` -> heads=1 (unet_2d.py:433).
    ``inner`` is the shared q/k/v output ChannelVar — the reference's autograd
    trace couples to_q/to_k/to_v outs and to_out in through the attention
    bmms, which this single var encodes exactly. Head-consistent pruning
    (ldm_prune.py:75-81) is the var's group_div = heads.
    """

    scope: Scope
    var: ChannelVar  # spatial channel var (query dim, residual)
    inner: ChannelVar  # q/k/v projection dim; group_div=heads
    heads: int = 1
    norm_num_groups: int = 32
    eps: float = 1e-6
    rescale_output_factor: float = 1.0

    def __post_init__(self):
        self.inner.require_group_div(self.heads)
        s = self.scope
        self.group_norm = GroupNorm(s("group_norm"), self.var, self.norm_num_groups, self.eps)
        self.to_q = Linear(s("to_q"), self.var, self.inner)
        self.to_k = Linear(s("to_k"), self.var, self.inner)
        self.to_v = Linear(s("to_v"), self.var, self.inner)
        self.to_out = Linear(s("to_out"), self.inner, self.var)

    def init(self, key):
        ks = jax.random.split(key, 5)
        return {
            "group_norm": self.group_norm.init(ks[0]),
            "to_q": self.to_q.init(ks[1]),
            "to_k": self.to_k.init(ks[2]),
            "to_v": self.to_v.init(ks[3]),
            "to_out": self.to_out.init(ks[4]),
        }

    def __call__(self, p, x):
        b, h, w, c = x.shape
        residual = x
        tokens = x.reshape(b, h * w, c)
        tokens = self.group_norm(p["group_norm"], tokens)
        q = self.to_q(p["to_q"], tokens)
        k = self.to_k(p["to_k"], tokens)
        v = self.to_v(p["to_v"], tokens)
        inner = self.inner.size
        dim_head = inner // self.heads
        scale = dim_head**-0.5

        def split_heads(t):  # (B, N, inner) -> (B, heads, N, dim_head)
            return t.reshape(b, -1, self.heads, dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        # scores in f32 (upcast_softmax=True in the reference)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores * scale, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, inner)
        out = self.to_out(p["to_out"], out)
        out = out.reshape(b, h, w, c) + residual
        if self.rescale_output_factor != 1.0:
            out = out / self.rescale_output_factor
        return out


def silu(x):
    return jax.nn.silu(x)


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal DDPM timestep embedding (embeddings.py:22-62)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC (resnet.py:155)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def downsample_pad(x: jnp.ndarray) -> jnp.ndarray:
    """Asymmetric (0,1,0,1) spatial pad used by Downsample2D when
    downsample_padding == 0 (resnet.py:213-215)."""
    return jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
