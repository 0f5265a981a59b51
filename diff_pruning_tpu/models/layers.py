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

from ..pruning.graph import CatVar, ChannelGraph, ChannelVar, VarLike, _parts_of


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

    def __call__(self, p, x, *, with_silu: bool = False):
        from .. import ops as _ops

        if _ops.pallas_enabled("group_norm") and jax.default_backend() == "tpu":
            from ..ops.group_norm import fused_group_norm

            return fused_group_norm(x, p["scale"], p["bias"],
                                    groups=self.num_groups, eps=self.eps,
                                    with_silu=with_silu)
        orig_dtype = x.dtype
        c = x.shape[-1]
        g = self.num_groups
        xf = x.astype(jnp.float32)
        # Fusion-friendly formulation (measured: the old
        # reshape-to-(B,-1,g,C/g) + jnp.var path materialized grouped
        # copies of the full activation and was 61% of LSUN-256 sampling
        # wall time — tools/attack_256.py ablation + trace, docs/PERF.md):
        #   1. per-CHANNEL sum/sumsq — big-tensor work is two reductions
        #      over the SAME read of x, no layout change, fusable;
        #   2. channels -> groups on the tiny (B, C) tensors;
        #   3. normalize as a per-channel affine y = x*a + b, the exact
        #      pattern XLA fuses into neighboring conv epilogues (the
        #      ablation's affine-only GN ran 2.56x faster end-to-end).
        red_axes = tuple(range(1, xf.ndim - 1))
        n_spatial = int(np.prod([xf.shape[a] for a in red_axes]))
        n_per_group = (c // g) * n_spatial
        bcast = (slice(None),) + (None,) * (xf.ndim - 2) + (slice(None),)
        # Variance formulation is gated on the INPUT dtype (ADVICE r3 +
        # measured in-model cost, docs/PERF.md r4):
        # * f32/f64 inputs (parity tests, eval, --mixed_precision no):
        #   SHIFTED variance — E[x^2]-E[x]^2 cancels catastrophically when
        #   mean^2 >> var. Anchor each channel at its first spatial element
        #   m0 (a sample from the distribution, so |x-m0| ~ O(std)); still
        #   ONE read of x, and the exact correction runs on tiny (B,C)
        #   tensors in f32.
        # * bf16/f16 inputs (the TPU hot paths): plain sum/sumsq — the
        #   input's own mantissa quantization (bf16: ~3e-3 relative) dwarfs
        #   the f32 stats cancellation in any regime where the layer output
        #   is still meaningful, and the shifted path measured -9.2%
        #   in-model (DDIM-100 sampling 114.1 -> 103.5 imgs/s A/B).
        shifted = orig_dtype in (jnp.float32, jnp.float64)
        bdim = xf.shape[0]
        if shifted:
            m0 = xf[(slice(None),) + (0,) * (xf.ndim - 2) + (slice(None),)]
            d = xf - m0[bcast]
        else:
            d = xf
        s1 = jnp.sum(d, axis=red_axes)        # (B, C)
        s2 = jnp.sum(d * d, axis=red_axes)    # (B, C)
        s1g = s1.reshape(bdim, g, c // g)
        s2g = s2.reshape(bdim, g, c // g)
        if shifted:
            m0g = m0.reshape(bdim, g, c // g)
            mean = (s1g.sum(-1) + n_spatial * m0g.sum(-1)) / n_per_group
            # exact: sum (x-mean)^2 = s2 + 2(m0-mean)s1 + N(m0-mean)^2 /chan
            delta = m0g - mean[..., None]
            varr = (s2g + 2.0 * delta * s1g
                    + n_spatial * delta * delta).sum(-1) / n_per_group
        else:
            mean = s1g.sum(-1) / n_per_group
            varr = s2g.sum(-1) / n_per_group - mean * mean
        varr = jnp.maximum(varr, 0.0)
        inv = jax.lax.rsqrt(varr + self.eps)        # (B, g)
        invc = jnp.repeat(inv, c // g, axis=-1)     # (B, C)
        meanc = jnp.repeat(mean, c // g, axis=-1)
        a = p["scale"].astype(jnp.float32) * invc
        bb = p["bias"].astype(jnp.float32) - meanc * a
        y = xf * a[bcast] + bb[bcast]
        if with_silu:
            y = y * jax.nn.sigmoid(y)
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
        from .. import ops as _ops

        if _ops.pallas_enabled("attention") and jax.default_backend() == "tpu":
            from ..ops.attention import flash_attention

            out = flash_attention(q, k, v, scale)
        else:
            # scores in f32 (upcast_softmax=True in the reference)
            scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                                preferred_element_type=jnp.float32)
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


@dataclasses.dataclass
class LayerNorm:
    """nn.LayerNorm over the last dim (BasicTransformerBlock norms,
    ldm_exp/ldm/modules/attention.py:204-206)."""

    scope: Scope
    var: VarLike
    eps: float = 1e-5

    def __post_init__(self):
        self.scope.ref("scale", 0, self.var, "norm")
        self.scope.ref("bias", 0, self.var, "bias")

    def init(self, key):
        del key
        return {"scale": jnp.ones((self.var.size,)), "bias": jnp.zeros((self.var.size,))}

    def __call__(self, p, x):
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
        return y.astype(x.dtype)


@dataclasses.dataclass
class CrossAttention:
    """CompVis CrossAttention (ldm_exp/ldm/modules/attention.py:152-196):
    bias-free q/k/v, heads via reshape, to_out Linear (bias=True).
    Self-attention when context_var is None. `inner` carries the
    head-grouping constraint (ldm_prune.py:79-83)."""

    scope: Scope
    query: VarLike
    inner: ChannelVar
    heads: int
    context: Optional[VarLike] = None  # None -> self-attention

    def __post_init__(self):
        self.inner.require_group_div(self.heads)
        s = self.scope
        ctx = self.context if self.context is not None else self.query
        self.to_q = Linear(s("to_q"), self.query, self.inner, use_bias=False)
        self.to_k = Linear(s("to_k"), ctx, self.inner, use_bias=False)
        self.to_v = Linear(s("to_v"), ctx, self.inner, use_bias=False)
        self.to_out = Linear(s("to_out"), self.inner, _out_var_of(self.query))

    def init(self, key):
        ks = jax.random.split(key, 4)
        return {"to_q": self.to_q.init(ks[0]), "to_k": self.to_k.init(ks[1]),
                "to_v": self.to_v.init(ks[2]), "to_out": self.to_out.init(ks[3])}

    def __call__(self, p, x, context=None):
        ctx = x if context is None else context
        b = x.shape[0]
        q = self.to_q(p["to_q"], x)
        k = self.to_k(p["to_k"], ctx)
        v = self.to_v(p["to_v"], ctx)
        h = self.heads
        dim_head = self.inner.size // h
        scale = dim_head**-0.5

        def split(t):
            return t.reshape(b, -1, h, dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        from .. import ops as _ops

        if _ops.pallas_enabled("attention") and jax.default_backend() == "tpu":
            from ..ops.attention import flash_attention

            out = flash_attention(q, k, v, scale)
        else:
            sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                             preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.inner.size)
        return self.to_out(p["to_out"], out)


def _out_var_of(v: VarLike) -> ChannelVar:
    if isinstance(v, CatVar):
        raise ValueError("attention output cannot target a concat var")
    return v


@dataclasses.dataclass
class FeedForward:
    """GEGLU FeedForward (attention.py:37-64): proj (d -> 2*inner) where the
    two halves (value, gate) are both indexed by the SAME ff-inner var —
    registered as a two-part AxisRef so surgery slices both halves
    consistently — then Linear(inner -> d)."""

    scope: Scope
    var: ChannelVar
    inner: ChannelVar

    def __post_init__(self):
        s = self.scope
        g = s.graph
        f = self.inner.size
        # proj kernel: (d, 2f), columns [0:f]=value, [f:2f]=gate, same var
        from ..pruning.graph import AxisRef, _parts_of

        g.ref(f"{s.path}/proj/kernel" if s.path else "proj/kernel", 0, self.var, "in")
        g.refs.append(AxisRef(
            f"{s.path}/proj/kernel" if s.path else "proj/kernel", 1,
            ((self.inner, 0), (self.inner, f)), "out"))
        g.refs.append(AxisRef(
            f"{s.path}/proj/bias" if s.path else "proj/bias", 0,
            ((self.inner, 0), (self.inner, f)), "bias"))
        g._by_var = None
        self.out = Linear(s("out"), self.inner, self.var)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        d, f = self.var.size, self.inner.size
        bound = math.sqrt(1.0 / d)
        return {
            "proj": {
                "kernel": _kaiming_uniform(k1, (d, 2 * f), d),
                "bias": jax.random.uniform(k2, (2 * f,), jnp.float32, -bound, bound),
            },
            "out": self.out.init(k3),
        }

    def __call__(self, p, x):
        h = x @ p["proj"]["kernel"].astype(x.dtype) + p["proj"]["bias"].astype(x.dtype)
        val, gate = jnp.split(h, 2, axis=-1)
        h = val * jax.nn.gelu(gate, approximate=False)
        return self.out(p["out"], h)


@dataclasses.dataclass
class SpatialTransformer:
    """CompVis SpatialTransformer (attention.py:218-258): GN -> 1x1 proj_in
    -> depth x BasicTransformerBlock(self-attn, cross-attn, GEGLU ff, pre-LN)
    -> 1x1 proj_out (+ residual). proj_out's out-axis ties back to the
    spatial var through the residual add."""

    scope: Scope
    var: ChannelVar  # spatial channel var
    inner: ChannelVar  # transformer width (n_heads * d_head)
    heads: int
    context: Optional[VarLike]  # None -> pure self-attention transformer
    depth: int = 1
    norm_num_groups: int = 32
    attn_inner_vars: Optional[list] = None  # [(attn1_inner, attn2_inner, ff_inner)]

    def __post_init__(self):
        s = self.scope
        self.norm = GroupNorm(s("norm"), self.var, self.norm_num_groups, 1e-6)
        self.proj_in = Conv2D(s("proj_in"), self.var, self.inner, 1, 1, 0)
        self.blocks = []
        for d in range(self.depth):
            bs = s(f"transformer_blocks/{d}")
            a1_inner, a2_inner, ff_inner = self.attn_inner_vars[d]
            norm1 = LayerNorm(bs("norm1"), self.inner)
            attn1 = CrossAttention(bs("attn1"), self.inner, a1_inner, self.heads)
            norm2 = LayerNorm(bs("norm2"), self.inner)
            attn2 = CrossAttention(bs("attn2"), self.inner, a2_inner, self.heads,
                                   context=self.context)
            norm3 = LayerNorm(bs("norm3"), self.inner)
            ff = FeedForward(bs("ff"), self.inner, ff_inner)
            self.blocks.append((norm1, attn1, norm2, attn2, norm3, ff))
        self.proj_out = Conv2D(s("proj_out"), self.inner, self.var, 1, 1, 0)

    def init(self, key):
        cnt = [0]

        def nk():
            cnt[0] += 1
            return jax.random.fold_in(key, cnt[0])

        p = {"norm": self.norm.init(nk()), "proj_in": self.proj_in.init(nk()),
             "transformer_blocks": {}, "proj_out": self.proj_out.init(nk())}
        # proj_out is zero-initialized (attention.py:240 zero_module)
        p["proj_out"]["kernel"] = jnp.zeros_like(p["proj_out"]["kernel"])
        p["proj_out"]["bias"] = jnp.zeros_like(p["proj_out"]["bias"])
        for d, (n1, a1, n2, a2, n3, ff) in enumerate(self.blocks):
            p["transformer_blocks"][str(d)] = {
                "norm1": n1.init(nk()), "attn1": a1.init(nk()),
                "norm2": n2.init(nk()), "attn2": a2.init(nk()),
                "norm3": n3.init(nk()), "ff": ff.init(nk()),
            }
        return p

    def __call__(self, p, x, context=None):
        b, hh, ww, c = x.shape
        x_in = x
        h = self.norm(p["norm"], x)
        h = self.proj_in(p["proj_in"], h)
        h = h.reshape(b, hh * ww, self.inner.size)
        for d, (n1, a1, n2, a2, n3, ff) in enumerate(self.blocks):
            bp = p["transformer_blocks"][str(d)]
            h = a1(bp["attn1"], n1(bp["norm1"], h)) + h
            h = a2(bp["attn2"], n2(bp["norm2"], h), context=context) + h
            h = ff(bp["ff"], n3(bp["norm3"], h)) + h
        h = h.reshape(b, hh, ww, self.inner.size)
        h = self.proj_out(p["proj_out"], h)
        return h + x_in


@dataclasses.dataclass
class BatchNorm:
    """Inference-form BatchNorm over the channel axis with running stats
    registered in the graph — the reference's BatchnormPruner slices
    weight/bias AND running_mean/running_var (function.py:210-233); here all
    four are AxisRefs on the same var so generic surgery covers them.

    Training-mode batch statistics are out of scope for the diffusion zoo
    (every reference model normalizes with GN/LN); this exists for library
    parity and for pruning externally-trained BN models.
    """

    scope: Scope
    var: VarLike
    eps: float = 1e-5

    def __post_init__(self):
        s = self.scope
        s.ref("scale", 0, self.var, "norm")
        s.ref("bias", 0, self.var, "bias")
        s.ref("running_mean", 0, self.var, "bias")
        s.ref("running_var", 0, self.var, "bias")
        self.size = sum(v.size for v, _ in _parts_of(self.var))

    def init(self, key):
        c = self.size
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}

    def __call__(self, p, x):
        xf = x.astype(jnp.float32)
        inv = jax.lax.rsqrt(p["running_var"].astype(jnp.float32) + self.eps)
        y = (xf - p["running_mean"].astype(jnp.float32)) * inv
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
        return y.astype(x.dtype)


@dataclasses.dataclass
class PReLU:
    """Per-channel PReLU (the reference's PReLUPruner target,
    function.py:324-348): alpha registered on the var axis."""

    scope: Scope
    var: VarLike
    init_alpha: float = 0.25

    def __post_init__(self):
        self.scope.ref("alpha", 0, self.var, "norm")
        self.size = sum(v.size for v, _ in _parts_of(self.var))

    def init(self, key):
        return {"alpha": jnp.full((self.size,), self.init_alpha)}

    def __call__(self, p, x):
        a = p["alpha"].astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


@dataclasses.dataclass
class InstanceNorm:
    """InstanceNorm over (N, H, W, C): per-sample spatial statistics per
    channel (torch.nn.InstanceNorm2d; the reference's InstanceNormPruner,
    function.py:304-322, slices the affine weight/bias — registered here as
    AxisRefs on the var). Stats in float32."""

    scope: Scope
    var: VarLike
    eps: float = 1e-5
    affine: bool = True

    def __post_init__(self):
        if self.affine:
            self.scope.ref("scale", 0, self.var, "norm")
            self.scope.ref("bias", 0, self.var, "bias")
        self.size = sum(v.size for v, _ in _parts_of(self.var))

    def init(self, key):
        if not self.affine:
            return {}
        return {"scale": jnp.ones((self.size,)), "bias": jnp.zeros((self.size,))}

    def __call__(self, p, x):
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2), keepdims=True)
        varr = xf.var(axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(varr + self.eps)
        if self.affine:
            y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
        return y.astype(x.dtype)


@dataclasses.dataclass
class DepthwiseConv2D:
    """Depthwise conv (feature_group_count == channels). In, out, and group
    counts are all the SAME channel dimension — the reference's
    DepthwiseConvPruner shrinks out_channels/in_channels/groups together
    (function.py:149-165); here that coupling is structural: one ChannelVar,
    kernel (k, k, 1, C) with the C axis registered once."""

    scope: Scope
    var: ChannelVar
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True

    def __post_init__(self):
        self.scope.ref("kernel", 3, self.var, "out")
        if self.use_bias:
            self.scope.ref("bias", 0, self.var, "bias")

    def init(self, key):
        k = self.kernel_size
        fan_in = k * k  # per-group fan-in (torch: in_channels/groups * k*k)
        kkey, bkey = jax.random.split(key)
        p = {"kernel": _kaiming_uniform(kkey, (k, k, 1, self.var.size), fan_in)}
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            p["bias"] = jax.random.uniform(bkey, (self.var.size,), jnp.float32, -bound, bound)
        return p

    def __call__(self, p, x):
        pad = [(self.padding, self.padding)] * 2
        y = jax.lax.conv_general_dilated(
            x,
            p["kernel"].astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=p["kernel"].shape[3],
        )
        if self.use_bias:
            y = y + p["bias"].astype(x.dtype)
        return y


def _gate_parts(hidden: ChannelVar, n: int) -> tuple:
    """An (n*H,) axis where each of the n contiguous gates is indexed by the
    same hidden var — the multi-part AxisRef form of torch_pruning's
    ``expanded_keep_idxs`` (LSTMPruner, function.py:384,390-399)."""
    return tuple((hidden, i * hidden.size) for i in range(n))


@dataclasses.dataclass
class LSTM:
    """Single-layer (optionally bidirectional) LSTM as one ``lax.scan`` per
    direction over (B, T, I) inputs — TPU-native: the whole sequence is one
    compiled loop, each step two matmuls on the MXU.

    torch.nn.LSTM parameter semantics and gate packing (i, f, g, o) along the
    4H axis; weights stored transposed for right-matmuls: w_ih (I, 4H),
    w_hh (H, 4H). The 4H axes are four-part AxisRefs on the hidden var and
    the H axes ordinary refs, so generic surgery reproduces exactly the
    reference LSTMPruner's coupled slicing (function.py:373-421); both
    directions share the hidden var, as the reference prunes both postfixes
    with the same indices."""

    scope: Scope
    din: VarLike
    hidden: ChannelVar
    use_bias: bool = True
    bidirectional: bool = False

    def __post_init__(self):
        self.dirs = ("fwd", "bwd") if self.bidirectional else ("fwd",)
        for d in self.dirs:
            s = self.scope(d)
            s.ref("w_ih", 0, self.din, "in")
            g = s.graph
            pre = f"{s.path}/" if s.path else ""
            from ..pruning.graph import AxisRef

            gates = _gate_parts(self.hidden, 4)
            g.refs.append(AxisRef(pre + "w_ih", 1, gates, "out"))
            g.ref(pre + "w_hh", 0, self.hidden, "in")
            g.refs.append(AxisRef(pre + "w_hh", 1, gates, "out"))
            if self.use_bias:
                g.refs.append(AxisRef(pre + "b_ih", 0, gates, "bias"))
                g.refs.append(AxisRef(pre + "b_hh", 0, gates, "bias"))
            g._by_var = None

    @property
    def out_var(self) -> VarLike:
        if not self.bidirectional:
            return self.hidden
        return CatVar((self.hidden, self.hidden))

    def init(self, key):
        i, h = self.din.size, self.hidden.size
        bound = 1.0 / math.sqrt(h)  # torch: uniform(-1/sqrt(H), 1/sqrt(H))
        p = {}
        for n, d in enumerate(self.dirs):
            ks = jax.random.split(jax.random.fold_in(key, n), 4)
            sub = {
                "w_ih": jax.random.uniform(ks[0], (i, 4 * h), jnp.float32, -bound, bound),
                "w_hh": jax.random.uniform(ks[1], (h, 4 * h), jnp.float32, -bound, bound),
            }
            if self.use_bias:
                sub["b_ih"] = jax.random.uniform(ks[2], (4 * h,), jnp.float32, -bound, bound)
                sub["b_hh"] = jax.random.uniform(ks[3], (4 * h,), jnp.float32, -bound, bound)
            p[d] = sub
        return p

    def _scan_dir(self, sub, x, reverse: bool):
        b, t, _ = x.shape
        h = sub["w_hh"].shape[0]
        w_ih = sub["w_ih"].astype(x.dtype)
        w_hh = sub["w_hh"].astype(x.dtype)
        bias = 0.0
        if self.use_bias:
            bias = (sub["b_ih"] + sub["b_hh"]).astype(x.dtype)
        # precompute input projections for the whole sequence (one big matmul)
        xg = x @ w_ih + bias  # (B, T, 4H)

        def step(carry, xt):
            hprev, cprev = carry
            gates = xt + hprev @ w_hh
            i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f_g) * cprev + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
            hh = jax.nn.sigmoid(o_g) * jnp.tanh(c)
            return (hh, c), hh

        h0 = jnp.zeros((b, h), x.dtype)
        (_, _), ys = jax.lax.scan(step, (h0, h0), jnp.swapaxes(xg, 0, 1),
                                  reverse=reverse)
        return jnp.swapaxes(ys, 0, 1)  # (B, T, H), time-ordered either way

    def __call__(self, p, x):
        outs = [self._scan_dir(p["fwd"], x, reverse=False)]
        if self.bidirectional:
            outs.append(self._scan_dir(p["bwd"], x, reverse=True))
        return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


@dataclasses.dataclass
class MultiheadAttention:
    """torch.nn.MultiheadAttention equivalent (batch_first self-attention,
    fused in-projection): in_proj kernel (E, 3E) where the 3E axis is a
    three-part AxisRef on the embed var (q, k, v blocks — the reference
    MultiheadAttentionPruner's ``pruning_idxs_repeated``,
    function.py:462-517), out_proj E -> E on the same var, and
    ``group_div = num_heads`` enforcing the reference's
    ``embed_dim % num_heads == 0`` check structurally. head_dim follows the
    pruned embed size."""

    scope: Scope
    var: ChannelVar  # embed dimension
    heads: int

    def __post_init__(self):
        self.var.require_group_div(self.heads)
        s = self.scope
        g = s.graph
        pre = f"{s.path}/" if s.path else ""
        from ..pruning.graph import AxisRef

        qkv = _gate_parts(self.var, 3)
        g.ref(pre + "in_proj/kernel", 0, self.var, "in")
        g.refs.append(AxisRef(pre + "in_proj/kernel", 1, qkv, "out"))
        g.refs.append(AxisRef(pre + "in_proj/bias", 0, qkv, "bias"))
        g._by_var = None
        self.out_proj = Linear(s("out_proj"), self.var, self.var)

    def init(self, key):
        e = self.var.size
        k1, k2 = jax.random.split(key)
        # torch inits in_proj with xavier_uniform_, in_proj_bias to 0
        bound = math.sqrt(6.0 / (e + 3 * e))
        p = {"in_proj": {
            "kernel": jax.random.uniform(k1, (e, 3 * e), jnp.float32, -bound, bound),
            "bias": jnp.zeros((3 * e,)),
        }, "out_proj": self.out_proj.init(k2)}
        return p

    def __call__(self, p, x):
        b, n, e = x.shape
        hd = e // self.heads
        qkv = x @ p["in_proj"]["kernel"].astype(x.dtype) + p["in_proj"]["bias"].astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):  # (B, N, E) -> (B, heads, N, hd)
            return t.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(hd), axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, e)
        return self.out_proj(p["out_proj"], o)
