"""Pallas kernel correctness (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.ops.group_norm import fused_group_norm


def _ref_gn(x, scale, bias, groups, eps=1e-6, silu=False):
    b, n, c = x.shape
    xf = x.astype(jnp.float32)
    xg = xf.reshape(b, n, groups, c // groups)
    m = jnp.mean(xg, axis=(1, 3), keepdims=True)
    v = jnp.var(xg, axis=(1, 3), keepdims=True)
    y = ((xg - m) * jax.lax.rsqrt(v + eps)).reshape(b, n, c) * scale + bias
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y


@pytest.mark.parametrize("silu", [False, True])
def test_fused_gn_forward(silu):
    B, N, C, G = 2, 64, 128, 32
    x = jax.random.normal(jax.random.key(0), (B, N, C))
    scale = jax.random.normal(jax.random.key(1), (C,)) * 0.2 + 1.0
    bias = jax.random.normal(jax.random.key(2), (C,)) * 0.1
    y = fused_group_norm(x, scale, bias, groups=G, with_silu=silu, interpret=True)
    ref = _ref_gn(x, scale, bias, G, silu=silu)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("silu", [False, True])
def test_fused_gn_grads(silu):
    B, N, C, G = 2, 64, 128, 32
    x = jax.random.normal(jax.random.key(3), (B, N, C))
    scale = jax.random.normal(jax.random.key(4), (C,)) * 0.2 + 1.0
    bias = jax.random.normal(jax.random.key(5), (C,)) * 0.1
    # weighted sum so dy isn't constant
    w = jax.random.normal(jax.random.key(6), (B, N, C))

    f1 = lambda x, s, b: (fused_group_norm(
        x, s, b, groups=G, with_silu=silu, interpret=True) * w).sum()
    f2 = lambda x, s, b: (_ref_gn(x, s, b, G, silu=silu) * w).sum()
    g1 = jax.grad(f1, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(x, scale, bias)
    for a, b, name in zip(g1, g2, ["dx", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_fused_gn_vmem_fallback():
    """Oversized slabs fall back to the XLA path transparently."""
    from diff_pruning_tpu.ops import group_norm as gmod

    old = gmod._VMEM_SLAB_LIMIT
    try:
        gmod._VMEM_SLAB_LIMIT = 1024  # force fallback
        B, N, C, G = 2, 64, 128, 32
        x = jax.random.normal(jax.random.key(0), (B, N, C))
        scale = jnp.ones((C,))
        bias = jnp.zeros((C,))
        y = fused_group_norm(x, scale, bias, groups=G, interpret=True)
        ref = _ref_gn(x, scale, bias, G)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    finally:
        gmod._VMEM_SLAB_LIMIT = old


def test_gn_layer_with_silu_flag():
    """layers.GroupNorm(with_silu=True) == GN then silu."""
    from diff_pruning_tpu.models.layers import GroupNorm, Scope
    from diff_pruning_tpu.pruning.graph import ChannelGraph

    g = ChannelGraph()
    v = g.var("v", 32)
    gn = GroupNorm(Scope(g)("gn"), v, 8)
    p = gn.init(None)
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 32))
    a = gn(p, x, with_silu=True)
    b = gn(p, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b * jax.nn.sigmoid(b)),
                               rtol=1e-6)


def test_gn_high_mean_low_variance_precision():
    """ADVICE r3: the one-pass E[x^2]-E[x]^2 variance cancels
    catastrophically when mean^2 >> var (f32 keeps ~7 digits; the residue
    clamps to 0 and the scale blows up to rsqrt(eps)). The shifted-variance
    rewrite (anchor at each channel's first element) must track a float64
    reference through this regime. mean=100, std=1e-2: the old formulation
    errs O(1) here, the shifted one ~1e-3."""
    from diff_pruning_tpu.models.layers import GroupNorm, Scope
    from diff_pruning_tpu.pruning.graph import ChannelGraph

    g = ChannelGraph()
    v = g.var("v", 32)
    gn = GroupNorm(Scope(g)("gn"), v, 8)
    p = gn.init(None)
    rng = np.random.default_rng(0)
    x64 = 100.0 + 1e-2 * rng.standard_normal((2, 4, 4, 32))
    # quantize to f32 FIRST so reference and layer see identical inputs
    x64 = x64.astype(np.float32).astype(np.float64)
    xg = x64.reshape(2, 4, 4, 8, 4)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    ref = ((xg - mean) / np.sqrt(var + gn.eps)).reshape(x64.shape)
    y = gn(p, jnp.asarray(x64, jnp.float32))
    np.testing.assert_allclose(np.asarray(y), ref, atol=5e-2)


def test_gn_bf16_keeps_fast_one_pass_path():
    """The shifted-variance path is gated to f32/f64 inputs: on bf16 the
    input quantization dwarfs the stats cancellation and the shifted path
    measured -9.2% in-model (docs/PERF.md r4). bf16 GN must stay finite and
    close to the f32 result on normal-regime activations."""
    from diff_pruning_tpu.models.layers import GroupNorm, Scope
    from diff_pruning_tpu.pruning.graph import ChannelGraph

    g = ChannelGraph()
    v = g.var("v", 32)
    gn = GroupNorm(Scope(g)("gn"), v, 8)
    p = gn.init(None)
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 32), jnp.float32)
    y32 = gn(p, x)
    y16 = gn(p, x.astype(jnp.bfloat16))
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32), atol=0.1)


@pytest.mark.parametrize("shape", [(1, 1, 1024, 224), (1, 2, 512, 32),
                                   (2, 1, 700, 64)])
def test_flash_attention_matches_reference(shape):
    from diff_pruning_tpu.ops.attention import flash_attention, reference_attention

    b, h, n, d = shape
    q = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    k = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    v = jax.random.normal(jax.random.key(2), shape, jnp.float32)
    # the primal path is plain XLA by design; the Pallas forward runs on
    # the differentiated path — fetch its output through jax.vjp
    out, _ = jax.vjp(
        lambda q, k, v: flash_attention(q, k, v, d**-0.5, interpret=True),
        q, k, v)
    ref = reference_attention(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_small_fallback():
    """Below min_tokens it routes to plain XLA (no kernel)."""
    from diff_pruning_tpu.ops.attention import flash_attention, reference_attention

    q = jax.random.normal(jax.random.key(0), (1, 1, 64, 32))
    out = flash_attention(q, q, q, 32**-0.5, min_tokens=512)
    ref = reference_attention(q, q, q, 32**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_flash_attention_grads():
    from diff_pruning_tpu.ops.attention import flash_attention, reference_attention

    q = jax.random.normal(jax.random.key(3), (1, 1, 512, 32))
    k = jax.random.normal(jax.random.key(4), (1, 1, 512, 32))
    v = jax.random.normal(jax.random.key(5), (1, 1, 512, 32))
    f1 = lambda q, k, v: flash_attention(q, k, v, 0.125, interpret=True).sum()
    f2 = lambda q, k, v: reference_attention(q, k, v, 0.125).sum()
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_flash_attention_grads_padded_shapes():
    """Backward with q/kv padding + masked columns (N=700 pads to 768,
    D=56 pads to 128): padded rows/cols must contribute exactly zero."""
    from diff_pruning_tpu.ops.attention import flash_attention, reference_attention

    q = jax.random.normal(jax.random.key(6), (2, 2, 700, 56))
    k = jax.random.normal(jax.random.key(7), (2, 2, 700, 56))
    v = jax.random.normal(jax.random.key(8), (2, 2, 700, 56))
    w = jax.random.normal(jax.random.key(9), q.shape)  # non-uniform cotangent
    f1 = lambda q, k, v: (flash_attention(q, k, v, 56**-0.5, interpret=True) * w).sum()
    f2 = lambda q, k, v: (reference_attention(q, k, v, 56**-0.5) * w).sum()
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)
