"""Measure the Pallas kernels against XLA at the model shapes that matter
(run on the real chip; the recorded numbers live in docs/PALLAS_BENCH.md
and set the kernels' default-on policy in ops/__init__.py).

    python tools/bench_pallas.py [--gn] [--attn]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def bench(f, *args, reps=10):
    o = f(*args)
    _sync(o[0] if isinstance(o, tuple) else o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    _sync(o[0] if isinstance(o, tuple) else o)
    return (time.perf_counter() - t0) / reps * 1000


def bench_attention():
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.ops.attention import (flash_attention,
                                                reference_attention)

    shapes = [
        ("LDM 4096tok h8 d64 b4", 4, 8, 4096, 64, jnp.bfloat16),
        ("LSUN 1024tok h1 d256 b16", 16, 1, 1024, 256, jnp.bfloat16),
        ("CIFAR 256tok h1 d256 b128", 128, 1, 256, 256, jnp.bfloat16),
    ]
    print("== attention: forward ==")
    for name, b, h, n, d, dt in shapes:
        ks = jax.random.split(jax.random.key(0), 3)
        q, k, v = (jax.random.normal(kk, (b, h, n, d), dt) for kk in ks)
        scale = d ** -0.5
        tx = bench(jax.jit(lambda q, k, v: reference_attention(q, k, v, scale)), q, k, v)

        # the no-grad primal of flash_attention IS plain XLA by design; the
        # Pallas forward (emitting lse) runs on the differentiated path —
        # fetch it through jax.vjp or this row would time XLA against XLA
        def pallas_fwd(q, k, v):
            out, _ = jax.vjp(
                lambda a, b, c: flash_attention(a, b, c, scale, min_tokens=1),
                q, k, v)
            return out

        tp = bench(jax.jit(pallas_fwd), q, k, v)
        print(f"  {name}: XLA {tx:.2f} ms | pallas(+lse) {tp:.2f} ms | {tx/tp:.2f}x")
    print("== attention: forward+backward ==")
    for name, b, h, n, d, dt in shapes:
        ks = jax.random.split(jax.random.key(0), 3)
        q, k, v = (jax.random.normal(kk, (b, h, n, d), dt) for kk in ks)
        scale = d ** -0.5

        def loss_x(q, k, v):
            return (reference_attention(q, k, v, scale).astype(jnp.float32) ** 2).sum()

        def loss_p(q, k, v):
            return (flash_attention(q, k, v, scale, min_tokens=1).astype(jnp.float32) ** 2).sum()

        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
        tx = bench(gx, q, k, v)
        tp = bench(gp, q, k, v)
        print(f"  {name}: XLA {tx:.2f} ms | pallas {tp:.2f} ms | {tx/tp:.2f}x")


def bench_group_norm():
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.ops.group_norm import fused_group_norm

    def xla_gn(x, scale, bias, groups, eps, silu):
        n, h, w, c = x.shape
        xg = x.reshape(n, h * w, groups, c // groups).astype(jnp.float32)
        mu = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        y = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
        y = y * scale + bias
        return y * jax.nn.sigmoid(y) if silu else y

    shapes = [
        ("CIFAR 32x32 c256 b128", 128, 32, 256),
        ("LSUN 64x64 c256 b16", 16, 64, 256),
        ("LSUN 256x256 c128 b4", 4, 256, 128),
        ("LSUN 256x256 c128 b16", 16, 256, 128),
    ]
    from diff_pruning_tpu.ops.group_norm import _slab_fits

    print("== group norm (+SiLU): forward ==")
    print("   (op-level only — in-model XLA fuses GN into conv epilogues;")
    print("    see docs/PALLAS_BENCH.md for the decisive in-model numbers)")
    for name, b, hw, c in shapes:
        x = jax.random.normal(jax.random.key(0), (b, hw, hw, c), jnp.float32)
        scale = jnp.ones((c,))
        bias = jnp.zeros((c,))
        fx = jax.jit(lambda x: xla_gn(x, scale, bias, 32, 1e-6, True))
        fp = jax.jit(lambda x: fused_group_norm(x, scale, bias, groups=32,
                                                eps=1e-6, with_silu=True))
        tx, tp = bench(fx, x), bench(fp, x)
        tag = "pallas" if _slab_fits(hw * hw, c, x.dtype) else "XLA-FALLBACK"
        print(f"  {name}: XLA {tx:.2f} ms | {tag} {tp:.2f} ms | {tx/tp:.2f}x")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--attn", action="store_true")
    p.add_argument("--gn", action="store_true")
    args = p.parse_args()
    if args.attn or not (args.attn or args.gn):
        bench_attention()
    if args.gn or not (args.attn or args.gn):
        bench_group_norm()
