"""Pallas TPU flash attention (non-causal, full self/cross attention).

Online-softmax attention for the diffusion UNets' spatial attention
(tokens up to 64^2=4096; head_dim up to full C for the heads=1 DDPM blocks).
Never materializes the (N, N) score matrix: grid (batch*heads, q-blocks,
k-blocks) with the k dimension innermost (sequential on TPU), carrying the
running max / denominator / f32 accumulator in VMEM scratch.

Backward: custom VJP whose backward recomputes through the reference XLA
implementation — attention is a small fraction of training FLOPs (convs
dominate; measured 25% of the LDM *forward*), so the fwd kernel is where
the win is; a hand-written flash backward can come later.

`flash_attention(q, k, v, scale)` takes (B, H, N, D) and picks the kernel
when shapes qualify (D padded to a lane multiple internally), else falls
back to plain XLA attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_DEFAULT_BQ = 256
_DEFAULT_BK = 512


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def reference_attention(q, k, v, scale: float):
    """Plain XLA attention, f32 softmax (the layers.py math)."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc, m_scr, l_scr, *,
                  scale: float, nk: int, kv_len: int, bk: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:, :] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:, :] = jnp.zeros_like(l_scr)
        acc[:, :] = jnp.zeros_like(acc)

    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (BK, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # mask padded kv rows (kv_len might not divide bk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * bk
    s = jnp.where(col < kv_len, s, -jnp.inf)

    m_prev = m_scr[:, 0:1]  # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # (BQ, 1)
    p = jnp.exp(s - m_new)  # (BQ, BK)
    l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(p, v_ref[0].astype(jnp.float32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc[:, :] = acc[:, :] * alpha + pv
    m_scr[:, :] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:, :] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = (acc[:, :] / l_scr[:, 0:1]).astype(o_ref.dtype)


def _flash_call(q, k, v, scale: float, bq: int, bk: int, kv_len: int,
                interpret: bool):
    """q: (BH, Nq, D), k/v: (BH, Nkv, D) — padded to block multiples;
    kv_len is the TRUE (unpadded) kv length for masking."""
    bh, nq_len, d = q.shape
    nq = nq_len // bq
    nk = k.shape[1] // bk
    kernel = functools.partial(_flash_kernel, scale=scale, nk=nk,
                               kv_len=kv_len, bk=bk)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention(q, k, v, scale: float, interpret: bool):
    b, h, n, d = q.shape
    kv = k.shape[2]
    bq = min(_DEFAULT_BQ, _ceil_to(n, 8))
    bk = min(_DEFAULT_BK, _ceil_to(kv, 8))
    npad = _ceil_to(n, bq) - n
    kpad = _ceil_to(kv, bk) - kv
    dpad = _ceil_to(d, _LANES) - d

    def pad(t, rows, cols):
        return jnp.pad(t, [(0, 0), (0, 0), (0, rows), (0, cols)])

    qp = pad(q, npad, dpad).reshape(b * h, n + npad, d + dpad)
    kp = pad(k, kpad, dpad).reshape(b * h, kv + kpad, d + dpad)
    vp = pad(v, kpad, dpad).reshape(b * h, kv + kpad, d + dpad)
    out = _flash_call(qp, kp, vp, scale, bq, bk, kv, interpret)
    out = out.reshape(b, h, n + npad, d + dpad)
    return out[:, :, :n, :d]


def _flash_fwd(q, k, v, scale, interpret):
    return _flash_attention(q, k, v, scale, interpret), (q, k, v)


def _flash_bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: reference_attention(q, k, v, scale), q, k, v)
    return vjp(g)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, scale: float, *,
                    interpret: Optional[bool] = None,
                    min_tokens: int = 512):
    """(B, H, N, D) attention; kernel when N >= min_tokens, else XLA."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if q.shape[2] < min_tokens:
        return reference_attention(q, k, v, scale)
    return _flash_attention(q, k, v, float(scale), interpret)
