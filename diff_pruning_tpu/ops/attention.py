"""Pallas TPU flash attention (non-causal, full self/cross attention),
forward AND backward.

Online-softmax attention for the diffusion UNets' spatial attention
(tokens up to 64^2=4096; head_dim up to full C for the heads=1 DDPM blocks).
Never materializes the (N, N) score matrix: grid (batch*heads, q-blocks,
k-blocks) with the contraction dimension innermost (sequential on TPU),
carrying the running max / denominator / f32 accumulator in VMEM scratch.

The forward also emits the per-row logsumexp; the backward is two Pallas
kernels (standard flash-attention backward): with D = rowsum(dO * O),
p = exp(s - lse), ds = p * (dO v^T - D) * scale, then dq = ds k (k-blocks
innermost) and [dk = ds^T q, dv = p^T dO] (q-blocks innermost). Zero-padded
q rows / masked kv columns contribute exactly zero to every gradient.

Measured on v5e (tools/bench_pallas.py; full table in docs/PALLAS_BENCH.md):
op-level the kernel wins 1.2-1.7x fwd and up to 1.55x fwd+bwd, but in-model
XLA's fused primal attention is as fast or faster — so the PRIMAL path here
is plain XLA, and the Pallas fwd(+lse)/bwd engage only under
differentiation for >= min_tokens sequences (celebahq-256 train step:
109.4 -> 103.9 ms, +5.3%; nothing regresses).

Reference semantics being replaced: torch bmm+softmax attention
(ddpm_exp/models/diffusion.py:171-185, ldm_exp/ldm/modules/attention.py:178-192).
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


# ---------------------------------------------------------------- forward

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *rest,
                scale: float, nk: int, kv_len: int, bk: int,
                with_lse: bool):
    lse_ref = rest[0] if with_lse else None
    acc, m_scr, l_scr = rest[-3:]
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
        if with_lse:
            lse_ref[0] = jnp.broadcast_to(
                m_scr[:, 0:1] + jnp.log(l_scr[:, 0:1]), lse_ref.shape[1:])


def _flash_fwd_call(q, k, v, scale: float, bq: int, bk: int, kv_len: int,
                    interpret: bool, with_lse: bool):
    """q: (BH, Nq, D), k/v: (BH, Nkv, D) — padded to block multiples;
    kv_len is the TRUE (unpadded) kv length for masking. Returns out or
    (out, lse): the lse write measurably slows the inference-only forward,
    so the primal path skips it."""
    bh, nq_len, d = q.shape
    nq = nq_len // bq
    nk = k.shape[1] // bk
    kernel = functools.partial(_fwd_kernel, scale=scale, nk=nk,
                               kv_len=kv_len, bk=bk, with_lse=with_lse)
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                              memory_space=pltpu.VMEM)]
    if with_lse:
        # q rows on sublanes, 8 broadcast lanes: the smallest layout that
        # satisfies TPU block tiling AND reads back as a (bq, 1) column
        # with no relayout
        out_shape.append(jax.ShapeDtypeStruct((bh, nq_len, 8), jnp.float32))
        out_specs.append(pl.BlockSpec((1, bq, 8), lambda b, iq, ik: (b, iq, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return res if with_lse else (res[0], None)


# --------------------------------------------------------------- backward

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref,
                   acc, *, scale: float, nk: int, kv_len: int, bk: int):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc[:, :] = jnp.zeros_like(acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * bk
    p = jnp.where(col < kv_len, jnp.exp(s - lse_ref[0][:, 0:1]), 0.0)
    dp = jax.lax.dot_general(do_ref[0].astype(jnp.float32),
                             v_ref[0].astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dsum_ref[0][:, 0:1]) * scale
    acc[:, :] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = acc[:, :].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                    dk_ref, dv_ref, kacc, vacc, *, scale: float, nq: int,
                    kv_len: int, bk: int):
    iq = pl.program_id(2)
    jk = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        kacc[:, :] = jnp.zeros_like(kacc)
        vacc[:, :] = jnp.zeros_like(vacc)

    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (BK, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jk * bk
    p = jnp.where(col < kv_len, jnp.exp(s - lse_ref[0][:, 0:1]), 0.0)
    do = do_ref[0].astype(jnp.float32)  # (BQ, D); zero on padded q rows
    # dv += p^T dO
    vacc[:, :] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[0].astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dsum_ref[0][:, 0:1]) * scale
    # dk += ds^T q
    kacc[:, :] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _finish():
        dk_ref[0] = kacc[:, :].astype(dk_ref.dtype)
        dv_ref[0] = vacc[:, :].astype(dv_ref.dtype)


def _flash_bwd_call(q, k, v, do, lse, dsum, scale, bq, bk, kv_len, interpret):
    bh, nq_len, d = q.shape
    nq, nk = nq_len // bq, k.shape[1] // bk
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk=nk, kv_len=kv_len,
                          bk=bk),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, iq, ik: (b, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda b, iq, ik: (b, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, iq, ik: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, dsum)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq, kv_len=kv_len,
                          bk=bk),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, jk, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, jk, iq: (b, jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, jk, iq: (b, jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda b, jk, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda b, jk, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda b, jk, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda b, jk, iq: (b, jk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, jk, iq: (b, jk, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, dsum)
    return dq, dk, dv


# ----------------------------------------------------------------- driver

def _pad_reshape(t, rows, cols):
    b, h, n, d = t.shape
    t = jnp.pad(t, [(0, 0), (0, 0), (0, rows), (0, cols)])
    return t.reshape(b * h, n + rows, d + cols)


def _block_geometry(n: int, kv: int, d: int):
    bq = min(_DEFAULT_BQ, _ceil_to(n, 8))
    bk = min(_DEFAULT_BK, _ceil_to(kv, 8))
    npad = _ceil_to(n, bq) - n
    kpad = _ceil_to(kv, bk) - kv
    dpad = _ceil_to(d, _LANES) - d
    return bq, bk, npad, kpad, dpad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention(q, k, v, scale: float, interpret: bool):
    # PRIMAL (inference / no-grad) path: plain XLA. In-model the XLA
    # attention fuses with its neighbors and beats the standalone kernel
    # (celebahq-256 fwd 50.5 vs 53.8 ms); the Pallas kernels engage only
    # under differentiation, where the hand-written backward wins
    # (celebahq-256 fwd+bwd 111.5 -> 105.7 ms).
    return reference_attention(q, k, v, scale)


def _flash_fwd_res(q, k, v, scale, interpret, with_lse):
    b, h, n, d = q.shape
    kv = k.shape[2]
    bq, bk, npad, kpad, dpad = _block_geometry(n, kv, d)
    qp = _pad_reshape(q, npad, dpad)
    kp = _pad_reshape(k, kpad, dpad)
    vp = _pad_reshape(v, kpad, dpad)
    outp, lse = _flash_fwd_call(qp, kp, vp, scale, bq, bk, kv, interpret,
                                with_lse)
    out = outp.reshape(b, h, n + npad, d + dpad)[:, :, :n, :d]
    return out, (q, k, v, out, lse)


def _flash_fwd(q, k, v, scale, interpret):
    out, res = _flash_fwd_res(q, k, v, scale, interpret, with_lse=True)
    return out, res


def _flash_bwd(scale, interpret, res, g):
    q, k, v, out, lse = res
    b, h, n, d = q.shape
    kv = k.shape[2]
    bq, bk, npad, kpad, dpad = _block_geometry(n, kv, d)
    # D = rowsum(dO * O) — zero on padded q rows by construction
    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dsum = jnp.pad(dsum, [(0, 0), (0, 0), (0, npad)]).reshape(b * h, n + npad)
    dsum = jnp.broadcast_to(dsum[:, :, None], dsum.shape + (8,))
    qp = _pad_reshape(q, npad, dpad)
    kp = _pad_reshape(k, kpad, dpad)
    vp = _pad_reshape(v, kpad, dpad)
    dop = _pad_reshape(g, npad, dpad)
    dq, dk, dv = _flash_bwd_call(qp, kp, vp, dop, lse, dsum, scale, bq, bk,
                                 kv, interpret)
    dq = dq.reshape(b, h, n + npad, d + dpad)[:, :, :n, :d]
    dk = dk.reshape(b, h, kv + kpad, d + dpad)[:, :, :kv, :d]
    dv = dv.reshape(b, h, kv + kpad, d + dpad)[:, :, :kv, :d]
    return dq, dk, dv


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, scale: float, *,
                    interpret: Optional[bool] = None,
                    min_tokens: int = 512):
    """(B, H, N, D) attention. The differentiated path uses the Pallas
    kernels when N >= min_tokens (default 512: excludes the CIFAR 256-token
    blocks where the in-model train step measured slightly slower); the
    inference path and short sequences use plain XLA."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if q.shape[2] < min_tokens:
        return reference_attention(q, k, v, scale)
    return _flash_attention(q, k, v, float(scale), interpret)
