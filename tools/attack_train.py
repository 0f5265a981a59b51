#!/usr/bin/env python
"""Train-step MFU attack (VERDICT r3 next #2): give the bs128 CIFAR
finetune step the same roofline treatment the sampler got in round 3
(tools/attack_256.py). Phases:

  baseline   time the chunked train step (reference recipe: bs128, bf16
             compute, EMA on, 32 fused steps/dispatch) -> imgs/s + MFU
  trace      jax.profiler trace of one chunked dispatch + per-op device-
             time attribution (Chrome-trace parse, shared with attack_256)
  ablate     semantic-preserving component ablations to locate the sink:
             EMA off, optimizer swap (adam->sgd), fwd-only loss (no bwd),
             f32 vs bf16, donate check
  mitigate   candidate fixes, each timed: batch/chunk sweep, remat off/on

ONE chip experiment at a time (CLAUDE.md) — run alone.
Usage: python tools/attack_train.py [baseline|trace|ablate|mitigate|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

V5E_PEAK_BF16 = 197e12


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def build(cfg=None, chunk=32, batch=128):
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_cifar10_config
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.training.finetune import (TrainConfig,
                                                    init_train_state,
                                                    make_chunked_train_step)

    mcfg = ddpm_cifar10_config()
    model = UNet2D(mcfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.key(0))
    params = jax.device_put(params, jax.devices()[0])
    schedule = DiffusionSchedule.create()
    if cfg is None:
        cfg = TrainConfig(use_ema=True, mixed_precision="bf16")
    state = init_train_state(params, cfg)
    step = make_chunked_train_step(model, schedule, cfg, chunk=chunk)
    batches = jnp.zeros((chunk, batch, 32, 32, 3), jnp.float32)
    return model, state, step, batches


def timeit(step, state, batches, reps=3):
    import jax

    # TWO warmups: jax 0.9 keys executables by input layout, so feeding the
    # donated state back triggers one layout-specialization recompile on
    # call 1 (CLAUDE.md / bench.py); timing starts at the fixed point
    for w in range(2):
        state, m = step(state, batches, jax.random.key(0))
        _sync(m["loss"])
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = step(state, batches, jax.random.key(i + 1))
        _sync(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    n = batches.shape[0] * batches.shape[1]
    return n / dt, dt


MACS_FWD_PER_IMG = 6.05e9  # CIFAR UNet, pinned (tests/test_macs_pin.py)


def mfu(imgs_per_sec, bwd_mult=3.0):
    return imgs_per_sec * MACS_FWD_PER_IMG * 2.0 * bwd_mult / V5E_PEAK_BF16


def phase_baseline(chunk=32, batch=128):
    _, state, step, batches = build(chunk=chunk, batch=batch)
    ips, dt = timeit(step, state, batches)
    print(json.dumps({"phase": "baseline", "chunk": chunk, "batch": batch,
                      "imgs_per_sec": round(ips, 1),
                      "ms_per_step": round(1e3 * dt / chunk, 2),
                      "mfu_pct": round(100 * mfu(ips), 1)}), flush=True)
    return ips


def phase_trace(outdir="/tmp/trace_train"):
    import glob

    import jax

    from attack_256 import parse_trace_top_ops

    _, state, step, batches = build()
    ips, _ = timeit(step, state, batches)
    with jax.profiler.trace(outdir):
        state, m = step(state, batches, jax.random.key(99))
        _sync(m["loss"])
    print(json.dumps({"phase": "trace", "imgs_per_sec": round(ips, 1),
                      "mfu_pct": round(100 * mfu(ips), 1),
                      "outdir": outdir}), flush=True)
    traces = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                              recursive=True))
    if not traces:
        print(json.dumps({"phase": "trace", "error": "no trace captured"}))
        return
    for row in parse_trace_top_ops(traces[-1])[:34]:
        print(json.dumps({"phase": "trace_op", **row}), flush=True)


def phase_roofline():
    """Analytic roofline from XLA's own compiled cost analysis (no profiler
    needed — the axon tunnel's profiler_controller can reject trace sessions
    with INVALID_ARGUMENT, as it did this round). flops + bytes accessed of
    the ONE compiled chunked program vs v5e peak (197 TF/s bf16, 819 GB/s
    HBM) bound the achievable step time; comparing with the measured step
    time says which wall the step sits against and how much headroom
    remains."""
    import jax

    _, state, step, batches = build()
    # lower() is host-local and cheap — do it while `state`'s donated
    # buffers are still alive. Warm + time through the normal jit dispatch
    # path BEFORE .compile(): an AOT compile on a cold program bypasses the
    # warm compile cache and once hung ~9 min in a fresh remote compile
    # (CLAUDE.md); after timeit the executable is in the persistent cache,
    # so the AOT compile below is a cache hit, not a second remote compile
    # (ADVICE r4).
    lowered = step.lower(state, batches, jax.random.key(0))
    ips, dt = timeit(step, state, batches)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"phase": "roofline",
                          "error": f"cost_analysis: {e}"[:200]}), flush=True)
        return
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    t_compute = flops / V5E_PEAK_BF16
    t_hbm = bytes_acc / 819e9
    print(json.dumps({
        "phase": "roofline", "imgs_per_sec": round(ips, 1),
        "measured_s_per_dispatch": round(dt, 3),
        "xla_flops_per_dispatch": flops,
        "xla_bytes_per_dispatch": bytes_acc,
        "compute_bound_floor_s": round(t_compute, 3),
        "hbm_bound_floor_s": round(t_hbm, 3),
        "arithmetic_intensity_flops_per_byte": round(flops / max(bytes_acc, 1), 1),
        "pct_of_dominant_roofline": round(
            100 * max(t_compute, t_hbm) / dt, 1),
    }), flush=True)


def phase_ablate():
    """Attribute cost by removing one component at a time. fwd-only uses the
    SAME chunked harness with gradients replaced by a loss-only pass to
    bound what backprop costs."""
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_cifar10_config
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.training.finetune import TrainConfig

    rows = []

    def run(tag, **cfg_kw):
        kw = dict(use_ema=True, mixed_precision="bf16")
        kw.update(cfg_kw)  # overrides must not collide with the defaults
        cfg = TrainConfig(**kw)
        _, state, step, batches = build(cfg=cfg)
        ips, dt = timeit(step, state, batches)
        rows.append({"phase": "ablate", "tag": tag,
                     "imgs_per_sec": round(ips, 1),
                     "mfu_pct": round(100 * mfu(ips), 1)})
        print(json.dumps(rows[-1]), flush=True)

    run("baseline_bf16_ema_adam")
    run("no_ema", use_ema=False)
    run("sgd_no_moments", use_ema=False, optimizer="sgd")
    run("f32_compute", mixed_precision="no")
    run("remat_on", remat=True)

    # fwd-only bound: loss under the same chunked scan, no grad
    mcfg = ddpm_cifar10_config()
    model = UNet2D(mcfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.key(0))
    params = jax.device_put(params, jax.devices()[0])
    schedule = DiffusionSchedule.create()
    from diff_pruning_tpu.training.finetune import antithetic_timesteps

    bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    @jax.jit
    def fwd_chunk(p, batches, key):
        def body(acc, inp):
            i, b = inp
            k = jax.random.fold_in(key, i)
            nk, tk = jax.random.split(k)
            noise = jax.random.normal(nk, b.shape, jnp.bfloat16)
            t = antithetic_timesteps(tk, b.shape[0],
                                     schedule.num_train_timesteps)
            noisy = schedule.add_noise(b.astype(jnp.bfloat16), noise, t)
            out = model(p, noisy, t)
            l = ((out - noise).astype(jnp.float32) ** 2).sum((1, 2, 3)).mean()
            return acc + l, None

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              (jnp.arange(batches.shape[0]), batches))
        return acc

    batches = jnp.zeros((32, 128, 32, 32, 3), jnp.float32)
    _sync(fwd_chunk(bf16, batches, jax.random.key(0)))
    t0 = time.perf_counter()
    for i in range(3):
        _sync(fwd_chunk(bf16, batches, jax.random.key(i + 1)))
    dt = (time.perf_counter() - t0) / 3
    ips = 32 * 128 / dt
    print(json.dumps({"phase": "ablate", "tag": "fwd_only",
                      "imgs_per_sec": round(ips, 1),
                      "mfu_pct_fwd_only": round(100 * mfu(ips, bwd_mult=1.0),
                                                1)}), flush=True)


def phase_mitigate():
    """Timed candidate mitigations; every row is a real measured number
    (negative results recorded too, PALLAS_BENCH style)."""
    for chunk, batch in [(32, 128), (32, 256), (16, 512), (64, 128),
                         (32, 64)]:
        try:
            _, state, step, batches = build(chunk=chunk, batch=batch)
            ips, dt = timeit(step, state, batches)
            print(json.dumps({"phase": "mitigate", "chunk": chunk,
                              "batch": batch, "imgs_per_sec": round(ips, 1),
                              "mfu_pct": round(100 * mfu(ips), 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(json.dumps({"phase": "mitigate", "chunk": chunk,
                              "batch": batch,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


def phase_train256(batch=8, chunk=4):
    """VERDICT r3 next #7: does the 256² TRAIN step inherit the
    fusion-friendly GN win on its backward? Three measured rows on the
    LSUN-256 UNet train step: current XLA GN (fusion-friendly, default),
    Pallas fused GN (default-OFF for sampling: -21%), and the pre-r3
    reshape+jnp.var formulation. In-model measurements decide; negative
    results recorded PALLAS_BENCH-style."""
    import contextlib
    import unittest.mock as mock

    import jax
    import jax.numpy as jnp
    import numpy as np

    import diff_pruning_tpu.models.layers as L
    from diff_pruning_tpu import ops as _ops
    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_lsun256_config
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.training.finetune import (TrainConfig,
                                                    init_train_state,
                                                    make_chunked_train_step)

    def reshape_var_gn(self, p, x, *, with_silu=False):
        orig = x.dtype
        b, c, g = x.shape[0], x.shape[-1], self.num_groups
        xf = x.astype(jnp.float32).reshape(b, -1, g, c // g)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(x.shape)
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
        if with_silu:
            y = y * jax.nn.sigmoid(y)
        return y.astype(orig)

    @contextlib.contextmanager
    def pallas_gn(on):
        prev = _ops.pallas_enabled("group_norm")
        _ops.set_pallas_enabled(group_norm=on)
        try:
            yield
        finally:
            _ops.set_pallas_enabled(group_norm=prev)

    variants = [
        ("xla_fusion_friendly", contextlib.nullcontext()),
        ("pallas_gn_on", pallas_gn(True)),
        ("reshape_jnp_var", mock.patch.object(L.GroupNorm, "__call__",
                                              reshape_var_gn)),
    ]
    mcfg = ddpm_lsun256_config()
    model_tpl = UNet2D(mcfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model_tpl.init(jax.random.key(0))
    params = jax.device_put(params, jax.devices()[0])
    schedule = DiffusionSchedule.create()
    for tag, ctx in variants:
        try:
            with ctx:
                cfg = TrainConfig(use_ema=True, mixed_precision="bf16",
                                  remat=True)
                model = UNet2D(mcfg)
                state = init_train_state(
                    jax.tree.map(jnp.copy, params), cfg)
                step = make_chunked_train_step(model, schedule, cfg,
                                               chunk=chunk)
                batches = jnp.zeros((chunk, batch, 256, 256, 3), jnp.float32)
                ips, dt = timeit(step, state, batches, reps=2)
            print(json.dumps({"phase": "train256", "tag": tag,
                              "batch": batch, "chunk": chunk,
                              "imgs_per_sec": round(ips, 2),
                              "ms_per_step": round(1e3 * dt / chunk, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"phase": "train256", "tag": tag,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


def phase_train256_remat(batch=8, chunk=4):
    """Follow-up to train256: the 32² attack measured remat at a 25%
    recompute tax ("never remat at 32²"). The 256² row above ran remat=ON
    (memory caution). If the LSUN-256 train step FITS v5e HBM without
    remat at the reference-ish bs8, turning it off is a free ~25% on the
    256² finetune workload. Two measured rows, default GN, one experiment
    on the chip at a time."""
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_lsun256_config
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.training.finetune import (TrainConfig,
                                                    init_train_state,
                                                    make_chunked_train_step)

    mcfg = ddpm_lsun256_config()
    model_tpl = UNet2D(mcfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model_tpl.init(jax.random.key(0))
    params = jax.device_put(params, jax.devices()[0])
    schedule = DiffusionSchedule.create()
    for remat in (True, False):
        try:
            cfg = TrainConfig(use_ema=True, mixed_precision="bf16",
                              remat=remat)
            model = UNet2D(mcfg)
            state = init_train_state(jax.tree.map(jnp.copy, params), cfg)
            step = make_chunked_train_step(model, schedule, cfg, chunk=chunk)
            batches = jnp.zeros((chunk, batch, 256, 256, 3), jnp.float32)
            ips, dt = timeit(step, state, batches, reps=2)
            print(json.dumps({"phase": "train256_remat", "remat": remat,
                              "batch": batch, "chunk": chunk,
                              "imgs_per_sec": round(ips, 2),
                              "ms_per_step": round(1e3 * dt / chunk, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — OOM/compile-500 is a result
            print(json.dumps({"phase": "train256_remat", "remat": remat,
                              "batch": batch, "chunk": chunk,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


LSUN_MACS_FWD_PER_IMG = 248.2e9  # LSUN-256 UNet (docs/PERF.md scale table)


def _mfu256(imgs_per_sec, bwd_mult=3.0):
    return imgs_per_sec * LSUN_MACS_FWD_PER_IMG * 2.0 * bwd_mult / V5E_PEAK_BF16


def _build256(cfg=None, chunk=4, batch=8):
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_lsun256_config
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.training.finetune import (TrainConfig,
                                                    init_train_state,
                                                    make_chunked_train_step)

    mcfg = ddpm_lsun256_config()
    model = UNet2D(mcfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.key(0))
    params = jax.device_put(params, jax.devices()[0])
    schedule = DiffusionSchedule.create()
    if cfg is None:
        cfg = TrainConfig(use_ema=True, mixed_precision="bf16", remat=False)
    state = init_train_state(params, cfg)
    step = make_chunked_train_step(model, schedule, cfg, chunk=chunk)
    batches = jnp.zeros((chunk, batch, 256, 256, 3), jnp.float32)
    return model, state, step, batches


def phase_attack256_train(batch=8, chunk=4):
    """VERDICT r4 next #3: the 256² TRAIN step sits at 44.3% MFU vs the
    same-scale sampler's 69.9% with no ceiling proof. Give it the full 32²
    treatment: fwd-only bound, per-component semantic ablation, roofline
    from XLA cost analysis, and measured mitigations. Each row is its own
    (multi-minute) 256² remote compile — run alone on the chip.
    Train-step semantics: ddpm_exp/runners/diffusion.py:446-469."""
    import contextlib
    import unittest.mock as mock

    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models import layers as L
    from diff_pruning_tpu.training.finetune import TrainConfig

    def row(tag, ips, dt=None, bwd_mult=3.0, **extra):
        print(json.dumps({"phase": "attack256_train", "tag": tag,
                          "imgs_per_sec": round(ips, 2),
                          **({"ms_per_step": round(1e3 * dt / chunk, 1)}
                             if dt else {}),
                          "mfu_pct": round(100 * _mfu256(ips, bwd_mult), 1),
                          **extra}), flush=True)

    def gn_affine_only(self, p, x, *, with_silu=False):
        y = x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
        return y * jax.nn.sigmoid(y) if with_silu else y

    def attn_identity(self, p, x):
        return x

    # --- baseline + semantic ablations (remat OFF — the production default)
    variants = [
        ("baseline_bf16_ema_adam", dict(), contextlib.nullcontext()),
        ("no_ema", dict(use_ema=False), contextlib.nullcontext()),
        ("sgd_no_moments", dict(use_ema=False, optimizer="sgd"),
         contextlib.nullcontext()),
        ("gn_affine_only", dict(),
         mock.patch.object(L.GroupNorm, "__call__", gn_affine_only)),
        ("attn_identity", dict(),
         mock.patch.object(L.SelfAttention2D, "__call__", attn_identity)),
    ]
    for tag, kw, ctx in variants:
        try:
            with ctx:
                cfg = TrainConfig(use_ema=True, mixed_precision="bf16",
                                  remat=False)
                import dataclasses

                cfg = dataclasses.replace(cfg, **kw)
                _, state, step, batches = _build256(cfg=cfg, chunk=chunk,
                                                    batch=batch)
                ips, dt = timeit(step, state, batches, reps=2)
            row(tag, ips, dt)
        except Exception as e:  # noqa: BLE001 — OOM/compile-500 is a result
            print(json.dumps({"phase": "attack256_train", "tag": tag,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    # --- fwd-only bound: the forward program's own ceiling at 256²
    import jax

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_lsun256_config
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.training.finetune import antithetic_timesteps

    mcfg = ddpm_lsun256_config()
    model = UNet2D(mcfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.key(0))
    bf16 = jax.tree.map(
        lambda a: jax.device_put(a.astype(jnp.bfloat16), jax.devices()[0]),
        params)
    schedule = DiffusionSchedule.create()

    @jax.jit
    def fwd_chunk(p, batches, key):
        def body(acc, inp):
            i, b = inp
            k = jax.random.fold_in(key, i)
            nk, tk = jax.random.split(k)
            noise = jax.random.normal(nk, b.shape, jnp.bfloat16)
            t = antithetic_timesteps(tk, b.shape[0],
                                     schedule.num_train_timesteps)
            noisy = schedule.add_noise(b.astype(jnp.bfloat16), noise, t)
            out = model(p, noisy, t)
            l = ((out - noise).astype(jnp.float32) ** 2).sum((1, 2, 3)).mean()
            return acc + l, None

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              (jnp.arange(batches.shape[0]), batches))
        return acc

    try:
        batches = jnp.zeros((chunk, batch, 256, 256, 3), jnp.float32)
        _sync(fwd_chunk(bf16, batches, jax.random.key(0)))
        t0 = time.perf_counter()
        for i in range(2):
            _sync(fwd_chunk(bf16, batches, jax.random.key(i + 1)))
        dt = (time.perf_counter() - t0) / 2
        row("fwd_only", chunk * batch / dt, bwd_mult=1.0)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"phase": "attack256_train", "tag": "fwd_only",
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)

    # --- roofline from XLA's cost analysis of the full train program
    try:
        _, state, step, batches = _build256(chunk=chunk, batch=batch)
        lowered = step.lower(state, batches, jax.random.key(0))
        ips, dt = timeit(step, state, batches, reps=2)  # warm cache FIRST
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
        print(json.dumps({
            "phase": "attack256_train", "tag": "roofline",
            "imgs_per_sec": round(ips, 2),
            "measured_s_per_dispatch": round(dt, 3),
            "xla_flops_per_dispatch": flops,
            "xla_bytes_per_dispatch": bytes_acc,
            "compute_bound_floor_s": round(flops / V5E_PEAK_BF16, 3),
            "hbm_bound_floor_s": round(bytes_acc / 819e9, 3),
            "pct_of_dominant_roofline": round(100 * max(
                flops / V5E_PEAK_BF16, bytes_acc / 819e9) / dt, 1),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"phase": "attack256_train", "tag": "roofline",
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)


def phase_attack256_mitigate():
    """Measured mitigation sweep for the 256² train step (each its own
    compile): dispatch-fusion depth and per-step batch, semantics-free
    except where noted. The scoped-vmem candidate needs a fresh process:
      LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
      python tools/attack_train.py attack256_baseline"""
    for chunk, batch in [(4, 8), (8, 8), (2, 16), (8, 4)]:
        try:
            _, state, step, batches = _build256(chunk=chunk, batch=batch)
            ips, dt = timeit(step, state, batches, reps=2)
            print(json.dumps({"phase": "attack256_mitigate", "chunk": chunk,
                              "batch": batch, "imgs_per_sec": round(ips, 2),
                              "mfu_pct": round(100 * _mfu256(ips), 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"phase": "attack256_mitigate", "chunk": chunk,
                              "batch": batch,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from diff_pruning_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    if which in ("baseline", "all"):
        phase_baseline()
    if which in ("trace", "all"):
        phase_trace()
    if which in ("roofline", "all"):
        phase_roofline()
    if which in ("ablate", "all"):
        phase_ablate()
    if which in ("mitigate", "all"):
        phase_mitigate()
    if which in ("train256", "all"):
        phase_train256()
    if which == "train256_remat":
        phase_train256_remat()
    if which == "attack256_train":
        phase_attack256_train()
    if which == "attack256_mitigate":
        phase_attack256_mitigate()
    if which == "attack256_baseline":
        # single baseline row (for fresh-process env-flag A/Bs like
        # LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536)
        _, state, step, batches = _build256()
        ips, dt = timeit(step, state, batches, reps=2)
        print(json.dumps({"phase": "attack256_baseline",
                          "imgs_per_sec": round(ips, 2),
                          "ms_per_step": round(1e3 * dt / 4, 1),
                          "mfu_pct": round(100 * _mfu256(ips), 1)}),
              flush=True)


if __name__ == "__main__":
    main()
