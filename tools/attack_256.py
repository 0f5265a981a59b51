#!/usr/bin/env python
"""Attack the 256-squared bandwidth wall (docs/PERF.md: LSUN-256 DDIM-100
sampling plateaus at 1.12 imgs/s, 28.3% MFU, batch-independent).

Measured attribution + mitigation trail, PALLAS_BENCH-style: every number
lands in the decision table whether it wins or loses.

Phases (each is one chip experiment — run ONE at a time, CLAUDE.md):

  roofline   XLA cost_analysis of the compiled 100-step program: bytes
             accessed vs flops -> which roofline binds and the
             speed-of-light time for each. If measured time is close to
             bytes/BW_peak, the wall is proven, not hypothesized.
  ablate     In-model measured attribution: time the full sampler with
             (a) GroupNorm stats ablated to affine-only (what a perfectly
             conv-fused GN would cost), (b) attention ablated to identity,
             (c) both. Deltas = each subsystem's true in-model cost.
  mitigate   Candidate fixes, each measured against baseline:
               bf16_carry   keep the scan-carried x in bf16 (halves the
                            trajectory state traffic)
               gn_bf16      GN stats reduced in f32 but normalize applied
                            in bf16 (halves the normalize read+write)
               vmem         --xla_tpu_scoped_vmem_limit_kib=65536 (bigger
                            fusions get more VMEM headroom)

Usage: python tools/attack_256.py {roofline,ablate,mitigate,baseline}
Reference rows being attacked: the paper's LSUN tables
(/root/reference/assets/exp2.png; ddpm_exp configs lsun_*.yml).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BW_PEAK = 8.19e11  # v5e HBM ~819 GB/s
FLOP_PEAK = 197e12  # v5e bf16


RES = int(os.environ.get("ATTACK_RES", "256"))  # 32 = CIFAR (CPU shakeout)
# VERDICT r4 weak #4 / next #4: ATTACK_PRUNED=0.3 runs every phase on the
# 30%-PRUNED model (local-mode prune, the PERF.md pruned rows' 19.95M CIFAR /
# 44.03M CelebA-64 programs) so the pruned-speedup saturation story gets the
# same measured roofline/ablation attribution the base 256² wall got —
# instead of the by-analogy explanation PERF.md carried.
PRUNED = float(os.environ.get("ATTACK_PRUNED", "0"))


def build(batch=8, steps=100):
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import (UNet2D, ddpm_celeba64_config,
                                                ddpm_cifar10_config,
                                                ddpm_lsun256_config)
    from diff_pruning_tpu.sampling.ddim_sampler import SamplerConfig, make_sampler
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    cfg = {256: ddpm_lsun256_config, 64: ddpm_celeba64_config}.get(
        RES, ddpm_cifar10_config)()
    model = UNet2D(cfg)
    # init on the host CPU backend: a fresh on-chip init program is an
    # uncached multi-minute remote compile for zero benefit
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(jax.random.key(0))
    if PRUNED > 0:
        from diff_pruning_tpu.pruning.flops import count_ops_and_params
        from diff_pruning_tpu.pruning.importance import make_importance
        from diff_pruning_tpu.pruning.pruner import apply_pruning, prune

        with jax.default_device(cpu):
            res = prune(model.graph, params, make_importance("magnitude"),
                        sparsity=PRUNED)
            params = apply_pruning(params, model.graph, res)
        cfg = cfg.with_channel_sizes(res.channel_sizes)
        model = UNet2D(cfg)
        macs, n = count_ops_and_params(model, params, (1, RES, RES, 3))
        print(json.dumps({"phase": "build", "pruned": PRUNED,
                          "params_M": round(n / 1e6, 2),
                          "macs_G": round(macs / 1e9, 2)}), flush=True)
    bf16 = jax.tree.map(lambda x: jax.device_put(x.astype(jnp.bfloat16),
                                                 jax.devices()[0]), params)
    sched = DiffusionSchedule.create()
    sampler = make_sampler(model, bf16, sched,
                           SamplerConfig(num_inference_steps=steps,
                                         skip_type="quad", style="ddim_exp",
                                         dtype="bfloat16"))
    return model, bf16, sched, sampler


def timeit(sampler, batch=8, reps=2):
    import jax.numpy as jnp

    def sync(x):
        return float(jnp.sum(x))

    t0 = time.perf_counter()
    sync(sampler(__import__("jax").random.key(0), batch, RES, 3))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        sync(sampler(__import__("jax").random.key(i + 1), batch, RES, 3))
    dt = (time.perf_counter() - t0) / reps
    return batch / dt, dt, compile_s


def phase_roofline(batch=8, steps=100):
    import jax

    model, bf16, sched, sampler = build(batch, steps)
    ips, dt, _ = timeit(sampler, batch)
    # cost analysis: the sampler hides its jitted fn, so rebuild the same
    # trajectory body here and lower/compile it for the HLO cost model
    import jax.numpy as jnp
    key = jax.random.key(0)
    from diff_pruning_tpu.schedulers.ddim import (ddim_prev_timesteps,
                                                  ddim_step, ddim_timesteps)

    ts = ddim_timesteps(steps, sched.num_train_timesteps, "quad",
                        style="ddim_exp")
    prev = ddim_prev_timesteps(ts, sched.num_train_timesteps)
    ts_j = jnp.asarray(ts, jnp.int32)
    prev_j = jnp.asarray(prev, jnp.int32)

    def body(key):
        x = jax.random.normal(key, (batch, RES, RES, 3))

        def step(carry, inp):
            x, = carry
            t, tp = inp
            tb = jnp.full((batch,), t, jnp.int32)
            eps = model(bf16, x.astype(jnp.bfloat16), tb)
            return (ddim_step(sched, x, eps, t, tp),), None

        (x,), _ = jax.lax.scan(step, (x,), (ts_j, prev_j))
        return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)

    compiled = jax.jit(body).lower(key).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    # XLA cost_analysis counts a lax.scan BODY ONCE, not x its trip count —
    # the program's true totals are ~steps x the reported numbers (verified:
    # reported flops = batch x 2 x MACs/eval exactly, one UNet eval)
    flops = float(ca.get("flops", 0.0)) * steps
    bytes_ = float(ca.get("bytes accessed", 0.0)) * steps
    t_flops = flops / FLOP_PEAK
    t_bytes = bytes_ / BW_PEAK
    out = {
        "phase": "roofline", "batch": batch, "steps": steps,
        "measured_s": round(dt, 3), "imgs_per_sec": round(ips, 3),
        "hlo_flops_T_per_step": round(flops / steps / 1e12, 2),
        "hlo_bytes_GB_per_step": round(bytes_ / steps / 1e9, 2),
        "min_s_flops_roofline": round(t_flops, 3),
        "min_s_bytes_roofline": round(t_bytes, 3),
        "binding": "bytes" if t_bytes > t_flops else "flops",
        "pct_of_binding_roofline": round(
            100 * max(t_flops, t_bytes) / dt, 1),
        "achieved_GBps": round(bytes_ / dt / 1e9, 1),
        "achieved_TFLOPs": round(flops / dt / 1e12, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def phase_trace(batch=8, steps=100, outdir="/tmp/trace_256"):
    """Capture a jax.profiler trace of the sampling program and print the
    top self-time ops from the xplane (xprof is in the image). Artifact +
    parsed attribution go in docs/PERF.md."""
    import glob

    import jax

    _, _, _, sampler = build(batch, steps)
    ips, dt, _ = timeit(sampler, batch)  # warm + baseline number
    with jax.profiler.trace(outdir):
        timeit(sampler, batch, reps=1)
    print(json.dumps({"phase": "trace", "imgs_per_sec": round(ips, 3),
                      "outdir": outdir}), flush=True)
    traces = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                              recursive=True))
    if not traces:
        print(json.dumps({"phase": "trace", "error": "no trace captured"}))
        return
    top = parse_trace_top_ops(traces[-1])
    for row in top[:30]:
        print(json.dumps({"phase": "trace_op", **row}), flush=True)


def parse_trace_top_ops(trace_json_gz):
    """Aggregate per-op device time from the Chrome trace jax.profiler
    writes alongside the xplane: 'X' events on device pids' 'XLA Ops'
    threads, summed by op name and by coarse category (conv / matmul /
    fusion / reduce / etc.)."""
    import gzip
    import re

    with gzip.open(trace_json_gz) as f:
        d = json.load(f)
    evs = d.get("traceEvents", [])
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "device" in str(e.get("args", {}).get("name", "")).lower()}
    op_tids = {(e["pid"], e["tid"]) for e in evs
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in dev_pids
               and "XLA Ops" in str(e.get("args", {}).get("name", ""))}
    if not op_tids:
        # CPU / other platforms: no "XLA Ops" device thread — fall back to
        # the XLA executor thread pool (tf_XLA*) so the shakeout still
        # attributes per-op time
        op_tids = {(e["pid"], e["tid"]) for e in evs
                   if e.get("ph") == "M" and e.get("name") == "thread_name"
                   and "tf_XLA" in str(e.get("args", {}).get("name", ""))}
    totals, cats = {}, {}
    for e in evs:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "?")
        us = float(e.get("dur", 0))
        totals[name] = totals.get(name, 0.0) + us
        base = re.split(r"[.\d]", name, 1)[0]
        cats[base] = cats.get(base, 0.0) + us
    rows = [{"kind": "category", "op": k, "ms": round(v / 1e3, 3)}
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])[:12]]
    rows += [{"kind": "op", "op": k[:120], "ms": round(v / 1e3, 3)}
             for k, v in sorted(totals.items(), key=lambda kv: -kv[1])[:18]]
    return rows


def phase_ablate(batch=8, steps=100):
    import contextlib
    import unittest.mock as mock

    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models import layers as L

    orig_gn = L.GroupNorm.__call__
    orig_attn = L.SelfAttention2D.__call__

    def gn_affine_only(self, p, x, *, with_silu=False):
        # what a perfectly-fused GN would cost: one elementwise pass that
        # rides the conv epilogue (no cross-position stats reduction)
        y = x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
        return y * jax.nn.sigmoid(y) if with_silu else y

    def attn_identity(self, p, x):
        return x

    variants = [
        ("baseline", contextlib.nullcontext(), contextlib.nullcontext()),
        ("gn_affine_only",
         mock.patch.object(L.GroupNorm, "__call__", gn_affine_only),
         contextlib.nullcontext()),
        ("attn_identity", contextlib.nullcontext(),
         mock.patch.object(L.SelfAttention2D, "__call__", attn_identity)),
        ("both",
         mock.patch.object(L.GroupNorm, "__call__", gn_affine_only),
         mock.patch.object(L.SelfAttention2D, "__call__", attn_identity)),
    ]
    results = {}
    for name, p1, p2 in variants:
        with p1, p2:
            _, _, _, sampler = build(batch, steps)
            ips, dt, compile_s = timeit(sampler, batch)
        results[name] = {"imgs_per_sec": round(ips, 3), "s": round(dt, 3),
                         "compile_s": round(compile_s, 1)}
        print(json.dumps({"phase": "ablate", "variant": name, **results[name]}),
              flush=True)
    return results


def phase_mitigate(batch=8, steps=100, which="all"):
    import unittest.mock as mock

    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models import layers as L

    results = {}

    def run(tag, sampler_builder):
        _, _, _, sampler = sampler_builder()
        ips, dt, compile_s = timeit(sampler, batch)
        results[tag] = {"imgs_per_sec": round(ips, 3), "s": round(dt, 3),
                        "compile_s": round(compile_s, 1)}
        print(json.dumps({"phase": "mitigate", "variant": tag,
                          **results[tag]}), flush=True)

    if which in ("all", "baseline"):
        run("baseline", lambda: build(batch, steps))

    if which in ("all", "gn_bf16"):
        orig_gn = L.GroupNorm.__call__

        def gn_stats_f32_normalize_native(self, p, x, *, with_silu=False):
            # stats reduced in f32 (accuracy), normalize applied in the
            # activation dtype (halves the normalize pass's read+write
            # traffic vs the all-f32 default)
            c = x.shape[-1]
            g = self.num_groups
            b = x.shape[0]
            xg = x.reshape(b, -1, g, c // g)
            mean = jnp.mean(xg.astype(jnp.float32), axis=(1, 3), keepdims=True)
            var = jnp.var(xg.astype(jnp.float32), axis=(1, 3), keepdims=True)
            scale = (jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
            xg = (xg - mean.astype(x.dtype)) * scale
            y = xg.reshape(x.shape)
            y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
            return y * jax.nn.sigmoid(y) if with_silu else y

        with mock.patch.object(L.GroupNorm, "__call__",
                               gn_stats_f32_normalize_native):
            run("gn_bf16_normalize", lambda: build(batch, steps))

    if which in ("all", "bf16_carry"):
        # bf16 trajectory carry: patch ddim_step's upcast away by sampling
        # through a local scan whose carry stays bf16
        from diff_pruning_tpu.schedulers.ddim import (ddim_prev_timesteps,
                                                      ddim_step,
                                                      ddim_timesteps)

        def build_bf16_carry():
            model, bf16, sched, _ = build(batch, steps)
            ts = ddim_timesteps(steps, sched.num_train_timesteps, "quad",
                                style="ddim_exp")
            prev = ddim_prev_timesteps(ts, sched.num_train_timesteps)
            ts_j = jnp.asarray(ts, jnp.int32)
            prev_j = jnp.asarray(prev, jnp.int32)

            @jax.jit
            def sample(key, b, hw, ch):
                x = jax.random.normal(key, (batch, RES, RES, 3),
                                      jnp.bfloat16)

                def step(carry, inp):
                    x, = carry
                    t, tp = inp
                    tb = jnp.full((batch,), t, jnp.int32)
                    eps = model(bf16, x, tb)
                    xn = ddim_step(sched, x.astype(jnp.float32),
                                   eps, t, tp)
                    return (xn.astype(jnp.bfloat16),), None

                (x,), _ = jax.lax.scan(step, (x,), (ts_j, prev_j))
                return jnp.clip(x.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

            return None, None, None, (
                lambda key, b, hw, ch: sample(key, b, hw, ch))

        run("bf16_carry", build_bf16_carry)

    if which in ("all", "vmem"):
        prev_flags = os.environ.get("LIBTPU_INIT_ARGS", "")
        print(json.dumps({
            "phase": "mitigate", "variant": "vmem",
            "note": "scoped-vmem flag needs a fresh process; run "
                    "LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 "
                    "python tools/attack_256.py baseline"}), flush=True)

    return results


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "roofline"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    if which == "roofline":
        phase_roofline(batch, steps)
    elif which == "trace":
        phase_trace(batch, steps)
    elif which == "ablate":
        phase_ablate(batch, steps)
    elif which == "baseline":
        _, _, _, sampler = build(batch, steps)
        ips, dt, compile_s = timeit(sampler, batch)
        print(json.dumps({"phase": "baseline", "imgs_per_sec": round(ips, 3),
                          "s": round(dt, 3), "compile_s": round(compile_s, 1)}),
              flush=True)
    elif which.startswith("mitigate"):
        sub = which.split(":", 1)[1] if ":" in which else "all"
        phase_mitigate(batch, steps, sub)
    else:
        raise SystemExit(f"unknown phase {which}")


if __name__ == "__main__":
    main()
