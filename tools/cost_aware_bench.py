#!/usr/bin/env python
"""Measure bandwidth-aware sparsity allocation vs the reference's
MACs-implicit allocation (docs/PERF.md weak #5; pruning/cost.py).

Protocol: prune the CIFAR UNet globally with
  (a) importance only (reference semantics: mean-normalized magnitude pool)
  (b) importance / d(MACs)/d(channel)      [what the reference optimizes]
  (c) importance / d(bytes)/d(channel)     [what a bandwidth-bound v5e pays]
  (d) importance / hybrid roofline cost
at EQUAL FINAL PARAMS: naive cost division is aggressive (cross-layer cost
ratios are ~100x, so whole expensive layers collapse to their GN floors at
a fixed channel sparsity), so each variant's channel-sparsity is
binary-searched to land on the same parameter budget — the budget the
plain-importance run produces at the requested sparsity. Then DDIM-100
sampling of each pruned model is timed on the real chip at bs128 bf16.
Equal-quality comparison is out of scope here (no real CIFAR weights in
this zero-egress env); the question answered is whether cost-weighting
moves *throughput* at equal model size, i.e. whether the allocator can
target machine time at all.

One chip experiment — run alone (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_cifar10_config
    from diff_pruning_tpu.pruning.cost import var_cost_weights
    from diff_pruning_tpu.pruning.flops import count_ops_and_params
    from diff_pruning_tpu.pruning.importance import make_importance
    from diff_pruning_tpu.pruning.pruner import apply_pruning, prune
    from diff_pruning_tpu.sampling.ddim_sampler import (SamplerConfig,
                                                        make_sampler)
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    sparsity = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = 100

    cfg = ddpm_cifar10_config()
    model = UNet2D(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(jax.random.key(0))
    sched = DiffusionSchedule.create()
    imp = make_importance("magnitude")

    # trace at the SERVING batch: at bs1 weight traffic dominates the byte
    # model and the ranking degenerates to "cut the deep wide layers"; at
    # bs128 activation traffic dominates (the regime the sampler runs in).
    # Finding (CPU dry-run): at bs128 the bytes ranking coincides with the
    # macs ranking for this architecture — activation bytes and MACs scale
    # with the same channels — so the allocator-level lever distinguishes
    # importance-only vs cost-weighted, not bytes vs macs.
    trace_shape = (batch, 32, 32, 3)
    variants = {
        "importance_only": None,
        "macs_weighted": var_cost_weights(model, params, trace_shape,
                                          mode="macs"),
        "bytes_weighted": var_cost_weights(model, params, trace_shape,
                                           mode="bytes"),
        "hybrid_weighted": var_cost_weights(model, params, trace_shape,
                                            mode="hybrid"),
    }

    def sync(x):
        return float(jnp.sum(x))

    from diff_pruning_tpu.pruning.flops import count_params

    def prune_at(cw, s):
        # max_sparsity caps any single var's drop at 75% so cost division
        # (cross-layer cost ratios ~100x) cannot floor whole layers
        return prune(model.graph, params, imp, sparsity=s,
                     global_pruning=True, cost_weights=cw,
                     max_sparsity=0.75)

    # the parameter budget every variant must hit (±1%)
    res0 = prune_at(None, sparsity)
    target = count_params(apply_pruning(params, model.graph, res0))

    def match_params(cw):
        if cw is None:
            return res0, sparsity
        lo, hi = 0.0, 0.95
        for _ in range(24):
            mid = (lo + hi) / 2
            r = prune_at(cw, mid)
            n = count_params(apply_pruning(params, model.graph, r))
            if abs(n - target) / target < 0.01:
                return r, mid
            if n > target:
                lo = mid
            else:
                hi = mid
        return r, mid

    results = {}
    seen_allocs = {}
    for name, cw in variants.items():
        res, eff_s = match_params(cw)
        alloc_key = json.dumps(res.channel_sizes, sort_keys=True)
        if alloc_key in seen_allocs:
            results[name] = {**results[seen_allocs[alloc_key]],
                             "same_alloc_as": seen_allocs[alloc_key]}
            print(json.dumps({"variant": name, **results[name]}), flush=True)
            continue
        seen_allocs[alloc_key] = name
        newp = apply_pruning(params, model.graph, res)
        m2 = UNet2D(cfg.with_channel_sizes(res.channel_sizes))
        m2.graph.validate(newp)
        macs, n = count_ops_and_params(m2, newp, (1, 32, 32, 3))
        bf16 = jax.tree.map(
            lambda x: jax.device_put(x.astype(jnp.bfloat16),
                                     jax.devices()[0]), newp)
        sampler = make_sampler(m2, bf16, sched,
                               SamplerConfig(num_inference_steps=steps,
                                             skip_type="quad",
                                             style="ddim_exp",
                                             dtype="bfloat16"))
        t0 = time.perf_counter()
        sync(sampler(jax.random.key(0), batch, 32, 3))
        compile_s = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for i in range(reps):
            sync(sampler(jax.random.key(i + 1), batch, 32, 3))
        dt = (time.perf_counter() - t0) / reps
        results[name] = {
            "params_m": round(n / 1e6, 3), "macs_g": round(macs / 1e9, 3),
            "imgs_per_sec": round(batch / dt, 2),
            "compile_s": round(compile_s, 1),
            "channel_sparsity": round(eff_s, 4),
        }
        print(json.dumps({"variant": name, **results[name]}), flush=True)

    print(json.dumps({"sparsity": sparsity, "batch": batch,
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
