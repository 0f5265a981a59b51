#!/usr/bin/env python
"""Full serving stack on one chip: cost-aware pruning x DPM-Solver++(2M).

Composes the two round-3 serving levers that were so far only measured in
isolation (docs/PERF.md):
  - cost-aware sparsity allocation (+61% imgs/s at equal params vs
    importance-only, tools/cost_aware_bench.py)
  - DPM-Solver++(2M) few-step sampling (5x fewer UNet evals at DDIM-100
    mode fidelity on the exact mixture eps-field, tools/dpm_timing.py /
    tests/test_dpm_solver.py)
into one measured number: imgs/s of the hybrid-cost-pruned CIFAR UNet under
DPM-20, against the paper-protocol baseline (base model, DDIM-100).

Two timing protocols per row:
  - "sync": one dispatch per rep, forced host transfer between reps — the
    comparable-with-PERF.md number (how every other row was measured);
  - "pipelined": `sample_many` steady state (dispatch b+1 before
    materializing b, host transfer included) — the serving number. At 20
    steps the per-dispatch tunnel latency is a much larger fraction of the
    batch than at 100 steps, so this is where pipelining actually matters.

Quality is NOT re-argued here; see the mixture-field proof cited above.
Equal-params protocol and the 0.75 max_sparsity cap are exactly
tools/cost_aware_bench.py's (binary-searched channel sparsity).

One chip experiment — run alone (CLAUDE.md).
Usage: python tools/serving_stack_bench.py [sparsity] [batch] [reps]
Env: SERVING_TINY=1 — CPU shakeout on the tiny UNet (numbers meaningless).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sparsity = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax

    tiny = bool(int(os.environ.get("SERVING_TINY", "0")))
    if tiny:
        # config.update, not the env var: the axon site hook can hang a
        # fresh process on a dead tunnel before JAX_PLATFORMS is consulted
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_cifar10_config
    from diff_pruning_tpu.pruning.cost import var_cost_weights
    from diff_pruning_tpu.pruning.flops import (count_ops_and_params,
                                                count_params)
    from diff_pruning_tpu.pruning.importance import make_importance
    from diff_pruning_tpu.pruning.pruner import apply_pruning, prune
    from diff_pruning_tpu.sampling.ddim_sampler import (SamplerConfig,
                                                        make_sampler)
    from diff_pruning_tpu.sampling.distributed import sample_many
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    if tiny:
        from diff_pruning_tpu.models.unet2d import tiny_unet_config

        cfg = tiny_unet_config(attn=False)
    else:
        cfg = ddpm_cifar10_config()
    model = UNet2D(cfg)
    hw, ch = cfg.sample_size, cfg.out_channels
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(jax.random.key(0))
    sched = DiffusionSchedule.create()
    imp = make_importance("magnitude")

    # --- equal-params cost-aware prune (tools/cost_aware_bench.py protocol)
    trace_shape = (batch, hw, hw, ch)

    def prune_at(cw, s):
        return prune(model.graph, params, imp, sparsity=s,
                     global_pruning=True, cost_weights=cw,
                     max_sparsity=0.75)

    res0 = prune_at(None, sparsity)
    target = count_params(apply_pruning(params, model.graph, res0))
    cw = var_cost_weights(model, params, trace_shape, mode="hybrid")
    lo, hi = 0.0, 0.95
    res, eff_s = res0, sparsity
    for _ in range(24):
        mid = (lo + hi) / 2
        r = prune_at(cw, mid)
        n = count_params(apply_pruning(params, model.graph, r))
        if abs(n - target) / target < 0.01:
            res, eff_s = r, mid
            break
        if n > target:
            lo = mid
        else:
            hi = mid
        res, eff_s = r, mid
    newp = apply_pruning(params, model.graph, res)
    pruned_model = UNet2D(cfg.with_channel_sizes(res.channel_sizes))
    pruned_model.graph.validate(newp)

    def to_dev_bf16(p):
        return jax.tree.map(
            lambda x: jax.device_put(x.astype(jnp.bfloat16),
                                     jax.devices()[0]), p)

    base_bf16 = to_dev_bf16(params)
    pruned_bf16 = to_dev_bf16(newp)
    macs_b, n_b = count_ops_and_params(model, params, (1, hw, hw, ch))
    macs_p, n_p = count_ops_and_params(pruned_model, newp, (1, hw, hw, ch))
    print(json.dumps({
        "base_params_m": round(n_b / 1e6, 3), "base_macs_g": round(macs_b / 1e9, 3),
        "pruned_params_m": round(n_p / 1e6, 3), "pruned_macs_g": round(macs_p / 1e9, 3),
        "channel_sparsity": round(eff_s, 4), "cost_mode": "hybrid",
    }), flush=True)

    def sync(x):
        return float(jnp.sum(x))

    def bench(label, m, p, kind, steps):
        # DDIM rows match docs/PERF.md protocol (ddim_exp quad); DPM rows
        # match tools/dpm_timing.py (clip_sample=False)
        scfg = (SamplerConfig(num_inference_steps=steps, kind="ddim",
                              skip_type="quad", style="ddim_exp",
                              dtype="bfloat16")
                if kind == "ddim" else
                SamplerConfig(num_inference_steps=steps, kind="dpm",
                              style="ddim_exp", clip_sample=False,
                              dtype="bfloat16"))
        s = make_sampler(m, p, sched, scfg)
        t0 = time.perf_counter()
        sync(s(jax.random.key(0), batch, hw, ch))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(reps):
            sync(s(jax.random.key(i + 1), batch, hw, ch))
        dt = (time.perf_counter() - t0) / reps
        # pipelined steady state incl. host materialization (serving)
        n_pipe = max(reps, 4)
        t0 = time.perf_counter()
        out = sample_many(s, key=jax.random.key(7), total_images=n_pipe * batch,
                          batch_size=batch, hw=hw, channels=ch)
        pipe_dt = (time.perf_counter() - t0) / n_pipe
        assert out.shape[0] == n_pipe * batch
        row = {"row": label, "kind": kind, "steps": steps, "batch": batch,
               "imgs_per_sec_sync": round(batch / dt, 2),
               "imgs_per_sec_pipelined": round(batch / pipe_dt, 2),
               "compile_s": round(compile_s, 1)}
        print(json.dumps(row), flush=True)
        return row

    r_base = bench("base", model, base_bf16, "ddim", 100)
    bench("pruned_cost", pruned_model, pruned_bf16, "ddim", 100)
    r_dpm25 = bench("pruned_cost", pruned_model, pruned_bf16, "dpm", 25)
    r_dpm20 = bench("pruned_cost", pruned_model, pruned_bf16, "dpm", 20)

    print(json.dumps({
        "full_stack_speedup_sync": round(
            r_dpm20["imgs_per_sec_sync"] / r_base["imgs_per_sec_sync"], 2),
        "full_stack_speedup_pipelined": round(
            r_dpm20["imgs_per_sec_pipelined"]
            / r_base["imgs_per_sec_pipelined"], 2),
        "dpm25_speedup_pipelined": round(
            r_dpm25["imgs_per_sec_pipelined"]
            / r_base["imgs_per_sec_pipelined"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
