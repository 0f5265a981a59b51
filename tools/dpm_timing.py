#!/usr/bin/env python
"""On-chip DPM-Solver++(2M) serving benchmark on the CIFAR-scale UNet.

Two questions, one protocol (cache-warm, host-transfer-timed, one chip
experiment at a time — CLAUDE.md):
1. Throughput: imgs/s at bs128 for DDIM-100 (the paper's FID protocol,
   docs/PERF.md row 95.4 imgs/s), DDIM-25, DPM-25 and DPM-20 — DPM-25 vs
   DDIM-25 isolates solver overhead (expected ~0: same eps evals, the
   update is elementwise), DPM-25 vs DDIM-100 is the serving win.
Accuracy is NOT measured here: a random-init UNet's eps field has none of
a trained score field's cancellation structure (measured: latents blow up
~150x unclipped, and clipping makes the field chaotic for every low-step
solver). The quality claim is instead proven on the exact eps-posterior of
a mixture-of-Gaussians data distribution — the closed-form field a
perfectly-trained model would learn — in tests/test_dpm_solver.py::
test_dpm20_matches_ddim100_on_exact_mixture_field (DPM-20 == DDIM-100
mode fidelity, DPM-10 ~ DDIM-50).

Spacing negative result (same field, 4 seeds x {10,15,20} steps, total
wrong-mode counts): uniform-t 13 < log-SNR-uniform 41 < quad 60 — the
literature's lambda-uniform grid does NOT beat uniform-t on this β
schedule, so 'dpm' keeps the standard ddim_timesteps families and no
logsnr skip_type was added.

Usage: python tools/dpm_timing.py [batch] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_cifar10_config
    from diff_pruning_tpu.sampling.ddim_sampler import (SamplerConfig,
                                                        make_sampler)
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    # DPM_TIMING_TINY=1: CPU shakeout on the tiny UNet with a short dense
    # reference (protocol identical, numbers meaningless off-chip)
    tiny = bool(int(os.environ.get("DPM_TIMING_TINY", "0")))
    if tiny:
        from diff_pruning_tpu.models.unet2d import tiny_unet_config

        cfg = tiny_unet_config(attn=False)
    else:
        cfg = ddpm_cifar10_config()
    model = UNet2D(cfg)
    # init on the host CPU backend — a cold on-chip init compile costs
    # minutes (CLAUDE.md); nudge so the eps field is non-trivial
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.key(0))
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.key(42), len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                      for l, k in zip(leaves, keys)])
    params = jax.device_put(params)
    schedule = DiffusionSchedule.create()

    def sync(x):
        return float(jnp.sum(x))

    def bench(kind, steps):
        s = make_sampler(model, params, schedule,
                         SamplerConfig(num_inference_steps=steps, kind=kind,
                                       style="ddim_exp", clip_sample=False,
                                       dtype="bfloat16"))
        t0 = time.perf_counter()
        sync(s(jax.random.key(0), batch, cfg.sample_size, cfg.out_channels))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(reps):
            sync(s(jax.random.key(i + 1), batch, cfg.sample_size,
                   cfg.out_channels))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"sampler": kind, "steps": steps, "batch": batch,
                          "imgs_per_sec": round(batch / dt, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return batch / dt

    r100 = bench("ddim", 100)
    bench("ddim", 25)
    r25 = bench("dpm", 25)
    bench("dpm", 20)

    print(json.dumps({"speedup_dpm25_vs_ddim100": round(r25 / r100, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
