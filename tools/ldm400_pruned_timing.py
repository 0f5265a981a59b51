#!/usr/bin/env python
"""Time pruned cin256-v2 CFG sampling against the unpruned baseline row
(docs/PERF.md: 400.9M, 250-step CFG DDIM, bs8 -> 0.84 imgs/s).

Usage: python tools/ldm400_pruned_timing.py <pruned_dir> [batch] [ddim_steps]
One chip experiment — run alone (CLAUDE.md)."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    pruned_dir = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 250

    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.cli.ldm_prune import load_ldm
    from diff_pruning_tpu.pruning.flops import count_params
    from diff_pruning_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()
    # "cin256-v2" (or any missing path) = the unpruned random-init preset,
    # so base and pruned time under the identical same-session protocol
    ldm, params = load_ldm(pruned_dir if os.path.isdir(pruned_dir) else None,
                           None)
    ucfg = ldm.unet.cfg
    hw, ch = ucfg.image_size, ucfg.in_channels
    n = count_params(params["unet"])
    sampler = ldm.make_cfg_sampler(params, ddim_steps=steps,
                                   guidance_scale=3.0, latent_hw=hw,
                                   latent_ch=ch)
    labels = jnp.arange(batch, dtype=jnp.int32) % 1000

    def sync(x):
        return float(jnp.sum(x))

    t0 = time.perf_counter()
    sync(sampler(jax.random.key(0), labels, batch))
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        sync(sampler(jax.random.key(i + 1), labels, batch))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "model": pruned_dir, "params_m": round(n / 1e6, 2),
        "batch": batch, "ddim_steps": steps,
        "imgs_per_sec": round(batch / dt, 3), "s_per_img": round(dt / batch, 3),
        "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
