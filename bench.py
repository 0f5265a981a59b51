"""Benchmark: DDPM CIFAR-10 DDIM sampling throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: images/sec for 100-step DDIM sampling of the 35.7M-param DDPM
CIFAR-10 UNet (the reference's headline workload: 50k-image FID runs,
ddpm_sample.py). The whole 100-step trajectory is one compiled lax.scan.

Baseline: the reference publishes NO throughput numbers (SURVEY.md §6), so
vs_baseline is computed against an analytic A100 estimate of the reference
stack: 6.1 GMACs/eval x 2 FLOP/MAC x 100 steps = 1.22 TFLOP/img; an A100
running PyTorch eager fp16 at a generous 25% MFU of 312 TFLOP/s sustains
~64 imgs/s. value/vs_baseline > 1 means we beat that estimate per chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_REF_IMGS_PER_SEC = 64.0


def main():
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_cifar10_config
    from diff_pruning_tpu.sampling.ddim_sampler import SamplerConfig, make_sampler
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule

    cfg = ddpm_cifar10_config()
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    schedule = DiffusionSchedule.create()
    sampler = make_sampler(model, params, schedule,
                           SamplerConfig(num_inference_steps=100,
                                         skip_type="quad", style="ddim_exp",
                                         dtype="bfloat16"))
    batch = 128  # best measured batch on v5e (99 imgs/s vs 75 at bs512)
    # warmup / compile
    sampler(jax.random.key(0), batch, 32, 3).block_until_ready()
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        sampler(jax.random.key(i), batch, 32, 3).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    imgs_per_sec = batch / dt
    print(json.dumps({
        "metric": "ddpm_cifar10_ddim100_sampling_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / A100_REF_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
