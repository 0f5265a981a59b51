#!/usr/bin/env python
"""End-to-end algorithm validation on procedural data (no external weights).

The reference's quality story is behavioral (SURVEY.md §4): prune a trained
model, check same-seed sample consistency (SSIM) and post-finetune recovery.
No pretrained checkpoint is obtainable in this zero-egress environment, so
this script trains a small DDPM from scratch on a procedural image
distribution, then runs the full Diff-Pruning pipeline and reports the
paper's metrics:

  1. train a DDPM UNet from scratch (bf16, chunked steps);
  2. sample a fixed-seed grid;
  3. Taylor-sweep + prune 30% with each criterion (diff-pruning / taylor /
     magnitude / random);
  4. same-seed SSIM of pruned vs unpruned samples per criterion — the
     paper's claim is diff-pruning > random here (exp.png SSIM column);
  5. finetune the diff-pruned model briefly and report SSIM recovery.

Usage: python tools/e2e_validation.py [--steps 3000] [--out /tmp/e2e]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


from diff_pruning_tpu.data.procedural import make_procedural_dataset  # noqa: E402

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--finetune_steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", type=str, default="/tmp/e2e")
    ap.add_argument("--ratio", type=float, default=0.3)
    ap.add_argument("--full", action="store_true",
                    help="run at the real CIFAR scale (the 35.75M-param "
                         "ddpm_cifar10 UNet) instead of the 6.47M dev model")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.data.datasets import ArrayDataset, iterate_batches
    from diff_pruning_tpu.diffpruning.sweep import accumulate_taylor_grads_scan
    from diff_pruning_tpu.eval.ssim import ssim
    from diff_pruning_tpu.models.unet2d import UNet2D, UNet2DConfig
    from diff_pruning_tpu.pruning.flops import count_ops_and_params, count_params
    from diff_pruning_tpu.pruning.importance import make_importance
    from diff_pruning_tpu.pruning.pruner import apply_pruning, prune
    from diff_pruning_tpu.sampling.ddim_sampler import (
        SamplerConfig, make_sampler, save_image_grid)
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.training.finetune import (
        TrainConfig, init_train_state, make_chunked_train_step)

    os.makedirs(args.out, exist_ok=True)
    if args.full:
        from diff_pruning_tpu.models.unet2d import ddpm_cifar10_config

        cfg = dataclasses.replace(ddpm_cifar10_config(), dropout=0.1)
    else:
        cfg = UNet2DConfig(
            sample_size=32,
            block_out_channels=(64, 128, 128),
            down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
            layers_per_block=2, downsample_padding=0, attention_head_dim=None,
            norm_num_groups=32, norm_eps=1e-6, freq_shift=1,
            flip_sin_to_cos=False, dropout=0.1)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    sched = DiffusionSchedule.create()
    print(f"model: {count_params(params)/1e6:.2f}M params", flush=True)

    data = ArrayDataset(make_procedural_dataset())
    batches = iterate_batches(data, args.batch, seed=0)

    # 1. scratch training
    tcfg = TrainConfig(learning_rate=2e-4, mixed_precision="bf16",
                       num_train_steps=args.steps)
    state = init_train_state(params, tcfg)
    CH = 20
    step = make_chunked_train_step(model, sched, tcfg, chunk=CH)
    key = jax.random.key(1)
    t0 = time.time()
    for s0 in range(0, args.steps, CH):
        stacked = jnp.asarray(np.stack([next(batches) for _ in range(CH)]))
        key, sk = jax.random.split(key)
        state, m = step(state, stacked, sk)
        if (s0 // CH) % 25 == 0:
            print(f"  step {s0+CH}: loss {float(m['loss']):.1f} "
                  f"({(s0+CH)*args.batch/(time.time()-t0):.0f} imgs/s)", flush=True)
    trained = state.ema_params
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s", flush=True)

    eval_cfg = dataclasses.replace(cfg, dropout=0.0)
    eval_model = UNet2D(eval_cfg)
    scfg = SamplerConfig(num_inference_steps=50, skip_type="quad", style="ddim_exp")
    base_sampler = make_sampler(eval_model, trained, sched, scfg)
    base = base_sampler(jax.random.key(42), 64, 32, 3)
    save_image_grid(base, os.path.join(args.out, "base_samples.png"))

    # 2. sweep grads on the trained model
    x0 = jnp.asarray(next(batches))
    noise = jax.random.normal(jax.random.key(2), x0.shape)
    # single on-device while_loop: a host-driven sweep pays seconds of
    # dispatch latency PER TIMESTEP behind the chip tunnel
    res = accumulate_taylor_grads_scan(eval_model, trained, sched, x0, noise,
                                       thr=0.05)
    print(f"diff-pruning sweep: stopped after {res.steps_run} timesteps", flush=True)

    # 3-4. prune with each criterion, measure same-seed SSIM vs base
    results = {}
    pruned_store = {}
    for crit in ("diff-pruning", "taylor", "magnitude", "random"):
        imp = make_importance(crit, seed=0)
        pr = prune(eval_model.graph, trained, imp, sparsity=args.ratio,
                   grads=res.grads)
        pp = apply_pruning(trained, eval_model.graph, pr)
        pcfg = eval_cfg.with_channel_sizes(pr.channel_sizes)
        pm = UNet2D(pcfg)
        macs, n = count_ops_and_params(pm, pp, (1, 32, 32, 3))
        sampler = make_sampler(pm, pp, sched, scfg)
        imgs = sampler(jax.random.key(42), 64, 32, 3)
        s = float(ssim(imgs, base))
        results[crit] = s
        pruned_store[crit] = (pcfg, pp)
        save_image_grid(imgs, os.path.join(args.out, f"pruned_{crit}.png"))
        print(f"  {crit:13s}: SSIM {s:.4f}  ({n/1e6:.2f}M params, "
              f"{macs/1e9:.3f}G MACs)", flush=True)

    # 5. brief finetune of the diff-pruned model
    pcfg, pp = pruned_store["diff-pruning"]
    pcfg_t = dataclasses.replace(pcfg, dropout=0.1)
    pmodel = UNet2D(pcfg_t)
    ftcfg = TrainConfig(learning_rate=2e-4, mixed_precision="bf16",
                        num_train_steps=args.finetune_steps)
    fstate = init_train_state(pp, ftcfg)
    fstep = make_chunked_train_step(pmodel, sched, ftcfg, chunk=CH)
    for s0 in range(0, args.finetune_steps, CH):
        stacked = jnp.asarray(np.stack([next(batches) for _ in range(CH)]))
        key, sk = jax.random.split(key)
        fstate, m = fstep(fstate, stacked, sk)
    pm_eval = UNet2D(pcfg)
    sampler = make_sampler(pm_eval, fstate.ema_params, sched, scfg)
    imgs = sampler(jax.random.key(42), 64, 32, 3)
    s_ft = float(ssim(imgs, base))
    save_image_grid(imgs, os.path.join(args.out, "pruned_finetuned.png"))
    print(f"  after {args.finetune_steps}-step finetune: SSIM {s_ft:.4f} "
          f"(was {results['diff-pruning']:.4f})", flush=True)

    print("\nRESULT", {**results, "diff-pruning+finetune": round(s_ft, 4)})
    ok = results["diff-pruning"] >= results["random"]
    print("diff-pruning >= random consistency:", ok)


if __name__ == "__main__":
    main()
