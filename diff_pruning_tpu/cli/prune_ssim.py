"""CLI: timestep-stage pruning ablation — port of ddpm_exp/prune_ssim.py.

For each requested `--stage` N: accumulate Taylor grads over exactly the
first N timesteps (no early stop, prune_ssim.py:257-269), prune at the given
ratio, and dump a fixed-seed sample grid so SSIM-vs-stage curves can be
computed against the unpruned model's samples (compute_ssim CLI +
tools/ssim_curve.py)."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--pruning_ratio", type=float, default=0.3)
    p.add_argument("--stages", type=int, nargs="+",
                   default=[1, 10, 50, 100, 250, 500, 1000])
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--n_vis", type=int, default=64)
    p.add_argument("--ddim_steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.datasets import get_dataset, iterate_batches
    from ..diffpruning.sweep import accumulate_taylor_grads
    from ..models.unet2d import UNet2D
    from ..pruning.importance import make_importance
    from ..pruning.pruner import apply_pruning, prune
    from ..sampling.ddim_sampler import SamplerConfig, make_sampler, save_images
    from ..schedulers.ddpm import DiffusionSchedule
    from ..utils.checkpoint import save_model
    from .ddpm_prune import load_unet

    cfg, params = load_unet(args.model_path)
    model = UNet2D(cfg)
    schedule = DiffusionSchedule.create()
    hw = cfg.sample_size or 32

    ds = get_dataset(args.dataset, resolution=hw)
    batch = jnp.asarray(next(iterate_batches(ds, args.batch_size, seed=args.seed)))
    noise = jax.random.normal(jax.random.key(args.seed), batch.shape)

    # baseline samples from the unpruned model (same seed for all stages)
    base_sampler = make_sampler(model, params, schedule,
                                SamplerConfig(num_inference_steps=args.ddim_steps))
    base = base_sampler(jax.random.key(123), args.n_vis, hw, cfg.in_channels)
    save_images(base, os.path.join(args.save_path, "stage_base"))

    imp = make_importance("diff-pruning")
    for stage in sorted(args.stages):
        res = accumulate_taylor_grads(model, params, schedule, batch, noise,
                                      thr=None, max_steps=stage)
        result = prune(model.graph, params, imp, sparsity=args.pruning_ratio,
                       grads=res.grads)
        pruned = apply_pruning(params, model.graph, result)
        pcfg = cfg.with_channel_sizes(result.channel_sizes)
        pm = UNet2D(pcfg)
        out_dir = os.path.join(args.save_path, f"stage_{stage}")
        save_model(out_dir, pcfg, pruned)
        sampler = make_sampler(pm, pruned, schedule,
                               SamplerConfig(num_inference_steps=args.ddim_steps))
        imgs = sampler(jax.random.key(123), args.n_vis, hw, cfg.in_channels)
        save_images(imgs, out_dir)
        print(f"stage {stage}: saved model + {args.n_vis} samples to {out_dir}")


if __name__ == "__main__":
    main()
