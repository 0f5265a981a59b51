"""CLI: large-batch DDIM sampling for FID — port of ddpm_sample.py.

The reference shards across GPU processes (process_{i} subdirs, seed+i,
ddpm_sample.py:55-77); here one SPMD program shards each batch over the TPU
mesh and a single host writes all images (multi-host slices write per-process
subdirs automatically).
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--total_samples", type=int, default=50000)
    p.add_argument("--ddim_steps", type=int, default=100)
    p.add_argument("--skip_type", type=str, default="uniform", choices=["uniform", "quad"])
    p.add_argument("--style", type=str, default="ddim_exp", choices=["diffusers", "ddim_exp"])
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "ddpm", "plms", "dpm"],
                   help="trajectory kind (plms: ldm_exp plms.py, eta=0 only)")
    p.add_argument("--no_clip", action="store_true")
    p.add_argument("--use_ema", action="store_true",
                   help="load unet_ema subfolder if present")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mode", type=str, default="fid",
                   choices=["fid", "sequence", "interpolation"],
                   help="fid: bulk PNGs; sequence: trajectory grid "
                        "(diffusion.py:429); interpolation: slerp grid (:452)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    from ..utils.tpu_flags import add_scoped_vmem_arg

    add_scoped_vmem_arg(p)
    from ._multihost import add_multihost_args

    add_multihost_args(p)
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache
    from ..utils.tpu_flags import set_scoped_vmem_limit

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    set_scoped_vmem_limit(args.scoped_vmem_kib)  # before first device access
    from ._multihost import maybe_init_distributed

    maybe_init_distributed(args)  # likewise before first device access
    import jax

    from ..models.unet2d import UNet2D
    from ..parallel.mesh import make_mesh
    from ..pruning.flops import count_ops_and_params
    from ..sampling.ddim_sampler import SamplerConfig, make_sampler
    from ..sampling.distributed import sample_many
    from ..schedulers.ddpm import DiffusionSchedule
    from ..utils.checkpoint import load_model
    from .ddpm_prune import load_unet

    if args.use_ema and os.path.exists(
            os.path.join(args.model_path, "unet_ema", "params.npz")):
        cfg, params = load_model(args.model_path, subfolder="unet_ema")
    else:
        cfg, params = load_unet(args.model_path)
    model = UNet2D(cfg)
    schedule = DiffusionSchedule.create()

    hw = cfg.sample_size or 32
    macs, n = count_ops_and_params(model, params, (1, hw, hw, cfg.in_channels))
    print("#Params: {:.4f} M".format(n / 1e6))
    print("#MACS: {:.4f} G".format(macs / 1e9))

    if args.mode != "fid":
        from ..sampling.ddim_sampler import save_image_grid
        from ..sampling.trajectories import sample_interpolation, sample_trajectory

        os.makedirs(args.output_dir, exist_ok=True)
        if args.mode == "sequence":
            traj = sample_trajectory(
                model, params, schedule, key=jax.random.key(args.seed),
                batch_size=4, hw=hw, channels=cfg.in_channels,
                num_inference_steps=args.ddim_steps, skip_type=args.skip_type,
                style=args.style)
            # rows = samples, cols = every 10th state
            sel = traj[:: max(1, traj.shape[0] // 10)]
            grid = sel.transpose(1, 0, 2, 3, 4).reshape(-1, hw, hw, cfg.in_channels)
            save_image_grid(grid, os.path.join(args.output_dir, "sequence.png"),
                            nrow=sel.shape[0])
            print(f"wrote sequence.png ({sel.shape[0]} states x 4 samples)")
        else:
            imgs = sample_interpolation(
                model, params, schedule, key=jax.random.key(args.seed), hw=hw,
                channels=cfg.in_channels, n_alphas=11,
                num_inference_steps=args.ddim_steps, skip_type=args.skip_type,
                style=args.style)
            save_image_grid(imgs, os.path.join(args.output_dir, "interpolation.png"),
                            nrow=11)
            print("wrote interpolation.png")
        return

    n_dev = len(jax.devices())
    n_use = max(d for d in range(1, n_dev + 1) if args.batch_size % d == 0)
    if jax.process_count() > 1 and n_use != n_dev:
        raise SystemExit(
            f"--multihost: batch_size {args.batch_size} must be divisible "
            f"by the global device count {n_dev}, or some hosts would own "
            "no shard and the slice would hang")
    mesh = make_mesh((("data", n_use),), devices=jax.devices()[:n_use])
    sampler = make_sampler(model, params, schedule, SamplerConfig(
        num_inference_steps=args.ddim_steps,
        skip_type=args.skip_type,
        style=args.style,
        eta=args.eta,
        clip_sample=not args.no_clip,
        kind=args.sampler,
        dtype=args.dtype,
    ), mesh=mesh)
    t0 = time.time()
    sample_many(sampler, key=jax.random.key(args.seed),
                total_images=args.total_samples, batch_size=args.batch_size,
                hw=hw, channels=cfg.in_channels, mesh=mesh,
                outdir=args.output_dir, progress=True)
    dt = time.time() - t0
    print(f"{args.total_samples} images in {dt:.1f}s "
          f"({args.total_samples/dt:.2f} imgs/s at {args.ddim_steps} DDIM steps)")


if __name__ == "__main__":
    main()
