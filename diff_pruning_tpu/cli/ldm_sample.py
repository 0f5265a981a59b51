"""CLI: class-conditional LDM sampling for FID — port of
ldm_exp/sample_for_FID.py (DDIM + CFG over all classes, --ipc images per
class) and sample_pruned.py (grid rendering)."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--ipc", type=int, default=50, help="images per class")
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--ddim_steps", type=int, default=250)
    p.add_argument("--scale", type=float, default=3.0)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--method", type=str, default="ddim", choices=["ddim", "plms", "dpm"])
    p.add_argument("--seed", type=int, default=0)
    from ..utils.tpu_flags import add_scoped_vmem_arg, set_scoped_vmem_limit

    add_scoped_vmem_arg(p)
    from ._multihost import add_multihost_args, maybe_init_distributed

    add_multihost_args(p)
    args = p.parse_args(argv)
    set_scoped_vmem_limit(args.scoped_vmem_kib)  # before first device access
    maybe_init_distributed(args)  # likewise before first device access

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..parallel.mesh import make_mesh
    from ..sampling.ddim_sampler import save_images
    from .ldm_prune import load_ldm

    ldm, params = load_ldm(args.model_path, None, args.seed)
    hw, ch = ldm.unet.cfg.image_size, ldm.unet.cfg.in_channels
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    if mesh is not None and args.batch_size % len(jax.devices()):
        mesh = None  # batch not shardable; fall back to single-program
    sampler = ldm.make_cfg_sampler(params, ddim_steps=args.ddim_steps,
                                   guidance_scale=args.scale, eta=args.eta,
                                   latent_hw=hw, latent_ch=ch, mesh=mesh,
                                   method=args.method)
    multiproc = jax.process_count() > 1
    outdir = args.output_dir
    if multiproc:
        # each host writes its local shard rows to process_{i}/ with local
        # numbering (ddpm_sample.py:55-74's layout); whole batches only
        assert mesh is not None, (
            "--multihost needs batch_size divisible by the device count")
        assert args.ipc % args.batch_size == 0, (
            "--multihost needs --ipc % --batch_size == 0")
        outdir = os.path.join(args.output_dir, f"process_{jax.process_index()}")
    os.makedirs(outdir, exist_ok=True)
    # jit the whole latent->image decode (one program per dispatch — this
    # platform pays seconds of latency per op otherwise) and pipeline:
    # batch b+1's trajectory runs on-device while batch b's PNGs encode.
    if ldm.first_stage is not None:
        decode = jax.jit(lambda p, lat: ldm.decode_first_stage(p, lat))
    else:
        decode = jax.jit(lambda p, lat: jnp.clip(lat * 0.5 + 0.5, 0.0, 1.0))
    key = jax.random.key(args.seed)
    idx = 0
    pending = None

    local_idx = 0  # per-process PNG numbering (ADVICE r3: processes can own
    # unequal device counts, so deriving it as start//process_count can
    # collide or skip; count what THIS process actually wrote, like
    # sampling/distributed.py's sample_many does)

    def flush(imgs_dev, n, start):
        nonlocal local_idx
        if multiproc:
            from ..sampling.distributed import fetch_local_rows

            rows = fetch_local_rows(imgs_dev)
            save_images(rows, outdir, start_index=local_idx)
            local_idx += len(rows)
        else:
            save_images(np.asarray(imgs_dev)[:n], outdir, start_index=start)

    for cls in range(args.num_classes):
        remaining = args.ipc
        while remaining > 0:
            n = min(args.batch_size, remaining)
            key, k = jax.random.split(key)
            labels = jnp.full((args.batch_size,), cls, jnp.int32)
            imgs_dev = decode(params, sampler(k, labels, args.batch_size))
            if pending is not None:
                flush(*pending)
            pending = (imgs_dev, n, idx)
            idx += n
            remaining -= n
        if (cls + 1) % 25 == 0:
            print(f"class {cls + 1}/{args.num_classes}: {idx} images")
    if pending is not None:
        flush(*pending)
    print(f"wrote {idx} images to {args.output_dir}")


if __name__ == "__main__":
    main()
