"""CLI: FID between two paths — port of fid_score.py.

    python -m diff_pruning_tpu.cli.fid_score path1 path2 [--save-stats]

Paths may be image dirs, dataset names (cifar10), or .npz stats files.
Requires local FID inception weights (see eval/inception.py); the converter
tools/convert_inception.py turns the pt_inception .pth into a portable npz.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path", nargs=2)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--res", type=int, default=None, help="resize/crop images first")
    p.add_argument("--inception-weights", type=str, default=None)
    p.add_argument("--save-stats", action="store_true",
                   help="treat path2 as the output .npz for path1's statistics")
    p.add_argument("--clean", action="store_true",
                   help="clean-fid preprocessing (antialiased PIL-bicubic "
                        "resize) — the reference calc_fid.py variant")
    p.add_argument("--random-init-seed", type=int, default=None,
                   help="use a fixed-seed RANDOM-init inception instead of "
                        "the pt_inception weights (zero-egress fallback): a "
                        "deterministic relative two-sample distance, NOT "
                        "comparable to published FID numbers")
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    import jax

    from ..eval.fid import fid_between_paths, save_stats, statistics_of_path
    from ..eval.inception import load_fid_inception_params
    from ..parallel.mesh import make_mesh

    # shard the Inception pass over all local devices (SPMD replaces the
    # reference's per-process fan-out)
    mesh = make_mesh() if len(jax.devices()) > 1 else None

    # an explicit --random-init-seed WINS over locally-found weights: the
    # random-init protocol is a relative-distance scale, and silently
    # switching to real-inception FID would make the number incomparable
    # with scores computed on weight-less machines at the same seed
    if args.random_init_seed is not None:
        from ..eval.inception import random_init_fid_inception_params

        print(f"NOTE: random-init inception (seed={args.random_init_seed}) — "
              "relative distance only, not comparable to published FID")
        params = random_init_fid_inception_params(args.random_init_seed)
    else:
        params = load_fid_inception_params(args.inception_weights)
    if params is None:
        raise SystemExit(
            "FID inception weights not found locally. Provide --inception-weights "
            "(pt_inception-2015-12-05-6726825d.pth or converted .npz); this "
            "environment has no network access.")

    mode = "clean" if args.clean else "torch"
    if args.save_stats:
        mu, sigma = statistics_of_path(args.path[0], params,
                                       batch_size=args.batch_size,
                                       resolution=args.res, resize_mode=mode,
                                       mesh=mesh)
        save_stats(args.path[1], mu, sigma, resize_mode=mode)
        print(f"saved stats to {args.path[1]}")
        return

    fid = fid_between_paths(args.path[0], args.path[1], params,
                            batch_size=args.batch_size, resolution=args.res,
                            resize_mode=mode, mesh=mesh)
    print("FID: ", fid)


if __name__ == "__main__":
    main()
