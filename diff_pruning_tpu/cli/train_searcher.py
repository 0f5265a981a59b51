"""CLI: build/save a retrieval searcher — ldm_exp/scripts/train_searcher.py.

Two modes:
  --database <dir>   load a reference-schema npz datapool (single or
                     multi-file) and persist it for the exact searcher.
  --images <dir>     (beyond the reference, which assumes its databases
                     pre-downloaded) embed a local image folder with the
                     CLIP vision tower into a fresh database first.

The reference trains a scaNN index here; the TPU searcher is exact
(one MXU matmul + top_k — see retrieval.py), so "training" reduces to
persisting the database.
"""

from __future__ import annotations

import argparse
import glob
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--database", "-d", type=str, default=None,
                   help="folder with the npz clip-feature datapool")
    p.add_argument("--images", type=str, default=None,
                   help="image folder to embed into a new database")
    p.add_argument("--clip_path", type=str, default=None,
                   help="converted CLIP dir (config.json + params.npz); "
                        "'random' for a weightless smoke run")
    p.add_argument("--target_path", "-t", type=str, required=True)
    p.add_argument("--knn", "-k", type=int, default=20,
                   help="accepted for flag parity; the exact searcher needs "
                        "no per-k tuning")
    p.add_argument("--batch_size", type=int, default=64)
    return p.parse_args(argv)


def load_clip(clip_path):
    import jax

    from ..models.clip import CLIP, CLIPConfig, clip_vit_l14_config
    from ..utils.checkpoint import load_params_npz

    if clip_path in (None, "random"):
        model = CLIP(clip_vit_l14_config())
        return model, model.init(jax.random.key(0))
    with open(os.path.join(clip_path, "config.json")) as f:
        cfg = CLIPConfig.from_json(f.read())
    model = CLIP(cfg)
    params = load_params_npz(os.path.join(clip_path, "params.npz"))
    return model, params


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    from ..retrieval import build_database, load_datapool, save_searcher

    if args.database:
        pool = load_datapool(args.database)
    elif args.images:
        files = sorted(f for ext in ("png", "jpg", "jpeg", "webp")
                       for f in glob.glob(os.path.join(args.images,
                                                       f"*.{ext}")))
        if not files:
            raise SystemExit(f"no images under {args.images}")
        model, params = load_clip(args.clip_path)
        print(f"embedding {len(files)} images with CLIP "
              f"({'random init' if args.clip_path in (None, 'random') else args.clip_path})")
        pool = build_database(model, params, files, batch_size=args.batch_size)
    else:
        raise SystemExit("need --database or --images")
    save_searcher(pool, args.target_path)
    print(f"saved searcher database ({pool['embedding'].shape[0]} entries) "
          f"under {args.target_path}")


if __name__ == "__main__":
    main()
