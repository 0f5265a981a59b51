"""CLI: full fidelity metric suite between two image dirs — the TPU
rebuild of ldm_exp/test_diffusion.py (torch_fidelity with isc / fid /
kid / prc all enabled).

All four metrics come from ONE InceptionV3 feature pass per input
(sharded over the mesh when more than one device is attached); ISC
additionally applies the classifier head kept by the inception converter.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input1", type=str, required=True,
                   help="generated images (dir or dataset name)")
    p.add_argument("--input2", type=str, required=True,
                   help="reference images")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--weights", type=str, default=None,
                   help="converted FID inception .npz (defaults to the "
                        "standard search paths)")
    p.add_argument("--no-isc", dest="isc", action="store_false")
    p.add_argument("--no-kid", dest="kid", action="store_false")
    p.add_argument("--no-prc", dest="prc", action="store_false")
    p.add_argument("--kid_subset_size", type=int, default=1000)
    p.add_argument("--kid_subsets", type=int, default=100)
    p.add_argument("--clean", action="store_true",
                   help="clean-fid preprocessing family")
    args = p.parse_args(argv)

    import jax

    from ..eval.fid import activation_statistics, features_of_path, frechet_distance
    from ..eval.fidelity import (inception_probs, inception_score, kid,
                                 precision_recall)
    from ..eval.inception import load_fid_inception_params
    from ..parallel.mesh import make_mesh

    params = load_fid_inception_params(args.weights)
    if params is None:
        raise SystemExit("no inception weights found — convert with "
                         "tools/convert_checkpoints.py inception")
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    mode = "clean" if args.clean else "torch"
    f1 = features_of_path(args.input1, params, batch_size=args.batch_size,
                          resize_mode=mode, mesh=mesh)
    f2 = features_of_path(args.input2, params, batch_size=args.batch_size,
                          resize_mode=mode, mesh=mesh)

    out = {}
    mu1, s1 = activation_statistics(f1)
    mu2, s2 = activation_statistics(f2)
    out["frechet_inception_distance"] = frechet_distance(mu1, s1, mu2, s2)
    if args.isc:
        m, s = inception_score(inception_probs(params, f1))
        out["inception_score_mean"], out["inception_score_std"] = m, s
    if args.kid:
        m, s = kid(f1, f2, subset_size=args.kid_subset_size,
                   subsets=args.kid_subsets)
        out["kernel_inception_distance_mean"] = m
        out["kernel_inception_distance_std"] = s
    if args.prc:
        out.update(precision_recall(f2, f1))
    print(json.dumps({k: round(float(v), 5) for k, v in out.items()}))
    return out


if __name__ == "__main__":
    main()
