#!/usr/bin/env python
"""SSIM-vs-timestep-stage curve from prune_ssim outputs — the
compute_pruned_ssim_curve.py + draw_ssim_pruned_curve.py equivalent
(the paper's figure showing consistency vs how many timesteps feed the
Taylor accumulation).

  python tools/ssim_curve.py <prune_ssim_save_path> [--out curve.png]

Expects <save_path>/stage_base and <save_path>/stage_<N> dirs of same-seed
samples (written by cli/prune_ssim.py).
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("save_path")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from diff_pruning_tpu.eval.ssim import pairwise_ssim_mse

    base = os.path.join(args.save_path, "stage_base")
    stages = sorted(
        (int(m.group(1)), os.path.join(args.save_path, d))
        for d in os.listdir(args.save_path)
        if (m := re.fullmatch(r"stage_(\d+)", d)))
    if not stages:
        raise SystemExit(f"no stage_<N> dirs under {args.save_path}")

    xs, ys = [], []
    for n, d in stages:
        s, _ = pairwise_ssim_mse(base, d)
        xs.append(n)
        ys.append(s)
        print(f"stage {n:5d}: SSIM {s:.4f}")

    out = args.out or os.path.join(args.save_path, "ssim_curve.png")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 3.2))
    ax.plot(xs, ys, marker="o")
    ax.set_xscale("log")
    ax.set_xlabel("timesteps in Taylor accumulation")
    ax.set_ylabel("same-seed SSIM vs unpruned")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
