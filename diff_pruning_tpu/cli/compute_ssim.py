"""CLI: pairwise SSIM/MSE between two sample directories — port of
ddpm_exp/compute_ssim.py (the paper's same-seed consistency metric)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dir1")
    p.add_argument("dir2")
    p.add_argument("--batch-size", type=int, default=256)
    args = p.parse_args(argv)

    from ..eval.ssim import pairwise_ssim_mse

    s, m = pairwise_ssim_mse(args.dir1, args.dir2, batch_size=args.batch_size)
    print(f"SSIM: {s:.6f}")
    print(f"MSE: {m:.6f}")


if __name__ == "__main__":
    main()
