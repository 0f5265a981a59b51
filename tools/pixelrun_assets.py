#!/usr/bin/env python
"""Render the pixelrun's committed evidence: class-major pixel grids from
the sampled PNG dirs + the codec recon grid into docs/assets/pixelrun/, and
print the docs/PIXELRUN.md results table from pixelrun_state.json.

Pure host/PIL work (no jax, no chip) — safe to run while a chip experiment
is in flight.

Usage: python tools/pixelrun_assets.py [--out run/pixelrun]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, "docs", "assets", "pixelrun")


def class_grid(sample_dir: str, out_png: str, n_classes: int = 8,
               per_class: int = 8) -> bool:
    """One row per class, first `per_class` samples of each (files are
    written class-major: label = index // ipc)."""
    files = sorted(glob.glob(os.path.join(sample_dir, "*.png")))
    if not files:
        return False
    ipc = len(files) // n_classes
    rows = []
    pad = 2
    for c in range(n_classes):
        imgs = [np.asarray(Image.open(files[c * ipc + i]))
                for i in range(min(per_class, ipc))]
        h, w = imgs[0].shape[:2]
        row = np.full((h, (w + pad) * len(imgs) - pad, 3), 255, np.uint8)
        for i, im in enumerate(imgs):
            row[:, i * (w + pad):i * (w + pad) + w] = im
        rows.append(row)
    grid = np.full((sum(r.shape[0] + pad for r in rows) - pad,
                    rows[0].shape[1], 3), 255, np.uint8)
    y = 0
    for r in rows:
        grid[y:y + r.shape[0]] = r
        y += r.shape[0] + pad
    Image.fromarray(grid).save(out_png)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="run/pixelrun")
    args = ap.parse_args()
    out = os.path.abspath(args.out)
    os.makedirs(ASSETS, exist_ok=True)

    with open(os.path.join(out, "pixelrun_state.json")) as f:
        st = json.load(f)

    made = []
    for src, dst in (("samples_base_grid", "base_grid.png"),
                     ("samples_pruned_grid", "pruned_grid.png")):
        if class_grid(os.path.join(out, src), os.path.join(ASSETS, dst)):
            made.append(dst)
    recon = os.path.join(out, "ae_recon.png")
    if os.path.exists(recon):
        shutil.copy(recon, os.path.join(ASSETS, "ae_recon.png"))
        made.append("ae_recon.png")
    print("assets:", ", ".join(made) or "none (sample dirs missing)")

    # ---- results table for docs/PIXELRUN.md ------------------------------
    ev = st.get("eval", {})

    def g(phase, key, fmt="{}"):
        v = st.get(phase, {}).get(key)
        return fmt.format(v) if v is not None else "—"

    print("""
| phase | result | wall |
|---|---|---|
| first stage (vq-f4 55.3M, scratch, 8k steps) | recon PSNR **{psnr} dB** (MSE {mse}) | {ae_s} s |
| LDM base train (39.8M UNetCond, 20k steps) | — | {tr_s} s |
| base CFG DDIM-100 sample+decode (2,048 imgs) | FID_rand vs data **{fidb}** | {bs_s} s |
| diff-prune 0.3 (self-sampled CFG latents) | 39.81M → 21.59M params | {pr_s} s |
| finetune (10k steps) | — | {ft_s} s |
| pruned sample+decode (2,048 imgs) | FID_rand vs data **{fidp}** | {ps_s} s |
| same-seed SSIM base vs pruned | **{ssim}** | |
| class consistency (palette classifier on DECODED PIXELS) | base **{ccb}** / pruned **{ccp}** | |
""".format(
        psnr=g("ae_check", "recon_psnr"),
        mse=g("ae_check", "recon_mse", "{:.2e}"),
        ae_s=g("ae", "secs"), tr_s=g("ldm_train", "secs"),
        bs_s=g("basesample", "secs"), pr_s=g("prune", "secs"),
        ft_s=g("finetune", "secs"), ps_s=g("prunedsample", "secs"),
        fidb=ev.get("fid_base_vs_data", "—"),
        fidp=ev.get("fid_pruned_vs_data", "—"),
        ssim=ev.get("sameseed_ssim", "—"),
        ccb=ev.get("class_acc_base", "—"), ccp=ev.get("class_acc_pruned", "—")))


if __name__ == "__main__":
    main()
