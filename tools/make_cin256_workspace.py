#!/usr/bin/env python
"""Materialize a cin256-v2 workspace for the on-chip 400M workflow
(VERDICT r3 next #3): a random-init checkpoint dir WITH a vq-f4 first
stage (zero egress: no real weights exist here — every 400M experiment
this framework runs is on random-init weights, same as rounds 1-3), plus
a small class-labeled procedural image-folder dataset for the finetune
leg (ldm_exp/main.py:533-566's ImageNet stand-in).

Runs entirely on the host CPU backend (CLAUDE.md: NEVER init big models
on the chip — a cold remote compile of the init program costs minutes).

Usage: python tools/make_cin256_workspace.py <out_dir> [n_classes] [per_class]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    out = sys.argv[1]
    n_classes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    per_class = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
    from diff_pruning_tpu.models.unet_cond import cin256_v2_config
    from diff_pruning_tpu.models.vae import VQModel, first_stage_config
    from diff_pruning_tpu.utils.checkpoint import save_model, save_params_npz

    mdir = os.path.join(out, "model")
    ucfg = cin256_v2_config()
    ldm = LatentDiffusion(ucfg)
    params = ldm.init(jax.random.key(0))
    save_model(mdir, ucfg, params["unet"], subfolder="unet")
    os.makedirs(os.path.join(mdir, "cond_stage"), exist_ok=True)
    save_params_npz(os.path.join(mdir, "cond_stage", "params.npz"),
                    params["cond_stage"])
    vcfg = first_stage_config("vq-f4")  # cin256-v2's codec family (f=4)
    vq = VQModel(vcfg)
    save_model(mdir, vcfg, vq.init(jax.random.key(1)),
               subfolder="first_stage")
    print(f"wrote {mdir} (unet {ucfg.image_size=} + cond_stage + vq-f4)")

    from PIL import Image

    from diff_pruning_tpu.data.procedural import make_procedural_dataset

    ddir = os.path.join(out, "data")
    imgs = make_procedural_dataset(n=n_classes * per_class, hw=256, seed=0)
    # map [-1,1] float (or uint8 — handle both) to uint8
    if imgs.dtype != np.uint8:
        imgs = np.clip((imgs + 1.0) * 127.5, 0, 255).astype(np.uint8)
    i = 0
    for c in range(n_classes):
        cdir = os.path.join(ddir, f"class_{c:03d}")
        os.makedirs(cdir, exist_ok=True)
        for k in range(per_class):
            Image.fromarray(imgs[i]).save(os.path.join(cdir, f"{k:04d}.png"))
            i += 1
    print(f"wrote {ddir}: {n_classes} classes x {per_class} images @256^2")


if __name__ == "__main__":
    main()
