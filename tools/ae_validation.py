#!/usr/bin/env python
"""Behavioral validation of the first-stage GAN training subsystem
(training/autoencoder.py + cli/autoencoder_train.py) on procedural data —
same method as tools/e2e_validation.py: no external weights exist in this
environment, so demonstrate the training dynamics the reference's
autoencoder recipe exhibits (reconstruction loss falling, codebook usage,
discriminator engaging after disc_start, visibly faithful reconstructions).

Drives the REAL cli.autoencoder_train (chunked dispatch, checkpoints,
metrics.jsonl) end-to-end on one chip, then renders input-vs-reconstruction
grids from the initial and trained params.

  python tools/ae_validation.py --steps 1500 --out /tmp/ae_val
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.e2e_validation import make_procedural_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--out", type=str, default="/tmp/ae_val")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--disc_start", type=int, default=500)
    ap.add_argument("--dispatch", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from diff_pruning_tpu.cli.autoencoder_train import main as train_main
    from diff_pruning_tpu.models.vae import AutoencoderConfig, VQModel
    from diff_pruning_tpu.utils.checkpoint import (load_params_npz,
                                                   save_params_npz)

    imgs_dir = os.path.join(args.out, "imgs")
    os.makedirs(imgs_dir, exist_ok=True)
    data = make_procedural_dataset(2048, 32)
    for i, im in enumerate(data):
        Image.fromarray(im, "RGB").save(os.path.join(imgs_dir, f"{i:05}.png"))

    # a mid-sized VQ codec (not the 55M vq-f4 — the dynamics, not the scale,
    # are under test; scale timing lives in docs/PERF.md)
    cfg = AutoencoderConfig(block_out_channels=(32, 64), layers_per_block=1,
                            latent_channels=4, norm_num_groups=16,
                            num_vq_embeddings=256, mid_block_attention=False,
                            sample_size=32)
    model = VQModel(cfg)
    init_params = model.init(jax.random.key(0))
    seed_dir = os.path.join(args.out, "seed", "first_stage")
    os.makedirs(seed_dir, exist_ok=True)
    with open(os.path.join(seed_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    save_params_npz(os.path.join(seed_dir, "params.npz"), init_params)

    run_dir = os.path.join(args.out, "run")
    train_main(["--model_path", os.path.join(args.out, "seed"),
                "--dataset", imgs_dir, "--resolution", "32",
                "--output_dir", run_dir,
                "--train_batch_size", str(args.batch_size),
                "--num_iters", str(args.steps),
                "--steps_per_dispatch", str(args.dispatch),
                "--disc_start", str(args.disc_start),
                "--log_steps", str(args.dispatch * 2),
                "--save_model_steps", str(args.steps),
                "--lpips", "random", "--base_learning_rate", "1e-5"])

    trained = load_params_npz(os.path.join(run_dir, "first_stage",
                                           "params.npz"))
    x = jnp.asarray(data[:8].astype(np.float32) / 127.5 - 1.0)

    def recon_grid(params, path):
        z = model.encode(params, x)
        zq, _, _ = model.quantize_train(params, z)
        r = np.asarray(model.decode(params, zq))
        top = np.concatenate(list(np.asarray((x + 1) / 2)), axis=1)
        bot = np.concatenate(list(np.clip((r + 1) / 2, 0, 1)), axis=1)
        grid = (np.concatenate([top, bot], axis=0) * 255).astype(np.uint8)
        Image.fromarray(grid, "RGB").save(path)
        return float(np.mean(np.abs(np.asarray(model.decode(params, zq)) - np.asarray(x))))

    os.makedirs(os.path.join(args.out, "grids"), exist_ok=True)
    l1_init = recon_grid(init_params, os.path.join(args.out, "grids",
                                                   "recon_init.png"))
    l1_trained = recon_grid(trained, os.path.join(args.out, "grids",
                                                  "recon_trained.png"))
    metrics = [json.loads(l) for l in
               open(os.path.join(run_dir, "metrics.jsonl"))]
    print(json.dumps({
        "steps": args.steps,
        "rec_loss_first": metrics[0]["rec_loss"],
        "rec_loss_last": metrics[-1]["rec_loss"],
        "perplexity_last": metrics[-1].get("perplexity"),
        "disc_loss_last": metrics[-1].get("disc_loss"),
        "l1_recon_init": round(l1_init, 4),
        "l1_recon_trained": round(l1_trained, 4),
    }))


if __name__ == "__main__":
    main()
