"""CLI: train a first-stage autoencoder (VQ or KL) with the reference's
LPIPS + PatchGAN objective — the TPU equivalent of running ldm_exp/main.py
on a configs/autoencoder/*.yaml / models/first_stage_models/*/config.yaml
target (Lightning two-optimizer loop, ldm/models/autoencoder.py:142-162).

Both optimizer passes are fused into one jitted dispatch (several per
dispatch with --steps_per_dispatch); LPIPS weights come from
`tools/convert_checkpoints.py lpips` (or --lpips random for a weightless
perceptual prior, or --lpips off to disable).

The reference's learning-rate convention (ldm_exp/main.py:697-706):
lr = base_lr * batch_size (accumulate/ngpu factors fold into batch here).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", type=str, default=None,
                   help="first-stage preset (kl-f4/kl-f8/kl-f16/kl-f32/"
                        "vq-f4/vq-f4-noattn/vq-f8/vq-f8-n256/vq-f16)")
    p.add_argument("--model_path", type=str, default=None,
                   help="resume/finetune from a converted first_stage dir "
                        "(config.json + params.npz) instead of --preset")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--train_batch_size", type=int, default=12)  # autoencoder_kl yamls
    p.add_argument("--num_iters", type=int, default=100_000)
    p.add_argument("--base_learning_rate", type=float, default=4.5e-6)
    p.add_argument("--lr_g_factor", type=float, default=1.0)
    p.add_argument("--disc_start", type=int, default=50_001)
    p.add_argument("--disc_weight", type=float, default=0.5)
    p.add_argument("--disc_num_layers", type=int, default=3)
    p.add_argument("--disc_loss", type=str, default="hinge",
                   choices=["hinge", "vanilla"])
    p.add_argument("--kl_weight", type=float, default=1e-6)
    p.add_argument("--codebook_weight", type=float, default=1.0)
    p.add_argument("--perceptual_weight", type=float, default=1.0)
    p.add_argument("--pixel_loss", type=str, default="l1", choices=["l1", "l2"])
    p.add_argument("--lpips", type=str, default="random",
                   help="'off', 'random', or a converted lpips params .npz")
    p.add_argument("--mixed_precision", type=str, default="no",
                   choices=["no", "bf16"])
    p.add_argument("--steps_per_dispatch", type=int, default=8)
    p.add_argument("--save_model_steps", type=int, default=2000)
    p.add_argument("--log_steps", type=int, default=100)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.datasets import get_dataset, iterate_batches
    from ..eval.lpips import init_lpips_params, load_lpips_params
    from ..models.discriminator import NLayerDiscriminator
    from ..models.vae import (AutoencoderConfig, first_stage_config,
                              make_first_stage)
    from ..training.autoencoder import (AETrainState, GANLossConfig,
                                        init_ae_train_state,
                                        make_ae_optimizers,
                                        make_autoencoder_train_step)
    from ..utils.checkpoint import load_params_npz, save_params_npz
    from ..utils.runlog import archive_command, chunk_for_intervals
    from ..utils.tensorboard import SummaryWriter

    # init on the host CPU backend, then move in one batched transfer: a
    # cold on-chip init of the 55M vq-f4 is its own multi-minute remote
    # compile (CLAUDE.md) — it hung the r5 pixelrun smoke for 30+ minutes
    dev0 = jax.devices()[0]
    if args.model_path:
        with open(os.path.join(args.model_path, "first_stage", "config.json")) as f:
            cfg = AutoencoderConfig.from_json(f.read())
        model = make_first_stage(cfg)
        gen_params = load_params_npz(
            os.path.join(args.model_path, "first_stage", "params.npz"))
    elif args.preset:
        cfg = first_stage_config(args.preset)
        if args.resolution != cfg.sample_size:
            import dataclasses

            cfg = dataclasses.replace(cfg, sample_size=args.resolution)
        model = make_first_stage(cfg)
        with jax.default_device(jax.devices("cpu")[0]):
            gen_params = model.init(jax.random.key(args.seed))
        gen_params = jax.device_put(gen_params, dev0)
    else:
        raise SystemExit("need --preset or --model_path")

    if args.lpips == "off":
        lpips_params, pw = None, 0.0
    elif args.lpips == "random":
        with jax.default_device(jax.devices("cpu")[0]):
            lpips_params = init_lpips_params(jax.random.key(7))
        lpips_params, pw = (jax.device_put(lpips_params, dev0),
                            args.perceptual_weight)
    else:
        lpips_params, pw = load_lpips_params(args.lpips), args.perceptual_weight

    disc = NLayerDiscriminator(input_nc=cfg.in_channels,
                               n_layers=args.disc_num_layers)
    if args.resolution < disc.min_input_size:
        raise SystemExit(
            f"--resolution {args.resolution} is below the "
            f"{args.disc_num_layers}-layer PatchGAN's minimum "
            f"({disc.min_input_size}) — pass a smaller --disc_num_layers")
    loss_cfg = GANLossConfig(
        disc_start=args.disc_start, kl_weight=args.kl_weight,
        codebook_weight=args.codebook_weight, disc_weight=args.disc_weight,
        perceptual_weight=pw, disc_loss=args.disc_loss,
        pixel_loss=args.pixel_loss)
    lr = args.base_learning_rate * args.train_batch_size
    gen_tx, disc_tx = make_ae_optimizers(lr, args.lr_g_factor)
    step_fn = make_autoencoder_train_step(model, loss_cfg, lpips_params, disc,
                                          gen_tx, disc_tx,
                                          mixed_precision=args.mixed_precision,
                                          jit=False)
    chunk = chunk_for_intervals(args.steps_per_dispatch,
                                args.save_model_steps, args.log_steps)

    @jax.jit
    def chunk_step(state: AETrainState, batches, key):
        def body(st, inp):
            i, x = inp
            st, m = step_fn(st, x, jax.random.fold_in(key, i))
            return st, m

        state, ms = jax.lax.scan(body, state,
                                 (jnp.arange(batches.shape[0]), batches))
        return state, jax.tree.map(lambda a: a[-1], ms)

    with jax.default_device(jax.devices("cpu")[0]):
        disc_params = disc.init(jax.random.key(args.seed + 1))
    state = init_ae_train_state(gen_params,
                                jax.device_put(disc_params, dev0),
                                gen_tx, disc_tx)
    start_step = 0
    if args.resume_from_checkpoint:
        from ..utils.checkpoint import load_train_state, restore_opt_state

        d = args.resume_from_checkpoint
        # gen is saved LAST (service_save), so its LATEST is the pair's
        # commit point; the disc is loaded at that same step explicitly —
        # a kill between the two saves must not resume a G/D pair from
        # different steps (the mismatch would spike the G/D balance)
        gmeta, gen_p, _ = load_train_state(os.path.join(d, "gen"))
        start_step = int(gmeta["step"])
        _, disc_p, _ = load_train_state(os.path.join(d, "disc"),
                                        step=start_step)
        gen_opt, g_ok = restore_opt_state(os.path.join(d, "gen"),
                                          gen_tx.init(gen_p))
        disc_opt, d_ok = restore_opt_state(os.path.join(d, "disc"),
                                           disc_tx.init(disc_p),
                                           step=start_step)
        state = AETrainState(gen_p, disc_p, gen_opt, disc_opt,
                             jnp.asarray(start_step, jnp.int32))
        print(f"resumed from step {start_step} (optimizers "
              f"{'restored' if g_ok and d_ok else 'RE-INITIALIZED'})")

    ds = get_dataset(args.dataset, resolution=args.resolution)
    print(f"dataset: {len(ds)} images at {args.resolution}")
    batches = iterate_batches(ds, args.train_batch_size, seed=args.seed,
                              skip_batches=start_step)

    os.makedirs(args.output_dir, exist_ok=True)
    archive_command(args.output_dir, "diff_pruning_tpu.cli.autoencoder_train",
                    argv)
    log = open(os.path.join(args.output_dir, "metrics.jsonl"), "a")
    tb = SummaryWriter(os.path.join(args.output_dir, "logs"))
    base_key = jax.random.key(args.seed + 2)

    def service_save(host, at_step):
        from ..utils.checkpoint import save_train_state

        gen_params, gen_opt, disc_params, disc_opt = host
        d = os.path.join(args.output_dir, "first_stage")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "config.json"), "w") as f:
            f.write(cfg.to_json())
        save_params_npz(os.path.join(d, "params.npz"), gen_params)
        ck = os.path.join(args.output_dir, "ckpt")
        # both optimizers' Adam moments persist (keypath-matched restore
        # — re-initializing them would spike the G/D balance on resume).
        # disc commits FIRST: resume reads gen's LATEST step and loads the
        # disc at that exact version, so a kill between the two saves can
        # never splice G/D states from different steps.
        save_train_state(os.path.join(ck, "disc"), step=at_step,
                         params=disc_params, opt_state=disc_opt,
                         extra_meta={"seed": args.seed})
        save_train_state(os.path.join(ck, "gen"), step=at_step,
                         params=gen_params, opt_state=gen_opt,
                         extra_meta={"seed": args.seed})
        print(f"saved at step {at_step}", flush=True)

    t0, n0 = time.time(), start_step
    pending_save = None  # host snapshot; disk writes overlap the next chunk
    for step0 in range(start_step, args.num_iters, chunk):
        xs = jnp.asarray(np.stack([next(batches) for _ in range(chunk)]))
        state, m = chunk_step(state, xs, jax.random.fold_in(base_key, step0))
        if pending_save is not None:
            service_save(*pending_save)
            pending_save = None
        step = step0 + chunk
        if step % args.log_steps == 0:
            rec = {"step": step,
                   **{k: round(float(v), 5) for k, v in m.items()},
                   "imgs_per_sec": round((step - n0) * args.train_batch_size
                                         / (time.time() - t0), 1)}
            t0, n0 = time.time(), step
            print(rec)
            log.write(json.dumps(rec) + "\n")
            log.flush()
            for k in ("total_loss", "rec_loss", "disc_loss", "d_weight"):
                if k in rec:
                    tb.add_scalar(f"train/{k}", rec[k], step)
            tb.flush()
        if step % args.save_model_steps == 0 or step >= args.num_iters:
            pending_save = (jax.device_get(
                (state.gen_params, state.gen_opt,
                 state.disc_params, state.disc_opt)), step)
    if pending_save is not None:
        service_save(*pending_save)
    log.close()
    tb.close()


if __name__ == "__main__":
    main()
