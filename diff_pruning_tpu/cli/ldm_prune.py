"""CLI: prune a class-conditional latent-diffusion UNet — port of
ldm_exp/prune_ldm.py (cin256-v2 workflow).

Workflow (prune_ldm.py:104-141): for t in 0..999, sample a batch of latents
from the CURRENT model via CFG DDIM (20 steps, scale 3.0), compute the
latent-space loss at timestep t for random classes, accumulate grads, stop
when loss/max_loss < thr (0.1); then prune with head-consistent attention
grouping (structural here) and round_to=2, ignoring the output conv.

Checkpoints are (config.json, params.npz); `--model_path` may point to a
converted CompVis checkpoint (tools/convert_ldm.py) or be omitted to run on
a random-init model (architecture smoke path).
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, default=None,
                   help="LatentDiffusion checkpoint dir; random init if absent")
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--sparsity", type=float, default=0.3)
    p.add_argument("--pruner", type=str, default="diff-pruning",
                   choices=["magnitude", "random", "taylor", "diff-pruning",
                            "reinit", "diff0"])
    p.add_argument("--thr", type=float, default=0.1)
    p.add_argument("--batch_size", type=int, default=6,
                   help="n_samples_per_class (prune_ldm.py:47)")
    p.add_argument("--ddim_steps", type=int, default=20)
    p.add_argument("--method", type=str, default="ddim",
                   choices=["ddim", "plms", "dpm"],
                   help="self-sampled-latents solver; 'dpm' reaches the "
                        "same trajectory fidelity in ~4x fewer steps "
                        "(tools/dpm_timing.py)")
    p.add_argument("--scale", type=float, default=3.0, help="CFG guidance scale")
    p.add_argument("--round_to", type=int, default=2)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--classes", type=int, nargs="*", default=[25, 187, 448, 992])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_vis", action="store_true")
    p.add_argument("--config", type=str, default=None,
                   help="UNetCond config JSON (default: cin256-v2)")
    return p.parse_args(argv)


def write_ldm_meta(model_path, ldm) -> None:
    """Persist the LDM-level hyperparameters next to unet/ + cond_stage/.

    Without this, load_ldm would rebuild every checkpoint with the cin256-v2
    defaults (n_classes=1001, scale_factor=1.0) — a checkpoint trained with
    a different class count then samples the uncond row out of bounds, and
    jnp.take's OOB fill is NaN, not an error (CLAUDE.md; the scratch LDM
    pipeline in tools/pixelrun.py trains with single-digit class counts)."""
    import json

    with open(os.path.join(model_path, "ldm.json"), "w") as f:
        json.dump({"n_classes": ldm.n_classes,
                   "scale_factor": ldm.scale_factor,
                   "num_train_timesteps": ldm.schedule.num_train_timesteps,
                   "linear_start": ldm.linear_start,
                   "linear_end": ldm.linear_end}, f, indent=2)


def load_ldm(model_path, config_path, seed=0):
    import json

    import jax

    from ..models.latent_diffusion import LatentDiffusion
    from ..models.unet_cond import UNetCondConfig, cin256_v2_config
    from ..utils.checkpoint import load_params_npz

    if config_path:
        with open(config_path) as f:
            ucfg = UNetCondConfig.from_json(f.read())
    elif model_path and os.path.exists(os.path.join(model_path, "unet", "config.json")):
        with open(os.path.join(model_path, "unet", "config.json")) as f:
            ucfg = UNetCondConfig.from_json(f.read())
    else:
        ucfg = cin256_v2_config()

    meta = {}
    if model_path and os.path.exists(os.path.join(model_path, "ldm.json")):
        with open(os.path.join(model_path, "ldm.json")) as f:
            meta = json.load(f)

    params = first_stage = None
    if model_path:
        params = {
            "unet": load_params_npz(os.path.join(model_path, "unet", "params.npz")),
            "cond_stage": load_params_npz(
                os.path.join(model_path, "cond_stage", "params.npz")),
        }
        fs = os.path.join(model_path, "first_stage", "params.npz")
        if os.path.exists(fs):
            from ..models.vae import AutoencoderConfig, make_first_stage

            with open(os.path.join(model_path, "first_stage", "config.json")) as f:
                vcfg = AutoencoderConfig.from_json(f.read())
            first_stage = make_first_stage(vcfg)
            params["first_stage"] = load_params_npz(fs)
        # checkpoints without ldm.json (pre-r5): the embedding table's row
        # count IS n_classes (ClassEmbedder init) — never trust the 1001
        # default against loaded weights
        if "n_classes" not in meta:
            emb = params["cond_stage"].get("embedding")
            if emb is not None:
                meta["n_classes"] = int(emb["weight"].shape[0])

    ldm = LatentDiffusion(
        ucfg, n_classes=int(meta.get("n_classes", 1001)),
        first_stage=first_stage,
        scale_factor=float(meta.get("scale_factor", 1.0)),
        num_train_timesteps=int(meta.get("num_train_timesteps", 1000)),
        linear_start=float(meta.get("linear_start", 0.0015)),
        linear_end=float(meta.get("linear_end", 0.0195)))
    if params is None:
        # init on the host CPU backend: a cold on-chip init program is its
        # own multi-minute remote compile at 400M scale (CLAUDE.md), then
        # move the whole tree in one batched transfer
        with jax.default_device(jax.devices("cpu")[0]):
            params = ldm.init(jax.random.key(seed))
        params = jax.device_put(params, jax.devices()[0])
    return ldm, params


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..pruning.flops import count_ops_and_params, count_params
    from ..pruning.importance import make_importance
    from ..pruning.pruner import apply_pruning, prune
    from ..utils.checkpoint import save_model, save_params_npz

    ldm, params = load_ldm(args.model_path, args.config, args.seed)
    ucfg = ldm.unet.cfg
    graph = ldm.unet.graph
    graph.validate(params["unet"])
    hw, ch = ucfg.image_size, ucfg.in_channels
    base_params = count_params(params["unet"])

    grads = None
    if args.pruner in ("taylor", "diff-pruning", "diff0"):
        sampler = ldm.make_cfg_sampler(
            params, ddim_steps=args.ddim_steps, guidance_scale=args.scale,
            method=args.method,
            latent_hw=hw, latent_ch=ch)
        grad_fn = jax.jit(jax.value_and_grad(
            lambda up, lat, lab, t, n: ldm.get_loss_at_t(
                {**params, "unet": up}, lat, lab, t, n)))
        grads = jax.tree.map(jnp.zeros_like, params["unet"])
        # one dispatch per accumulate: an eager tree.map(jnp.add) is ~700
        # separate ops per step — seconds of per-op latency on this tunnel
        acc_fn = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))
        key = jax.random.key(args.seed)
        max_loss = -1.0
        thr = args.thr if args.pruner == "diff-pruning" else 0.0
        print("Accumulating gradients from self-sampled latents...")
        t0 = time.time()
        for t in range(args.max_steps):
            key, k1, k2, k3 = jax.random.split(key, 4)
            labels = jax.random.randint(k1, (args.batch_size,), 0, ldm.n_classes - 1)
            latents = sampler(k2, labels, args.batch_size)
            noise = jax.random.normal(k3, latents.shape)
            tb = jnp.full((args.batch_size,), t, jnp.int32)
            loss, g = grad_fn(params["unet"], latents, labels, tb, noise)
            loss = float(loss)
            max_loss = max(max_loss, loss)
            if args.pruner in ("diff-pruning", "diff0") and loss / max_loss < thr:
                break
            # reference order (prune_ldm.py:123-131): the breaking step's
            # grads are NOT accumulated (backward comes after the break check)
            grads = acc_fn(grads, g)
            if t % 20 == 0:
                print(f"  t={t} loss={loss:.5f} ratio={loss/max_loss:.3f}")
        print(f"  sweep: {t+1} steps in {time.time()-t0:.1f}s")

    imp = make_importance(args.pruner if args.pruner != "diff0" else "diff-pruning",
                          seed=args.seed)
    result = prune(graph, params["unet"], imp, sparsity=args.sparsity,
                   grads=grads, round_to=args.round_to)
    new_unet = apply_pruning(params["unet"], graph, result)
    new_ucfg = ucfg.with_channel_sizes(result.channel_sizes)

    from ..models.latent_diffusion import LatentDiffusion

    ldm2 = LatentDiffusion(new_ucfg, n_classes=ldm.n_classes,
                           first_stage=ldm.first_stage,
                           scale_factor=ldm.scale_factor,
                           num_train_timesteps=ldm.schedule.num_train_timesteps,
                           linear_start=ldm.linear_start,
                           linear_end=ldm.linear_end)
    ldm2.graph = ldm2.unet.graph
    ldm2.unet.graph.validate(new_unet)
    params2 = {**params, "unet": new_unet}
    if args.pruner == "reinit":
        params2["unet"] = ldm2.unet.init(jax.random.key(args.seed))

    n_params = count_params(params2["unet"])
    print(f"Params: {n_params/base_params*100:.2f}%, "
          f"{base_params/1e6:.2f}M => {n_params/1e6:.2f}M")

    os.makedirs(os.path.join(args.save_path, "cond_stage"), exist_ok=True)
    save_model(args.save_path, new_ucfg, params2["unet"], subfolder="unet")
    save_params_npz(os.path.join(args.save_path, "cond_stage", "params.npz"),
                    params2["cond_stage"])
    if ldm.first_stage is not None:
        # carry the (frozen, unpruned) codec through: the reference's
        # finetune step needs it to encode images (ldm_exp/main.py:533-566),
        # so a pruned artifact without it cannot be trained
        save_model(args.save_path, ldm.first_stage.cfg,
                   params2["first_stage"], subfolder="first_stage")
    write_ldm_meta(args.save_path, ldm2)
    print(f"Saved pruned LDM to {args.save_path}")

    if not args.skip_vis:
        from ..sampling.ddim_sampler import save_image_grid

        sampler2 = ldm2.make_cfg_sampler(
            params2, ddim_steps=args.ddim_steps, guidance_scale=args.scale,
            latent_hw=hw, latent_ch=ch)
        rows = []
        for cls in args.classes:
            labels = jnp.full((args.batch_size,), cls, jnp.int32)
            lat = sampler2(jax.random.key(cls), labels, args.batch_size)
            if ldm.first_stage is not None:
                rows.append(np.asarray(ldm2.decode_first_stage(params2, lat)))
            else:
                rows.append(np.clip(np.asarray(lat) * 0.5 + 0.5, 0, 1))
        imgs = np.concatenate(rows, axis=0)
        save_image_grid(imgs, os.path.join(args.save_path, "samples.png"),
                        nrow=args.batch_size)
        print("Wrote samples.png")


if __name__ == "__main__":
    main()
