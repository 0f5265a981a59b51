"""CLI: unconditional LDM sampling — ldm_exp/scripts/sample_diffusion.py
(the celeba256 / ffhq256 / lsun_{beds,churches}256 model dirs: DDIM with
eta, or --vanilla full-chain DDPM, then first-stage decode).

The whole latent trajectory is one jitted scan (make_concat_sampler with a
zero-channel conditioning block — unconditional is the concat path's empty
case, and unlike the pixel samplers it never clips latents). Decode
quantizes for VQ first stages like LatentDiffusion.decode_first_stage.

Model dir: unet/ (UNetCondConfig with context_dim=None) + first_stage/
from `tools/convert_checkpoints.py compvis/first-stage`.
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--logdir", type=str, required=True)
    p.add_argument("--n_samples", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--custom_steps", "-c", type=int, default=250)
    p.add_argument("--eta", "-e", type=float, default=1.0)
    p.add_argument("--vanilla_sample", action="store_true",
                   help="full-chain DDPM instead of DDIM")
    p.add_argument("--scale_factor", type=float, default=1.0,
                   help="latent scaling (1.0 for the unconditional zoo)")
    p.add_argument("--seed", type=int, default=0)
    from ..utils.tpu_flags import add_scoped_vmem_arg

    add_scoped_vmem_arg(p)
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache
    from ..utils.tpu_flags import set_scoped_vmem_limit

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    set_scoped_vmem_limit(args.scoped_vmem_kib)  # before first device access
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..models.latent_diffusion import ldm_schedule
    from ..models.unet_cond import UNetCond, UNetCondConfig
    from ..models.vae import AutoencoderConfig, make_first_stage
    from ..schedulers.ddim import ddim_prev_timesteps, ddim_step, ddpm_step
    from ..utils.checkpoint import load_model

    ucfg, uparams = load_model(args.model_path, "unet",
                               config_cls=UNetCondConfig)
    fcfg, fparams = load_model(args.model_path, "first_stage",
                               config_cls=AutoencoderConfig)
    unet = UNetCond(ucfg)
    fs = make_first_stage(fcfg)
    hw, ch = ucfg.image_size, ucfg.in_channels

    schedule = ldm_schedule()
    if args.vanilla_sample:
        # DDPM over every timestep (sample_diffusion.py convsample)
        ts = np.arange(schedule.num_train_timesteps)[::-1].copy()
        prev = ddim_prev_timesteps(ts)
        ts_j = jnp.asarray(ts, jnp.int32)
        prev_j = jnp.asarray(prev, jnp.int32)

        @jax.jit
        def sample_latents(key):
            key, ik = jax.random.split(key)
            x = jax.random.normal(ik, (args.batch_size, hw, hw, ch))

            def step(carry, inp):
                x, key = carry
                t, tp = inp
                key, nk = jax.random.split(key)
                eps = unet(uparams, x, jnp.full((args.batch_size,), t,
                                                jnp.int32))
                z = jax.random.normal(nk, x.shape)
                return (ddpm_step(schedule, x, eps, t, tp, z), key), None

            (x, _), _ = jax.lax.scan(step, (x, key), (ts_j, prev_j))
            return x
    else:
        from ..models.latent_diffusion import make_concat_sampler

        concat = make_concat_sampler(unet, uparams, schedule,
                                     ddim_steps=args.custom_steps,
                                     eta=args.eta, latent_ch=ch)
        empty = jnp.zeros((args.batch_size, hw, hw, 0))
        sample_latents = lambda key: concat(key, empty)

    if fcfg.num_vq_embeddings:
        decode = jax.jit(lambda lat: fs.decode(
            fparams, lat / args.scale_factor, force_not_quantize=False))
    else:
        decode = jax.jit(lambda lat: fs.decode(fparams,
                                               lat / args.scale_factor))

    os.makedirs(os.path.join(args.logdir, "img"), exist_ok=True)
    key = jax.random.key(args.seed)
    n = 0
    t0 = time.time()
    while n < args.n_samples:
        key, sk = jax.random.split(key)
        imgs = np.asarray(jnp.clip((decode(sample_latents(sk)) + 1) / 2, 0, 1))
        for b in range(imgs.shape[0]):
            if n >= args.n_samples:
                break
            Image.fromarray((imgs[b] * 255).astype(np.uint8)).save(
                os.path.join(args.logdir, "img", f"{n:06}.png"))
            n += 1
        print(f"{n}/{args.n_samples} ({n / (time.time() - t0):.2f} imgs/s)")


if __name__ == "__main__":
    main()
