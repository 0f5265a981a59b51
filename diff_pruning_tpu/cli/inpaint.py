"""CLI: latent-diffusion inpainting — the TPU rebuild of
ldm_exp/scripts/inpaint.py (the inpainting_big model: concat-mode
conditioning, VQ-f4-noattn first stage).

For every `example.png` + `example_mask.png` pair in --indir:
encode the masked image with the first stage, concat the nearest-downsampled
mask plane ([-1,1]-scaled, exactly like inpaint.py:29 feeds it), run the
whole DDIM trajectory as one jitted scan, decode, and composite
`(1-mask)*image + mask*prediction` (inpaint.py:88-96).

Model dir layout: unet/ (UNetCondConfig (config.json, params.npz) from
`tools/convert_checkpoints.py compvis` on the inpainting_big checkpoint) +
first_stage/.
"""

from __future__ import annotations

import argparse
import glob
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--indir", type=str, required=True,
                   help="dir with image-mask pairs (x.png + x_mask.png)")
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--model_path", type=str, required=True,
                   help="checkpoint dir (unet/ + first_stage/)")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--method", type=str, default="ddim",
                   choices=["ddim", "plms", "dpm"])
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def load_pair(image_path, mask_path):
    """inpaint.py make_batch: image/mask/masked all scaled to [-1,1]
    (including the binarized mask — kept faithful)."""
    import numpy as np
    from PIL import Image

    image = np.asarray(Image.open(image_path).convert("RGB"),
                       np.float32) / 255.0
    mask = np.asarray(Image.open(mask_path).convert("L"), np.float32) / 255.0
    mask = (mask >= 0.5).astype(np.float32)[..., None]
    masked = (1.0 - mask) * image
    return image * 2 - 1, mask * 2 - 1, masked * 2 - 1


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..models.latent_diffusion import ldm_schedule, make_concat_sampler
    from ..models.unet_cond import UNetCond, UNetCondConfig
    from ..models.vae import AutoencoderConfig, make_first_stage
    from ..utils.checkpoint import load_model

    ucfg, uparams = load_model(args.model_path, "unet",
                               config_cls=UNetCondConfig)
    fcfg, fparams = load_model(args.model_path, "first_stage",
                               config_cls=AutoencoderConfig)
    unet = UNetCond(ucfg)
    fs = make_first_stage(fcfg)
    latent_ch = ucfg.out_channels
    cond_ch = ucfg.in_channels - latent_ch

    # inpainting_big/config.yaml: linear_end 0.0205 (vs 0.0195 elsewhere)
    schedule = ldm_schedule(linear_end=0.0205)
    sampler = make_concat_sampler(unet, uparams, schedule,
                                  ddim_steps=args.steps,
                                  latent_ch=latent_ch, method=args.method)

    @jax.jit
    def make_cond(masked, mask_small):
        # cond_stage is the first stage itself (config.yaml:
        # cond_stage_config: __is_first_stage__); VQModelInterface.encode
        # returns pre-quantization latents
        c = fs.encode(fparams, masked)
        return jnp.concatenate([c, mask_small], axis=-1)

    # decode_first_stage -> VQModelInterface.decode quantizes the sampled
    # latents against the codebook first (ddpm.py:755-756, default
    # force_not_quantize=False) — unlike the LDMPipeline's decode path
    if fcfg.num_vq_embeddings:
        decode = jax.jit(lambda lat: fs.decode(fparams, lat,
                                               force_not_quantize=False))
    else:
        decode = jax.jit(lambda lat: fs.decode(fparams, lat))

    masks = sorted(glob.glob(os.path.join(args.indir, "*_mask.png")))
    images = [m.replace("_mask.png", ".png") for m in masks]
    print(f"Found {len(masks)} inputs.")
    os.makedirs(args.outdir, exist_ok=True)

    key = jax.random.key(args.seed)
    for start in range(0, len(images), args.batch_size):
        ims, msks, mskds = zip(*[load_pair(i, m) for i, m in
                                 zip(images[start:start + args.batch_size],
                                     masks[start:start + args.batch_size])])
        image = jnp.asarray(np.stack(ims))
        mask = jnp.asarray(np.stack(msks))
        masked = jnp.asarray(np.stack(mskds))
        h = image.shape[1] // (2 ** (len(fcfg.block_out_channels) - 1))
        # F.interpolate default mode='nearest' (inpaint.py:77-78)
        stride = mask.shape[1] // h
        mask_small = mask[:, ::stride, ::stride]
        cond = make_cond(masked, mask_small)
        key, sk = jax.random.split(key)
        lat = sampler(sk, cond)
        pred = decode(lat)
        # composite in [0,1] (inpaint.py:88-96)
        img01 = jnp.clip((image + 1) / 2, 0, 1)
        m01 = jnp.clip((mask + 1) / 2, 0, 1)
        pred01 = jnp.clip((pred + 1) / 2, 0, 1)
        out = np.asarray((1 - m01) * img01 + m01 * pred01)
        for b, src in enumerate(images[start:start + args.batch_size]):
            path = os.path.join(args.outdir, os.path.basename(src))
            Image.fromarray((out[b] * 255).astype(np.uint8)).save(path)
            print(f"wrote {path}")


if __name__ == "__main__":
    main()
