"""CLI: text-to-image sampling — port of ldm_exp/scripts/txt2img.py.

Prompt -> WordPiece tokens -> BERTEmbedder context -> CFG DDIM/PLMS over
latents -> first-stage decode -> PNGs + grid. Unconditional guidance uses
the empty-string conditioning exactly like the reference (txt2img.py:133).

Checkpoint layout: model_path/{unet,cond_stage[,first_stage]}/(config.json,
params.npz) from tools/convert_checkpoints.py; --vocab points at the
bert-base-uncased vocab.txt (zero egress: supplied locally).
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompt", type=str,
                   default="a painting of a virus monster playing guitar")
    p.add_argument("--outdir", type=str, default="outputs/txt2img-samples")
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint dir; random init when omitted (smoke)")
    p.add_argument("--vocab", type=str, required=True,
                   help="path to bert-base-uncased vocab.txt")
    p.add_argument("--ddim_steps", type=int, default=200)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--dpm", action="store_true",
                   help="DPM-Solver++(2M) (beyond reference)")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("--H", type=int, default=256)
    p.add_argument("--W", type=int, default=256)
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def load_txt2img(model_path, seed=0):
    """LatentDiffusion with a BERTEmbedder cond stage (+optional KL/VQ
    first stage) from the (config.json, params.npz) layout."""
    import jax

    from ..models.latent_diffusion import LatentDiffusion
    from ..models.text_encoder import BERTEmbedder, BERTEmbedderConfig, bert_txt2img_config
    from ..models.unet_cond import UNetCondConfig, txt2img_1p4B_config
    from ..utils.checkpoint import load_params_npz

    if model_path and os.path.exists(os.path.join(model_path, "unet", "config.json")):
        with open(os.path.join(model_path, "unet", "config.json")) as f:
            ucfg = UNetCondConfig.from_json(f.read())
        with open(os.path.join(model_path, "cond_stage", "config.json")) as f:
            bcfg = BERTEmbedderConfig.from_json(f.read())
    else:
        ucfg, bcfg = txt2img_1p4B_config(), bert_txt2img_config()
    enc = BERTEmbedder(bcfg)
    ldm = LatentDiffusion(ucfg, cond_stage=enc,
                          linear_start=0.00085, linear_end=0.012,
                          scale_factor=0.18215)  # txt2img-1p4B-eval.yaml
    if model_path:
        params = {
            "unet": load_params_npz(os.path.join(model_path, "unet", "params.npz")),
            "cond_stage": load_params_npz(
                os.path.join(model_path, "cond_stage", "params.npz")),
        }
        fs = os.path.join(model_path, "first_stage", "params.npz")
        if os.path.exists(fs):
            from ..models.vae import AutoencoderConfig, AutoencoderKL

            with open(os.path.join(model_path, "first_stage", "config.json")) as f:
                vcfg = AutoencoderConfig.from_json(f.read())
            ldm.first_stage = AutoencoderKL(vcfg)
            params["first_stage"] = load_params_npz(fs)
    else:
        params = ldm.init(jax.random.key(seed))
    return ldm, enc, params


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.tokenizer import BERTTokenizer
    from ..sampling.ddim_sampler import save_image_grid, save_images

    ldm, enc, params = load_txt2img(args.model_path, args.seed)
    tok = BERTTokenizer(args.vocab, max_length=enc.cfg.max_seq_len)
    if tok.vocab_size > enc.cfg.vocab_size:
        # jnp.take fills out-of-bounds with NaN — a mismatched vocab would
        # produce silent all-NaN samples (CLAUDE.md gotcha)
        raise SystemExit(f"vocab file has {tok.vocab_size} tokens but the "
                         f"text encoder embeds {enc.cfg.vocab_size}")
    sampler = ldm.make_cfg_sampler(
        params, ddim_steps=args.ddim_steps, guidance_scale=args.scale,
        # f8 latents like the reference (txt2img.py:141: H//8 x W//8)
        eta=args.ddim_eta, latent_hw=(args.H // 8, args.W // 8),
        latent_ch=ldm.unet.cfg.in_channels,
        method="dpm" if args.dpm else ("plms" if args.plms else "ddim"),
        uncond_input=tok([""]))
    if ldm.first_stage is not None:
        decode = jax.jit(lambda p, z: ldm.decode_first_stage(p, z))
    else:
        decode = jax.jit(lambda p, z: jnp.clip(z * 0.5 + 0.5, 0.0, 1.0))

    os.makedirs(args.outdir, exist_ok=True)
    tokens = jnp.asarray(np.repeat(tok([args.prompt]), args.n_samples, axis=0))
    key = jax.random.key(args.seed)
    all_imgs = []
    for it in range(args.n_iter):
        key, k = jax.random.split(key)
        lat = sampler(k, tokens, args.n_samples)
        imgs = np.asarray(decode(params, lat))
        save_images(imgs, os.path.join(args.outdir, "samples"),
                    start_index=it * args.n_samples)
        all_imgs.append(imgs)
    grid = np.concatenate(all_imgs, axis=0)
    save_image_grid(grid, os.path.join(args.outdir, "grid.png"),
                    nrow=args.n_samples)
    print(f"wrote {len(grid)} samples for {args.prompt!r} to {args.outdir}")


if __name__ == "__main__":
    main()
