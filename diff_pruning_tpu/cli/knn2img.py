"""CLI: retrieval-augmented text-to-image sampling — the TPU rebuild of
ldm_exp/scripts/knn2img.py over the RDM (rdm768x768) model.

Prompt -> CLIP text embedding (normalized, (B,1,768)) -> optionally append
the k nearest CLIP image embeddings from a retrieval database -> CFG
DDIM/PLMS over 48x48x16 KL-f16 latents (uncond = zero context,
knn2img.py:361-363) -> decode -> samples/ PNGs + a grid.

Model dir layout: unet/ (rdm768 UNetCond) + first_stage/ (kl-f16) + clip/
(converted CLIP, `tools/convert_checkpoints.py clip`); --bpe points at a
local bpe_simple_vocab_16e6 merges file.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompt", type=str,
                   default="a painting of a virus monster playing guitar")
    p.add_argument("--from-file", dest="from_file", type=str, default=None)
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--clip_path", type=str, default=None,
                   help="defaults to <model_path>/clip; 'random' for smoke")
    p.add_argument("--bpe", type=str, required=True,
                   help="local CLIP merges file (bpe_simple_vocab_16e6)")
    p.add_argument("--database", type=str, default=None,
                   help="searcher dir (cli.train_searcher output)")
    p.add_argument("--use_neighbors", action="store_true")
    p.add_argument("--knn", type=int, default=10)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--dpm", action="store_true",
                   help="DPM-Solver++(2M) (beyond reference)")
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--n_samples", type=int, default=2)
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("--H", type=int, default=768)
    p.add_argument("--W", type=int, default=768)
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--skip_grid", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..data.clip_tokenizer import CLIPTokenizer
    from ..models.clip import clip_text_embed
    from ..models.latent_diffusion import IdentityCondStage, LatentDiffusion
    from ..models.unet_cond import UNetCondConfig
    from ..models.vae import AutoencoderConfig, make_first_stage
    from ..utils.checkpoint import load_model
    from .train_searcher import load_clip

    ucfg, uparams = load_model(args.model_path, "unet",
                               config_cls=UNetCondConfig)
    fcfg, fparams = load_model(args.model_path, "first_stage",
                               config_cls=AutoencoderConfig)
    clip_path = args.clip_path or os.path.join(args.model_path, "clip")
    if args.clip_path is None and not os.path.isdir(clip_path):
        print(f"WARNING: no CLIP weights at {clip_path} — falling back to "
              "RANDOM-INIT CLIP; outputs are smoke-test garbage, not real "
              "samples (pass --clip_path or convert with "
              "`tools/convert_checkpoints.py clip`)")
        clip_path = "random"
    clip_model, clip_params = load_clip(clip_path)
    tok = CLIPTokenizer(args.bpe)
    if tok.vocab_size > clip_model.cfg.vocab_size:
        raise SystemExit(
            f"tokenizer vocab ({tok.vocab_size}) exceeds the CLIP text "
            f"tower's ({clip_model.cfg.vocab_size}) — mismatched bpe file")

    # 768x768.yaml: scale_factor 0.22765929, linear_end 0.015, f16 latents
    ldm = LatentDiffusion(ucfg, cond_stage=IdentityCondStage(),
                          first_stage=make_first_stage(fcfg),
                          scale_factor=0.22765929, linear_end=0.015)
    params = {"unet": uparams, "cond_stage": {}, "first_stage": fparams}
    f = 2 ** (len(fcfg.block_out_channels) - 1)
    latent_hw = (args.H // f, args.W // f)

    searcher = None
    if args.use_neighbors:
        if not args.database:
            raise SystemExit("--use_neighbors needs --database "
                             "(cli.train_searcher output)")
        from ..retrieval import load_searcher

        searcher = load_searcher(args.database)

    if args.from_file:
        with open(args.from_file) as fh:
            prompts = [l for l in fh.read().splitlines() if l]
    else:
        prompts = [args.prompt]

    sampler = ldm.make_cfg_sampler(
        params, ddim_steps=args.ddim_steps, guidance_scale=args.scale,
        eta=args.ddim_eta, latent_hw=latent_hw,
        latent_ch=ucfg.out_channels,
        method="dpm" if args.dpm else ("plms" if args.plms else "ddim"),
        uncond_input=np.zeros(
            (1, 1 + (args.knn if args.use_neighbors else 0),
             ucfg.context_dim), np.float32))
    decode = jax.jit(lambda p, lat: ldm.decode_first_stage(p, lat))

    os.makedirs(args.outdir, exist_ok=True)
    sample_path = os.path.join(args.outdir, "samples")
    os.makedirs(sample_path, exist_ok=True)
    base = len(os.listdir(sample_path))
    key = jax.random.key(args.seed)
    all_rows = []
    for it in range(args.n_iter):
        for prompt in prompts:
            tokens = jnp.asarray(tok.tokenize(
                [prompt] * args.n_samples,
                context_length=clip_model.cfg.context_length))
            c = clip_text_embed(clip_model, clip_params, tokens)  # (B,1,D)
            if searcher is not None:
                nn = searcher(np.asarray(c), args.knn)
                c = jnp.concatenate(
                    [c, jnp.asarray(nn["nn_embeddings"], c.dtype)], axis=1)
            key, sk = jax.random.split(key)
            lat = sampler(sk, c, args.n_samples)
            imgs = np.asarray(decode(params, lat))
            for b in range(imgs.shape[0]):
                Image.fromarray((imgs[b] * 255).astype(np.uint8)).save(
                    os.path.join(sample_path, f"{base:05}.png"))
                base += 1
            all_rows.append(imgs)
            print(f"sampled {imgs.shape[0]} for {prompt!r}")
    if not args.skip_grid and all_rows:
        grid = np.concatenate([np.concatenate(list(r), axis=1)
                               for r in all_rows], axis=0)
        n_grids = len([f for f in os.listdir(args.outdir)
                       if f.startswith("grid-")])
        Image.fromarray((grid * 255).astype(np.uint8)).save(
            os.path.join(args.outdir, f"grid-{n_grids:04}.png"))


if __name__ == "__main__":
    main()
