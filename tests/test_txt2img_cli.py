"""txt2img CLI end-to-end on a tiny checkpoint (ldm_exp/scripts/txt2img.py
port): prompt -> WordPiece -> BERTEmbedder -> CFG DDIM/PLMS -> decode ->
PNGs + grid, with empty-string unconditional guidance."""

import json
import os

import numpy as np
import pytest

import jax

from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
from diff_pruning_tpu.models.text_encoder import BERTEmbedder, tiny_bert_config
from diff_pruning_tpu.models.unet_cond import UNetCondConfig
from diff_pruning_tpu.utils.checkpoint import save_params_npz


@pytest.fixture()
def tiny_txt2img_ckpt(tmp_path):
    bcfg = tiny_bert_config()
    ucfg = UNetCondConfig(
        image_size=4, in_channels=3, out_channels=3, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, transformer_depth=1, context_dim=bcfg.n_embed,
        norm_num_groups=8)
    ldm = LatentDiffusion(ucfg, cond_stage=BERTEmbedder(bcfg))
    params = ldm.init(jax.random.key(0))
    mdir = tmp_path / "model"
    for sub, cfg, p in (("unet", ucfg, params["unet"]),
                        ("cond_stage", bcfg, params["cond_stage"])):
        os.makedirs(mdir / sub)
        (mdir / sub / "config.json").write_text(cfg.to_json())
        save_params_npz(str(mdir / sub / "params.npz"), p)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "virus", "monster",
             "guitar", "painting", "of", "playing"]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n")
    return mdir, vf


@pytest.mark.parametrize("plms", [False, True])
def test_txt2img_cli(tmp_path, tiny_txt2img_ckpt, plms):
    mdir, vf = tiny_txt2img_ckpt
    from diff_pruning_tpu.cli.txt2img import main

    outdir = tmp_path / ("out_plms" if plms else "out")
    argv = ["--model_path", str(mdir), "--vocab", str(vf),
            "--outdir", str(outdir), "--prompt", "a virus monster",
            "--ddim_steps", "3", "--n_samples", "2", "--n_iter", "2",
            "--H", "32", "--W", "32", "--scale", "5.0"]
    if plms:
        argv.append("--plms")
    main(argv)
    files = sorted(os.listdir(outdir / "samples"))
    assert files == [f"{i:06d}.png" for i in range(4)]
    assert (outdir / "grid.png").exists()
    from PIL import Image

    # H//8 latents, no first stage -> 4x4 images at this tiny config
    assert np.asarray(Image.open(outdir / "samples" / files[0])).shape == (4, 4, 3)
