"""Unconditional LDM sampling CLI (scripts/sample_diffusion.py rebuild)."""

import os

import numpy as np

import jax

from diff_pruning_tpu.models.unet_cond import UNetCond, UNetCondConfig
from diff_pruning_tpu.models.vae import AutoencoderConfig, VQModel
from diff_pruning_tpu.utils.checkpoint import save_model


def _model_dir(tmp_path):
    ucfg = UNetCondConfig(
        image_size=8, in_channels=3, out_channels=3, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, context_dim=None, use_spatial_transformer=False,
        norm_num_groups=8)
    vcfg = AutoencoderConfig(block_out_channels=(8, 8), layers_per_block=1,
                             latent_channels=3, norm_num_groups=4,
                             num_vq_embeddings=16, mid_block_attention=False,
                             sample_size=16)
    mdir = tmp_path / "model"
    save_model(str(mdir), ucfg, UNetCond(ucfg).init(jax.random.key(0)),
               subfolder="unet")
    save_model(str(mdir), vcfg, VQModel(vcfg).init(jax.random.key(1)),
               subfolder="first_stage")
    return mdir


def test_sample_diffusion_ddim(tmp_path):
    from diff_pruning_tpu.cli.sample_diffusion import main

    mdir = _model_dir(tmp_path)
    main(["--model_path", str(mdir), "--logdir", str(tmp_path / "out"),
          "--n_samples", "3", "--batch_size", "2", "--custom_steps", "2",
          "--eta", "1.0"])
    from PIL import Image

    files = sorted(os.listdir(tmp_path / "out" / "img"))
    assert len(files) == 3
    img = np.asarray(Image.open(tmp_path / "out" / "img" / files[0]))
    assert img.shape == (16, 16, 3)


def test_sample_diffusion_vanilla(tmp_path):
    from diff_pruning_tpu.cli.sample_diffusion import main

    mdir = _model_dir(tmp_path)
    main(["--model_path", str(mdir), "--logdir", str(tmp_path / "van"),
          "--n_samples", "2", "--batch_size", "2", "--vanilla_sample"])
    assert len(os.listdir(tmp_path / "van" / "img")) == 2
