"""ldm_sample CLI end-to-end on a tiny checkpoint (sample_for_FID.py port):
pipelined sample -> jitted decode -> threaded PNG save."""

import os

import numpy as np

import jax

from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
from diff_pruning_tpu.models.unet_cond import tiny_cond_config
from diff_pruning_tpu.utils.checkpoint import save_model, save_params_npz


def test_ldm_sample_cli_writes_expected_files(tmp_path):
    ucfg = tiny_cond_config()
    ldm = LatentDiffusion(ucfg)
    params = ldm.init(jax.random.key(0))

    mdir = tmp_path / "model"
    save_model(str(mdir), ucfg, params["unet"], subfolder="unet")
    os.makedirs(mdir / "cond_stage")
    save_params_npz(str(mdir / "cond_stage" / "params.npz"), params["cond_stage"])

    outdir = tmp_path / "imgs"
    from diff_pruning_tpu.cli.ldm_sample import main

    # ipc=3 with batch_size=2 exercises the partial final batch per class
    main(["--model_path", str(mdir), "--output_dir", str(outdir),
          "--ipc", "3", "--num_classes", "2", "--batch_size", "2",
          "--ddim_steps", "2", "--scale", "1.5"])

    files = sorted(os.listdir(outdir))
    assert files == [f"{i:06d}.png" for i in range(6)]
    from PIL import Image

    im = np.asarray(Image.open(outdir / files[0]))
    assert im.shape == (ucfg.image_size, ucfg.image_size, 3)
