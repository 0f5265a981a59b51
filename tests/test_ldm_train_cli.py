"""ldm_train CLI: smoke + kill-and-resume (the ldm_exp/main.py
--load_pruned_model finetune path, now with durable resume like ddpm_train)."""

import json
import os

import numpy as np
import pytest

import jax

from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
from diff_pruning_tpu.models.unet_cond import tiny_cond_config
from diff_pruning_tpu.models.vae import AutoencoderConfig, VQModel
from diff_pruning_tpu.utils.checkpoint import save_model, save_params_npz

PIL = pytest.importorskip("PIL")
from PIL import Image


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ldm")
    # class-labeled image folder, 2 classes x 8 images at 32x32 (VQ-f4 -> 8)
    rng = np.random.default_rng(0)
    for c in ("class_a", "class_b"):
        d = root / "data" / c
        os.makedirs(d)
        for i in range(8):
            Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                            ).save(d / f"{i}.png")
    # checkpoint: unet + cond_stage + first_stage (f4: 3 blocks)
    ucfg = tiny_cond_config()
    ldm = LatentDiffusion(ucfg, n_classes=3)
    params = ldm.init(jax.random.key(0))
    vcfg = AutoencoderConfig(block_out_channels=(16, 16, 32),
                             layers_per_block=1, latent_channels=3,
                             norm_num_groups=4, num_vq_embeddings=32,
                             mid_block_attention=False)
    vq = VQModel(vcfg)
    mdir = root / "model"
    save_model(str(mdir), ucfg, params["unet"], subfolder="unet")
    os.makedirs(mdir / "cond_stage")
    save_params_npz(str(mdir / "cond_stage" / "params.npz"),
                    params["cond_stage"])
    save_model(str(mdir), vcfg, vq.init(jax.random.key(1)),
               subfolder="first_stage")
    return root


def _run(workspace, outdir, num_iters, resume=None):
    from diff_pruning_tpu.cli.ldm_train import main

    argv = [
        "--model_path", str(workspace / "model"),
        "--dataset", str(workspace / "data"),
        "--output_dir", str(outdir),
        "--train_batch_size", "4",
        "--num_iters", str(num_iters),
        "--save_model_steps", "4",
        "--log_steps", "2",
        "--steps_per_dispatch", "2",
        "--uncond_prob", "0.1",
        "--mixed_precision", "no",
        "--seed", "5",
    ]
    if resume:
        argv += ["--resume_from_checkpoint", str(resume)]
    main(argv)


def _losses(outdir):
    with open(os.path.join(outdir, "metrics.jsonl")) as f:
        return {r["step"]: r["loss"] for r in map(json.loads, f)}


def test_ldm_train_smoke_and_resume(workspace, tmp_path):
    full = tmp_path / "full"
    _run(workspace, full, num_iters=8)
    assert os.path.exists(full / "unet" / "params.npz")
    # the output dir is a complete sample-able checkpoint: codec + meta ride
    # along so cli.ldm_sample can decode to pixels from it directly
    assert os.path.exists(full / "first_stage" / "params.npz")
    with open(full / "ldm.json") as f:
        assert json.load(f)["n_classes"] == 3
    from diff_pruning_tpu.utils.checkpoint import _resolve_ckpt_dir

    assert os.path.exists(
        os.path.join(_resolve_ckpt_dir(str(full / "ckpt")), "opt_state.npz"))
    assert os.path.exists(full / "run.sh")
    import glob

    assert glob.glob(str(full / "logs" / "events.out.tfevents.*"))

    part = tmp_path / "part"
    _run(workspace, part, num_iters=4)
    _run(workspace, part, num_iters=8, resume=part / "ckpt")
    lf, lp = _losses(full), _losses(part)
    for step in (6, 8):
        assert lp[step] == pytest.approx(lf[step], rel=1e-5), (
            f"step {step}: resumed {lp[step]} vs uninterrupted {lf[step]}")
