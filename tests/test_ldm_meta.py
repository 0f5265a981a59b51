"""LDM checkpoint meta (ldm.json): n_classes/scale_factor/schedule must
round-trip through save -> load_ldm, and legacy checkpoints without the
meta file must infer n_classes from the embedding table — the cin256-v2
default (1001) against a smaller ClassEmbedder samples the uncond row out
of bounds and jnp.take fills NaN silently (CLAUDE.md)."""

import json
import os

import pytest

import jax

from diff_pruning_tpu.cli.ldm_prune import load_ldm, write_ldm_meta
from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
from diff_pruning_tpu.models.unet_cond import tiny_cond_config
from diff_pruning_tpu.utils.checkpoint import save_model, save_params_npz


def _save(tmp_path, ldm, params, meta=True):
    mdir = tmp_path / "model"
    save_model(str(mdir), ldm.unet.cfg, params["unet"], subfolder="unet")
    os.makedirs(mdir / "cond_stage", exist_ok=True)
    save_params_npz(str(mdir / "cond_stage" / "params.npz"),
                    params["cond_stage"])
    if meta:
        write_ldm_meta(str(mdir), ldm)
    return mdir


def test_ldm_meta_round_trip(tmp_path):
    ldm = LatentDiffusion(tiny_cond_config(), n_classes=5, scale_factor=0.7,
                          num_train_timesteps=64, linear_start=0.002,
                          linear_end=0.02)
    params = ldm.init(jax.random.key(0))
    mdir = _save(tmp_path, ldm, params, meta=True)

    ldm2, p2 = load_ldm(str(mdir), None)
    assert ldm2.n_classes == 5 and ldm2.uncond_class == 4
    assert ldm2.scale_factor == pytest.approx(0.7)
    assert ldm2.schedule.num_train_timesteps == 64
    assert ldm2.linear_start == pytest.approx(0.002)
    assert p2["cond_stage"]["embedding"]["weight"].shape[0] == 5


def test_legacy_checkpoint_infers_n_classes_from_embedding(tmp_path):
    ldm = LatentDiffusion(tiny_cond_config(), n_classes=7)
    params = ldm.init(jax.random.key(1))
    mdir = _save(tmp_path, ldm, params, meta=False)

    ldm2, _ = load_ldm(str(mdir), None)
    assert ldm2.n_classes == 7, "must infer from the embedding table, not 1001"


def test_prune_cli_propagates_meta(tmp_path):
    ldm = LatentDiffusion(tiny_cond_config(), n_classes=5, scale_factor=0.7)
    params = ldm.init(jax.random.key(2))
    mdir = _save(tmp_path, ldm, params, meta=True)

    from diff_pruning_tpu.cli.ldm_prune import main

    out = tmp_path / "pruned"
    main(["--model_path", str(mdir), "--save_path", str(out),
          "--sparsity", "0.25", "--pruner", "magnitude",
          "--classes", "0", "1", "--batch_size", "2", "--ddim_steps", "2",
          "--skip_vis"])
    with open(out / "ldm.json") as f:
        meta = json.load(f)
    assert meta["n_classes"] == 5
    assert meta["scale_factor"] == pytest.approx(0.7)
