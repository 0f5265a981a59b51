"""ldm_prune CLI end-to-end on a tiny conditional UNet (prune_ldm.py port):
self-sampled CFG latents -> per-t grad sweep with thr early exit -> surgery
with round_to -> pruned checkpoint + sample grid."""

import json
import os

import numpy as np

import pytest

import jax

from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
from diff_pruning_tpu.models.unet_cond import UNetCondConfig, tiny_cond_config
from diff_pruning_tpu.utils.checkpoint import save_model, save_params_npz


@pytest.mark.parametrize("method", ["ddim", "dpm"])
def test_ldm_prune_cli_end_to_end(tmp_path, method):
    ucfg = tiny_cond_config()
    ldm = LatentDiffusion(ucfg)
    params = ldm.init(jax.random.key(0))

    mdir = tmp_path / "model"
    save_model(str(mdir), ucfg, params["unet"], subfolder="unet")
    os.makedirs(mdir / "cond_stage")
    save_params_npz(str(mdir / "cond_stage" / "params.npz"), params["cond_stage"])

    out = tmp_path / "pruned"
    from diff_pruning_tpu.cli.ldm_prune import main

    main(["--model_path", str(mdir), "--save_path", str(out),
          "--sparsity", "0.25", "--pruner", "diff-pruning",
          "--thr", "0.1", "--batch_size", "2", "--ddim_steps", "2",
          "--max_steps", "4", "--classes", "0", "1", "--method", method])

    with open(out / "unet" / "config.json") as f:
        cfg2 = UNetCondConfig.from_json(f.read())
    assert cfg2.channel_sizes, "pruned config must carry channel_sizes"

    from diff_pruning_tpu.pruning.flops import count_params
    from diff_pruning_tpu.utils.checkpoint import load_params_npz

    newp = load_params_npz(str(out / "unet" / "params.npz"))
    ldm2 = LatentDiffusion(cfg2)
    ldm2.unet.graph.validate(newp)
    n0 = count_params(params["unet"])
    n1 = count_params(newp)
    assert n1 < n0

    # pruned model must still sample via the CFG path end-to-end
    assert os.path.exists(out / "samples.png")
    assert os.path.exists(out / "cond_stage" / "params.npz")
