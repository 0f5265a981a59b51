"""ddpm_prune CLI: the --use_generated_samples path (prune_test.py:230-237 —
Taylor grads accumulated on the model's own DDIM samples, no dataset)."""

import os

import numpy as np

import jax

from diff_pruning_tpu.models.unet2d import UNet2D, tiny_unet_config
from diff_pruning_tpu.utils.checkpoint import load_model, save_model


def test_prune_on_generated_samples(tmp_path):
    from diff_pruning_tpu.cli.ddpm_prune import main

    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    save_model(str(tmp_path / "model"), cfg, params, subfolder="unet")
    n0 = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))

    main([
        "--model_path", str(tmp_path / "model"),
        "--save_path", str(tmp_path / "pruned"),
        "--pruner", "taylor",
        "--pruning_ratio", "0.3",
        "--use_generated_samples",
        "--gen_ddim_steps", "2",
        "--max_steps", "3",
        "--batch_size", "8",
        "--skip_vis",
    ])
    assert os.path.exists(tmp_path / "pruned" / "generated_for_pruning.png")
    cfg2, p2 = load_model(str(tmp_path / "pruned"))
    m2 = UNet2D(cfg2)
    m2.graph.validate(p2)
    n1 = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(p2))
    assert n1 < 0.65 * n0
    y = m2(p2, np.zeros((1, 16, 16, 3), np.float32), np.array([5]))
    assert y.shape == (1, 16, 16, 3)
