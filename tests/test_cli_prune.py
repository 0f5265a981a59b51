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


def test_prune_cost_aware_match_params(tmp_path):
    """--cost_aware bytes --match_params: cost-weighted allocation lands on
    the importance-only param budget (±1%) and produces a different (or at
    minimum valid) channel allocation. VERDICT r4 task #2."""
    import pytest

    from diff_pruning_tpu.cli.ddpm_prune import main

    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    save_model(str(tmp_path / "model"), cfg, params, subfolder="unet")

    # cost_aware without global_pruning must refuse
    with pytest.raises(SystemExit):
        main([
            "--model_path", str(tmp_path / "model"),
            "--save_path", str(tmp_path / "bad"),
            "--pruner", "magnitude", "--pruning_ratio", "0.3",
            "--cost_aware", "bytes", "--skip_vis",
        ])

    common = [
        "--model_path", str(tmp_path / "model"),
        "--pruner", "magnitude", "--pruning_ratio", "0.3",
        "--global_pruning", "--skip_vis", "--batch_size", "8",
    ]
    main(common + ["--save_path", str(tmp_path / "plain")])
    main(common + ["--save_path", str(tmp_path / "cost"),
                   "--cost_aware", "bytes", "--match_params",
                   "--max_sparsity", "0.75"])

    _, p_plain = load_model(str(tmp_path / "plain"))
    cfg_c, p_cost = load_model(str(tmp_path / "cost"))
    n_plain = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(p_plain))
    n_cost = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(p_cost))
    # channel drops are discrete on the tiny model, so the closest
    # reachable budget can sit a few % off; the full-size CIFAR UNet
    # converges within 1% (tools/cost_aware_bench.py)
    assert abs(n_cost - n_plain) / n_plain < 0.05, (n_plain, n_cost)
    m2 = UNet2D(cfg_c)
    m2.graph.validate(p_cost)
    y = m2(p_cost, np.zeros((1, 16, 16, 3), np.float32), np.array([5]))
    assert y.shape == (1, 16, 16, 3)
