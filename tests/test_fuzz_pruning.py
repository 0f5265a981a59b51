"""Randomized structural fuzz of the pruning engine.

The reference's engine is validated only behaviorally on the shipped
models (SURVEY §4); its failure mode class — index drift across
concat/residual/GN couplings on an architecture nobody tried — is exactly
what random architectures catch. Each seeded trial builds a random
UNet2DConfig (depth, widths, attention placement, GN group count, head
dim), prunes it with random settings (importance, sparsity, local/global,
round_to, normalizer), and asserts the invariants the engine must keep on
ANY model: the sliced pytree validates against the rebuilt graph, every
GN-constrained var stays divisible by its group count, params strictly
decrease, and the pruned model's forward still produces the right shape
with finite values.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_pruning_tpu.models.unet2d import UNet2D, UNet2DConfig
from diff_pruning_tpu.pruning.flops import count_params
from diff_pruning_tpu.pruning.importance import make_importance
from diff_pruning_tpu.pruning.pruner import apply_pruning, prune


def _random_config(rng: np.random.Generator) -> UNet2DConfig:
    g = int(rng.choice([4, 8]))
    n_blocks = int(rng.integers(2, 4))
    widths = tuple(int(g * rng.integers(2, 7)) for _ in range(n_blocks))
    down, up = [], []
    for _ in range(n_blocks):
        attn = bool(rng.integers(0, 2))
        down.append("AttnDownBlock2D" if attn else "DownBlock2D")
        up.insert(0, "AttnUpBlock2D" if attn else "UpBlock2D")
    return UNet2DConfig(
        sample_size=16,
        block_out_channels=widths,
        down_block_types=tuple(down),
        up_block_types=tuple(up),
        layers_per_block=int(rng.integers(1, 3)),
        downsample_padding=int(rng.integers(0, 2)),
        attention_head_dim=int(rng.choice([g // 2, g])) if rng.integers(0, 2) else None,
        norm_num_groups=g,
        add_attention=bool(rng.integers(0, 2)),
    )


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_random_architecture_prunes_consistently(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = _random_config(rng)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(seed))
    n0 = count_params(params)

    imp_name = str(rng.choice(["magnitude", "random", "lamp", "group_norm"]))
    normalizer = rng.choice([None, "mean", "max", "gaussian"])
    imp = make_importance(imp_name, seed=seed,
                          normalizer=None if normalizer is None else str(normalizer))
    sparsity = float(rng.uniform(0.15, 0.5))
    rt = int(rng.choice([1, 2, 3, 4]))
    res = prune(model.graph, params, imp, sparsity=sparsity,
                global_pruning=bool(rng.integers(0, 2)),
                round_to=rt)
    for name, k in res.keep.items():
        var = model.graph.vars[name]
        eff_rt = max(var.round_to, rt)
        assert (var.size - len(k)) % eff_rt == 0, (name, var.size, len(k), eff_rt)
    newp = apply_pruning(params, model.graph, res)
    new_cfg = cfg.with_channel_sizes(res.channel_sizes)
    m2 = UNet2D(new_cfg)
    m2.graph.validate(newp)

    n1 = count_params(newp)
    assert n1 < n0, (n0, n1, dataclasses.asdict(cfg))

    # GN-group divisibility must survive on every var the graph constrains
    for var in m2.graph.vars.values():
        if var.group_div > 1:
            assert var.size % var.group_div == 0, (var.name, var.size,
                                                   var.group_div)

    x = jax.random.normal(jax.random.key(seed + 1), (2, 16, 16, 3))
    t = jnp.array([3, 500], jnp.int32)
    out = m2(newp, x, t)
    assert out.shape == (2, 16, 16, 3), dataclasses.asdict(cfg)
    assert bool(jnp.isfinite(out).all()), dataclasses.asdict(cfg)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(3))
def test_random_cond_unet_prunes_consistently(seed):
    """Same fuzz on the openaimodel family: cross-attention head groups,
    GEGLU two-part ff axes, scale-shift-norm, resblock_updown — the graph
    couplings with the most index bookkeeping."""
    from diff_pruning_tpu.models.unet_cond import UNetCond, UNetCondConfig

    rng = np.random.default_rng(2000 + seed)
    g = int(rng.choice([4, 8]))
    st = bool(rng.integers(0, 2))
    cfg = UNetCondConfig(
        image_size=8, in_channels=3, out_channels=3,
        model_channels=int(g * rng.integers(3, 6)),
        num_res_blocks=int(rng.integers(1, 3)),
        attention_resolutions=(2,) if rng.integers(0, 2) else (1, 2),
        channel_mult=(1, 2),
        num_heads=int(rng.choice([1, 2])),
        transformer_depth=1,
        context_dim=16 if st else None,
        norm_num_groups=g,
        use_spatial_transformer=st,
        use_scale_shift_norm=bool(rng.integers(0, 2)),
        resblock_updown=bool(rng.integers(0, 2)),
    )
    model = UNetCond(cfg)
    params = model.init(jax.random.key(seed))
    n0 = count_params(params)

    imp = make_importance("magnitude", seed=seed)
    rt = int(rng.choice([1, 2, 3, 4]))
    res = prune(model.graph, params, imp,
                sparsity=float(rng.uniform(0.15, 0.4)),
                global_pruning=bool(rng.integers(0, 2)),
                round_to=rt)
    for name, k in res.keep.items():
        var = model.graph.vars[name]
        eff_rt = max(var.round_to, rt)
        assert (var.size - len(k)) % eff_rt == 0, (name, var.size, len(k), eff_rt)
    newp = apply_pruning(params, model.graph, res)
    m2 = UNetCond(cfg.with_channel_sizes(res.channel_sizes))
    m2.graph.validate(newp)
    assert count_params(newp) < n0

    x = jax.random.normal(jax.random.key(seed + 1), (2, 8, 8, 3))
    t = jnp.array([3, 500], jnp.int32)
    ctx = (jax.random.normal(jax.random.key(seed + 2), (2, 4, 16))
           if st else None)
    out = m2(newp, x, t, context=ctx)
    assert out.shape == (2, 8, 8, 3), dataclasses.asdict(cfg)
    assert bool(jnp.isfinite(out).all()), dataclasses.asdict(cfg)
