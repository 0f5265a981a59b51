"""Pruning engine tests: group selection semantics, surgery shape
consistency, concat offsets, GN/head grouping, importance golden values.
(The reference has no tests — SURVEY.md §4 defines this strategy.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_cifar10_config, tiny_unet_config
from diff_pruning_tpu.pruning.graph import CatVar, ChannelGraph
from diff_pruning_tpu.pruning.importance import (
    diff_pruning_importance,
    magnitude_importance,
    make_importance,
    taylor_importance,
)
from diff_pruning_tpu.pruning.pruner import _select_keep, apply_pruning, prune
from diff_pruning_tpu.pruning.surgery import flatten_params, slice_params, unflatten_params


def _simple_graph():
    g = ChannelGraph()
    v = g.var("v", 8)
    g.ref("w/kernel", 1, v, "out")
    return g, v


def test_magnitude_golden():
    g, v = _simple_graph()
    w = np.zeros((3, 8), dtype=np.float32)
    w[:, 0] = [3, 4, 0]  # L2 = 5
    w[:, 1] = [1, 0, 0]  # L2 = 1
    params = {"w": {"kernel": jnp.asarray(w)}}
    imp = magnitude_importance(g, params, v)
    assert np.isclose(imp[0], 5.0) and np.isclose(imp[1], 1.0)


def test_taylor_multivariable_switch():
    """multivariable=True -> |sum w*g|; False -> sum |w*g| (ddpm_prune.py:60,66)."""
    g, v = _simple_graph()
    w = np.zeros((2, 8), dtype=np.float32)
    gr = np.zeros((2, 8), dtype=np.float32)
    w[:, 0] = [1.0, 1.0]
    gr[:, 0] = [2.0, -2.0]  # w*g = [2, -2]
    params = {"w": {"kernel": jnp.asarray(w)}}
    grads = {"w": {"kernel": jnp.asarray(gr)}}
    mv = taylor_importance(g, params, v, grads=grads, multivariable=True)
    sv = diff_pruning_importance(g, params, v, grads=grads)
    assert np.isclose(mv[0], 0.0)
    assert np.isclose(sv[0], 4.0)


def test_select_keep_group_div():
    """GN-style grouping: prune uniformly per contiguous sub-block."""
    from diff_pruning_tpu.pruning.graph import ChannelVar

    v = ChannelVar("v", 8, group_div=2)
    imp = np.array([0.1, 5, 6, 7, 8, 9, 0.2, 10.0])
    keep = _select_keep(imp, v, sparsity=0.25)  # prune 2 -> 1 per block
    assert list(keep) == [1, 2, 3, 4, 5, 7]
    # per-block counts stay equal
    assert (np.asarray(keep) < 4).sum() == 3


def test_select_keep_round_to():
    from diff_pruning_tpu.pruning.graph import ChannelVar

    v = ChannelVar("v", 10, round_to=4)
    imp = np.arange(10, dtype=np.float64)
    keep = _select_keep(imp, v, sparsity=0.5)  # n_pruned 5 -> rounded to 4
    assert len(keep) == 6


def test_concat_offset_slicing():
    """Slicing a consumer whose in-axis is a concat of two vars must shift
    the second part's indices by the (pre-surgery) size of the first."""
    g = ChannelGraph()
    a = g.var("a", 4)
    b = g.var("b", 4)
    cat = CatVar((a, b))
    g.ref("c/kernel", 0, cat, "in")
    w = np.arange(8, dtype=np.float32)[:, None] * np.ones((8, 2), np.float32)
    params = {"c": {"kernel": jnp.asarray(w)}}
    out = slice_params(params, g, {"a": [0, 2], "b": [1, 3]})
    got = np.asarray(out["c"]["kernel"])[:, 0]
    assert list(got) == [0, 2, 5, 7]


def test_flatten_roundtrip():
    tree = {"a": {"b": jnp.ones((2,)), "c": {"d": jnp.zeros((3,))}}}
    flat = flatten_params(tree)
    assert set(flat) == {"a/b", "a/c/d"}
    tree2 = unflatten_params(flat)
    assert jnp.array_equal(tree2["a"]["c"]["d"], tree["a"]["c"]["d"])


@pytest.mark.parametrize("pruner_name", ["magnitude", "random"])
def test_unet_prune_rebuild_forward(pruner_name):
    cfg = tiny_unet_config()
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    imp = make_importance(pruner_name, seed=0)
    res = prune(model.graph, params, imp, sparsity=0.3)
    new_params = apply_pruning(params, model.graph, res)
    new_cfg = cfg.with_channel_sizes(res.channel_sizes)
    m2 = UNet2D(new_cfg)
    m2.graph.validate(new_params)
    y = m2(new_params, jnp.zeros((2, 16, 16, 3)), jnp.array([0, 999]))
    assert y.shape == (2, 16, 16, 3)
    n_old = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    n_new = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(new_params))
    assert n_new < 0.65 * n_old


def test_cifar_prune_matches_reference_ratios():
    """At ratio 0.3 the reference reports 35.7M -> 19.8M params
    (BASELINE.md CIFAR-10 table); our graph must land in the same regime."""
    cfg = ddpm_cifar10_config()
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    n_base = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    assert abs(n_base - 35.7e6) < 0.2e6
    res = prune(model.graph, params, make_importance("magnitude"), sparsity=0.3)
    new_params = apply_pruning(params, model.graph, res)
    n_new = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(new_params))
    assert abs(n_new - 19.8e6) < 0.5e6


def test_gn_group_div_propagates():
    cfg = tiny_unet_config()
    model = UNet2D(cfg)
    for v in model.graph.prunable_vars():
        if "inner" in v.name or "time_embedding" in v.name:
            continue
        assert v.group_div == cfg.norm_num_groups, v.name


def test_pruned_checkpoint_roundtrip(tmp_path):
    """Pruned model round-trips through (config.json, npz) — no pickles."""
    from diff_pruning_tpu.utils.checkpoint import load_model, save_model

    cfg = tiny_unet_config()
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    res = prune(model.graph, params, make_importance("magnitude"), sparsity=0.3)
    new_params = apply_pruning(params, model.graph, res)
    new_cfg = cfg.with_channel_sizes(res.channel_sizes)
    save_model(str(tmp_path / "m"), new_cfg, new_params)
    cfg2, params2 = load_model(str(tmp_path / "m"))
    m2 = UNet2D(cfg2)
    m2.graph.validate(params2)
    x = jnp.ones((1, 16, 16, 3))
    t = jnp.array([5])
    np.testing.assert_allclose(
        np.asarray(UNet2D(new_cfg)(new_params, x, t)),
        np.asarray(m2(params2, x, t)), rtol=1e-6, atol=1e-6)


def test_global_pruning_mode():
    """Global mode: pooled threshold produces uneven per-var sparsity but
    hits the overall target within rounding; model rebuilds and runs."""
    cfg = tiny_unet_config()
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    res = prune(model.graph, params, make_importance("magnitude"),
                sparsity=0.3, global_pruning=True)
    new_params = apply_pruning(params, model.graph, res)
    m2 = UNet2D(cfg.with_channel_sizes(res.channel_sizes))
    m2.graph.validate(new_params)
    y = m2(new_params, jnp.zeros((1, 16, 16, 3)), jnp.array([3]))
    assert y.shape == (1, 16, 16, 3)
    # overall channel reduction near the target
    total_before = sum(v.size for v in model.graph.prunable_vars())
    total_after = sum(res.channel_sizes.values())
    assert 0.55 < total_after / total_before < 0.85
    # at least one var pruned more than another (global redistribution)
    ratios = {k: res.channel_sizes[k] / model.graph.vars[k].size
              for k in res.channel_sizes}
    assert max(ratios.values()) - min(ratios.values()) > 0.01


def test_lamp_and_group_norm_importance():
    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    for name in ("lamp", "group_norm"):
        imp = make_importance(name)
        res = prune(model.graph, params, imp, sparsity=0.3)
        p2 = apply_pruning(params, model.graph, res)
        m2 = UNet2D(cfg.with_channel_sizes(res.channel_sizes))
        m2.graph.validate(p2)


def test_normalizer_golden():
    """normalize_scores matches the reference's _normalize arithmetic
    (torch_pruning/importance.py:25-40) on hand-computed values."""
    from diff_pruning_tpu.pruning.importance import normalize_scores

    imp = np.array([1.0, 2.0, 5.0], np.float64)
    np.testing.assert_allclose(normalize_scores(imp, None), imp)
    np.testing.assert_allclose(normalize_scores(imp, "sum"), imp / 8.0)
    np.testing.assert_allclose(normalize_scores(imp, "mean"), imp / (8.0 / 3))
    np.testing.assert_allclose(normalize_scores(imp, "max"), imp / 5.0)
    np.testing.assert_allclose(
        normalize_scores(imp, "standarization"),
        (imp - 1.0) / (5.0 - 1.0 + 1e-8))
    mu, sd = imp.mean(), imp.std()
    np.testing.assert_allclose(normalize_scores(imp, "gaussian"),
                               (imp - mu) / (sd + 1e-8))
    np.testing.assert_allclose(normalize_scores(imp, lambda x: x * 2), imp * 2)
    with pytest.raises(ValueError):
        normalize_scores(imp, "nope")


def test_make_importance_normalizer_integration():
    """A normalized importance changes GLOBAL drop allocation but never
    LOCAL ranking (every normalizer is monotonic within a var)."""
    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    base = prune(model.graph, params, make_importance("magnitude"), sparsity=0.3)
    for norm in ("mean", "max", "standarization", "gaussian", "sum"):
        imp = make_importance("magnitude", normalizer=norm)
        assert imp.normalizer == norm
        # local mode: identical keep sets
        res = prune(model.graph, params, imp, sparsity=0.3)
        assert set(res.keep) == set(base.keep)
        for k in base.keep:
            np.testing.assert_array_equal(res.keep[k], base.keep[k])
        # global mode: runs, rebuilds, validates
        gres = prune(model.graph, params, imp, sparsity=0.3,
                     global_pruning=True)
        p2 = apply_pruning(params, model.graph, gres)
        m2 = UNet2D(cfg.with_channel_sizes(gres.channel_sizes))
        m2.graph.validate(p2)
    # 'gaussian' centers per var (mean 0) vs default mean-normalization
    # (mean 1) — the pooled thresholds must differ in allocation
    g_mean = prune(model.graph, params,
                   make_importance("magnitude", normalizer="mean"),
                   sparsity=0.3, global_pruning=True)
    g_gauss = prune(model.graph, params,
                    make_importance("magnitude", normalizer="gaussian"),
                    sparsity=0.3, global_pruning=True)
    assert g_mean.channel_sizes != g_gauss.channel_sizes


def test_cost_weights_trace_and_modes():
    """pruning/cost.py: every prunable var gets a positive per-channel cost
    in each mode, and unknown modes are rejected."""
    from diff_pruning_tpu.pruning.cost import var_cost_weights

    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    for mode in ("macs", "bytes", "hybrid"):
        cw = var_cost_weights(model, params, (1, 16, 16, 3), mode=mode)
        assert all(c > 0 for c in cw.values())
        touched = set(cw)
        conv_vars = {v.name for v in model.graph.prunable_vars()}
        # every prunable var in this model feeds a conv or linear
        assert touched == conv_vars, conv_vars - touched
    with pytest.raises(ValueError):
        var_cost_weights(model, params, (1, 16, 16, 3), mode="wall_clock")


def test_global_prune_with_cost_weights():
    """cost_weights reallocates global drops toward high-cost vars at the
    same overall sparsity; result still rebuilds and validates."""
    from diff_pruning_tpu.pruning.cost import var_cost_weights

    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    imp = make_importance("magnitude")
    base = prune(model.graph, params, imp, sparsity=0.3, global_pruning=True)
    cw = var_cost_weights(model, params, (1, 16, 16, 3), mode="bytes")
    res = prune(model.graph, params, imp, sparsity=0.3, global_pruning=True,
                cost_weights=cw)
    p2 = apply_pruning(params, model.graph, res)
    m2 = UNet2D(cfg.with_channel_sizes(res.channel_sizes))
    m2.graph.validate(p2)
    assert res.channel_sizes != base.channel_sizes
    # the highest-cost var should keep no more channels than under the
    # cost-blind allocation (its importance got discounted)
    vmax = max(cw, key=cw.get)
    assert res.channel_sizes[vmax] <= base.channel_sizes[vmax]


def test_prune_does_not_mutate_graph_round_to():
    """VERDICT r1 weak #5: a prune(round_to=N) call must not leak rounding
    into subsequent prune() calls on the same graph."""
    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    before = {v.name: v.round_to for v in model.graph.prunable_vars()}
    prune(model.graph, params, make_importance("magnitude"),
          sparsity=0.25, round_to=4)
    after = {v.name: v.round_to for v in model.graph.prunable_vars()}
    assert before == after
    # and a second call without round_to behaves as if the first never ran
    r_plain = prune(model.graph, params, make_importance("magnitude"),
                    sparsity=0.25)
    r_fresh = prune(UNet2D(cfg).graph, params, make_importance("magnitude"),
                    sparsity=0.25)
    assert r_plain.channel_sizes == r_fresh.channel_sizes


def test_global_round_to_truncation_is_importance_aware():
    """VERDICT r1 weak #4: channels spared by global round_to truncation
    must be the HIGHEST-importance drop candidates, not the lowest-indexed."""
    g = ChannelGraph()
    a = g.var("a", 8)
    b = g.var("b", 8)
    g.ref("wa/kernel", 1, a, "out")
    g.ref("wb/kernel", 1, b, "out")
    # var a: channels 0..3 weak (score 1..4 after indexing trick), rest strong.
    wa = np.ones((2, 8), np.float32) * 10.0
    wa[:, [3, 0, 2, 1]] = np.asarray([1.0, 2.0, 3.0, 4.0])[None, :]
    wb = np.ones((2, 8), np.float32) * 10.0
    params = {"wa": {"kernel": jnp.asarray(wa)}, "wb": {"kernel": jnp.asarray(wb)}}
    res = prune(g, params, make_importance("magnitude"), sparsity=0.25,
                global_pruning=True, round_to=3)
    # 4 candidates fall under the global threshold in `a`; round_to=3 keeps 3
    # drops and must spare index 1 (the strongest candidate, score 4), NOT
    # index 3 (the weakest) as index-order truncation would.
    keep_a = set(res.keep["a"])
    assert 1 in keep_a
    assert 3 not in keep_a and 0 not in keep_a and 2 not in keep_a


def test_global_max_sparsity_guard():
    """metapruner.py:172-194: no var may be pruned below
    init*(1-max_sparsity) channels in global mode."""
    g = ChannelGraph()
    a = g.var("a", 16)
    b = g.var("b", 16)
    g.ref("wa/kernel", 1, a, "out")
    g.ref("wb/kernel", 1, b, "out")
    # a is uniformly tiny -> global thresholding wants to drop ALL of a
    params = {"wa": {"kernel": jnp.asarray(np.full((2, 16), 1e-3, np.float32))},
              "wb": {"kernel": jnp.asarray(np.ones((2, 16), np.float32))}}
    res = prune(g, params, make_importance("magnitude"), sparsity=0.5,
                global_pruning=True, max_sparsity=0.75)
    assert res.channel_sizes["a"] >= 4  # 16 * (1 - 0.75)
    # without the guard the var still survives with >= 1 channel
    res2 = prune(g, params, make_importance("magnitude"), sparsity=0.5,
                 global_pruning=True)
    assert res2.channel_sizes["a"] >= 1


def test_global_sparsity_per_var_cap():
    g = ChannelGraph()
    a = g.var("a", 16)
    b = g.var("b", 16)
    g.ref("wa/kernel", 1, a, "out")
    g.ref("wb/kernel", 1, b, "out")
    params = {"wa": {"kernel": jnp.asarray(np.full((2, 16), 1e-3, np.float32))},
              "wb": {"kernel": jnp.asarray(np.ones((2, 16), np.float32))}}
    res = prune(g, params, make_importance("magnitude"), sparsity=0.5,
                global_pruning=True, sparsity_per_var={"a": 0.25})
    assert res.channel_sizes["a"] >= 12  # capped at 25% drop


def test_batchnorm_prunes_running_stats():
    """BatchnormPruner parity (function.py:210-233): pruning a var slices
    the BN scale/bias AND running_mean/running_var consistently."""
    from diff_pruning_tpu.models.layers import BatchNorm, Conv2D, PReLU, Scope

    g = ChannelGraph()
    v_in = g.var("in", 3, prunable=False)
    v = g.var("mid", 8)
    s = Scope(g)
    conv = Conv2D(s("conv"), v_in, v, 3, 1, 1)
    bn = BatchNorm(s("bn"), v)
    act = PReLU(s("act"), v)
    params = {"conv": conv.init(jax.random.key(0)),
              "bn": bn.init(jax.random.key(1)),
              "act": act.init(jax.random.key(2))}
    params["bn"]["running_mean"] = jnp.arange(8.0)
    params["bn"]["running_var"] = jnp.arange(8.0) + 1.0
    params["act"]["alpha"] = jnp.arange(8.0) * 0.1
    out = slice_params(params, g, {"mid": [1, 3, 6]})
    assert out["conv"]["kernel"].shape[-1] == 3
    np.testing.assert_array_equal(out["bn"]["running_mean"], [1, 3, 6])
    np.testing.assert_array_equal(out["bn"]["running_var"], [2, 4, 7])
    np.testing.assert_allclose(out["act"]["alpha"], [0.1, 0.3, 0.6])
    # forward still works on the pruned shapes (BN/PReLU apply is
    # shape-agnostic: it reads sizes from the param arrays)
    x = jnp.ones((1, 4, 4, 3))
    y = act(out["act"], bn(out["bn"], conv(out["conv"], x)))
    assert y.shape == (1, 4, 4, 3)


def test_normalize_scores_all_zero_no_nan():
    """An all-zero score vector (taylor on a dead zero-init out-conv path)
    must normalize to finite zeros, never 0/0 NaNs that would poison the
    global pooling threshold."""
    from diff_pruning_tpu.pruning.importance import normalize_scores

    z = np.zeros(8, np.float64)
    for norm in ("sum", "mean", "max", "standarization", "gaussian"):
        out = normalize_scores(z, norm)
        assert np.isfinite(out).all(), norm


def test_cost_weights_with_mean_centered_normalizer():
    """cost_weights must PENALIZE high-cost vars even when the importance
    normalizer emits negative scores (gaussian mean-centers each var):
    dividing a negative score by a big cost would otherwise rank it HIGHER.
    The pruner shifts to a non-negative scale first."""
    from diff_pruning_tpu.pruning.cost import var_cost_weights

    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    imp = make_importance("magnitude", normalizer="gaussian")
    base = prune(model.graph, params, imp, sparsity=0.3, global_pruning=True)
    cw = var_cost_weights(model, params, (1, 16, 16, 3), mode="bytes")
    res = prune(model.graph, params, imp, sparsity=0.3, global_pruning=True,
                cost_weights=cw)
    p2 = apply_pruning(params, model.graph, res)
    m2 = UNet2D(cfg.with_channel_sizes(res.channel_sizes))
    m2.graph.validate(p2)
    # same invariant as the non-centered case: the most expensive var keeps
    # no more channels than under cost-blind allocation
    vmax = max(cw, key=cw.get)
    assert res.channel_sizes[vmax] <= base.channel_sizes[vmax]
