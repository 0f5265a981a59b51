"""Generic-surgery layer family: parity vs the torch layers the reference's
per-layer pruners target (function.py:149-165 depthwise conv, :304-322
InstanceNorm, :373-421 LSTM, :444-517 MultiheadAttention) and structural
pruning consistency through the ChannelGraph."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.layers import (
    LSTM,
    Conv2D,
    DepthwiseConv2D,
    InstanceNorm,
    MultiheadAttention,
    Scope,
)
from diff_pruning_tpu.pruning.graph import ChannelGraph
from diff_pruning_tpu.pruning.importance import make_importance
from diff_pruning_tpu.pruning.surgery import slice_params

torch = pytest.importorskip("torch")


def _t(a):
    # np.array (copy), not asarray: jax arrays export as non-writable numpy
    # views and torch.from_numpy warns on those
    return torch.from_numpy(np.array(a, dtype=np.float32))


# -- torch forward parity ----------------------------------------------------


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_parity_vs_torch(bidirectional):
    I, H, B, T = 6, 5, 2, 7
    g = ChannelGraph()
    din = g.var("in", I, prunable=False)
    hidden = g.var("h", H)
    lstm = LSTM(Scope(g), din, hidden, bidirectional=bidirectional)
    p = lstm.init(jax.random.key(0))

    ref = torch.nn.LSTM(I, H, batch_first=True, bidirectional=bidirectional)
    with torch.no_grad():
        ref.weight_ih_l0.copy_(_t(p["fwd"]["w_ih"]).T)
        ref.weight_hh_l0.copy_(_t(p["fwd"]["w_hh"]).T)
        ref.bias_ih_l0.copy_(_t(p["fwd"]["b_ih"]))
        ref.bias_hh_l0.copy_(_t(p["fwd"]["b_hh"]))
        if bidirectional:
            ref.weight_ih_l0_reverse.copy_(_t(p["bwd"]["w_ih"]).T)
            ref.weight_hh_l0_reverse.copy_(_t(p["bwd"]["w_hh"]).T)
            ref.bias_ih_l0_reverse.copy_(_t(p["bwd"]["b_ih"]))
            ref.bias_hh_l0_reverse.copy_(_t(p["bwd"]["b_hh"]))

    x = np.random.default_rng(1).normal(size=(B, T, I)).astype(np.float32)
    with jax.default_matmul_precision("float32"):
        ours = np.asarray(lstm(p, jnp.asarray(x)))
    theirs = ref(torch.from_numpy(x))[0].detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_mha_parity_vs_torch():
    E, heads, B, N = 8, 2, 2, 5
    g = ChannelGraph()
    v = g.var("e", E)
    mha = MultiheadAttention(Scope(g), v, heads)
    p = mha.init(jax.random.key(0))

    ref = torch.nn.MultiheadAttention(E, heads, batch_first=True)
    with torch.no_grad():
        ref.in_proj_weight.copy_(_t(p["in_proj"]["kernel"]).T)
        ref.in_proj_bias.copy_(_t(p["in_proj"]["bias"]))
        ref.out_proj.weight.copy_(_t(p["out_proj"]["kernel"]).T)
        ref.out_proj.bias.copy_(_t(p["out_proj"]["bias"]))

    x = np.random.default_rng(2).normal(size=(B, N, E)).astype(np.float32)
    with jax.default_matmul_precision("float32"):
        ours = np.asarray(mha(p, jnp.asarray(x)))
    xt = torch.from_numpy(x)
    theirs = ref(xt, xt, xt, need_weights=False)[0].detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_depthwise_conv_parity_vs_torch():
    C, B = 6, 2
    g = ChannelGraph()
    v = g.var("c", C)
    dw = DepthwiseConv2D(Scope(g), v, 3, 1, 1)
    p = dw.init(jax.random.key(0))

    ref = torch.nn.Conv2d(C, C, 3, padding=1, groups=C)
    with torch.no_grad():
        # ours (k, k, 1, C) -> torch (C, 1, k, k)
        ref.weight.copy_(_t(np.transpose(p["kernel"], (3, 2, 0, 1))))
        ref.bias.copy_(_t(p["bias"]))

    x = np.random.default_rng(3).normal(size=(B, 5, 5, C)).astype(np.float32)
    ours = np.asarray(dw(p, jnp.asarray(x)))
    theirs = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    theirs = np.transpose(theirs.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_instance_norm_parity_vs_torch():
    C, B = 5, 2
    g = ChannelGraph()
    v = g.var("c", C)
    inorm = InstanceNorm(Scope(g), v)
    p = inorm.init(jax.random.key(0))
    p["scale"] = jnp.arange(1.0, C + 1.0)
    p["bias"] = jnp.arange(0.0, C * 0.1, 0.1)[:C]

    ref = torch.nn.InstanceNorm2d(C, affine=True)
    with torch.no_grad():
        ref.weight.copy_(_t(p["scale"]))
        ref.bias.copy_(_t(p["bias"]))

    x = np.random.default_rng(4).normal(size=(B, 4, 4, C)).astype(np.float32)
    ours = np.asarray(inorm(p, jnp.asarray(x)))
    theirs = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    theirs = np.transpose(theirs.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


# -- pruning consistency -----------------------------------------------------


def test_lstm_pruning_expanded_gate_slicing():
    """Pruning the hidden var slices all four gate blocks of the 4H axes plus
    the H rows of w_hh — exactly LSTMPruner's expanded_keep_idxs
    (function.py:384-399) — and both directions get the same indices."""
    I, H = 4, 6
    g = ChannelGraph()
    din = g.var("in", I, prunable=False)
    hidden = g.var("h", H)
    lstm = LSTM(Scope(g), din, hidden, bidirectional=True)
    p = lstm.init(jax.random.key(0))
    g.validate(p)

    keep = [1, 4, 5]
    out = slice_params(p, g, {"h": keep})
    exp = np.concatenate([np.asarray(keep) + i * H for i in range(4)])
    for d in ("fwd", "bwd"):
        np.testing.assert_allclose(out[d]["w_ih"], np.asarray(p[d]["w_ih"])[:, exp])
        np.testing.assert_allclose(
            out[d]["w_hh"], np.asarray(p[d]["w_hh"])[np.ix_(keep, exp)])
        np.testing.assert_allclose(out[d]["b_ih"], np.asarray(p[d]["b_ih"])[exp])
        np.testing.assert_allclose(out[d]["b_hh"], np.asarray(p[d]["b_hh"])[exp])
    # pruned forward runs at the new width, (B, T, 2*len(keep))
    y = lstm(out, jnp.ones((2, 3, I)))
    assert y.shape == (2, 3, 2 * len(keep))


def test_mha_pruning_head_uniform():
    """Embed var carries group_div=heads: pruning keeps each head the same
    size (the reference's embed_dim % num_heads == 0 check, function.py:449),
    and q/k/v blocks of in_proj slice at the right offsets."""
    E, heads = 8, 2
    g = ChannelGraph()
    v = g.var("e", E)
    mha = MultiheadAttention(Scope(g), v, heads)
    assert v.group_div == heads
    p = mha.init(jax.random.key(0))
    g.validate(p)

    from diff_pruning_tpu.pruning.pruner import prune

    res = prune(g, p, make_importance("magnitude"), sparsity=0.5)
    keep = np.asarray(res.keep["e"])
    assert len(keep) == 4 and sum(keep < 4) == 2  # uniform across the 2 heads
    out = slice_params(p, g, res.keep)
    exp = np.concatenate([keep + i * E for i in range(3)])
    np.testing.assert_allclose(
        out["in_proj"]["kernel"], np.asarray(p["in_proj"]["kernel"])[np.ix_(keep, exp)])
    y = mha(out, jnp.ones((2, 5, 4)))
    assert y.shape == (2, 5, 4)


def test_depthwise_instance_chain_channel_separable():
    """conv -> depthwise conv -> InstanceNorm all share one var; because the
    depthwise/IN path is channel-separable, the pruned forward must EQUAL the
    unpruned forward gathered at the kept channels."""
    g = ChannelGraph()
    cin = g.var("in", 3, prunable=False)
    v = g.var("mid", 8)
    s = Scope(g)
    conv = Conv2D(s("conv"), cin, v, 3, 1, 1)
    dw = DepthwiseConv2D(s("dw"), v, 3, 1, 1)
    inorm = InstanceNorm(s("inorm"), v)
    params = {"conv": conv.init(jax.random.key(0)),
              "dw": dw.init(jax.random.key(1)),
              "inorm": inorm.init(jax.random.key(2))}
    g.validate(params)

    x = jax.random.normal(jax.random.key(3), (2, 6, 6, 3))

    def fwd(p):
        return inorm(p["inorm"], dw(p["dw"], conv(p["conv"], x)))

    keep = [0, 2, 3, 7]
    pruned = slice_params(params, g, {"mid": keep})
    np.testing.assert_allclose(
        np.asarray(fwd(pruned)),
        np.asarray(fwd(params))[..., keep], atol=1e-5)
