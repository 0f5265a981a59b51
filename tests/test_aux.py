"""Aux subsystems: regularizers, visualizers, trajectory sampling, converters."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.unet2d import UNet2D, tiny_unet_config
from diff_pruning_tpu.pruning.regularize import (
    group_l2_norms,
    group_lasso_grads,
    l1_norm_scale_penalty,
)
from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_unet_config(attn=False)
    m = UNet2D(cfg)
    return cfg, m, m.init(jax.random.key(0))


def test_l1_penalty_positive_and_grows(tiny):
    _, m, p = tiny
    v = float(l1_norm_scale_penalty(m.graph, p, coeff=1.0))
    assert v > 0
    p2 = jax.tree.map(lambda x: x * 2.0, p)
    assert float(l1_norm_scale_penalty(m.graph, p2, coeff=1.0)) > v


def test_group_l2_norms_shapes(tiny):
    _, m, p = tiny
    norms = group_l2_norms(m.graph, p)
    for var in m.graph.prunable_vars():
        assert norms[var.name].shape == (var.size,)
        assert np.all(np.asarray(norms[var.name]) >= 0)


def test_group_lasso_pushes_weak_channels(tiny):
    _, m, p = tiny
    zero_grads = jax.tree.map(jnp.zeros_like, p)
    g = group_lasso_grads(m.graph, p, zero_grads, reg=1e-2)
    # at least one registered weight axis must receive a non-zero decay grad
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert total > 0


def test_visualizers(tiny, tmp_path):
    from diff_pruning_tpu.pruning.importance import make_importance
    from diff_pruning_tpu.pruning.pruner import prune
    from diff_pruning_tpu.pruning.visualize import (
        draw_dependency_graph,
        draw_importance_bars,
        var_adjacency,
    )

    cfg, m, p = tiny
    names, adj = var_adjacency(m.graph)
    assert adj.sum() > 0 and (adj == adj.T).all()
    draw_dependency_graph(m.graph, str(tmp_path / "graph.png"))
    assert os.path.exists(tmp_path / "graph.png")
    res = prune(m.graph, p, make_importance("magnitude"), sparsity=0.3)
    draw_importance_bars({k: v for k, v in list(res.scores.items())[:2]},
                         str(tmp_path / "imps"), keep=res.keep)
    assert len(os.listdir(tmp_path / "imps")) == 2


def test_trajectory_and_interpolation(tiny):
    from diff_pruning_tpu.sampling.trajectories import (
        sample_interpolation,
        sample_trajectory,
        slerp,
    )

    cfg, m, p = tiny
    sched = DiffusionSchedule.create()
    traj = sample_trajectory(m, p, sched, key=jax.random.key(0), batch_size=2,
                             hw=16, num_inference_steps=4)
    assert traj.shape == (5, 2, 16, 16, 3)
    interp = sample_interpolation(m, p, sched, key=jax.random.key(0), hw=16,
                                  n_alphas=5, num_inference_steps=3)
    assert interp.shape == (5, 16, 16, 3)
    # slerp endpoints reproduce the inputs
    z1 = jax.random.normal(jax.random.key(1), (4, 4, 3))
    z2 = jax.random.normal(jax.random.key(2), (4, 4, 3))
    out = slerp(z1, z2, jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(z1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(z2), atol=1e-5)


def test_ddim_original_converter_roundtrip():
    """Synthesize a DDIM-style state dict (incl. attention blocks with
    1x1-conv q/k/v) and check the converter produces a graph-valid,
    numerically identical param tree."""
    torch = pytest.importorskip("torch")
    from diff_pruning_tpu.utils.convert import (
        ddim_original_state_dict_to_params,
        params_to_torch_state_dict,
    )

    cfg = tiny_unet_config(attn=True)
    m = UNet2D(cfg)
    p = m.init(jax.random.key(1))
    # build the ddim-style names from our torch-style export
    sd = params_to_torch_state_dict(p)
    ddim_sd = {}
    L = len(cfg.block_out_channels)
    for k, v in sd.items():
        n = k
        n = n.replace("time_embedding.linear_1.", "temb.dense.0.")
        n = n.replace("time_embedding.linear_2.", "temb.dense.1.")
        n = n.replace("conv_norm_out.", "norm_out.")
        n = n.replace("mid_block.resnets.0.", "mid.block_1.")
        n = n.replace("mid_block.resnets.1.", "mid.block_2.")
        n = n.replace("mid_block.attentions.0.", "mid.attn_1.")
        if n.startswith("down_blocks."):
            n = "down." + n[len("down_blocks."):]
        if n.startswith("up_blocks."):
            segs = n.split(".")
            segs[0] = "up"
            segs[1] = str(L - 1 - int(segs[1]))
            n = ".".join(segs)
        n = n.replace(".resnets.", ".block.")
        n = n.replace(".attentions.", ".attn.")
        n = n.replace(".downsamplers.0.conv.", ".downsample.conv.")
        n = n.replace(".upsamplers.0.conv.", ".upsample.conv.")
        n = n.replace(".time_emb_proj.", ".temb_proj.")
        n = n.replace(".conv_shortcut.", ".nin_shortcut.")
        if ".attn." in n or ".attn_1." in n:
            n = n.replace(".group_norm.", ".norm.")
            n = n.replace(".to_q.", ".q.").replace(".to_k.", ".k.")
            n = n.replace(".to_v.", ".v.").replace(".to_out.0.", ".proj_out.")
            if n.endswith(".weight") and v.ndim == 2:
                v = v[:, :, None, None]  # linear -> 1x1 conv layout
        # .copy(): torch warns on (and may alias) non-writable numpy views
        ddim_sd[n] = torch.from_numpy(np.ascontiguousarray(v).copy())

    params2 = ddim_original_state_dict_to_params(ddim_sd, num_levels=L)
    m.graph.validate(params2)
    flat_a = dict(jax.tree_util.tree_flatten_with_path(p)[0][:0])
    # numerical identity through the round trip
    from diff_pruning_tpu.pruning.surgery import flatten_params

    fa, fb = flatten_params(p), flatten_params(params2)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   err_msg=k)


def test_taylor_scaled_regularizer(tiny):
    from diff_pruning_tpu.pruning.regularize import taylor_scaled_grads

    _, m, p = tiny
    ones_grads = jax.tree.map(jnp.ones_like, p)
    g = taylor_scaled_grads(m.graph, p, ones_grads, reg=1e-2)
    # decay added on top of the incoming grads
    delta = sum(float(jnp.abs(a - b).sum())
                for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ones_grads)))
    assert delta > 0
    # weak channels (low |w·g|) must receive LARGER decay scale: zero a
    # channel's weights -> its score is minimal -> scale is base**1 (max)
    # sanity via shapes only here; the scale ordering is covered by
    # group_lasso's shared codepath


def test_scaling_factor_regularizer(tiny):
    from diff_pruning_tpu.pruning.regularize import scaling_factor_grads
    from diff_pruning_tpu.pruning.surgery import get_path

    _, m, p = tiny
    zero_grads = jax.tree.map(jnp.zeros_like, p)
    g = scaling_factor_grads(m.graph, p, zero_grads, reg=1e-2)
    # ONLY norm-scale refs receive decay (scaling_factor_pruner.py:76-89)
    norm_params = {r.param for r in m.graph.refs if r.role == "norm"}
    for ref in m.graph.refs:
        arr = np.asarray(get_path(g, ref.param))
        if ref.param in norm_params:
            assert np.abs(arr).sum() > 0, ref.param
    nonnorm_delta = 0.0
    flat_g = dict()
    from diff_pruning_tpu.pruning.surgery import flatten_params

    fg = flatten_params(g)
    for k, v in fg.items():
        if k not in norm_params:
            nonnorm_delta += float(jnp.abs(v).sum())
    assert nonnorm_delta == 0.0


def test_ckpt_util_local_resolution(tmp_path):
    """ckpt_util.py port: same cache layout and MD5 verification, fetch
    replaced by a clear local-placement error (zero-egress)."""
    from diff_pruning_tpu.utils.ckpt_util import get_ckpt_path, md5_hash

    with pytest.raises(FileNotFoundError, match="no network access"):
        get_ckpt_path("ema_cifar10", root=str(tmp_path))
    # place a file -> resolves; church_outdoor alias maps to church
    p = tmp_path / "ema_diffusion_cifar10_model"
    os.makedirs(p)
    (p / "model-790000.ckpt").write_bytes(b"fake")
    assert get_ckpt_path("ema_cifar10", root=str(tmp_path)).endswith(
        "model-790000.ckpt")
    with pytest.raises(ValueError, match="MD5"):
        get_ckpt_path("ema_cifar10", root=str(tmp_path), check=True)
    with pytest.raises(KeyError):
        get_ckpt_path("nope", root=str(tmp_path))
    assert md5_hash(str(p / "model-790000.ckpt")) == \
        __import__("hashlib").md5(b"fake").hexdigest()


def test_spatial_rescaler():
    """modules.py:106-135 SpatialRescaler: n_stages of halving + 1x1 map."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diff_pruning_tpu.models.latent_diffusion import SpatialRescaler

    r = SpatialRescaler(n_stages=2, method="bilinear", multiplier=0.5,
                        in_channels=3, out_channels=5)
    p = r.init(jax.random.key(0))
    y = r(p, jnp.ones((2, 16, 16, 3)))
    assert y.shape == (2, 4, 4, 5)
    # nearest at multiplier 0.5 == stride-2 subsampling of the torch impl
    rn = SpatialRescaler(n_stages=1, method="nearest")
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    yn = rn({}, x)
    np.testing.assert_allclose(np.asarray(yn), np.asarray(x[:, ::2, ::2]))


def test_scoped_vmem_flag_staging(monkeypatch):
    """utils/tpu_flags: the scoped-VMEM knob must stage into
    LIBTPU_INIT_ARGS (replacing an existing setting, preserving others),
    no-op on None, and fail loudly once the backend is up (the flag is
    only read at backend startup)."""
    from diff_pruning_tpu.utils import tpu_flags

    real_initialized = tpu_flags._backend_initialized
    monkeypatch.setattr(tpu_flags, "_backend_initialized", lambda: False)
    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       "--xla_other=1 --xla_tpu_scoped_vmem_limit_kib=1024")
    tpu_flags.set_scoped_vmem_limit(None)
    assert os.environ["LIBTPU_INIT_ARGS"] == (
        "--xla_other=1 --xla_tpu_scoped_vmem_limit_kib=1024")
    tpu_flags.set_scoped_vmem_limit(65536)
    assert os.environ["LIBTPU_INIT_ARGS"] == (
        "--xla_other=1 --xla_tpu_scoped_vmem_limit_kib=65536")
    # this test process HAS an initialized (CPU) backend: the real guard
    monkeypatch.setattr(tpu_flags, "_backend_initialized", real_initialized)
    jax.devices()
    with pytest.raises(RuntimeError):
        tpu_flags.set_scoped_vmem_limit(65536)
    # the CLI arg attaches and defaults to None
    import argparse

    p = argparse.ArgumentParser()
    tpu_flags.add_scoped_vmem_arg(p)
    assert p.parse_args([]).scoped_vmem_kib is None
    assert p.parse_args(["--scoped_vmem_kib", "65536"]).scoped_vmem_kib == 65536
