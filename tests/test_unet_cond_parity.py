"""Numerical parity of UNetCond vs the reference CompVis UNetModel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.unet_cond import UNetCond, tiny_cond_config
from diff_pruning_tpu.utils.convert import ldm_unet_state_dict_to_params

torch = pytest.importorskip("torch")


def _ref_unet(cfg):
    import sys
    import types

    if "/root/reference/ldm_exp" not in sys.path:
        sys.path.insert(0, "/root/reference/ldm_exp")
    if "omegaconf" not in sys.modules:  # stub: only ListConfig is touched
        import importlib.machinery

        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")
        lc.ListConfig = list
        om.listconfig = lc
        om.__version__ = "0.0.0-stub"
        # give both real ModuleSpecs so importlib.util.find_spec (used by the
        # vendored diffusers' availability checks) doesn't raise
        om.__spec__ = importlib.machinery.ModuleSpec("omegaconf", None)
        lc.__spec__ = importlib.machinery.ModuleSpec("omegaconf.listconfig", None)
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    return UNetModel(
        image_size=cfg.image_size,
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        model_channels=cfg.model_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=list(cfg.attention_resolutions),
        channel_mult=list(cfg.channel_mult),
        num_heads=cfg.num_heads,
        use_spatial_transformer=True,
        transformer_depth=cfg.transformer_depth,
        context_dim=cfg.context_dim,
    )


def _make_cfg32():
    from diff_pruning_tpu.models.unet_cond import UNetCondConfig

    return UNetCondConfig(
        image_size=8, in_channels=3, out_channels=3, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, transformer_depth=1, context_dim=16, norm_num_groups=32)


def test_forward_matches_reference():
    cfg = _make_cfg32()
    torch.manual_seed(0)
    ref = _ref_unet(cfg).eval().float()
    params = ldm_unet_state_dict_to_params(ref.state_dict())
    model = UNetCond(cfg)
    model.graph.validate(params)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    t = np.array([3, 777], dtype=np.int64)
    ctx = rng.standard_normal((2, 1, 16)).astype(np.float32)

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(t),
                    context=torch.from_numpy(ctx)).numpy()
    with jax.default_matmul_precision("float32"):
        y = model(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
                  context=jnp.asarray(ctx))
    y = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_ref, atol=2e-3, rtol=2e-3)


def test_param_count_matches():
    cfg = _make_cfg32()
    ref = _ref_unet(cfg)
    n_ref = sum(p.numel() for p in ref.parameters())
    model = UNetCond(cfg)
    params = model.init(jax.random.key(0))
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    assert n == n_ref
