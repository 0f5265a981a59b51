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


def _ref_unet_kw(**kw):
    _ref_unet(_make_cfg32())  # ensure shims installed
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    return UNetModel(**kw)


def _tiny_attnblock_cfg(scale_shift=True, updown=True):
    from diff_pruning_tpu.models.unet_cond import UNetCondConfig

    return UNetCondConfig(
        image_size=8, in_channels=3, out_channels=3, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, context_dim=None, use_spatial_transformer=False,
        use_scale_shift_norm=scale_shift, resblock_updown=updown,
        norm_num_groups=32)


@pytest.mark.parametrize("scale_shift,updown", [(False, False), (True, True)])
def test_attnblock_variants_match_reference(scale_shift, updown):
    """The non-spatial-transformer AttentionBlock (fused head-interleaved
    qkv), scale-shift norm, and resblock up/down variants
    (openaimodel.py:207-246,278-341) — the lsun_churches / celebahq /
    ffhq / bedrooms yaml family."""
    cfg = _tiny_attnblock_cfg(scale_shift, updown)
    torch.manual_seed(0)
    ref = _ref_unet_kw(
        image_size=cfg.image_size, in_channels=3, out_channels=3,
        model_channels=32, num_res_blocks=1, attention_resolutions=[2],
        channel_mult=[1, 2], num_heads=2,
        use_scale_shift_norm=scale_shift, resblock_updown=updown,
    ).eval().float()
    model = UNetCond(cfg)
    params = ldm_unet_state_dict_to_params(ref.state_dict(),
                                           attn_heads=model.attn_heads)
    model.graph.validate(params)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    t = np.array([10, 500], dtype=np.int64)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    with jax.default_matmul_precision("float32"):
        y = model(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    y = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(y, y_ref, atol=2e-3, rtol=2e-3)


def test_zoo_preset_param_counts():
    """Every served LDM zoo yaml's UNet, pinned against the reference
    openaimodel instantiation (exact)."""
    from diff_pruning_tpu.models.unet_cond import (celebahq_ldm_vq4_config,
                                                   cin_ldm_vq_f8_config,
                                                   inpainting_big_config,
                                                   lsun_churches_ldm_kl8_config,
                                                   rdm768_config)

    def n_jax(cfg):
        # eval_shape: identical pytree/shapes without materializing the
        # arrays (3.4B params across these presets — was the slowest test
        # in the suite at ~2 min; the assertion surface is unchanged)
        m = UNetCond(cfg)
        p = jax.eval_shape(m.init, jax.random.key(0))
        return sum(int(np.prod(v.shape)) for v in jax.tree.leaves(p))

    # counts produced by instantiating the reference UNetModel with each
    # yaml's unet_config (run once, recorded here — avoids building the
    # 274-395M torch models in the suite)
    assert n_jax(celebahq_ldm_vq4_config()) == 274_056_163
    assert n_jax(lsun_churches_ldm_kl8_config()) == 294_966_916
    assert n_jax(cin_ldm_vq_f8_config()) == 394_984_196
    assert n_jax(inpainting_big_config()) == 387_245_827
    assert n_jax(rdm768_config()) == 1_335_480_400
    from diff_pruning_tpu.models.unet_cond import (
        bsr_sr_config, layout2img_openimages256_config,
        semantic_synthesis256_config, semantic_synthesis512_config,
        text2img256_config)

    assert n_jax(bsr_sr_config()) == 113_622_563
    assert n_jax(layout2img_openimages256_config()) == 246_277_379
    assert n_jax(semantic_synthesis256_config()) == 215_229_315
    assert n_jax(semantic_synthesis512_config()) == 215_229_315
    assert n_jax(text2img256_config()) == 403_623_939


def test_attnblock_prune_rebuild():
    cfg = _tiny_attnblock_cfg(True, True)
    from diff_pruning_tpu.pruning.importance import make_importance
    from diff_pruning_tpu.pruning.pruner import apply_pruning, prune

    model = UNetCond(cfg)
    params = model.init(jax.random.key(0))
    res = prune(model.graph, params, make_importance("magnitude"), sparsity=0.25)
    p2 = apply_pruning(params, model.graph, res)
    m2 = UNetCond(cfg.with_channel_sizes(res.channel_sizes))
    m2.graph.validate(p2)
    y = m2(p2, jnp.zeros((1, 8, 8, 3)), jnp.asarray([5]))
    assert y.shape == (1, 8, 8, 3)
