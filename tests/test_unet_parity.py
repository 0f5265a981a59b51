"""Numerical parity of the JAX UNet2D against the reference torch model.

Builds the vendored diffusers UNet2DModel (reference, read-only) on a tiny
config, transplants its weights through the converter, and checks forward
outputs agree to float32 tolerance. This pins every architectural detail
(GN eps/groups, attention scaling+residual, skip-concat order, asymmetric
downsample padding, timestep embedding with freq_shift=1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.unet2d import UNet2D, UNet2DConfig, tiny_unet_config
from diff_pruning_tpu.utils.convert import torch_state_dict_to_params

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


def _load_reference_unet(cfg: UNet2DConfig):
    import sys

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # The vendored diffusers (0.17.0.dev0) expects an older huggingface_hub;
    # shim the removed symbol so the reference model imports for comparison.
    import huggingface_hub

    if not hasattr(huggingface_hub, "cached_download"):
        huggingface_hub.cached_download = huggingface_hub.hf_hub_download
    if not hasattr(jax.random, "KeyArray"):  # removed in modern JAX
        jax.random.KeyArray = jax.Array
    from diffusers.models.unet_2d import UNet2DModel

    return UNet2DModel(
        sample_size=cfg.sample_size,
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        down_block_types=list(cfg.down_block_types),
        up_block_types=list(cfg.up_block_types),
        block_out_channels=list(cfg.block_out_channels),
        layers_per_block=cfg.layers_per_block,
        downsample_padding=cfg.downsample_padding,
        attention_head_dim=cfg.attention_head_dim,
        norm_num_groups=cfg.norm_num_groups,
        norm_eps=cfg.norm_eps,
        freq_shift=cfg.freq_shift,
        flip_sin_to_cos=cfg.flip_sin_to_cos,
    )


@pytest.mark.parametrize("attn", [True, False])
def test_forward_matches_reference(attn):
    cfg = tiny_unet_config(attn=attn)
    ref = _load_reference_unet(cfg).eval()
    params = torch_state_dict_to_params(ref.state_dict())

    model = UNet2D(cfg)
    model.graph.validate(params)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.array([7, 423], dtype=np.int64)

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(t)).sample.numpy()

    # JAX's DEFAULT matmul precision is reduced (bf16-grade MXU passes on
    # TPU); force true f32 for the numerical comparison.
    with jax.default_matmul_precision("float32"):
        y = model(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    y = np.asarray(y).transpose(0, 3, 1, 2)

    # Residual slack covers sin/cos range-reduction differences in the
    # timestep embedding at large t (~4e-4); structural errors are >>1e-2.
    np.testing.assert_allclose(y, y_ref, atol=2e-3, rtol=2e-3)


def test_param_count_matches_reference():
    cfg = tiny_unet_config()
    ref = _load_reference_unet(cfg)
    n_ref = sum(p.numel() for p in ref.parameters())
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    assert n == n_ref
