"""diffusers ``save_pretrained`` EXPORT round-trip (VERDICT r3 missing #1).

The reference persists pruned/finetuned pipelines with
``pipeline.save_pretrained(args.save_path)`` (ddpm_prune.py:132) so HF
tooling can consume them. `export_diffusers_pipeline` writes that layout
(model_index.json + unet/{config.json, safetensors} + scheduler config);
these tests round-trip it through our own importer and check the layout
contract stock diffusers expects.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_pruning_tpu.models.unet2d import UNet2D, UNet2DConfig
from diff_pruning_tpu.pruning.importance import make_importance
from diff_pruning_tpu.pruning.pruner import apply_pruning, prune
from diff_pruning_tpu.utils.convert import (export_diffusers_pipeline,
                                            load_diffusers_unet_checkpoint)


@pytest.fixture(scope="module")
def tiny():
    cfg = UNet2DConfig(
        sample_size=16,
        block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        attention_head_dim=8,
        norm_num_groups=8,
    )
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    return cfg, model, params


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    # tree_leaves_with_path returns list of (path, leaf); compare by path
    fb = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(b)}
    for p, va in fa:
        vb = fb.pop(jax.tree_util.keystr(p))
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    assert not fb


def test_export_layout(tmp_path, tiny):
    cfg, model, params = tiny
    dst = str(tmp_path / "pipe")
    export_diffusers_pipeline(dst, cfg, params)

    with open(os.path.join(dst, "model_index.json")) as f:
        idx = json.load(f)
    assert idx["_class_name"] == "DDPMPipeline"
    assert idx["unet"] == ["diffusers", "UNet2DModel"]
    assert idx["scheduler"] == ["diffusers", "DDPMScheduler"]

    with open(os.path.join(dst, "unet", "config.json")) as f:
        ucfg = json.load(f)
    assert ucfg["_class_name"] == "UNet2DModel"
    assert tuple(ucfg["block_out_channels"]) == cfg.block_out_channels
    # unpruned export: no channel_sizes key (stock diffusers layout)
    assert "channel_sizes" not in ucfg

    with open(os.path.join(dst, "scheduler", "scheduler_config.json")) as f:
        scfg = json.load(f)
    assert scfg["_class_name"] == "DDPMScheduler"
    assert scfg["num_train_timesteps"] == 1000

    assert os.path.exists(os.path.join(
        dst, "unet", "diffusion_pytorch_model.safetensors"))


def test_export_import_round_trip_bit_equal(tmp_path, tiny):
    cfg, model, params = tiny
    dst = str(tmp_path / "pipe")
    export_diffusers_pipeline(dst, cfg, params)

    back = load_diffusers_unet_checkpoint(os.path.join(dst, "unet"))
    with open(os.path.join(dst, "unet", "config.json")) as f:
        cfg2 = UNet2DConfig.from_json(f.read())
    assert cfg2.block_out_channels == cfg.block_out_channels
    UNet2D(cfg2).graph.validate(back)
    _tree_equal(params, back)


def test_export_pruned_keeps_channel_sizes(tmp_path, tiny):
    """Pruned-shape models can't instantiate in stock diffusers (the
    reference pickles them instead, ddpm_prune.py:133-135); OUR export keeps
    channel_sizes in the config so our importer round-trips them."""
    cfg, model, params = tiny
    res = prune(model.graph, params, make_importance("magnitude"),
                sparsity=0.25)
    pruned = apply_pruning(params, model.graph, res)
    pcfg = cfg.with_channel_sizes(res.channel_sizes)

    dst = str(tmp_path / "pruned_pipe")
    export_diffusers_pipeline(dst, pcfg, pruned,
                              pipeline_class="DDIMPipeline",
                              scheduler_class="DDIMScheduler")

    with open(os.path.join(dst, "unet", "config.json")) as f:
        ucfg_json = f.read()
    assert "channel_sizes" in json.loads(ucfg_json)
    cfg2 = UNet2DConfig.from_json(ucfg_json)
    assert cfg2.channel_sizes == res.channel_sizes

    back = load_diffusers_unet_checkpoint(os.path.join(dst, "unet"))
    UNet2D(cfg2).graph.validate(back)
    _tree_equal(pruned, back)

    with open(os.path.join(dst, "scheduler", "scheduler_config.json")) as f:
        scfg = json.load(f)
    assert scfg["_class_name"] == "DDIMScheduler"
    assert "set_alpha_to_one" in scfg


def test_export_casts_bf16_to_f32(tmp_path, tiny):
    cfg, model, params = tiny
    bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    dst = str(tmp_path / "bf16_pipe")
    export_diffusers_pipeline(dst, cfg, bf16)
    back = load_diffusers_unet_checkpoint(os.path.join(dst, "unet"))
    leaf = jax.tree_util.tree_leaves(back)[0]
    assert np.asarray(leaf).dtype == np.float32
