"""Notebook helper flow (ldm_exp/notebook_helpers.py + the
latent_imagenet_diffusion.ipynb workflow) on a tiny preset."""

import numpy as np

from diff_pruning_tpu.utils.notebook import (get_model, run_inpaint,
                                             sample_classes, to_pil)


def test_get_model_preset_and_sample_classes():
    ldm, params = get_model("tiny_cond")
    imgs = sample_classes(ldm, params, classes=(0, 1), n_per_class=2,
                          ddim_steps=2, scale=1.5)
    hw = ldm.unet.cfg.image_size
    assert imgs.shape == (4, hw, hw, 3) if ldm.first_stage is None else True
    assert np.isfinite(imgs).all()
    pil = to_pil(imgs, nrow=2)
    assert pil.size[0] > 0


def test_get_model_rejects_unknown():
    try:
        get_model("no_such_preset_xyz")
    except ValueError as e:
        assert "presets" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_run_inpaint_shapes():
    import jax

    import dataclasses

    from diff_pruning_tpu.models.unet_cond import UNetCond, tiny_cond_config

    base = tiny_cond_config()
    # concat task: in_channels = latent(3) + masked-img(3) + mask(1)
    ucfg = dataclasses.replace(base, in_channels=7, out_channels=3,
                               context_dim=None)
    unet = UNetCond(ucfg)
    params = unet.init(jax.random.key(0))
    hw = ucfg.image_size
    img = np.random.default_rng(0).uniform(0, 1, (2, hw, hw, 3)).astype(np.float32)
    mask = np.zeros((2, hw, hw), np.float32)
    mask[:, : hw // 2] = 1.0
    out = run_inpaint(unet, params, img, mask, ddim_steps=2)
    assert out.shape == (2, hw, hw, 3)
    assert np.isfinite(out).all()
