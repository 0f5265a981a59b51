"""Model preset param counts vs the reference's published numbers."""

import numpy as np
import pytest

import jax

from diff_pruning_tpu.models.unet2d import (
    UNet2D,
    ddpm_celeba64_config,
    ddpm_cifar10_config,
    ddpm_lsun256_config,
)


def _count(cfg):
    m = UNet2D(cfg)
    p = jax.eval_shape(lambda: m.init(jax.random.key(0)))
    return sum(int(np.prod(v.shape)) for v in jax.tree.leaves(p))


def test_cifar10_params():
    assert abs(_count(ddpm_cifar10_config()) - 35.7e6) < 0.2e6


def test_celeba64_params():
    # BASELINE.md: CelebA-HQ pretrained 78.7M
    assert abs(_count(ddpm_celeba64_config()) - 78.7e6) < 0.5e6


def test_lsun256_params():
    # BASELINE.md: LSUN church/bedroom pretrained 113.7M
    assert abs(_count(ddpm_lsun256_config()) - 113.7e6) < 0.8e6
