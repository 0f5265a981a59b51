"""Procedural image distributions for zero-egress validation runs.

No real dataset (CIFAR-10 etc.) can be downloaded in this environment, so
full-pipeline validation (docs/VALIDATION.md, docs/FULLRUN.md) trains on a
smooth, learnable procedural distribution: colored soft blobs on gradient
backgrounds. The *algorithmic* claims being validated (Taylor-sweep early
exit, pruning-criterion ordering, finetune recovery — reference
ddpm_prune.py:94-131) are distribution-agnostic.
"""

from __future__ import annotations

import numpy as np


def make_procedural_dataset(n: int = 4096, hw: int = 32, seed: int = 0) -> np.ndarray:
    """(n, hw, hw, 3) uint8 — colored soft blobs on gradient backgrounds."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32) / hw
    imgs = np.zeros((n, hw, hw, 3), np.float32)
    for i in range(n):
        bg = rng.uniform(0.1, 0.9, 3)
        grad_dir = rng.uniform(-1, 1, 2)
        base = bg[None, None] * (0.7 + 0.3 * (grad_dir[0] * xx + grad_dir[1] * yy))[..., None]
        img = base.copy()
        for _ in range(rng.integers(1, 4)):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            r = rng.uniform(0.08, 0.25)
            color = rng.uniform(0, 1, 3)
            d2 = (xx - cx) ** 2 + (yy - cy) ** 2
            mask = np.exp(-d2 / (2 * r * r))[..., None]
            img = img * (1 - mask) + color[None, None] * mask
        imgs[i] = np.clip(img, 0, 1)
    return (imgs * 255).astype(np.uint8)
