"""Inception Score / KID / improved precision-recall — the metric family of
the reference's `ldm_exp/test_diffusion.py` (a torch_fidelity wrapper with
isc=True, fid=True, kid=True, prc=True).

All three reuse the InceptionV3 features the FID pipeline already extracts
(eval/fid.compute_activations); ISC additionally needs the classifier
logits — the converter keeps the fc head (`torch_inception_state_dict_to_
params`) and :func:`inception_probs` applies it to pool3 features.

Semantics follow torch_fidelity's defaults: ISC splits=10; KID polynomial
kernel (x·y/d + 1)^3 with 100 subsets of size 1000, unbiased MMD²;
precision/recall per Kynkäänniemi et al. with k=3 NN manifolds.
The math is numpy/JAX (the pairwise-distance and kernel matmuls ride the
MXU via jnp where it matters); golden-tested against hand-computable cases.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def inception_probs(inception_params: dict, pool3: np.ndarray) -> np.ndarray:
    """pool3 (N, 2048) -> class probabilities (N, 1008) via the fc head."""
    fc = inception_params.get("fc")
    if fc is None:
        raise ValueError("inception params lack the fc head — reconvert with "
                         "tools/convert_checkpoints.py inception (the head "
                         "is kept since the fidelity metrics were added)")
    logits = pool3 @ np.asarray(fc["kernel"]) + np.asarray(fc["bias"])
    x = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)


def inception_score(probs: np.ndarray, *, splits: int = 10
                    ) -> Tuple[float, float]:
    """ISC over (N, C) class probabilities: exp(E_x KL(p(y|x) || p(y)))
    per split; returns (mean, std) over the splits."""
    n = len(probs)
    scores = []
    for part in np.array_split(np.arange(n), splits):
        p = probs[part]
        py = p.mean(axis=0, keepdims=True)
        kl = np.sum(p * (np.log(p + 1e-16) - np.log(py + 1e-16)), axis=1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))


def _poly_kernel(x, y, *, degree=3, coef0=1.0):
    gamma = 1.0 / x.shape[1]
    return (x @ y.T * gamma + coef0) ** degree


def kid(feat1: np.ndarray, feat2: np.ndarray, *, subset_size: int = 1000,
        subsets: int = 100, seed: int = 0) -> Tuple[float, float]:
    """Kernel Inception Distance: unbiased MMD² with the cubic polynomial
    kernel, averaged over random subsets; returns (mean, std)."""
    rng = np.random.default_rng(seed)
    m = min(subset_size, len(feat1), len(feat2))
    vals = []
    f1 = jnp.asarray(feat1, jnp.float32)
    f2 = jnp.asarray(feat2, jnp.float32)

    @jax.jit
    def mmd2(x, y):
        kxx = _poly_kernel(x, x)
        kyy = _poly_kernel(y, y)
        kxy = _poly_kernel(x, y)
        s = x.shape[0]
        t1 = (jnp.sum(kxx) - jnp.trace(kxx)) / (s * (s - 1))
        t2 = (jnp.sum(kyy) - jnp.trace(kyy)) / (s * (s - 1))
        return t1 + t2 - 2.0 * jnp.mean(kxy)

    for _ in range(subsets):
        i = rng.choice(len(feat1), m, replace=False)
        j = rng.choice(len(feat2), m, replace=False)
        vals.append(float(mmd2(f1[i], f2[j])))
    return float(np.mean(vals)), float(np.std(vals))


def precision_recall(feat_real: np.ndarray, feat_gen: np.ndarray, *,
                     k: int = 3) -> Dict[str, float]:
    """Improved precision & recall (Kynkäänniemi et al. 2019): a sample is
    covered if it falls inside any reference ball of radius = that
    reference point's k-th-NN distance. precision = gen covered by the
    real manifold; recall = real covered by the gen manifold."""
    r = jnp.asarray(feat_real, jnp.float32)
    g = jnp.asarray(feat_gen, jnp.float32)

    @jax.jit
    def pair_d2(a, b):
        an = jnp.sum(a * a, axis=1, keepdims=True)
        bn = jnp.sum(b * b, axis=1)
        return jnp.maximum(an - 2.0 * (a @ b.T) + bn[None, :], 0.0)

    @jax.jit
    def knn_radius2(a):
        d2 = pair_d2(a, a)
        d2 = d2.at[jnp.arange(a.shape[0]), jnp.arange(a.shape[0])].set(jnp.inf)
        # k-th smallest distance per row
        return -jax.lax.top_k(-d2, k)[0][:, -1]

    def coverage(ref, samples):
        rad2 = knn_radius2(ref)
        d2 = pair_d2(samples, ref)
        inside = jnp.any(d2 <= rad2[None, :], axis=1)
        return float(jnp.mean(inside.astype(jnp.float32)))

    return {"precision": coverage(r, g), "recall": coverage(g, r)}
