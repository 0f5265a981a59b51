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


def inception_probs(inception_params: dict, pool3: np.ndarray, *,
                    unbiased: bool = True) -> np.ndarray:
    """pool3 (N, 2048) -> class probabilities (N, 1008) via the fc head.

    ``unbiased=True`` (default) drops the fc bias like torch_fidelity's
    'logits_unbiased' — the original OpenAI IS formulation the reference
    suite reproduces."""
    fc = inception_params.get("fc")
    if fc is None:
        raise ValueError("inception params lack the fc head — reconvert with "
                         "tools/convert_checkpoints.py inception (the head "
                         "is kept since the fidelity metrics were added)")
    logits = pool3 @ np.asarray(fc["kernel"])
    if not unbiased:
        logits = logits + np.asarray(fc["bias"])
    x = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)


def inception_score(probs: np.ndarray, *, splits: int = 10,
                    shuffle: bool = True, seed: int = 0
                    ) -> Tuple[float, float]:
    """ISC over (N, C) class probabilities: exp(E_x KL(p(y|x) || p(y)))
    per split; returns (mean, std) over the splits.

    Samples are shuffled first like torch_fidelity (samples_shuffle=True):
    class-ordered inputs (e.g. ldm_sample's class-by-class dirs) would
    otherwise concentrate each split's marginal p(y). splits is clamped to
    the sample count so tiny inputs never produce empty (NaN) splits."""
    n = len(probs)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    scores = []
    for part in np.array_split(order, min(splits, n)):
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
    f1 = jnp.asarray(feat1, jnp.float32)
    f2 = jnp.asarray(feat2, jnp.float32)
    # all subset indices stacked -> ONE jitted vmapped dispatch (per-subset
    # dispatches would pay this platform's seconds-scale round trip x100)
    idx1 = np.stack([rng.choice(len(feat1), m, replace=False)
                     for _ in range(subsets)])
    idx2 = np.stack([rng.choice(len(feat2), m, replace=False)
                     for _ in range(subsets)])

    @jax.jit
    def all_mmd2(i1, i2):
        def mmd2(i, j):
            x, y = f1[i], f2[j]
            kxx = _poly_kernel(x, x)
            kyy = _poly_kernel(y, y)
            kxy = _poly_kernel(x, y)
            s = x.shape[0]
            t1 = (jnp.sum(kxx) - jnp.trace(kxx)) / (s * (s - 1))
            t2 = (jnp.sum(kyy) - jnp.trace(kyy)) / (s * (s - 1))
            return t1 + t2 - 2.0 * jnp.mean(kxy)

        return jax.vmap(mmd2)(i1, i2)

    vals = np.asarray(all_mmd2(jnp.asarray(idx1), jnp.asarray(idx2)))
    return float(np.mean(vals)), float(np.std(vals))


def precision_recall(feat_real: np.ndarray, feat_gen: np.ndarray, *,
                     k: int = 3, row_chunk: int = 4096) -> Dict[str, float]:
    """Improved precision & recall (Kynkäänniemi et al. 2019): a sample is
    covered if it falls inside any reference ball of radius = that
    reference point's k-th-NN distance. precision = gen covered by the
    real manifold; recall = real covered by the gen manifold.

    Distances are computed in row chunks (like torch_fidelity): the naive
    NxN matrix at the 50k-vs-50k FID scale would be 10 GB and exceed one
    v5e's HBM."""
    r = jnp.asarray(feat_real, jnp.float32)
    g = jnp.asarray(feat_gen, jnp.float32)

    @jax.jit
    def chunk_d2(a, b):
        an = jnp.sum(a * a, axis=1, keepdims=True)
        bn = jnp.sum(b * b, axis=1)
        return jnp.maximum(an - 2.0 * (a @ b.T) + bn[None, :], 0.0)

    @jax.jit
    def chunk_knn_radius2(rows, full, start):
        d2 = chunk_d2(rows, full)
        n = rows.shape[0]
        # mask each row's own diagonal entry
        cols = jnp.arange(full.shape[0])[None, :]
        own = cols == (start + jnp.arange(n))[:, None]
        d2 = jnp.where(own, jnp.inf, d2)
        return -jax.lax.top_k(-d2, k)[0][:, -1]

    def knn_radius2(a):
        return jnp.concatenate([
            chunk_knn_radius2(a[i:i + row_chunk], a, i)
            for i in range(0, a.shape[0], row_chunk)])

    @jax.jit
    def chunk_inside(rows, ref, rad2):
        d2 = chunk_d2(rows, ref)
        return jnp.any(d2 <= rad2[None, :], axis=1)

    def coverage(ref, samples):
        rad2 = knn_radius2(ref)
        inside = jnp.concatenate([
            chunk_inside(samples[i:i + row_chunk], ref, rad2)
            for i in range(0, samples.shape[0], row_chunk)])
        return float(jnp.mean(inside.astype(jnp.float32)))

    return {"precision": coverage(r, g), "recall": coverage(g, r)}
