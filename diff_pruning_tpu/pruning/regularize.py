"""Sparse-training regularizers — functional ports of the vendored
torch_pruning regularizing pruners (present in the reference for
completeness, unused by its shipped scripts; SURVEY.md §2.2):

* :func:`l1_norm_scale_penalty` — BNScalePruner.regularize's L1 on norm
  gammas (batchnorm_scale_pruner.py:45-48), here applied to GN/LN scales.
* :func:`group_lasso_grads` — GroupNormPruner.regularize's exponential
  group-norm-scaled decay added to grads
  (group_norm_pruner.py:54-180: scale = 2^(alpha (max-gn)/(max-min))).

Both are pure: penalty terms to add to the loss / grad transforms to chain
before the optimizer, driven by the same ChannelGraph the pruner uses.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .graph import ChannelGraph
from .surgery import get_path


def l1_norm_scale_penalty(graph: ChannelGraph, params, *, coeff: float = 1e-5):
    """coeff * sum |gamma| over every registered norm-scale axis."""
    total = 0.0
    seen = set()
    for ref in graph.refs:
        if ref.role != "norm" or ref.param in seen:
            continue
        seen.add(ref.param)
        total = total + jnp.abs(get_path(params, ref.param)).sum()
    return coeff * total


def group_l2_norms(graph: ChannelGraph, params) -> Dict[str, jnp.ndarray]:
    """Per-channel L2 norm of each prunable var's full group (the quantity
    GroupNormImportance scores; importance.py:227-330)."""
    out = {}
    for v in graph.prunable_vars():
        sq = jnp.zeros((v.size,))
        for ref, off in graph.refs_of(v):
            if ref.role == "bias":
                continue
            arr = get_path(params, ref.param)
            arr = jnp.moveaxis(arr, ref.axis, 0)
            arr = jax.lax.dynamic_slice_in_dim(arr, off, v.size, axis=0)
            sq = sq + (arr.reshape(v.size, -1).astype(jnp.float32) ** 2).sum(axis=1)
        out[v.name] = jnp.sqrt(sq)
    return out


def group_lasso_grads(graph: ChannelGraph, params, grads, *,
                      reg: float = 1e-4, alpha: float = 4.0):
    """Add exponential group-norm-scaled weight decay to grads.

    Per var: scale_c = 2^(alpha * (gn_max - gn_c) / (gn_max - gn_min)),
    grad += reg * scale_c * w — pushes already-weak channel groups toward
    zero faster (group_norm_pruner.py's schedule with base 2).
    """
    norms = group_l2_norms(graph, params)
    new_grads = jax.tree.map(lambda g: g, grads)
    from .surgery import set_path

    for v in graph.prunable_vars():
        gn = norms[v.name]
        span = jnp.maximum(gn.max() - gn.min(), 1e-12)
        scale = 2.0 ** (alpha * (gn.max() - gn) / span)
        for ref, off in graph.refs_of(v):
            if ref.role == "bias":
                continue
            w = get_path(params, ref.param)
            g = get_path(new_grads, ref.param)
            sh = [1] * w.ndim
            sh[ref.axis] = v.size
            pad_cfg = [(0, 0)] * w.ndim
            pad_cfg[ref.axis] = (off, w.shape[ref.axis] - off - v.size)
            scale_b = jnp.pad(scale.reshape(sh), pad_cfg)
            wslice = jnp.where(scale_b > 0, w, 0.0)
            set_path(new_grads, ref.param,
                     g + (reg * scale_b * wslice).astype(g.dtype))
    return new_grads


def _per_channel_taylor(graph: ChannelGraph, params, grads) -> Dict[str, jnp.ndarray]:
    """Per-channel sum of |w * dw| across every non-bias ref of each var —
    TaylorPruner.regularize's group importance (taylor_pruner.py:63-119)."""
    out = {}
    for v in graph.prunable_vars():
        acc = jnp.zeros((v.size,))
        for ref, off in graph.refs_of(v):
            if ref.role == "bias":
                continue
            w = jnp.moveaxis(get_path(params, ref.param), ref.axis, 0)
            g = jnp.moveaxis(get_path(grads, ref.param), ref.axis, 0)
            w = jax.lax.dynamic_slice_in_dim(w, off, v.size, axis=0)
            g = jax.lax.dynamic_slice_in_dim(g, off, v.size, axis=0)
            wg = (w.astype(jnp.float32) * g.astype(jnp.float32)).reshape(v.size, -1)
            acc = acc + jnp.abs(wg).sum(axis=1)
        out[v.name] = acc
    return out


def _scaled_decay_grads(graph: ChannelGraph, params, grads,
                        per_var_scores: Dict[str, jnp.ndarray], *,
                        reg: float, base: float, roles) -> dict:
    """grad += reg * base^((max-s)/(max-min)) * w on every ref whose role is
    in ``roles`` — the shared update of the reference's regularizing pruners
    (taylor_pruner.py:124-145, scaling_factor_pruner.py:76-89)."""
    from .surgery import set_path

    new_grads = jax.tree.map(lambda g: g, grads)
    for v in graph.prunable_vars():
        s = per_var_scores[v.name]
        span = jnp.maximum(s.max() - s.min(), 1e-12)
        scale = base ** ((s.max() - s) / span)
        for ref, off in graph.refs_of(v):
            if ref.role not in roles:
                continue
            w = get_path(params, ref.param)
            g = get_path(new_grads, ref.param)
            sh = [1] * w.ndim
            sh[ref.axis] = v.size
            pad_cfg = [(0, 0)] * w.ndim
            pad_cfg[ref.axis] = (off, w.shape[ref.axis] - off - v.size)
            scale_b = jnp.pad(scale.reshape(sh), pad_cfg)
            set_path(new_grads, ref.param,
                     g + (reg * scale_b * jnp.where(scale_b > 0, w, 0.0)).astype(g.dtype))
    return new_grads


def taylor_scaled_grads(graph: ChannelGraph, params, grads, *,
                        reg: float = 1e-4, base: float = 16.0) -> dict:
    """TaylorPruner.regularize (taylor_pruner.py:54-145): weight decay
    scaled by base^((imp_max - imp)/(imp_max - imp_min)) where imp is the
    group's per-channel Σ|w·dw| — decays the channels Taylor deems weak."""
    scores = _per_channel_taylor(graph, params, grads)
    return _scaled_decay_grads(graph, params, grads, scores, reg=reg,
                               base=base, roles=("out", "in", "norm"))


def scaling_factor_grads(graph: ChannelGraph, params, grads, *,
                         reg: float = 1e-4, base: float = 16.0) -> dict:
    """ScalingFactorPruner.regularize (scaling_factor_pruner.py:51-89):
    group norm = sqrt(Σ γ²) over the var's norm scales; only the norm
    scales receive the scaled decay."""
    out = {}
    for v in graph.prunable_vars():
        sq = jnp.zeros((v.size,))
        found = False
        for ref, off in graph.refs_of(v):
            if ref.role != "norm":
                continue
            found = True
            g = jnp.moveaxis(get_path(params, ref.param), ref.axis, 0)
            g = jax.lax.dynamic_slice_in_dim(g, off, v.size, axis=0)
            sq = sq + (g.astype(jnp.float32).reshape(v.size, -1) ** 2).sum(axis=1)
        out[v.name] = jnp.sqrt(sq) if found else jnp.ones((v.size,))
    return _scaled_decay_grads(graph, params, grads, out, reg=reg, base=base,
                               roles=("norm",))
