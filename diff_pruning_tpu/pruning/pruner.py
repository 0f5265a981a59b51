"""Pruner: select keep-indices per ChannelVar and apply functional surgery.

Functional MetaPruner (ddpm_exp/torch_pruning/pruner/algorithms/metapruner.py).
Local mode scores each var independently and drops its lowest-importance
channels at the target sparsity, respecting the var's group_div (GN groups /
attention heads, metapruner.py:237-246) and round_to (:232-233). Global mode
concatenates (sub-group-reduced) importances and thresholds at the global
top-k (:256-297).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, List, Mapping, Optional, Sequence

import numpy as np

from .graph import ChannelGraph, ChannelVar
from .importance import ScoreFn
from .surgery import pruned_channel_sizes, slice_params


@dataclasses.dataclass
class PruneResult:
    keep: Dict[str, np.ndarray]  # var name -> sorted kept indices
    scores: Dict[str, np.ndarray]
    channel_sizes: Dict[str, int]


def _select_keep(
    imp: np.ndarray, var: ChannelVar, sparsity: float
) -> Optional[np.ndarray]:
    """Indices to keep for one var (ascending). None = keep all."""
    size = var.size
    n_pruned = size - int(size * (1.0 - sparsity))
    if var.round_to > 1:
        n_pruned -= n_pruned % var.round_to
    g = var.group_div
    if g > 1:
        # prune uniformly per contiguous sub-block (metapruner.py:237-246)
        n_per = n_pruned // g
        if n_per <= 0:
            return None
        gs = size // g
        drop = []
        for chg in range(g):
            sub = imp[chg * gs:(chg + 1) * gs]
            drop.append(np.argsort(sub, kind="stable")[:n_per] + chg * gs)
        drop = np.concatenate(drop)
    else:
        if n_pruned <= 0:
            return None
        drop = np.argsort(imp, kind="stable")[:n_pruned]
    mask = np.ones(size, dtype=bool)
    mask[drop] = False
    keep = np.nonzero(mask)[0]
    if keep.size == 0 or keep.size == size:
        return None
    return keep


def prune(
    graph: ChannelGraph,
    params: dict,
    importance: ScoreFn,
    *,
    sparsity: float,
    grads: Optional[dict] = None,
    ignored_vars: Sequence[str] = (),
    sparsity_per_var: Optional[Mapping[str, float]] = None,
    global_pruning: bool = False,
    round_to: Optional[int] = None,
) -> PruneResult:
    """`round_to` tightens every var's rounding (ldm_exp/prune_ldm.py:99
    passes round_to=2 globally)."""
    ignored = set(ignored_vars)
    vars_ = [v for v in graph.prunable_vars() if v.name not in ignored]
    if round_to is not None:
        for v in vars_:
            v.round_to = max(v.round_to, round_to)
    scores: Dict[str, np.ndarray] = {}
    for v in vars_:
        scores[v.name] = np.asarray(importance(graph, params, v, grads=grads), dtype=np.float64)

    keep: Dict[str, np.ndarray] = {}
    if global_pruning:
        # Reduce each var's score to per-"channel-group" scalars, pool, and
        # threshold globally (metapruner.py:256-297): with group_div>1 only
        # the first sub-block participates in the pool and the chosen drops
        # replicate across sub-blocks. Scores are mean-normalized per var
        # before pooling (the reference importance's normalizer step) —
        # without it, cross-layer scale differences concentrate all drops in
        # a few low-magnitude layers.
        norm_scores = {
            v.name: scores[v.name] / max(scores[v.name].mean(), 1e-30)
            for v in vars_}
        pooled = []
        for v in vars_:
            imp = norm_scores[v.name]
            sub = imp[: v.size // v.group_div] if v.group_div > 1 else imp
            pooled.append(sub)
        flat = np.concatenate(pooled)
        total = flat.size
        n_pruned = total - int(total * (1.0 - sparsity))
        if n_pruned <= 0:
            return PruneResult({}, scores, pruned_channel_sizes(graph, {}))
        thres = np.partition(flat, n_pruned - 1)[n_pruned - 1]
        for v in vars_:
            imp = norm_scores[v.name]
            gs = v.size // v.group_div
            sub = imp[:gs] if v.group_div > 1 else imp
            drop_local = np.nonzero(sub <= thres)[0]
            if v.group_div > 1:
                drop = np.concatenate([drop_local + gs * i for i in range(v.group_div)])
            else:
                drop = drop_local
            if v.round_to > 1:
                n = len(drop) - (len(drop) % v.round_to)
                drop = drop[:n]
            if len(drop) == 0 or len(drop) >= v.size:
                continue
            mask = np.ones(v.size, dtype=bool)
            mask[drop] = False
            keep[v.name] = np.nonzero(mask)[0]
    else:
        for v in vars_:
            s = sparsity_per_var.get(v.name, sparsity) if sparsity_per_var else sparsity
            k = _select_keep(scores[v.name], v, s)
            if k is not None:
                keep[v.name] = k

    return PruneResult(keep, scores, pruned_channel_sizes(graph, keep))


def apply_pruning(params: dict, graph: ChannelGraph, result: PruneResult) -> dict:
    return slice_params(params, graph, result.keep)
