"""Tensor-parallel sharding rules (beyond the reference, which is DP-only).

For a 2-D mesh ("data", "model"), shard every conv/linear kernel's OUT axis
(and the matching bias/norm vectors) across "model" wherever the channel
count divides the axis size; GSPMD propagates activation shardings and
inserts the all-reduces/all-gathers. The ChannelGraph already knows every
param's channel axes, so the rules are derived, not hand-annotated.

This is useful when one model's activations outgrow a chip (256^2 DDPMs,
the 400M-param LDM at larger batch); for the reference's own workloads pure
DP is enough (SURVEY.md §2.6) — TP is the "don't stop at parity" extra.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pruning.graph import ChannelGraph
from ..pruning.surgery import flatten_params, get_path


def tp_param_shardings(graph: ChannelGraph, params: dict, mesh: Mesh,
                       axis: str = "model") -> dict:
    """params-shaped pytree of NamedShardings: every out-axis AND the
    matching norm/bias vectors sharded on `axis` where the channel count
    divides the axis size; 'in' kernel axes stay with GSPMD propagation
    (annotating them too would conflict with the same kernel's out-axis
    entry). Non-divisible channel counts — routine after pruning, whose
    per-var sizes are importance-driven — degrade gracefully to replicated
    for that param only (tested in test_tp_sharding.py)."""
    size = mesh.shape[axis]
    # param path -> sharded axis; 'out' first so it wins over any other
    # role on the same param (kernels carry both 'out' and 'in' refs)
    plan: Dict[str, int] = {}
    for ref in graph.refs:
        if ref.role == "in":
            continue
        arr = get_path(params, ref.param)
        if arr.shape[ref.axis] % size == 0:
            plan.setdefault(ref.param, ref.axis)

    flat = flatten_params(params)
    out = {}
    for path, arr in flat.items():
        if path in plan:
            spec = [None] * arr.ndim
            spec[plan[path]] = axis
            out[path] = NamedSharding(mesh, P(*spec))
        else:
            out[path] = NamedSharding(mesh, P())
    from ..pruning.surgery import unflatten_params

    return unflatten_params(out)


def shard_params_tp(graph: ChannelGraph, params: dict, mesh: Mesh,
                    axis: str = "model") -> dict:
    shardings = tp_param_shardings(graph, params, mesh, axis)
    return jax.tree.map(jax.device_put, params, shardings)
