"""round_to x group_div interaction grid (VERDICT r4 weak #5).

The reference rounds the pruned-away count to a multiple of round_to
(torch_pruning metapruner.py:232-233) and prunes uniformly across
channel_groups sub-blocks (metapruner.py:237-246). When round_to does not
divide group_div, satisfying BOTH requires truncating the per-sub-block
drop count to a multiple of round_to/gcd(round_to, group_div). The global
path always did this; the local path rounded n_pruned before the per-group
division, so the realized drop g*(n_pruned//g) could violate round_to
(e.g. round_to=3, group_div=2 -> drop 8). This grid pins both paths.
"""

import numpy as np
import pytest

from diff_pruning_tpu.pruning.graph import ChannelGraph
from diff_pruning_tpu.pruning.pruner import prune


def _toy_graph(size: int, group_div: int) -> ChannelGraph:
    g = ChannelGraph()
    v = g.var("ch", size, group_div=group_div)
    g.ref("w", 0, v, "out")
    return g


def _arange_importance(graph, params, var, grads=None):
    # deterministic, strictly increasing scores: drops are the low indices
    return np.arange(var.size, dtype=np.float64) + 1.0


@pytest.mark.parametrize("global_pruning", [False, True])
@pytest.mark.parametrize("group_div", [1, 2, 32])
@pytest.mark.parametrize("round_to", [1, 2, 3, 4])
@pytest.mark.parametrize("size,sparsity", [(96, 0.3), (96, 0.47), (64, 0.55), (128, 0.21)])
def test_round_to_group_div_grid(size, sparsity, round_to, group_div, global_pruning):
    graph = _toy_graph(size, group_div)
    params = {"w": np.zeros((size, 3))}
    res = prune(graph, params, _arange_importance, sparsity=sparsity,
                global_pruning=global_pruning, round_to=round_to)
    if "ch" not in res.keep:
        # legal only when every admissible drop count truncates to zero
        step = group_div * (round_to // np.gcd(round_to, group_div))
        assert int(size * sparsity) < step
        return
    keep = res.keep["ch"]
    dropped = size - len(keep)
    assert dropped > 0
    assert dropped % round_to == 0, (dropped, round_to, group_div)
    assert dropped % group_div == 0, (dropped, group_div)
    # uniform across sub-blocks, and never over the nominal target
    gs = size // group_div
    per = [np.sum((keep >= i * gs) & (keep < (i + 1) * gs)) for i in range(group_div)]
    assert len(set(per)) == 1, per
    if not global_pruning:
        assert dropped <= int(np.ceil(size * sparsity)) + round_to * group_div


def test_local_round_to_3_group_div_2_regression():
    """The exact VERDICT r4 weak #5 shape: rt=3, g=2 must not drop 8."""
    size = 24
    graph = _toy_graph(size, 2)
    params = {"w": np.zeros((size, 3))}
    # sparsity 0.4 -> n_pruned=10 raw; old code: round to 9, n_per=4, drop 8 (8%3!=0)
    res = prune(graph, params, _arange_importance, sparsity=0.4, round_to=3)
    keep = res.keep["ch"]
    dropped = size - len(keep)
    assert dropped % 3 == 0 and dropped % 2 == 0, dropped
    assert dropped == 6  # n_per=5 -> truncate to mult of 3 -> 3 per block
