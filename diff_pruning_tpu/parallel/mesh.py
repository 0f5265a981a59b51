"""Device mesh + sharding helpers — the SPMD replacement for the reference's
accelerate/DDP layer (SURVEY.md §2.6).

DDP ≙ batch-sharded data + replicated params on a 1-D 'data' mesh; XLA emits
the grad psum. Barriers (accelerator.wait_for_everyone) vanish under SPMD;
per-process seeds (ddpm_sample.py:57) become fold_in over the process index.
Multi-host: jax.distributed.initialize before calling make_mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[Tuple[str, int]] = (("data", -1),),
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a mesh; a single -1 axis size is inferred from device count."""
    devs = list(devices) if devices is not None else jax.devices()
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    n = len(devs)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes = [n // known if s == -1 else s for s in sizes]
    assert int(np.prod(sizes)) == n, f"mesh {sizes} != {n} devices"
    arr = np.asarray(devs).reshape(sizes)
    return Mesh(arr, tuple(names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data", *, batch_dim: int = 0):
    """Place a host array batch-sharded on the mesh; batch_dim selects which
    dim is sharded (1 for (K, B, ...) stacked multi-step chunks)."""
    spec = P(*([None] * batch_dim + [axis]))
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def process_batch_slice(mesh: Mesh, global_batch: int,
                        axis: str = "data") -> Tuple[int, int]:
    """This process's contiguous row range [lo, hi) of a batch sharded over
    ``axis`` — so multi-host data loaders can decode ONLY local rows
    (each host of a pod otherwise decodes the full global batch and ships
    1/N of it). Asserts the process's shards are contiguous, which holds
    for make_mesh's process-major device order."""
    sh = NamedSharding(mesh, P(axis))
    pid = jax.process_index()
    spans = [(s[0].start or 0, global_batch if s[0].stop is None else s[0].stop)
             for d, s in sh.devices_indices_map((global_batch,)).items()
             if d.process_index == pid]
    assert spans, f"process {pid} owns no shard of the '{axis}' axis"
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    assert sum(e - s for s, e in spans) == hi - lo, (
        f"process {pid}'s shards are not contiguous: {sorted(spans)}")
    return lo, hi


def shard_batch_local(mesh: Mesh, local_batch, axis: str = "data", *,
                      batch_dim: int = 0):
    """Build the global batch-sharded array from THIS process's rows only
    (jax.make_array_from_process_local_data) — the multi-host fast path
    pairing :func:`process_batch_slice`; single-process it equals
    :func:`shard_batch`."""
    spec = P(*([None] * batch_dim + [axis]))
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def process_fold_key(key: jax.Array, process_index: Optional[int] = None) -> jax.Array:
    """Per-process RNG stream (ddpm_sample.py:57's seed+process_index)."""
    if process_index is None:
        process_index = jax.process_index()
    return jax.random.fold_in(key, process_index)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization — the torchrun/accelerate-launch equivalent
    (scripts/sample_ddpm_cifar10_pretrained_distributed.sh:1). On TPU pods
    every arg is auto-detected from the environment; call before any jax
    device use, then make_mesh() spans all hosts' chips over DCN+ICI."""
    explicit = (coordinator_address, num_processes, process_id)
    if any(v is not None for v in explicit) and None in explicit:
        raise ValueError(
            "explicit multi-host init needs ALL of coordinator_address, "
            f"num_processes, and process_id (got {explicit}); on TPU pods "
            "omit all three for auto-detection")
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
