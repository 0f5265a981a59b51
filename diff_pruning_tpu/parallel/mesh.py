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
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
