"""Sharded large-batch sampling (the 50k-image FID runs).

The reference shards work across processes by index with per-process seeds
and barriers (ddpm_sample.py:55-77, diffusion.py:390-427). Here a single
SPMD program shards each sampling batch across the mesh's data axis; on
multi-host slices each host saves its local shard (process_index subdirs,
matching the reference's layout).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import data_sharding
from .ddim_sampler import save_images, to_uint8


def fetch_local_rows(imgs_dev) -> np.ndarray:
    """Materialize a batch on the host. Single-process (or fully
    addressable): the whole array. Multi-host: ONLY this process's
    addressable shards, ordered by global batch offset — fetching a
    globally-sharded array raises across hosts. Replicated shards (e.g.
    the batch replicated over a 2-D mesh's 'model' axis) are deduplicated
    by index so each row is returned once."""
    if jax.process_count() > 1 and not imgs_dev.is_fully_addressable:
        uniq = {}
        for s in imgs_dev.addressable_shards:
            key = tuple((sl.start, sl.stop) for sl in s.index)
            uniq.setdefault(key, s)
        shards = sorted(uniq.values(), key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(imgs_dev)


def sample_many(
    sampler: Callable,
    *,
    key: jax.Array,
    total_images: int,
    batch_size: int,
    hw: int,
    channels: int = 3,
    mesh=None,
    outdir: Optional[str] = None,
    labels_fn: Optional[Callable[[jax.Array, int], jax.Array]] = None,
    progress: bool = False,
) -> Optional[np.ndarray]:
    """Run `sampler` repeatedly; save PNGs to outdir or return the array.

    batch_size is the global per-call batch. Pass the same ``mesh`` the
    sampler was built with (make_sampler(..., mesh=mesh)) — the sampler
    shards the trajectory over the data axis; here labels are placed
    data-sharded and divisibility is checked.
    num_batches = ceil(total/batch) like ddpm_sample.py:67.
    On multi-process (multi-host) runs, each process saves/returns only its
    own shard rows: PNGs go to process_{i}/ with local numbering, and the
    outdir=None return value is this process's rows only.
    """
    num_batches = (total_images + batch_size - 1) // batch_size
    sh = data_sharding(mesh) if mesh is not None else None
    if mesh is not None:
        n_shards = mesh.shape["data"]
        assert batch_size % n_shards == 0, (
            f"batch_size {batch_size} must divide by the data axis ({n_shards})")
    multiproc = jax.process_count() > 1
    if multiproc:
        # a mesh spanning every process is required: without one each host
        # would hold the full batch and save P duplicate copies
        assert mesh is not None, (
            "multi-process sampling requires a mesh spanning all processes")
        if total_images % batch_size:
            # each host flushes whole local shards; like the reference's
            # ceil-rounding (ddpm_sample.py:67) the run writes whole
            # batches, i.e. slightly MORE than total_images if ragged
            print(f"multi-process run rounds {total_images} up to "
                  f"{num_batches * batch_size} images (whole batches)")
    results = [] if outdir is None else None
    sub = outdir
    if outdir is not None and multiproc:
        sub = os.path.join(outdir, f"process_{jax.process_index()}")
    local_count = [0]

    def flush(imgs_dev, start):
        """Materialize a finished batch on the host and save/collect it."""
        if multiproc and not imgs_dev.is_fully_addressable:
            # each host saves its local shard rows, numbered locally inside
            # its process_{i} subdir — the reference's per-process layout
            # (ddpm_sample.py:55-74). tests/test_multiprocess.py proves the
            # union across hosts is bit-exact vs a single-process run.
            imgs = fetch_local_rows(imgs_dev)
            start = local_count[0]
        else:
            imgs = np.asarray(imgs_dev)[: min(batch_size, total_images - start)]
        local_count[0] += len(imgs)
        if outdir is not None:
            save_images(imgs, sub, start_index=start)
        else:
            results.append(imgs)
        if progress:
            local_total = (num_batches * batch_size // jax.process_count()
                           if multiproc else total_images)
            print(f"  sampled {local_count[0]}/{local_total}"
                  + (" (local)" if multiproc else ""))

    # Pipelined: dispatch batch b+1 before materializing batch b, so PNG
    # encoding/host transfer overlaps the device's next trajectory (the
    # reference serializes save after sample, ddpm_sample.py:64-77).
    pending = None
    for b in range(num_batches):
        bkey = jax.random.fold_in(key, b)
        if labels_fn is not None:
            labels = labels_fn(bkey, batch_size)
            if sh is not None:
                labels = jax.device_put(labels, sh)
            imgs = sampler(bkey, batch_size, hw, channels, labels)
        else:
            imgs = sampler(bkey, batch_size, hw, channels)
        if pending is not None:
            flush(*pending)
        pending = (imgs, b * batch_size)
    if pending is not None:
        flush(*pending)
    if results is not None:
        return np.concatenate(results, axis=0)
    return None
