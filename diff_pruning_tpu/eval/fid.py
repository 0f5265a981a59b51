"""FID: activation statistics + Fréchet distance, on-device.

Math port of fid_score.py: get_activations (:100) -> (mu, sigma) (:239) ->
calculate_frechet_distance (:182). The scipy.linalg.sqrtm LAPACK call
(fid_score.py:218) becomes an eigendecomposition identity computed with
jnp.linalg.eigh on device:

    Tr((S1 S2)^1/2) = sum_i sqrt(lambda_i(S1^1/2 S2 S1^1/2))

which is exact for PSD covariances and maps the 2048x2048 work onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .inception import inception_pool3


def activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu, sigma) with ddof=1 (np.cov default,
    fid_score.py:261)."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def _psd_sqrt(mat: np.ndarray) -> np.ndarray:
    w, v = np.linalg.eigh(mat)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)[None, :]) @ v.T


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^1/2) (fid_score.py:182-236).

    The feature extraction is the on-device work; this final 2048x2048 solve
    needs float64 (JAX x64 is disabled by default), so it runs as host numpy
    eigh — milliseconds, numerically identical to scipy sqrtm for PSD inputs.
    """
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    s1 = np.asarray(sigma1, np.float64)
    s2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    s1h = _psd_sqrt(s1)
    inner = s1h @ s2 @ s1h
    w = np.clip(np.linalg.eigvalsh(inner), 0.0, None)
    tr_sqrt = np.sum(np.sqrt(w))
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_sqrt)


def compute_activations(
    inception_params: dict,
    images_iter: Iterable[np.ndarray],
    *,
    batch_size: int = 128,
    resize_mode: str = "torch",
    mesh=None,
) -> np.ndarray:
    """Iterate uint8/float NHWC image batches -> stacked (N, 2048) features.

    resize_mode 'torch' is pytorch-fid's in-network bilinear (fid_score.py /
    inception.py:33-34); 'clean' is the clean-fid preprocessing the
    reference's calc_fid.py uses — antialiased PIL-bicubic resize on float
    data before the network, overshoot unclipped (eval/resize.py).

    With ``mesh``, each batch is sharded over the mesh's data axis (params
    replicated, XLA runs the Inception pass SPMD) — the 50k-feature
    extraction the reference does per-process scales over the slice. Ragged
    final batches are zero-padded to shard divisibility and the pad rows
    dropped from the features.
    """
    from .resize import resize_bicubic_pil

    sh = None
    if mesh is not None:
        from ..parallel.mesh import data_sharding

        sh = data_sharding(mesh)
        n_shards = mesh.shape["data"]

    @jax.jit
    def feat(x):
        if resize_mode == "clean":
            x = resize_bicubic_pil(x, 299, 299)
            return inception_pool3(inception_params, x, resize=False)
        return inception_pool3(inception_params, x)

    out = []
    for batch in images_iter:
        x = np.asarray(batch)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        n = len(x)
        if sh is not None:
            pad = (-n) % n_shards
            if pad:
                x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            xd = jax.device_put(jnp.asarray(x), sh)
        else:
            xd = jnp.asarray(x)
        out.append(np.asarray(feat(xd))[:n])
    return np.concatenate(out, axis=0)


def statistics_of_path(
    path: str,
    inception_params: dict,
    *,
    batch_size: int = 128,
    resolution: Optional[int] = None,
    max_images: Optional[int] = None,
    resize_mode: str = "torch",
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dir of images, .npz stats cache, or dataset name -> (mu, sigma).

    An .npz with mu/sigma keys is the precomputed-stats fast path
    (fid_score.py:266-268); anything else goes through the dataset loader.
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            if "mu" in z.files:
                if "resize_mode" in z.files and str(z["resize_mode"]) != resize_mode:
                    print(f"warning: stats cache {path} was computed with "
                          f"resize_mode={z['resize_mode']} but this run uses "
                          f"{resize_mode} — FID mixes preprocessing families")
                return z["mu"], z["sigma"]
    feats = features_of_path(path, inception_params, batch_size=batch_size,
                             resolution=resolution, max_images=max_images,
                             resize_mode=resize_mode, mesh=mesh)
    return activation_statistics(feats)


def features_of_path(
    path: str,
    inception_params: dict,
    *,
    batch_size: int = 128,
    resolution: Optional[int] = None,
    max_images: Optional[int] = None,
    resize_mode: str = "torch",
    mesh=None,
) -> np.ndarray:
    """Dir of images / dataset name -> raw (N, 2048) pool3 features (shared
    by FID stats and the ISC/KID/PRC metrics in eval/fidelity.py)."""
    from ..data.datasets import get_dataset

    ds = get_dataset(path, resolution=resolution)
    n = len(ds) if max_images is None else min(max_images, len(ds))

    def batches():
        from ..data.datasets import ArrayDataset

        if isinstance(ds, ArrayDataset):
            for i in range(0, n, batch_size):
                yield ds.images[i:min(i + batch_size, n)]
        else:
            # threaded decode + one-batch lookahead: serial PIL loads left
            # the chip idle between batches (a 50k-image FID leg spent ~x4
            # its device time in single-threaded PNG decode)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=16) as pool:
                futs = {}

                def submit(i):
                    for j in range(i, min(i + batch_size, n)):
                        futs[j] = pool.submit(ds.load, j)

                submit(0)
                for i in range(0, n, batch_size):
                    if i + batch_size < n:
                        submit(i + batch_size)
                    yield np.stack([futs.pop(j).result()
                                    for j in range(i, min(i + batch_size, n))])

    return compute_activations(inception_params, batches(), batch_size=batch_size,
                               resize_mode=resize_mode, mesh=mesh)


def save_stats(path: str, mu: np.ndarray, sigma: np.ndarray,
               resize_mode: str = "torch") -> None:
    """mu/sigma npz (fid_score.py:266-268 layout) + the preprocessing family
    it was computed with, so clean/torch stats can't be silently mixed."""
    np.savez(path, mu=mu, sigma=sigma, resize_mode=np.str_(resize_mode))


def fid_between_paths(path1: str, path2: str, inception_params: dict,
                      *, batch_size: int = 128, resolution: Optional[int] = None,
                      resize_mode: str = "torch", mesh=None) -> float:
    m1, s1 = statistics_of_path(path1, inception_params, batch_size=batch_size,
                                resolution=resolution, resize_mode=resize_mode,
                                mesh=mesh)
    m2, s2 = statistics_of_path(path2, inception_params, batch_size=batch_size,
                                resolution=resolution, resize_mode=resize_mode,
                                mesh=mesh)
    return frechet_distance(m1, s1, m2, s2)
