"""CLIP-embedding retrieval for the knn2img workflow — TPU-native rebuild of
`ldm_exp/scripts/train_searcher.py` and the `Searcher` in
`scripts/knn2img.py:60-166`.

The reference builds a scaNN index (brute-force scorer under 20k entries,
asymmetric hashing above). On TPU the exact search IS the fast path: a
normalized (B, D) x (D, N) matmul rides the MXU and `jax.lax.top_k` gives
the neighbors — exact for every pool size, replacing all three scaNN
configurations (an approximate index is a CPU-side workaround this hardware
does not need). Database layout matches the reference npz schema
(embedding / img_id / patch_coords), including the multi-file concatenation
of `train_searcher.py:36-56`.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np


def load_datapool(dpath: str) -> Dict[str, np.ndarray]:
    """Reference load_datapool (train_searcher.py:29-59): one npz or the
    multi-file layout whose arrays carry a leading singleton axis."""
    files = sorted(glob.glob(os.path.join(dpath, "*.npz")))
    if not files:
        raise ValueError(f'No npz-files in specified path "{dpath}"')
    if len(files) == 1:
        z = np.load(files[0])
        return {k: z[k] for k in z.files}
    archives = [np.load(f) for f in files]
    keys = archives[0].files
    out = {}
    for k in keys:
        parts = [a[k] for a in archives]
        if parts[0].ndim >= 2 and parts[0].shape[0] == 1:
            out[k] = np.concatenate(parts, axis=1)[0]
        else:
            out[k] = np.concatenate(parts, axis=0)
    return out


def build_database(clip_model, clip_params, image_files: Sequence[str],
                   *, batch_size: int = 64) -> Dict[str, np.ndarray]:
    """Embed an image folder into a reference-schema retrieval database
    (the reference assumes its databases pre-downloaded; this builds one
    from local images — whole-image embeddings, patch_coords = full frame)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from .models.clip import clip_image_embed

    size = clip_model.cfg.image_size
    embed = jax.jit(lambda imgs: clip_image_embed(clip_model, clip_params, imgs))
    embs: List[np.ndarray] = []
    for start in range(0, len(image_files), batch_size):
        chunk = image_files[start:start + batch_size]
        batch = np.stack([
            np.asarray(Image.open(f).convert("RGB").resize((size, size)),
                       np.float32) / 127.5 - 1.0 for f in chunk])
        embs.append(np.asarray(embed(jnp.asarray(batch))))
    embedding = np.concatenate(embs, axis=0)
    n = embedding.shape[0]
    return {
        "embedding": embedding.astype(np.float32),
        "img_id": np.arange(n, dtype=np.int64),
        "patch_coords": np.tile(np.array([[0, 0, size, size]], np.int64),
                                (n, 1)),
    }


class ExactSearcher:
    """Drop-in for knn2img.py's Searcher.search: exact dot-product top-k on
    device. Returns the reference's result-dict schema."""

    def __init__(self, database: Dict[str, np.ndarray]):
        import jax
        import jax.numpy as jnp
        from jax import lax

        self.database = database
        emb = np.asarray(database["embedding"], np.float32)
        # device-resident once; per-query work is ONE jitted matmul+top_k
        # dispatch (this platform pays seconds per dispatch — CLAUDE.md)
        self._normed_dev = jnp.asarray(
            emb / np.linalg.norm(emb, axis=1, keepdims=True))
        self._topk = None
        self._k = None

    def search(self, x, k: int) -> Dict[str, np.ndarray]:
        import jax
        import jax.numpy as jnp
        from jax import lax

        x = np.asarray(x)
        if x.ndim == 3:  # (B, 1, D) context rows -> (B, D) (knn2img.py:142)
            x = x[:, 0]
        q = x / np.linalg.norm(x, axis=1, keepdims=True)
        start = time.time()
        if self._k != k:
            self._k = k
            self._topk = jax.jit(lambda qq, db: lax.top_k(qq @ db.T, k))
        _, nns = self._topk(jnp.asarray(q), self._normed_dev)
        nns = np.asarray(nns)
        end = time.time()
        out_emb = self.database["embedding"][nns]
        return {
            "nn_embeddings": out_emb / np.linalg.norm(out_emb, axis=-1,
                                                      keepdims=True),
            "img_ids": self.database["img_id"][nns],
            "patch_coords": self.database["patch_coords"][nns],
            "queries": x,
            "exec_time": end - start,
            "nns": nns,
            "q_embeddings": q,
        }

    def __call__(self, x, n: int):
        return self.search(x, n)


def save_searcher(database: Dict[str, np.ndarray], target_path: str) -> None:
    """train_searcher.py equivalent: persist the (single-file) database the
    exact searcher loads — no index artifact is needed."""
    os.makedirs(target_path, exist_ok=True)
    np.savez(os.path.join(target_path, "database.npz"), **database)


def load_searcher(path: str) -> ExactSearcher:
    return ExactSearcher(load_datapool(path))
