"""Host-side data loading (the L1 layer; SURVEY.md §2.1 'Data utils').

Replaces utils.py get_dataset / UnlabeledImageFolder and the ddpm_exp dataset
transforms with torch-free NumPy/PIL pipelines feeding `jax.device_put`.
Supported sources:

* CIFAR-10 python-pickle batches (cifar-10-batches-py) — local only, no
  downloads (zero-egress environment);
* recursive image folders (UnlabeledImageFolder, utils.py:8-24) with the
  256-crop pipeline for big images (utils.py:48-56) and the CelebA
  center-crop recipe (ddpm_exp/datasets/__init__.py:61-107);
* npz arrays (N,H,W,C) uint8.

Outputs are NHWC float32 in [-1,1] (Normalize(0.5,0.5), utils.py:43) with
random horizontal flip at iteration time.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from glob import glob
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class ArrayDataset:
    """In-memory uint8 NHWC images."""

    images: np.ndarray  # (N,H,W,C) uint8

    def __len__(self) -> int:
        return len(self.images)


def load_cifar10(root: str) -> ArrayDataset:
    """Load CIFAR-10 from the standard python-pickle batch directory."""
    d = root
    if os.path.isdir(os.path.join(root, "cifar-10-batches-py")):
        d = os.path.join(root, "cifar-10-batches-py")
    batches = sorted(glob(os.path.join(d, "data_batch_*")))
    if not batches:
        raise FileNotFoundError(f"no CIFAR-10 batches under {root}")
    imgs = []
    for b in batches:
        with open(b, "rb") as f:
            entry = pickle.load(f, encoding="latin1")
        arr = np.asarray(entry["data"], np.uint8).reshape(-1, 3, 32, 32)
        imgs.append(arr.transpose(0, 2, 3, 1))
    return ArrayDataset(np.concatenate(imgs))


def load_cifar100(root: str) -> ArrayDataset:
    """CIFAR-100 python-pickle 'train' file (utils.py:37-44's CIFAR100)."""
    d = root
    if os.path.isdir(os.path.join(root, "cifar-100-python")):
        d = os.path.join(root, "cifar-100-python")
    f = os.path.join(d, "train")
    if not os.path.exists(f):
        raise FileNotFoundError(f"no CIFAR-100 'train' pickle under {root}")
    with open(f, "rb") as fh:
        entry = pickle.load(fh, encoding="latin1")
    arr = np.asarray(entry["data"], np.uint8).reshape(-1, 3, 32, 32)
    return ArrayDataset(arr.transpose(0, 2, 3, 1))


def load_npz(path: str, key: str = "images") -> ArrayDataset:
    with np.load(path) as z:
        arr = z[key] if key in z.files else z[z.files[0]]
    return ArrayDataset(np.asarray(arr, np.uint8))


IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp", ".JPEG", ".PNG", ".JPG")


def list_image_files(root: str) -> list:
    files = []
    for ext in IMG_EXTS:
        files.extend(glob(os.path.join(root, "**", f"*{ext}"), recursive=True))
    return sorted(set(files))


def _load_image(path: str, resolution: Optional[int], celeba_crop: bool) -> np.ndarray:
    from PIL import Image

    im = Image.open(path).convert("RGB")
    if celeba_crop:
        # ddpm_exp/datasets/__init__.py:70-90: crop around (cx=89, cy=121),
        # 128x128 window, then resize.
        cx, cy = 89, 121
        x1, x2, y1, y2 = cy - 64, cy + 64, cx - 64, cx + 64
        im = im.crop((y1, x1, y2, x2))
    if resolution is not None and im.size != (resolution, resolution):
        # utils.py:48-56: resize shorter side then center crop
        w, h = im.size
        s = resolution / min(w, h)
        im = im.resize((max(resolution, round(w * s)), max(resolution, round(h * s))))
        w, h = im.size
        left, top = (w - resolution) // 2, (h - resolution) // 2
        im = im.crop((left, top, left + resolution, top + resolution))
    return np.asarray(im, np.uint8)


def _resize_center_crop(im, resolution: int):
    """transforms.Resize(s) (shorter side) + CenterCrop(s) — the LSUN
    pipeline (ddpm_exp/datasets/__init__.py:113-136). Matches torchvision's
    size arithmetic (long side = int(s * long / short), truncating) and its
    default BILINEAR filter — PIL's default resample is bicubic, which would
    feed systematically different pixels than the reference."""
    from PIL import Image

    w, h = im.size
    if (w, h) != (resolution, resolution):
        if w <= h:
            new_w, new_h = resolution, int(resolution * h / w)
        else:
            new_w, new_h = int(resolution * w / h), resolution
        im = im.resize((new_w, new_h), Image.BILINEAR)
        w, h = im.size
        # torchvision center_crop: int(round((dim - crop)/2))
        left = int(round((w - resolution) / 2.0))
        top = int(round((h - resolution) / 2.0))
        im = im.crop((left, top, left + resolution, top + resolution))
    return im


class LSUNDataset:
    """LSUN lmdb category database (ddpm_exp/datasets/lsun.py:11-58), read
    through the pure-Python LMDB reader; values are encoded (webp) images."""

    def __init__(self, root: str, resolution: int = 256):
        from .lmdb_io import LMDBReader

        self.db = LMDBReader(root)
        self.keys = self.db.keys()  # lsun.py:34-36's cached key scan
        self.resolution = resolution

    def __len__(self) -> int:
        return len(self.keys)

    def load(self, idx: int) -> np.ndarray:
        import io

        from PIL import Image

        im = Image.open(io.BytesIO(self.db.get(self.keys[idx]))).convert("RGB")
        return np.asarray(_resize_center_crop(im, self.resolution), np.uint8)


class FFHQDataset:
    """FFHQ lmdb (ddpm_exp/datasets/ffhq.py): length under key b'length',
    images under f'{resolution}-{index:05d}'."""

    def __init__(self, root: str, resolution: int = 256):
        from .lmdb_io import LMDBReader

        self.db = LMDBReader(root)
        raw = self.db.get(b"length")
        if raw is None:
            raise FileNotFoundError(f"{root}: no 'length' key (not FFHQ-layout)")
        self.length = int(raw.decode())
        self.resolution = resolution

    def __len__(self) -> int:
        return self.length

    def load(self, idx: int) -> np.ndarray:
        import io

        from PIL import Image

        key = f"{self.resolution}-{str(idx).zfill(5)}".encode()
        raw = self.db.get(key)
        if raw is None:
            raise KeyError(f"FFHQ key {key!r} missing")
        im = Image.open(io.BytesIO(raw)).convert("RGB")
        return np.asarray(im, np.uint8)


@dataclasses.dataclass
class ImageFolderDataset:
    """Recursive unlabeled image folder (utils.py:8-24)."""

    files: list
    resolution: Optional[int] = None
    celeba_crop: bool = False

    def __len__(self) -> int:
        return len(self.files)

    def load(self, idx: int) -> np.ndarray:
        return _load_image(self.files[idx], self.resolution, self.celeba_crop)


def get_dataset(name_or_path: str, resolution: Optional[int] = None):
    """utils.py:31-58 equivalent: 'cifar10' | 'cifar100' | npz | image dir |
    'celeba:<dir>' (the DDIM-codebase CelebA center-crop recipe,
    ddpm_exp/datasets/__init__.py:61-107) | 'lsun:<lmdb-dir>' (lmdb category
    database, resize+center-crop, :110-136) | 'ffhq:<lmdb-dir>'
    (:150-165); a directory containing data.mdb is treated as LSUN."""
    if name_or_path is None:
        raise ValueError("dataset required")
    if name_or_path.startswith("celeba:"):
        files = list_image_files(name_or_path[len("celeba:"):])
        if not files:
            raise FileNotFoundError(name_or_path)
        return ImageFolderDataset(files, resolution=resolution or 64,
                                  celeba_crop=True)
    if name_or_path.startswith("lsun:"):
        return LSUNDataset(name_or_path[len("lsun:"):],
                           resolution=resolution or 256)
    if name_or_path.startswith("ffhq:"):
        return FFHQDataset(name_or_path[len("ffhq:"):],
                           resolution=resolution or 256)
    if name_or_path.startswith("imagenet:"):
        # synset/filelist machinery (ldm_exp/ldm/data/imagenet.py:26-131)
        from .ldm_datasets import ImageNetDataset

        return ImageNetDataset(name_or_path[len("imagenet:"):],
                               size=resolution or 256)
    if name_or_path.startswith("txt:"):
        # 'txt:<filelist>:<data_root>' — the LSUN txt-list contract
        # (ldm_exp/ldm/data/lsun.py:10-36)
        from .ldm_datasets import TxtListDataset

        _, txt, root = name_or_path.split(":", 2)
        # flip_p=0: iterate_batches owns flip augmentation here
        return TxtListDataset(txt, root, size=resolution or 256, flip_p=0.0)
    if name_or_path.endswith(".npz"):
        return load_npz(name_or_path)
    if os.path.isdir(name_or_path):
        if os.path.exists(os.path.join(name_or_path, "data.mdb")):
            return LSUNDataset(name_or_path, resolution=resolution or 256)
        if glob(os.path.join(name_or_path, "*data_batch_*")) or os.path.isdir(
                os.path.join(name_or_path, "cifar-10-batches-py")):
            return load_cifar10(name_or_path)
        if os.path.isdir(os.path.join(name_or_path, "cifar-100-python")):
            return load_cifar100(name_or_path)
        files = list_image_files(name_or_path)
        if files:
            return ImageFolderDataset(files, resolution=resolution or 256)
    if "cifar100" in name_or_path.lower().replace("-", ""):
        for root in (name_or_path, "data/cifar100",
                     os.path.expanduser("~/data/cifar100")):
            try:
                return load_cifar100(root)
            except (FileNotFoundError, NotADirectoryError):
                continue
        raise FileNotFoundError(
            "CIFAR-100 'train' pickle not found; place cifar-100-python "
            "locally (no network access in this environment)")
    if "cifar" in name_or_path.lower():
        for root in (name_or_path, "data/cifar10", os.path.expanduser("~/data/cifar10")):
            try:
                return load_cifar10(root)
            except (FileNotFoundError, NotADirectoryError):
                continue
        raise FileNotFoundError(
            "CIFAR-10 batches not found; place cifar-10-batches-py locally "
            "(no network access in this environment)")
    raise FileNotFoundError(name_or_path)


def normalize(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (Normalize(0.5,0.5))."""
    return batch_u8.astype(np.float32) / 127.5 - 1.0


def logit_transform(x01: np.ndarray, lam: float = 1e-6) -> np.ndarray:
    """ddpm_exp/datasets/__init__.py:184-186, with the input clamped to
    [0,1] first: dequantization noise can push pixels slightly outside the
    domain, where the reference's torch.log silently yields NaN — a silent
    NaN source in the input pipeline (documented deviation: NaN-free by
    construction; in-domain values are bit-identical)."""
    x = lam + (1.0 - 2.0 * lam) * np.clip(x01, 0.0, 1.0)
    return np.log(x) - np.log1p(-x)


def data_transform(
    x01: np.ndarray,
    *,
    uniform_dequantization: bool = False,
    gaussian_dequantization: bool = False,
    rescaled: bool = True,
    logit: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """The ddpm_exp input-transform family (datasets/__init__.py:184-198).
    Input in [0,1] float32; order matches the reference exactly."""
    x = x01.astype(np.float32)
    if uniform_dequantization:
        rng = rng or np.random.default_rng(0)
        x = x / 256.0 * 255.0 + rng.random(x.shape, np.float32) / 256.0
    if gaussian_dequantization:
        rng = rng or np.random.default_rng(0)
        x = x + rng.standard_normal(x.shape, np.float32) * 0.01
    if logit:
        return logit_transform(x)
    if rescaled:
        return 2.0 * x - 1.0
    return x


def inverse_data_transform(x: np.ndarray, *, rescaled: bool = True,
                           logit: bool = False) -> np.ndarray:
    """datasets/__init__.py:201-215: undo the transform, clamp to [0,1]."""
    if logit:
        x = 1.0 / (1.0 + np.exp(-x))
    elif rescaled:
        x = (x + 1.0) / 2.0
    return np.clip(x, 0.0, 1.0)


def _parse_transform(name: Optional[str]) -> dict:
    """'logit' | 'rescaled' (default) with '+udq'/'+gdq' dequant suffixes,
    e.g. 'logit+udq' = logit transform with uniform dequantization."""
    kw = dict(uniform_dequantization=False, gaussian_dequantization=False,
              rescaled=True, logit=False)
    if not name:
        return kw
    for part in name.split("+"):
        if part == "logit":
            kw["logit"] = True
            kw["rescaled"] = False
        elif part in ("rescaled", ""):
            pass
        elif part == "udq":
            kw["uniform_dequantization"] = True
        elif part == "gdq":
            kw["gaussian_dequantization"] = True
        else:
            raise ValueError(f"unknown transform component {part!r} in {name!r}")
    return kw


def iterate_batches(
    dataset,
    batch_size: int,
    *,
    seed: int = 0,
    flip: bool = True,
    drop_last: bool = True,
    loop: bool = True,
    skip_batches: int = 0,
    transform: Optional[str] = None,
    dequant_seed: Optional[int] = None,
    local_slice: Optional[Tuple[int, int]] = None,
) -> Iterator[np.ndarray]:
    """Shuffled epochs of normalized NHWC float32 batches with random flip.

    ``skip_batches`` fast-forwards the stream for resume: the shuffle, flip,
    AND dequantization RNG draws are replayed without touching pixel data,
    so a resumed run sees exactly the batches an uninterrupted run would
    have (the dequant replay draws same-shape noise per skipped batch —
    correctness over skip speed on the transform paths).
    ``transform`` selects the ddpm_exp input-transform family
    (datasets/__init__.py:184-215) applied after Normalize: None (the
    [-1,1] default), or one of data_transforms' names via
    :func:`data_transform` with uniform dequantization noise drawn from
    ``dequant_seed``.
    ``local_slice=(lo, hi)`` yields only rows [lo, hi) of each GLOBAL
    batch — the multi-host fast path (parallel.mesh.process_batch_slice):
    every RNG draw (shuffle, flips, dequant) still happens at the global
    batch shape, so the yielded rows are bit-exactly the single-process
    stream's rows [lo, hi), and only the plain path's pixel decode is
    reduced to the local rows (the transform paths decode globally — they
    are the cheap in-memory datasets).
    """
    from .. import native

    rng = np.random.default_rng(seed)
    n = len(dataset)
    in_memory = isinstance(dataset, ArrayDataset)
    use_native_folder = (
        isinstance(dataset, ImageFolderDataset) and not dataset.celeba_crop
        and dataset.resolution is not None)
    tkw = _parse_transform(transform)
    plain = not (tkw["logit"] or tkw["uniform_dequantization"]
                 or tkw["gaussian_dequantization"])
    trng = np.random.default_rng(seed + 1 if dequant_seed is None else dequant_seed)
    img_shape = None
    if not plain and skip_batches > 0:
        img_shape = (dataset.images.shape[1:] if in_memory
                     else np.asarray(dataset.load(0)).shape)
    to_skip = skip_batches
    while True:
        order = rng.permutation(n)
        end = n - (n % batch_size) if drop_last else n
        for i in range(0, end, batch_size):
            idx = order[i:i + batch_size]
            flips = (rng.random(len(idx)) < 0.5) if flip else np.zeros(len(idx), bool)
            if to_skip > 0:
                to_skip -= 1
                if not plain:
                    # replay the dequant draws the skipped batch would make
                    shape = (len(idx),) + tuple(img_shape)
                    if tkw["uniform_dequantization"]:
                        trng.random(shape, np.float32)
                    if tkw["gaussian_dequantization"]:
                        trng.standard_normal(shape, np.float32)
                continue
            if plain and local_slice is not None:
                # multi-host: decode/assemble only this process's rows
                # (RNG draws above already happened at global shape)
                lo, hi = local_slice
                idx, flips = idx[lo:hi], flips[lo:hi]
            if in_memory:
                if plain:
                    # hot path: native OpenMP gather+flip+normalize
                    out = native.assemble_batch(dataset.images, idx, flips)
                    if out is not None:
                        yield out
                        continue
                imgs = dataset.images[idx]
            elif use_native_folder:
                imgs = native.decode_batch([dataset.files[j] for j in idx],
                                           dataset.resolution)
                if imgs is None:
                    imgs = np.stack([dataset.load(j) for j in idx])
            else:
                imgs = np.stack([dataset.load(j) for j in idx])
            if flip:
                imgs = imgs.copy()
                imgs[flips] = imgs[flips, :, ::-1]
            if plain:
                yield normalize(imgs)
            else:
                out = data_transform(imgs.astype(np.float32) / 255.0,
                                     rng=trng, **tkw)
                if local_slice is not None:
                    out = out[local_slice[0]:local_slice[1]]
                yield out
        if not loop:
            return


@dataclasses.dataclass
class LabeledImageFolderDataset:
    """Class-labeled image folder (ImageNet layout: root/<class>/*.jpg) for
    the LDM finetune path (ldm_exp/ldm/data/imagenet.py equivalent)."""

    files: list
    labels: np.ndarray
    class_names: list
    resolution: int = 256

    def __len__(self) -> int:
        return len(self.files)


def get_labeled_dataset(root: str, resolution: int = 256) -> LabeledImageFolderDataset:
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    if not classes:
        raise FileNotFoundError(f"no class subdirectories under {root}")
    files, labels = [], []
    for ci, cname in enumerate(classes):
        for f in list_image_files(os.path.join(root, cname)):
            files.append(f)
            labels.append(ci)
    return LabeledImageFolderDataset(files, np.asarray(labels, np.int32),
                                     classes, resolution)


def iterate_labeled_batches(dataset: LabeledImageFolderDataset, batch_size: int,
                            *, seed: int = 0, flip: bool = True,
                            skip_batches: int = 0):
    """(images in [-1,1], labels) batches, shuffled epochs, native decode.
    ``skip_batches`` fast-forwards for resume (RNG draws replayed, no IO)."""
    from .. import native

    rng = np.random.default_rng(seed)
    n = len(dataset)
    to_skip = skip_batches
    while True:
        order = rng.permutation(n)
        for i in range(0, n - (n % batch_size), batch_size):
            idx = order[i:i + batch_size]
            if to_skip > 0:
                to_skip -= 1
                if flip:
                    rng.random(len(idx))  # keep the flip stream aligned
                continue
            imgs = native.decode_batch([dataset.files[j] for j in idx],
                                       dataset.resolution)
            if imgs is None:
                imgs = np.stack([_load_image(dataset.files[j],
                                             dataset.resolution, False)
                                 for j in idx])
            if flip:
                flips = rng.random(len(imgs)) < 0.5
                imgs = imgs.copy()
                imgs[flips] = imgs[flips, :, ::-1]
            yield normalize(imgs), dataset.labels[idx]
