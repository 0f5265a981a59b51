"""Native C++ loader: build, numerical equivalence with the numpy path."""

import os

import numpy as np
import pytest

from diff_pruning_tpu import native
from diff_pruning_tpu.data.datasets import ArrayDataset, iterate_batches, normalize


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


def test_assemble_batch_matches_numpy(lib):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (32, 8, 8, 3), dtype=np.uint8)
    idx = rng.integers(0, 32, 16)
    flip = rng.random(16) < 0.5
    out = native.assemble_batch(images, idx, flip)
    assert out is not None and out.dtype == np.float32
    ref = images[idx].astype(np.float32) / 127.5 - 1.0
    ref[flip] = ref[flip, :, ::-1]
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_decode_batch_png(lib, tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    paths = []
    arrs = []
    for i in range(4):
        a = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        p = str(tmp_path / f"im{i}.png")
        Image.fromarray(a).save(p)
        paths.append(p)
        arrs.append(a)
    out = native.decode_batch(paths, 32)
    assert out is not None and out.shape == (4, 32, 32, 3)
    # compare against PIL pipeline loosely (bilinear implementations differ)
    from diff_pruning_tpu.data.datasets import _load_image

    ref = np.stack([_load_image(p, 32, False) for p in paths])
    err = np.abs(out.astype(np.int32) - ref.astype(np.int32)).mean()
    assert err < 12.0, f"mean abs err {err}"


def test_iterate_batches_uses_native(lib):
    rng = np.random.default_rng(2)
    ds = ArrayDataset(rng.integers(0, 256, (64, 8, 8, 3), dtype=np.uint8))
    b = next(iterate_batches(ds, 16, seed=0))
    assert b.shape == (16, 8, 8, 3) and b.dtype == np.float32
    assert b.min() >= -1.0 and b.max() <= 1.0


def test_iterate_matches_with_and_without_native(monkeypatch):
    """Same seed -> identical batches whether or not the native path is on."""
    rng = np.random.default_rng(3)
    ds = ArrayDataset(rng.integers(0, 256, (64, 8, 8, 3), dtype=np.uint8))
    a = next(iterate_batches(ds, 16, seed=5))
    monkeypatch.setattr(native, "assemble_batch", lambda *args: None)
    b = next(iterate_batches(ds, 16, seed=5))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_celeba_crop_dataset(tmp_path):
    """'celeba:<dir>' applies the 128-window center crop then resize."""
    from PIL import Image

    from diff_pruning_tpu.data.datasets import get_dataset

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (218, 178, 3), dtype=np.uint8)  # celeba dims
    Image.fromarray(img).save(tmp_path / "a.png")
    ds = get_dataset(f"celeba:{tmp_path}", resolution=64)
    out = ds.load(0)
    assert out.shape == (64, 64, 3)
    # crop window check: the recipe crops rows 57:185, cols 25:153 then
    # resizes — compare against a direct PIL recreation
    ref = Image.fromarray(img).crop((25, 57, 153, 185)).resize((64, 64))
    np.testing.assert_allclose(out, np.asarray(ref), atol=1)
