"""LSUN lmdb / FFHQ lmdb data paths (VERDICT r1 missing #2) + the ddpm_exp
transform family, driven end-to-end from fixtures built with our own
pure-Python LMDB writer (the same format py-lmdb produces for
ddpm_exp/datasets/lsun.py:11-38 / ffhq.py:9-23)."""

import io
import json
import os

import numpy as np
import pytest

from diff_pruning_tpu.data.datasets import (FFHQDataset, LSUNDataset,
                                            data_transform, get_dataset,
                                            inverse_data_transform,
                                            iterate_batches, logit_transform)
from diff_pruning_tpu.data.lmdb_io import LMDBReader, write_lmdb

PIL = pytest.importorskip("PIL")
from PIL import Image


def _img_bytes(rng, h, w, fmt="WEBP"):
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format=fmt, lossless=True)
    return arr, buf.getvalue()


@pytest.fixture(scope="module")
def lsun_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("lsun") / "church_outdoor_train_lmdb"
    rng = np.random.default_rng(0)
    items, arrays = [], {}
    for i in range(12):
        # LSUN images vary in size; shorter side >= 256 in the real data —
        # use small rectangles here and read at resolution 16
        arr, raw = _img_bytes(rng, 24 + 4 * (i % 3), 32, "WEBP")
        key = f"{i:08x}deadbeef".encode()
        items.append((key, raw))
        arrays[key] = arr
    write_lmdb(str(root), items)
    return str(root), arrays


def test_lsun_dataset_reads_lmdb(lsun_fixture):
    root, arrays = lsun_fixture
    ds = LSUNDataset(root, resolution=16)
    assert len(ds) == 12
    img = ds.load(0)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # torchvision Resize(s)+CenterCrop(s) semantics: short side -> s with
    # the long side int-truncated, BILINEAR filter, round()ed crop origin
    key = sorted(arrays)[0]
    src = Image.fromarray(arrays[key])
    w, h = src.size
    if w <= h:
        nw, nh = 16, int(16 * h / w)
    else:
        nw, nh = int(16 * w / h), 16
    ref = src.resize((nw, nh), Image.BILINEAR)
    left, top = int(round((nw - 16) / 2.0)), int(round((nh - 16) / 2.0))
    ref = ref.crop((left, top, left + 16, top + 16))
    np.testing.assert_array_equal(img, np.asarray(ref))


def test_get_dataset_lsun_prefix_and_autodetect(lsun_fixture):
    root, _ = lsun_fixture
    assert len(get_dataset(f"lsun:{root}", resolution=16)) == 12
    assert len(get_dataset(root, resolution=16)) == 12  # data.mdb autodetect


def test_lsun_batches_feed_training_shapes(lsun_fixture):
    root, _ = lsun_fixture
    ds = get_dataset(f"lsun:{root}", resolution=16)
    batch = next(iterate_batches(ds, 4, seed=0))
    assert batch.shape == (4, 16, 16, 3) and batch.dtype == np.float32
    assert batch.min() >= -1.0 and batch.max() <= 1.0


def test_ffhq_dataset(tmp_path):
    rng = np.random.default_rng(1)
    items = [(b"length", b"5")]
    arrays = []
    for i in range(5):
        arr, raw = _img_bytes(rng, 16, 16, "PNG")
        items.append((f"16-{str(i).zfill(5)}".encode(), raw))
        arrays.append(arr)
    write_lmdb(str(tmp_path / "ffhq"), items)
    ds = FFHQDataset(str(tmp_path / "ffhq"), resolution=16)
    assert len(ds) == 5
    np.testing.assert_array_equal(ds.load(3), arrays[3])
    ds2 = get_dataset(f"ffhq:{tmp_path / 'ffhq'}", resolution=16)
    assert len(ds2) == 5


def test_transform_goldens():
    """datasets/__init__.py:179-215 formulas."""
    x = np.linspace(0.05, 0.95, 7, dtype=np.float32).reshape(1, 7, 1, 1)
    lam = 1e-6
    want = np.log(lam + (1 - 2 * lam) * x) - np.log1p(-(lam + (1 - 2 * lam) * x))
    np.testing.assert_allclose(logit_transform(x), want, rtol=1e-6)
    np.testing.assert_allclose(data_transform(x, rescaled=True), 2 * x - 1,
                               rtol=1e-6)
    got = data_transform(x, logit=True, rescaled=False)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # inverses
    np.testing.assert_allclose(
        inverse_data_transform(data_transform(x, rescaled=True)), x, atol=1e-6)
    np.testing.assert_allclose(
        inverse_data_transform(data_transform(x, logit=True, rescaled=False),
                               logit=True), x, atol=1e-5)
    # uniform dequantization: x/256*255 + U[0,1)/256 (datasets/__init__.py:186)
    rng = np.random.default_rng(0)
    xd = data_transform(x, uniform_dequantization=True, rescaled=False,
                        rng=rng)
    assert ((xd - x * 255.0 / 256.0) >= 0).all()
    assert ((xd - x * 255.0 / 256.0) < 1 / 256.0 + 1e-7).all()
    # gaussian dequantization adds sigma=0.01 noise
    xg = data_transform(x, gaussian_dequantization=True, rescaled=False,
                        rng=np.random.default_rng(0))
    assert 0 < np.abs(xg - x).max() < 0.06


def test_iterate_batches_logit_transform():
    from diff_pruning_tpu.data.datasets import ArrayDataset

    rng = np.random.default_rng(2)
    ds = ArrayDataset(rng.integers(0, 256, (8, 4, 4, 3), dtype=np.uint8))
    b = next(iterate_batches(ds, 4, seed=0, flip=False, transform="logit+udq"))
    assert np.isfinite(b).all()
    # logit of (0,1) values spans beyond [-1,1]
    assert b.max() > 1.5 or b.min() < -1.5


def test_lsun_prune_finetune_sample_end_to_end(lsun_fixture, tmp_path):
    """VERDICT r1 next-round #4 'done' criterion: prune -> finetune-smoke ->
    sample, all fed from the lmdb fixture (tiny UNet standing in for the
    113.7M LSUN-256 preset, which test_model_presets pins separately)."""
    import jax

    from diff_pruning_tpu.cli.ddpm_prune import main as prune_main
    from diff_pruning_tpu.cli.ddpm_sample import main as sample_main
    from diff_pruning_tpu.cli.ddpm_train import main as train_main
    from diff_pruning_tpu.models.unet2d import UNet2D, tiny_unet_config
    from diff_pruning_tpu.utils.checkpoint import save_model

    root, _ = lsun_fixture
    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    save_model(str(tmp_path / "model"), cfg, model.init(jax.random.key(0)),
               subfolder="unet")
    prune_main(["--model_path", str(tmp_path / "model"),
                "--save_path", str(tmp_path / "pruned"),
                "--pruner", "diff-pruning", "--thr", "0.05",
                "--pruning_ratio", "0.3", "--max_steps", "3",
                "--batch_size", "4", "--dataset", f"lsun:{root}",
                "--skip_vis"])
    train_main(["--dataset", f"lsun:{root}",
                "--model_path", str(tmp_path / "pruned"),
                "--output_dir", str(tmp_path / "ft"),
                "--train_batch_size", "4", "--num_iters", "2",
                "--save_model_steps", "2", "--log_steps", "2",
                "--steps_per_dispatch", "2", "--no_ema", "--vis_samples", "4"])
    sample_main(["--model_path", str(tmp_path / "ft"),
                 "--output_dir", str(tmp_path / "samples"),
                 "--batch_size", "8", "--total_samples", "8",
                 "--ddim_steps", "2"])
    pngs = [f for f in os.listdir(tmp_path / "samples") if f.endswith(".png")]
    assert len(pngs) == 8


def test_write_lmdb_multi_level_branches(tmp_path):
    """LSUN-scale trees need >1 branch level (the old writer asserted at
    ~one branch page of children); verify a 3-level tree round-trips."""
    import hashlib

    from diff_pruning_tpu.data.lmdb_io import LMDBReader, write_lmdb

    items = []
    for i in range(600):
        key = hashlib.md5(str(i).encode()).hexdigest().encode()
        # mix inline values and overflow values (> psize//2 - 32)
        val = (b"v%05d" % i) * (120 if i % 7 == 0 else 3)
        items.append((key, val))
    write_lmdb(str(tmp_path / "db"), items, psize=1024)
    with LMDBReader(str(tmp_path / "db")) as r:
        assert r.depth >= 3, r.depth
        got = dict(r.items())
        assert len(got) == 600
        ref = dict(items)
        for k in list(ref)[::37]:
            assert r.get(k) == ref[k]
        assert got == ref
        assert r.get(b"missing-key") is None


def test_lmdb_reader_threaded_reads(lsun_fixture):
    """LMDBReader must be safe under the FID threaded decode pool
    (eval/fid.py batches(): 16 workers share ONE reader). pread-based
    reads have no shared file offset; 16 concurrent full scans must
    agree byte-for-byte with a serial scan."""
    from concurrent.futures import ThreadPoolExecutor

    root, arrays = lsun_fixture
    db = LMDBReader(root)
    keys = [k for k, _ in db.items()]
    serial = {k: db.get(k) for k in keys}
    work = [k for _ in range(16) for k in keys]
    with ThreadPoolExecutor(max_workers=16) as pool:
        results = list(pool.map(db.get, work))
    for k, v in zip(work, results):
        assert v == serial[k]
