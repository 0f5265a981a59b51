"""The native TensorBoard event writer: CRC32C vectors, TFRecord framing,
and round-trip through our parser (the reference logs via accelerate's
TB tracker, ddpm_train.py:519-530 — this is the dependency-free port)."""

import glob
import os
import struct

import numpy as np

from diff_pruning_tpu.utils.tensorboard import (SummaryWriter, _masked_crc,
                                                crc32c, read_scalars)


def test_crc32c_known_vectors():
    # RFC 3720 / published CRC32C test vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    for i in range(5):
        w.add_scalar("train/loss", 3.0 / (i + 1), i * 10)
        w.add_scalar("train/imgs_per_sec", 100.0 + i, i * 10)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    scalars = read_scalars(files[0])
    losses = [(s, v) for s, t, v in scalars if t == "train/loss"]
    assert [s for s, _ in losses] == [0, 10, 20, 30, 40]
    np.testing.assert_allclose([v for _, v in losses],
                               [3.0 / (i + 1) for i in range(5)], rtol=1e-6)


def test_tfrecord_framing(tmp_path):
    """Each record is u64 len + masked CRC(len) + payload + masked CRC(payload)
    — the framing TensorBoard's reader checks."""
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("x", 1.0, 1)
    w.close()
    raw = open(w.path, "rb").read()
    off = 0
    n_records = 0
    while off < len(raw):
        (ln,) = struct.unpack_from("<Q", raw, off)
        (hcrc,) = struct.unpack_from("<I", raw, off + 8)
        assert hcrc == _masked_crc(raw[off:off + 8])
        (dcrc,) = struct.unpack_from("<I", raw, off + 12 + ln)
        assert dcrc == _masked_crc(raw[off + 12:off + 12 + ln])
        off += 16 + ln
        n_records += 1
    assert off == len(raw)
    assert n_records == 2  # file_version event + one scalar event
