"""SR data pipeline: BSRGAN degradation + ImageNetSR-equivalent dataset
(reference: ldm/modules/image_degradation/, ldm/data/imagenet.py:272-394)."""

import numpy as np
import pytest
from PIL import Image

from diff_pruning_tpu.data.degradation import (add_gaussian_noise,
                                               anisotropic_gaussian_kernel,
                                               degradation_bsrgan_variant,
                                               gaussian_kernel, shift_pixel)
from diff_pruning_tpu.data.sr import SRDataset, sr_dataset_from_folder


def test_kernels_normalized_and_oriented():
    k = gaussian_kernel(7, 1.5)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[3, 3] == k.max()
    ka = anisotropic_gaussian_kernel(9, 0.0, 4.0, 0.25)
    np.testing.assert_allclose(ka.sum(), 1.0, rtol=1e-6)
    # theta=0: long axis along x -> wider spread across columns than rows
    row_spread = (ka[4] * (np.arange(9) - 4) ** 2).sum()
    col_spread = (ka[:, 4] * (np.arange(9) - 4) ** 2).sum()
    assert row_spread > col_spread
    sh = shift_pixel(gaussian_kernel(25, 2.0), 4)
    assert sh.shape == (25, 25)


def test_gaussian_noise_bounded():
    rng = np.random.default_rng(0)
    img = np.full((16, 16, 3), 0.5, np.float32)
    for _ in range(5):
        out = add_gaussian_noise(img, rng, 2, 25)
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert not np.allclose(out, img)


@pytest.mark.parametrize("light", [True, False])
def test_degradation_variant_output(light):
    rng = np.random.default_rng(7)
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3),
                                            dtype=np.uint8)
    out = degradation_bsrgan_variant(img, sf=4, light=light, rng=rng)
    lr = out["image"]
    assert lr.dtype == np.uint8
    assert lr.shape == (16, 16, 3)
    # reproducible with the same seed
    out2 = degradation_bsrgan_variant(img, sf=4, light=light,
                                      rng=np.random.default_rng(7))
    np.testing.assert_array_equal(lr, out2["image"])


def _folder(tmp_path, n=3, hw=96):
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (hw, hw + 16, 3),
                                     dtype=np.uint8), "RGB").save(
            tmp_path / f"{i}.png")
    return str(tmp_path)


def test_sr_dataset_pil_nearest_golden(tmp_path):
    root = _folder(tmp_path)
    ds = sr_dataset_from_folder(root, size=32, degradation="pil_nearest",
                                downscale_f=4, min_crop_f=1.0, max_crop_f=1.0,
                                random_crop=False, seed=1)
    ex = ds[0]
    assert ex["image"].shape == (32, 32, 3)
    assert ex["LR_image"].shape == (8, 8, 3)
    assert ex["image"].dtype == np.float32
    assert -1.0 <= ex["image"].min() and ex["image"].max() <= 1.0
    # LR is exactly PIL nearest of the HR crop
    hr_u8 = ((ex["image"] + 1.0) * 127.5).round().astype(np.uint8)
    ref = np.asarray(Image.fromarray(hr_u8).resize((8, 8), Image.NEAREST))
    lr_u8 = ((ex["LR_image"] + 1.0) * 127.5).round().astype(np.uint8)
    np.testing.assert_array_equal(lr_u8, ref)


def test_sr_dataset_bsrgan_and_cv(tmp_path):
    root = _folder(tmp_path)
    for deg in ("bsrgan_light", "bsrgan", "cv_area"):
        ds = sr_dataset_from_folder(root, size=32, degradation=deg,
                                    downscale_f=4, seed=2)
        ex = ds[1]
        assert ex["image"].shape == (32, 32, 3)
        assert ex["LR_image"].shape == (8, 8, 3)
    # deterministic per (seed, index)
    a = sr_dataset_from_folder(root, size=32, degradation="bsrgan_light",
                               downscale_f=4, seed=2)[1]
    b = sr_dataset_from_folder(root, size=32, degradation="bsrgan_light",
                               downscale_f=4, seed=2)[1]
    np.testing.assert_array_equal(a["LR_image"], b["LR_image"])
    with pytest.raises(ValueError):
        SRDataset(["x.png"], size=32, degradation="nope")
