"""Class-conditional procedural distribution (data/procedural.py): the
zero-egress stand-in for class-labeled ImageNet in the scratch LDM pixel
pipeline (tools/pixelrun.py). The palette classifier must decode the class
from pixels — that property is what makes CFG conditioning verifiable."""

import numpy as np

from diff_pruning_tpu.data.procedural import (class_palette,
                                              classify_by_palette,
                                              make_procedural_class_dataset,
                                              write_labeled_folder)


def test_class_dataset_shapes_and_decodability():
    imgs, labels = make_procedural_class_dataset(n_per_class=16, hw=32,
                                                 n_classes=8, seed=0)
    assert imgs.shape == (128, 32, 32, 3) and imgs.dtype == np.uint8
    assert labels.shape == (128,) and set(labels.tolist()) == set(range(8))
    pred = classify_by_palette(imgs, 8)
    assert (pred == labels).mean() >= 0.98, "classes must be pixel-decodable"


def test_palette_distinct():
    pal = class_palette(8)
    d = ((pal[:, None] - pal[None]) ** 2).sum(-1)
    d[np.arange(8), np.arange(8)] = 9.0
    assert d.min() > 0.05, "palette colors must be separable"


def test_classifier_rejects_blobless():
    gray = np.full((4, 32, 32, 3), 128, np.uint8)
    assert (classify_by_palette(gray, 8) == -1).all()


def test_write_labeled_folder_layout(tmp_path):
    imgs, labels = make_procedural_class_dataset(n_per_class=3, hw=16,
                                                 n_classes=2, seed=1)
    write_labeled_folder(imgs, labels, str(tmp_path))
    from diff_pruning_tpu.data.datasets import get_labeled_dataset

    ds = get_labeled_dataset(str(tmp_path), resolution=16)
    assert len(ds) == 6 and len(ds.class_names) == 2
