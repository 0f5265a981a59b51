"""ldm_exp data-stanza parity: synset/index ImageNet machinery + txt-list
LSUN (reference ldm/data/imagenet.py:21-146, lsun.py:10-93)."""

import os

import numpy as np
import pytest

from diff_pruning_tpu.data.ldm_datasets import (
    CONFIG_TARGETS,
    ImageNetDataset,
    TxtListDataset,
    dataset_from_config_target,
    give_synsets_from_indices,
    str_to_indices,
    synset2idx,
)


def test_str_to_indices():
    # taming semantics: ranges end-exclusive, result sorted
    assert str_to_indices("30-32") == [30, 31]
    assert str_to_indices("5, 1, 10-12") == [1, 5, 10, 11]
    with pytest.raises(AssertionError):
        str_to_indices("5,")


@pytest.fixture()
def imagenet_fixture(tmp_path):
    from PIL import Image

    root = tmp_path / "ILSVRC2012_train"
    rng = np.random.default_rng(0)
    synsets = ["n01440764", "n01443537", "n01484850"]
    for s in synsets:
        d = root / "data" / s
        d.mkdir(parents=True)
        for j in range(2):
            arr = rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{s}_{j}.JPEG")
    # the always-ignored corrupt file (imagenet.py:49-52)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        root / "data" / synsets[0] / "n06596364_9591.JPEG")
    with open(root / "index_synset.yaml", "w") as f:
        for i, s in enumerate(synsets):
            f.write(f"{i}: {s}\n")
    with open(root / "synset_human.txt", "w") as f:
        for s in synsets:
            f.write(f"{s} some fish\n")
    return str(root), synsets


def test_imagenet_filelist_and_labels(imagenet_fixture):
    root, synsets = imagenet_fixture
    ds = ImageNetDataset(root, size=32)
    # filelist generated, ignore-file dropped
    assert os.path.exists(os.path.join(root, "filelist.txt"))
    assert len(ds) == 6
    assert ds.class_names == synsets
    ex = ds[0]
    assert ex["image"].shape == (32, 32, 3)
    assert -1.0 <= ex["image"].min() and ex["image"].max() <= 1.0
    assert ex["class_label"] == 0 and ex["human_label"] == "some fish"
    # smallest-side resize + center crop really produced a square
    assert ds.load(3).dtype == np.uint8


def test_imagenet_sub_indices(imagenet_fixture):
    root, synsets = imagenet_fixture
    ds = ImageNetDataset(root, size=16, sub_indices="1-3")
    # indices [1, 2] -> last two synsets only
    assert sorted(set(ds.synsets)) == synsets[1:]
    assert len(ds) == 4
    # keep_orig_class_label keeps the yaml's global indices
    ds2 = ImageNetDataset(root, size=16, sub_indices="1-3",
                          keep_orig_class_label=True)
    assert sorted(set(ds2.class_labels)) == [1, 2]
    s2i = synset2idx(os.path.join(root, "index_synset.yaml"))
    assert s2i[synsets[2]] == 2
    assert give_synsets_from_indices([0], os.path.join(
        root, "index_synset.yaml")) == [synsets[0]]


def test_imagenet_missing_root(tmp_path):
    with pytest.raises(FileNotFoundError, match="zero-egress"):
        ImageNetDataset(str(tmp_path / "nope"))


@pytest.fixture()
def lsun_fixture(tmp_path):
    from PIL import Image

    droot = tmp_path / "churches"
    droot.mkdir()
    rng = np.random.default_rng(1)
    names = []
    for j in range(3):
        name = f"img_{j}.jpg"
        arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(droot / name, quality=95)
        names.append(name)
    txt = tmp_path / "church_train.txt"
    txt.write_text("\n".join(names) + "\n")
    return str(txt), str(droot)


def test_txtlist_lsun(lsun_fixture):
    txt, root = lsun_fixture
    ds = TxtListDataset(txt, root, size=32, flip_p=0.0)
    assert len(ds) == 3
    ex = ds[1]
    assert ex["image"].shape == (32, 32, 3)
    assert ex["relative_file_path_"] == "img_1.jpg"
    # flip determinism: flip=True mirrors flip=False
    a = ds.load(0, flip=False)
    b = ds.load(0, flip=True)
    np.testing.assert_array_equal(b, a[:, ::-1])
    # center crop before resize: no-size dataset returns the square crop
    ds_raw = TxtListDataset(txt, root, size=None, flip_p=0.0)
    assert ds_raw.load(0).shape == (48, 48, 3)
    with pytest.raises(FileNotFoundError):
        TxtListDataset(str(root) + "/missing.txt", root)
    with pytest.raises(ValueError):
        TxtListDataset(txt, root, interpolation="nearest")


def test_get_dataset_prefixes(lsun_fixture, imagenet_fixture):
    """'txt:' and 'imagenet:' resolve through the generic loader and batch
    through iterate_batches (uint8 load protocol)."""
    from diff_pruning_tpu.data.datasets import get_dataset, iterate_batches

    txt, root = lsun_fixture
    ds = get_dataset(f"txt:{txt}:{root}", resolution=16)
    assert len(ds) == 3 and ds.flip_p == 0.0
    b = next(iterate_batches(ds, 2, seed=0))
    assert b.shape == (2, 16, 16, 3) and b.min() >= -1.0 and b.max() <= 1.0

    iroot, _ = imagenet_fixture
    ds2 = get_dataset(f"imagenet:{iroot}", resolution=16)
    assert len(ds2) == 6
    b2 = next(iterate_batches(ds2, 2, seed=0))
    assert b2.shape == (2, 16, 16, 3)


def test_config_targets_resolve(lsun_fixture, monkeypatch, tmp_path):
    txt, root = lsun_fixture
    # the reference yaml stanza targets resolve through the table; the LSUN
    # ones use canonical relative paths, so chdir into a fixture layout
    os.makedirs(tmp_path / "data" / "lsun" / "churches", exist_ok=True)
    import shutil

    for f in os.listdir(root):
        shutil.copy(os.path.join(root, f),
                    tmp_path / "data" / "lsun" / "churches" / f)
    shutil.copy(txt, tmp_path / "data" / "lsun" / "church_outdoor_train.txt")
    monkeypatch.chdir(tmp_path)
    ds = dataset_from_config_target("ldm.data.lsun.LSUNChurchesTrain",
                                    {"size": 16})
    assert len(ds) == 3 and ds[0]["image"].shape == (16, 16, 3)
    assert len(CONFIG_TARGETS) == 8
    with pytest.raises(KeyError):
        dataset_from_config_target("ldm.data.nope.Nope")
