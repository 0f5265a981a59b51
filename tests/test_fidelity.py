"""ISC / KID / precision-recall metric math (reference:
ldm_exp/test_diffusion.py's torch_fidelity suite)."""

import numpy as np
import pytest

from diff_pruning_tpu.eval.fidelity import (inception_probs, inception_score,
                                            kid, precision_recall)


def test_inception_score_bounds():
    n, c = 500, 10
    # perfectly confident AND balanced within every split -> IS == C
    onehot = np.eye(c)[np.arange(n) % c] * (1 - 1e-9) + 1e-10
    m, s = inception_score(onehot, splits=5, shuffle=False)
    np.testing.assert_allclose(m, c, rtol=1e-3)
    # uniform predictions -> IS == 1
    uni = np.full((n, c), 1.0 / c)
    m, _ = inception_score(uni, splits=5, shuffle=False)
    np.testing.assert_allclose(m, 1.0, rtol=1e-5)


def test_inception_score_golden_two_point():
    # p(y|x) alternates between [0.9,0.1] and [0.1,0.9]; p(y)=[0.5,0.5]
    p = np.array([[0.9, 0.1], [0.1, 0.9]] * 50)
    kl = (0.9 * np.log(0.9 / 0.5) + 0.1 * np.log(0.1 / 0.5))
    m, _ = inception_score(p, splits=2, shuffle=False)
    np.testing.assert_allclose(m, np.exp(kl), rtol=1e-5)


def test_kid_zero_for_identical_and_positive_for_shifted():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((300, 16)).astype(np.float32)
    m_same, s_same = kid(x, x.copy(), subset_size=100, subsets=10)
    # unbiased estimator: ~0 within subset-sampling noise
    assert abs(m_same) < max(5 * s_same, 0.15), (m_same, s_same)
    y = x + 3.0
    m_diff, _ = kid(x, y, subset_size=100, subsets=10)
    assert m_diff > 100 * abs(m_same)


def test_kid_unbiased_golden_tiny():
    # hand-computable 2x2 case with the cubic kernel
    x = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    y = np.array([[1.0, 1.0], [1.0, 1.0]], np.float32)

    def k(a, b):
        return (a @ b / 2 + 1) ** 3

    kxx = k(x[0], x[1])
    kyy = k(y[0], y[1])
    kxy = np.mean([k(a, b) for a in x for b in y])
    expect = kxx + kyy - 2 * kxy  # m=2: off-diagonal mean is the single term
    m, _ = kid(x, y, subset_size=2, subsets=1)
    np.testing.assert_allclose(m, expect, rtol=1e-5)


def test_precision_recall_extremes():
    rng = np.random.default_rng(2)
    real = rng.standard_normal((200, 8)).astype(np.float32)
    # generated == real subset -> both metrics high
    gen = real[:100] + 1e-4
    out = precision_recall(real, gen, k=3)
    assert out["precision"] > 0.95
    assert out["recall"] > 0.4  # half the real set is near a gen point
    # far-away generated -> precision ~ 0
    far = real[:100] + 100.0
    out2 = precision_recall(real, far, k=3)
    assert out2["precision"] < 0.05 and out2["recall"] < 0.05


def test_inception_probs_needs_fc_and_softmaxes():
    with pytest.raises(ValueError, match="fc head"):
        inception_probs({}, np.zeros((2, 2048), np.float32))
    rng = np.random.default_rng(3)
    params = {"fc": {"kernel": rng.standard_normal((2048, 1008)).astype(np.float32) * 0.01,
                     "bias": np.zeros(1008, np.float32)}}
    p = inception_probs(params, rng.standard_normal((4, 2048)).astype(np.float32))
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-5)
    assert (p >= 0).all()


def test_inception_converter_keeps_fc():
    from diff_pruning_tpu.eval.inception import torch_inception_state_dict_to_params

    sd = {"fc.weight": np.zeros((1008, 2048), np.float32),
          "fc.bias": np.zeros((1008,), np.float32),
          "AuxLogits.fc.weight": np.zeros((1000, 768), np.float32)}
    out = torch_inception_state_dict_to_params(sd)
    assert out["fc"]["kernel"].shape == (2048, 1008)
    assert "AuxLogits" not in out


def test_fidelity_cli_end_to_end(tmp_path, monkeypatch):
    """CLI over two tiny image dirs with random-init inception weights."""
    from PIL import Image

    import jax

    from diff_pruning_tpu.cli import fidelity as cli

    rng = np.random.default_rng(0)
    for name, shift in (("a", 0), ("b", 60)):
        d = tmp_path / name
        d.mkdir()
        for i in range(8):
            arr = np.clip(rng.integers(0, 195, (16, 16, 3)) + shift,
                          0, 255).astype(np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")

    # stub the inception pass (weights are zero-egress-blocked; the metric
    # math is golden-tested above — this covers the CLI plumbing): features
    # = pixel projection, fc = random head
    rng2 = np.random.default_rng(1)
    proj = rng2.standard_normal((16 * 16 * 3, 2048)).astype(np.float32) * 0.01
    params = {"fc": {"kernel": rng2.standard_normal((2048, 1008)).astype(np.float32) * 0.01,
                     "bias": np.zeros(1008, np.float32)}}

    def fake_features(path, p, **kw):
        from diff_pruning_tpu.data.datasets import get_dataset

        ds = get_dataset(path, resolution=16)
        imgs = np.stack([ds.load(i) for i in range(len(ds))])
        return (imgs.reshape(len(imgs), -1) / 255.0) @ proj

    import diff_pruning_tpu.eval.fid as fid_mod
    import diff_pruning_tpu.eval.inception as inc

    monkeypatch.setattr(fid_mod, "features_of_path", fake_features)
    monkeypatch.setattr(inc, "load_fid_inception_params", lambda p=None: params)
    out = cli.main(["--input1", str(tmp_path / "a"),
                    "--input2", str(tmp_path / "b"),
                    "--batch_size", "4", "--kid_subset_size", "8",
                    "--kid_subsets", "4"])
    assert np.isfinite(out["frechet_inception_distance"])
    assert "kernel_inception_distance_mean" in out
    assert 0.0 <= out["precision"] <= 1.0


def test_inception_score_shuffles_and_clamps():
    # class-sorted confident predictions: unshuffled splits each see ONE
    # class (IS=1); shuffling recovers the true diversity
    c = 4
    sorted_onehot = np.repeat(np.eye(c), 100, axis=0) * (1 - 1e-9) + 1e-10
    m_sorted, _ = inception_score(sorted_onehot, splits=4, shuffle=False)
    np.testing.assert_allclose(m_sorted, 1.0, rtol=1e-3)
    m_shuf, _ = inception_score(sorted_onehot, splits=4, shuffle=True)
    assert m_shuf > 3.0
    # n < splits: no empty-split NaN
    m_tiny, s_tiny = inception_score(sorted_onehot[:3], splits=10)
    assert np.isfinite(m_tiny) and np.isfinite(s_tiny)
