"""FID math vs scipy, SSIM vs closed form / reference values, inception
architecture parity vs the reference's torch InceptionV3 (random weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.eval.fid import activation_statistics, frechet_distance
from diff_pruning_tpu.eval.ssim import ssim


def test_frechet_vs_scipy():
    """Our eigh-based Tr((S1 S2)^1/2) equals scipy sqrtm (fid_score.py:218)."""
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.default_rng(0)
    d = 32
    f1 = rng.standard_normal((500, d))
    f2 = rng.standard_normal((400, d)) * 1.5 + 0.3
    mu1, s1 = activation_statistics(f1)
    mu2, s2 = activation_statistics(f2)
    ours = frechet_distance(mu1, s1, mu2, s2)
    covmean = scipy_linalg.sqrtm(s1.dot(s2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    ref = (np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2)
           - 2 * np.trace(covmean))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(1)
    f = rng.standard_normal((300, 16))
    mu, s = activation_statistics(f)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-6


def test_ssim_identical_is_one():
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    assert float(ssim(x, x)) > 0.9999


def test_ssim_vs_pytorch_msssim_formula():
    """Compare against a direct numpy implementation of the same formula."""
    rng = np.random.default_rng(2)
    x = rng.random((1, 32, 32, 1)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    # independent numpy reference
    from scipy.signal import convolve2d

    g = np.arange(11) - 5.0
    k1d = np.exp(-(g**2) / (2 * 1.5**2)); k1d /= k1d.sum()
    k = np.outer(k1d, k1d)
    xa, ya = x[0, :, :, 0].astype(np.float64), y[0, :, :, 0].astype(np.float64)
    f = lambda im: convolve2d(im, k, mode="valid")
    mu1, mu2 = f(xa), f(ya)
    s1 = f(xa * xa) - mu1**2
    s2 = f(ya * ya) - mu2**2
    s12 = f(xa * ya) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    np.testing.assert_allclose(got, m.mean(), rtol=1e-4)


def _synth_inception_params(rng):
    """Random params with the exact pt_inception shapes (now provided by the
    package itself for zero-egress relative FID — eval/inception.py)."""
    from diff_pruning_tpu.eval.inception import random_init_fid_inception_params

    return random_init_fid_inception_params(rng)


def test_inception_structure():
    """Wiring test with synthesized weights of the exact pt_inception shapes:
    a 299-input forward must produce finite 2048-d features (every concat,
    stride, and padding has to line up for this to trace)."""
    from diff_pruning_tpu.eval.inception import inception_pool3

    rng = np.random.default_rng(0)
    params = _synth_inception_params(rng)
    x = jnp.asarray(rng.random((2, 75, 75, 3)), jnp.float32)
    feats = inception_pool3(params, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


@pytest.mark.slow
def test_inception_architecture_parity():
    """Random-weight forward parity vs the reference InceptionV3 wrapper
    (reference inception.py) — validates every block's wiring without the
    (non-downloadable) FID weights. Skips when torchvision is absent."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("torchvision")
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from inception import InceptionV3  # reference module

    torch.manual_seed(0)
    net = InceptionV3([3], resize_input=False, normalize_input=False).eval()
    sd = net.blocks.state_dict()
    # reference nests blocks as blocks.{0..3}.{idx}.<torchvision names>; map
    # back to torchvision names via the known layout
    import torchvision

    tv = torchvision.models.inception_v3(num_classes=1008, aux_logits=True,
                                         weights=None, init_weights=False)
    # copy reference weights into torchvision naming via ordered zip of
    # equally-shaped tensors
    from diff_pruning_tpu.eval.inception import (
        inception_pool3,
        torch_inception_state_dict_to_params,
    )

    name_map = {}
    layers = [
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
        "Conv2d_4a_3x3", "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
        "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a",
        "Mixed_7b", "Mixed_7c"]
    block_layout = [["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"],
                    ["Conv2d_3b_1x1", "Conv2d_4a_3x3"],
                    ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e"],
                    ["Mixed_7a", "Mixed_7b", "Mixed_7c"]]
    flat_sd = {}
    for bi, names in enumerate(block_layout):
        # reference blocks interleave pools as extra indices; build index map
        idx_names = {0: {0: names[0], 1: names[1], 2: names[2]},
                     1: {1: names[0], 2: names[1]},
                     2: {i: n for i, n in enumerate(names)},
                     3: {i: n for i, n in enumerate(names)}}[bi]
        for key, val in sd.items():
            parts = key.split(".")
            if int(parts[0]) != bi:
                continue
            sub = int(parts[1])
            if sub not in idx_names:
                continue
            flat_sd[idx_names[sub] + "." + ".".join(parts[2:])] = val
    params = torch_inception_state_dict_to_params(flat_sd)

    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_feat = net(torch.from_numpy(x))[0].squeeze(-1).squeeze(-1).numpy()
    with jax.default_matmul_precision("float32"):
        got = inception_pool3(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                              resize=False, normalize=False)
    np.testing.assert_allclose(np.asarray(got), ref_feat, rtol=2e-3, atol=2e-3)


def test_fid_pipeline_end_to_end(tmp_path):
    """Full FID path over two image dirs with synthesized inception weights:
    identical dirs -> ~0; shifted dirs -> clearly positive."""
    from PIL import Image

    from diff_pruning_tpu.eval.fid import fid_between_paths

    rng = np.random.default_rng(0)
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d3 = tmp_path / "c"
    for d in (d1, d2, d3):
        d.mkdir()
    # 24 imgs / batch 12 (was 48/16): same assertion surface at half the
    # inception FLOPs — this test alone cost 47s of suite time (r5 budget)
    for i in range(24):
        im = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(im).save(d1 / f"{i}.png")
        Image.fromarray(im).save(d2 / f"{i}.png")
        Image.fromarray(np.clip(im.astype(np.int32) + 64, 0, 255)
                        .astype(np.uint8)).save(d3 / f"{i}.png")
    params = _synth_inception_params(np.random.default_rng(1))
    same = fid_between_paths(str(d1), str(d2), params, batch_size=12)
    diff = fid_between_paths(str(d1), str(d3), params, batch_size=12)
    assert abs(same) < 1e-3
    assert diff > same + 1.0


def test_clean_resize_matches_pil():
    """eval/resize.py is PIL-exact: antialiased bicubic on float channels
    (the clean-fid preprocessing behind the reference's calc_fid.py)."""
    from PIL import Image

    from diff_pruning_tpu.eval.resize import resize_bicubic_pil

    rng = np.random.default_rng(7)
    for (h, w, oh, ow) in [(32, 32, 299, 299), (300, 200, 64, 48)]:
        x = rng.uniform(0, 255, size=(2, h, w, 3)).astype(np.float32)
        ours = np.asarray(resize_bicubic_pil(jnp.asarray(x), oh, ow))
        for n in range(2):
            ref = np.stack([
                np.asarray(Image.fromarray(x[n, :, :, c], mode="F")
                           .resize((ow, oh), Image.BICUBIC))
                for c in range(3)], axis=-1)
            np.testing.assert_allclose(ours[n], ref, atol=2e-4)


def test_clean_mode_fid_runs(tmp_path):
    """--clean routes through the antialiased resize and still gives ~0 FID
    for identical dirs."""
    from PIL import Image

    from diff_pruning_tpu.eval.fid import fid_between_paths

    rng = np.random.default_rng(2)
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    for i in range(24):
        im = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(im).save(d1 / f"{i}.png")
        Image.fromarray(im).save(d2 / f"{i}.png")
    params = _synth_inception_params(np.random.default_rng(1))
    same = fid_between_paths(str(d1), str(d2), params, batch_size=12,
                             resize_mode="clean")
    assert abs(same) < 1e-3


def test_fid_activations_sharded_matches_single_device():
    """compute_activations(mesh=...) shards each Inception batch over the
    data axis; features must match the single-device pass (incl. a ragged
    final batch exercising the pad-and-drop path)."""
    from diff_pruning_tpu.eval.fid import compute_activations
    from diff_pruning_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    params = _synth_inception_params(np.random.default_rng(1))
    batches = [rng.random((16, 32, 32, 3)).astype(np.float32),
               rng.random((5, 32, 32, 3)).astype(np.float32)]  # ragged
    ref = compute_activations(params, iter(batches))
    got = compute_activations(params, iter(batches), mesh=make_mesh())
    assert got.shape == ref.shape == (21, 2048)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_stats_cache_records_resize_mode(tmp_path, capsys):
    from diff_pruning_tpu.eval.fid import save_stats, statistics_of_path

    p = str(tmp_path / "stats.npz")
    save_stats(p, np.zeros(4), np.eye(4), resize_mode="clean")
    statistics_of_path(p, None, resize_mode="clean")
    assert "warning" not in capsys.readouterr().out
    statistics_of_path(p, None, resize_mode="torch")
    assert "preprocessing families" in capsys.readouterr().out
