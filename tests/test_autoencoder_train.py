"""First-stage autoencoder GAN training: discriminator, LPIPS, losses, and
the fused two-optimizer step (reference: ldm_exp/ldm/modules/losses/*,
taming discriminator/lpips, ldm/models/autoencoder.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_pruning_tpu.eval.lpips import (init_lpips_params, lpips,
                                         torch_lpips_state_dicts_to_params,
                                         VGG16_CONV_IDX, VGG16_CONV_CH,
                                         TAP_CHANNELS)
from diff_pruning_tpu.models.discriminator import (NLayerDiscriminator,
                                                   actnorm_apply,
                                                   actnorm_initialize)
from diff_pruning_tpu.models.vae import AutoencoderConfig, AutoencoderKL, VQModel
from diff_pruning_tpu.training.autoencoder import (GANLossConfig, adopt_weight,
                                                   hinge_d_loss,
                                                   hinge_d_loss_with_exemplar_weights,
                                                   init_ae_train_state,
                                                   make_ae_optimizers,
                                                   make_autoencoder_train_step,
                                                   measure_perplexity,
                                                   vanilla_d_loss)


# ---------------------------------------------------------------------------
# discriminator


def test_discriminator_patch_shape_and_graph():
    # pix2pix PatchGAN on 64^2, n_layers=3: 64 ->32 ->16 ->8 ->(s1)7 ->(s1)6
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=3)
    p = disc.init(jax.random.key(0))
    x = jnp.ones((2, 64, 64, 3))
    y = disc(p, x)
    assert y.shape == (2, 6, 6, 1)
    disc.graph.validate(p)
    # widths follow ndf * min(2^n, 8)
    assert disc.widths == [8, 16, 32, 64]


def test_discriminator_weights_init_distribution():
    disc = NLayerDiscriminator(input_nc=3, ndf=64, n_layers=3)
    p = disc.init(jax.random.key(1))
    k = np.asarray(p["main"]["1"]["conv"]["kernel"])
    # N(0, 0.02): std within 10% on ~65k samples
    assert abs(k.std() - 0.02) < 0.002 and abs(k.mean()) < 0.002
    s = np.asarray(p["main"]["1"]["norm"]["scale"])
    assert abs(s.mean() - 1.0) < 0.02
    # BatchNorm blocks drop the conv bias; first block keeps it
    assert "bias" not in p["main"]["1"]["conv"]
    assert "bias" in p["main"]["0"]["conv"]


def test_actnorm_initialize_normalizes():
    x = jax.random.normal(jax.random.key(0), (8, 4, 4, 3)) * 5.0 + 2.0
    p = actnorm_initialize({}, x)
    y = actnorm_apply(p, x)
    np.testing.assert_allclose(np.asarray(y).mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y).std(axis=(0, 1, 2)), 1.0, atol=1e-3)


def test_discriminator_actnorm_variant():
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2, use_actnorm=True)
    p = disc.init(jax.random.key(0))
    assert "bias" in p["main"]["1"]["conv"]  # use_bias=True with ActNorm
    assert "loc" in p["main"]["1"]["norm"]
    y = disc(p, jnp.ones((2, 32, 32, 3)))
    assert y.shape[0] == 2 and y.shape[-1] == 1


# ---------------------------------------------------------------------------
# loss math (vqperceptual.py golden values)


def test_hinge_and_vanilla_d_loss_golden():
    real = jnp.array([[2.0], [0.5]])[:, :, None, None]
    fake = jnp.array([[-2.0], [0.5]])[:, :, None, None]
    # hinge: 0.5*(mean(relu(1-real)) + mean(relu(1+fake)))
    #      = 0.5*(mean([0, .5]) + mean([0, 1.5])) = 0.5*(0.25+0.75) = 0.5
    np.testing.assert_allclose(float(hinge_d_loss(real, fake)), 0.5, rtol=1e-6)
    v = 0.5 * (np.mean(np.log1p(np.exp(-np.array([2.0, 0.5]))))
               + np.mean(np.log1p(np.exp(np.array([-2.0, 0.5])))))
    np.testing.assert_allclose(float(vanilla_d_loss(real, fake)), v, rtol=1e-5)


def test_hinge_with_exemplar_weights_matches_plain_when_uniform():
    real = jax.random.normal(jax.random.key(0), (4, 3, 3, 1))
    fake = jax.random.normal(jax.random.key(1), (4, 3, 3, 1))
    w = jnp.ones((4,))
    np.testing.assert_allclose(
        float(hinge_d_loss_with_exemplar_weights(real, fake, w)),
        float(hinge_d_loss(real, fake)), rtol=1e-6)


def test_adopt_weight_jittable():
    f = jax.jit(lambda s: adopt_weight(2.0, s, threshold=10))
    assert float(f(jnp.asarray(5))) == 0.0
    assert float(f(jnp.asarray(10))) == 2.0


def test_measure_perplexity_uniform_is_n_embed():
    idx = jnp.arange(64) % 8
    perp, used = measure_perplexity(idx, 8)
    np.testing.assert_allclose(float(perp), 8.0, rtol=1e-5)
    assert int(used) == 8


# ---------------------------------------------------------------------------
# VQ straight-through quantizer


def _tiny_vq_cfg():
    return AutoencoderConfig(block_out_channels=(8,), latent_channels=4,
                             norm_num_groups=4, num_vq_embeddings=16,
                             mid_block_attention=False, layers_per_block=1)


def test_quantize_train_straight_through_and_loss():
    model = VQModel(_tiny_vq_cfg())
    p = model.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (2, 4, 4, 4))
    zq_st, loss, idx = model.quantize_train(p, z, beta=0.25)
    zq, idx2 = model.quantize(p, z)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
    # straight-through value equals the quantized value
    np.testing.assert_allclose(np.asarray(zq_st), np.asarray(zq), atol=1e-6)
    # legacy=True weighting: mean((sg[zq]-z)^2) + beta*mean((zq-sg[z])^2)
    expect = float(np.mean((np.asarray(zq) - np.asarray(z)) ** 2) * 1.25)
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)
    # gradient passes straight through to z
    g = jax.grad(lambda zz: jnp.sum(model.quantize_train(p, zz)[0] ** 2))(z)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * zq_st), rtol=1e-5)


# ---------------------------------------------------------------------------
# LPIPS


def test_lpips_zero_symmetric_positive():
    params = init_lpips_params(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3), minval=-1, maxval=1)
    y = jax.random.uniform(jax.random.key(2), (2, 32, 32, 3), minval=-1, maxval=1)
    d_xx = lpips(params, x, x)
    d_xy = lpips(params, x, y)
    d_yx = lpips(params, y, x)
    assert d_xy.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_xx), 0.0, atol=1e-8)
    assert float(d_xy[0]) > 0
    np.testing.assert_allclose(np.asarray(d_xy), np.asarray(d_yx), rtol=1e-5)


def test_lpips_converter_layout():
    vgg_sd = {}
    for i, (cin, cout) in zip(VGG16_CONV_IDX, VGG16_CONV_CH):
        vgg_sd[f"features.{i}.weight"] = np.random.RandomState(i).randn(
            cout, cin, 3, 3).astype(np.float32) * 0.01
        vgg_sd[f"features.{i}.bias"] = np.zeros((cout,), np.float32)
    lin_sd = {f"lin{k}.model.1.weight":
              np.abs(np.random.RandomState(k).randn(1, c, 1, 1)).astype(np.float32)
              for k, c in enumerate(TAP_CHANNELS)}
    params = torch_lpips_state_dicts_to_params(vgg_sd, lin_sd)
    assert params["features"]["0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["lins"]["4"]["kernel"].shape == (512,)
    d = lpips(params, jnp.zeros((1, 16, 16, 3)), jnp.ones((1, 16, 16, 3)))
    assert np.isfinite(float(d[0]))


# ---------------------------------------------------------------------------
# fused two-optimizer train step


def _run_steps(model, cfg, n_steps, key=0, with_lpips=False):
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    lp = init_lpips_params(jax.random.key(9)) if with_lpips else None
    loss_cfg = GANLossConfig(disc_start=2, kl_weight=1e-4,
                             perceptual_weight=1.0 if with_lpips else 0.0)
    gen_tx, disc_tx = make_ae_optimizers(1e-3)
    step = make_autoencoder_train_step(model, loss_cfg, lp, disc,
                                       gen_tx, disc_tx, jit=True)
    gp = model.init(jax.random.key(key))
    dp = disc.init(jax.random.key(key + 1))
    state = init_ae_train_state(gp, dp, gen_tx, disc_tx)
    x = jax.random.uniform(jax.random.key(3), (2, 16, 16, 3),
                           minval=-1.0, maxval=1.0)
    history = []
    disc_before = jax.tree.map(jnp.copy, state.disc_params)
    for i in range(n_steps):
        state, m = step(state, x, jax.random.key(100 + i))
        history.append({k: float(v) for k, v in m.items()})
    return state, history, disc_before


def test_vq_train_step_runs_and_metrics():
    model = VQModel(_tiny_vq_cfg())
    state, hist, disc_before = _run_steps(model, None, 3)
    for m in hist:
        assert np.isfinite(m["total_loss"]) and np.isfinite(m["disc_loss"])
        assert "quant_loss" in m and "perplexity" in m
    # disc_factor off until disc_start=2
    assert hist[0]["disc_factor"] == 0.0 and hist[2]["disc_factor"] == 1.0
    assert int(state.step) == 3


def test_kl_train_step_with_lpips_and_disc_start_gate():
    cfg = AutoencoderConfig(block_out_channels=(8,), latent_channels=2,
                            norm_num_groups=4, mid_block_attention=False)
    model = AutoencoderKL(cfg)
    state, hist, disc_before = _run_steps(model, None, 1, with_lpips=True)
    m = hist[0]
    assert np.isfinite(m["total_loss"]) and m["kl_loss"] > 0
    # before disc_start the discriminator gets zero loss -> params unchanged
    flat_a = jax.tree.leaves(disc_before)
    flat_b = jax.tree.leaves(state.disc_params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_gen_learns_reconstruction():
    # with the GAN branch inert, the generator should reduce rec_loss fast
    model = VQModel(_tiny_vq_cfg())
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    loss_cfg = GANLossConfig(disc_start=10**9, perceptual_weight=0.0,
                             disc_factor=0.0)
    gen_tx, disc_tx = make_ae_optimizers(2e-3)
    step = make_autoencoder_train_step(model, loss_cfg, None, disc,
                                       gen_tx, disc_tx, jit=True)
    state = init_ae_train_state(model.init(jax.random.key(0)),
                                disc.init(jax.random.key(1)), gen_tx, disc_tx)
    x = jnp.broadcast_to(jnp.linspace(-0.5, 0.5, 16)[None, :, None, None],
                         (4, 16, 16, 3)).astype(jnp.float32)
    first = last = None
    for i in range(30):
        state, m = step(state, x, jax.random.key(i))
        if first is None:
            first = float(m["rec_loss"])
        last = float(m["rec_loss"])
    assert last < 0.7 * first, (first, last)


def test_adaptive_weight_matches_full_autograd():
    """The conv_out-only nested grad must equal differentiating the losses
    through the full decode wrt the conv_out params (they are the same
    mathematical object — the reference's autograd.grad(loss, last_layer))."""
    from diff_pruning_tpu.training.autoencoder import sg

    model = VQModel(_tiny_vq_cfg())
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    gp = model.init(jax.random.key(0))
    dp = disc.init(jax.random.key(1))
    x = jax.random.uniform(jax.random.key(2), (2, 16, 16, 3),
                           minval=-1.0, maxval=1.0)

    z = model.encode(gp, x)
    zq, _, _ = model.quantize_train(gp, z)
    zpq = model.post_quant_conv(gp["post_quant_conv"], zq)
    h = model.decoder.features(gp["decoder"], zpq)

    def nll_from_w(w):
        recon = model.decoder.conv_out(w, h)
        return jnp.mean(jnp.abs(x - recon))

    def g_from_w(w):
        recon = model.decoder.conv_out(w, h)
        return -jnp.mean(disc(dp, recon))

    w = gp["decoder"]["conv_out"]
    n1 = jax.grad(nll_from_w)(w)["kernel"]
    g1 = jax.grad(g_from_w)(w)["kernel"]

    # the same grads computed through the whole decode graph
    def nll_full(w_sub):
        gp2 = {**gp, "decoder": {**gp["decoder"], "conv_out": w_sub}}
        recon = model.decode(gp2, zq)
        return jnp.mean(jnp.abs(x - recon))

    n2 = jax.grad(nll_full)(w)["kernel"]
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), rtol=1e-5)
    dw = float(jnp.linalg.norm(n1.ravel()) / (jnp.linalg.norm(g1.ravel()) + 1e-4))
    assert np.isfinite(dw) and dw >= 0


def test_bf16_mixed_precision_step():
    """bf16 compute / f32 master params: runs, finite, and first-step
    metrics close to the f32 step (loss accumulation is f32)."""
    model = VQModel(_tiny_vq_cfg())
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    loss_cfg = GANLossConfig(disc_start=0, perceptual_weight=0.0)
    gen_tx, disc_tx = make_ae_optimizers(1e-3)
    gp = model.init(jax.random.key(0))
    dp = disc.init(jax.random.key(1))
    x = jax.random.uniform(jax.random.key(3), (2, 16, 16, 3),
                           minval=-1.0, maxval=1.0)
    results = {}
    for mp in ("no", "bf16"):
        step = make_autoencoder_train_step(model, loss_cfg, None, disc,
                                           gen_tx, disc_tx,
                                           mixed_precision=mp, jit=True)
        st = init_ae_train_state(jax.tree.map(jnp.copy, gp),
                                 jax.tree.map(jnp.copy, dp), gen_tx, disc_tx)
        st, m = step(st, x, jax.random.key(7))
        results[mp] = {k: float(v) for k, v in m.items()}
        # master params stay f32
        assert st.gen_params["quantize"]["embedding"]["weight"].dtype == jnp.float32
    assert np.isfinite(results["bf16"]["total_loss"])
    np.testing.assert_allclose(results["bf16"]["rec_loss"],
                               results["no"]["rec_loss"], rtol=0.05)
    np.testing.assert_allclose(results["bf16"]["disc_loss"],
                               results["no"]["disc_loss"], rtol=0.05)


def test_ae_train_step_data_parallel():
    """DP GAN step on the 8-device CPU mesh == single-device step (both
    optimizers; XLA-inserted psum, the Lightning-DDP equivalent)."""
    from diff_pruning_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    model = VQModel(_tiny_vq_cfg())
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    loss_cfg = GANLossConfig(disc_start=0, perceptual_weight=0.0)
    gen_tx, disc_tx = make_ae_optimizers(1e-3)
    gp = model.init(jax.random.key(0))
    dp = disc.init(jax.random.key(1))
    x = jax.random.uniform(jax.random.key(3), (16, 16, 16, 3),
                           minval=-1.0, maxval=1.0)
    key = jax.random.key(9)

    mesh = make_mesh()
    step_dp = make_autoencoder_train_step(model, loss_cfg, None, disc,
                                          gen_tx, disc_tx, mesh=mesh)
    st = replicate(mesh, init_ae_train_state(
        jax.tree.map(jnp.copy, gp), jax.tree.map(jnp.copy, dp),
        gen_tx, disc_tx))
    st2, m = step_dp(st, shard_batch(mesh, x), key)

    step_s = make_autoencoder_train_step(model, loss_cfg, None, disc,
                                         gen_tx, disc_tx)
    st_s = init_ae_train_state(jax.tree.map(jnp.copy, gp),
                               jax.tree.map(jnp.copy, dp), gen_tx, disc_tx)
    st_s2, m_s = step_s(st_s, x, key)
    np.testing.assert_allclose(float(m["total_loss"]),
                               float(m_s["total_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m["disc_loss"]),
                               float(m_s["disc_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(st2.gen_params),
                    jax.tree.leaves(st_s2.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)
    for a, b in zip(jax.tree.leaves(st2.disc_params),
                    jax.tree.leaves(st_s2.disc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)


def test_cli_kill_and_resume_matches_uninterrupted(tmp_path):
    """4 straight steps == 2 steps + resume(2 more): params AND Adam
    moments restored by keypath, data/RNG streams re-aligned."""
    from PIL import Image

    from diff_pruning_tpu.cli.autoencoder_train import main as cli

    imdir = tmp_path / "imgs"
    imdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8),
                        "RGB").save(imdir / f"{i}.png")

    from diff_pruning_tpu.models.vae import AutoencoderConfig, VQModel
    from diff_pruning_tpu.utils.checkpoint import load_params_npz, save_model

    cfg = AutoencoderConfig(block_out_channels=(8,), latent_channels=4,
                            norm_num_groups=4, num_vq_embeddings=16,
                            mid_block_attention=False, sample_size=16)
    seed_dir = tmp_path / "seed"
    save_model(str(seed_dir), cfg, VQModel(cfg).init(jax.random.key(0)),
               subfolder="first_stage")

    def run(outdir, iters, resume=None):
        argv = ["--model_path", str(seed_dir), "--dataset", str(imdir),
                "--resolution", "16", "--output_dir", str(outdir),
                "--train_batch_size", "2", "--num_iters", str(iters),
                "--steps_per_dispatch", "2", "--log_steps", "2",
                "--save_model_steps", "2", "--disc_start", "0",
                "--disc_num_layers", "2",  # 16² < 3-layer PatchGAN minimum
                "--lpips", "off", "--seed", "3"]
        if resume:
            argv += ["--resume_from_checkpoint", str(resume)]
        cli(argv)

    run(tmp_path / "straight", 4)
    run(tmp_path / "partA", 2)
    run(tmp_path / "partB", 4, resume=tmp_path / "partA" / "ckpt")

    # the run must be HEALTHY: assert_allclose treats NaN==NaN as equal, so
    # a degenerate run (e.g. an empty PatchGAN logits map) would otherwise
    # pass this test vacuously
    import json as _json

    metrics = [_json.loads(l) for l in
               open(tmp_path / "straight" / "metrics.jsonl")]
    for m in metrics:
        assert np.isfinite(m["total_loss"]) and np.isfinite(m["disc_loss"]), m

    a = load_params_npz(str(tmp_path / "straight" / "first_stage" / "params.npz"))
    b = load_params_npz(str(tmp_path / "partB" / "first_stage" / "params.npz"))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert np.isfinite(np.asarray(x)).all()
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_discriminator_rejects_undersized_input():
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=3)
    assert disc.min_input_size == 24
    p = disc.init(jax.random.key(0))
    with pytest.raises(ValueError, match="too small"):
        disc(p, jnp.ones((1, 16, 16, 3)))
