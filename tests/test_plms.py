"""PLMS sampler golden tests: the lax.scan implementation must match a
plain-Python transcription of the reference update rule
(ldm_exp/ldm/models/diffusion/plms.py:180-236) step for step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.unet2d import UNet2D, tiny_unet_config
from diff_pruning_tpu.sampling.ddim_sampler import SamplerConfig, make_sampler
from diff_pruning_tpu.schedulers.ddim import ddim_prev_timesteps, ddim_timesteps
from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
from diff_pruning_tpu.schedulers.plms import plms_combine, plms_sample


def _reference_plms(eps_fn, schedule, x, ts, prev):
    """Literal transcription of p_sample_plms + the driver loop
    (plms.py:140-166, 224-236), eta=0, no clipping."""

    def x_prev_from(x, e, t, tp):
        a_t = np.float32(schedule.alpha_bar(int(t)))
        a_prev = np.float32(schedule.alpha_bar(int(tp)))
        pred_x0 = (x - np.sqrt(1.0 - a_t) * e) / np.sqrt(a_t)
        dir_xt = np.sqrt(1.0 - a_prev) * e
        return np.sqrt(a_prev) * pred_x0 + dir_xt

    old_eps = []
    x = np.asarray(x, np.float64)
    for i, (t, tp) in enumerate(zip(ts, prev)):
        e_t = np.asarray(eps_fn(x, t), np.float64)
        if len(old_eps) == 0:
            # pseudo improved Euler (plms.py:224-228)
            t_next = ts[min(i + 1, len(ts) - 1)]
            x_trial = x_prev_from(x, e_t, t, tp)
            e_next = np.asarray(eps_fn(x_trial, t_next), np.float64)
            e_prime = (e_t + e_next) / 2.0
        elif len(old_eps) == 1:
            e_prime = (3.0 * e_t - old_eps[-1]) / 2.0
        elif len(old_eps) == 2:
            e_prime = (23.0 * e_t - 16.0 * old_eps[-1] + 5.0 * old_eps[-2]) / 12.0
        else:
            e_prime = (55.0 * e_t - 59.0 * old_eps[-1] + 37.0 * old_eps[-2]
                       - 9.0 * old_eps[-3]) / 24.0
        x = x_prev_from(x, e_prime, t, tp)
        old_eps.append(e_t)
        if len(old_eps) >= 4:
            old_eps.pop(0)
    return x


def test_plms_combine_coefficients():
    e = jnp.full((2, 2), 1.0)
    old = jnp.stack([jnp.full((2, 2), 2.0), jnp.full((2, 2), 3.0),
                     jnp.full((2, 2), 4.0)])
    assert np.allclose(plms_combine(e, old, jnp.asarray(1)), (3 - 2) / 2)
    assert np.allclose(plms_combine(e, old, jnp.asarray(2)),
                       (23 - 16 * 2 + 5 * 3) / 12)
    for c in (3, 4, 9):
        assert np.allclose(plms_combine(e, old, jnp.asarray(c)),
                           (55 - 59 * 2 + 37 * 3 - 9 * 4) / 24)


@pytest.mark.parametrize("steps", [1, 2, 6])
def test_plms_scan_matches_reference_rule(steps):
    """Drive plms_sample with a cheap analytic eps and compare to the
    transcribed reference loop (covers Euler start, order ramp-up 2->3->4,
    and history rotation)."""
    with jax.default_matmul_precision("float32"):
        schedule = DiffusionSchedule.create()
        ts = ddim_timesteps(steps, 1000, "uniform", style="ddim_exp")
        prev = ddim_prev_timesteps(ts)

        def eps_jnp(x, t):
            return jnp.tanh(x) * (1.0 + jnp.float32(t) / 1000.0)

        def eps_np(x, t):
            return np.tanh(x) * (1.0 + np.float32(t) / 1000.0)

        x0 = jax.random.normal(jax.random.key(0), (2, 4, 4, 3))
        got = jax.jit(lambda x: plms_sample(
            eps_jnp, schedule, x, jnp.asarray(ts, jnp.int32),
            jnp.asarray(prev, jnp.int32)))(x0)
        want = _reference_plms(eps_np, schedule, np.asarray(x0), ts, prev)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_plms_sampler_kind_end_to_end():
    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    sched = DiffusionSchedule.create()
    out = make_sampler(model, params, sched,
                       SamplerConfig(num_inference_steps=5, kind="plms",
                                     clip_sample=False))(
        jax.random.key(1), 4, 16, 3)
    assert out.shape == (4, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # differs from plain DDIM at the same step count (the multistep term bites)
    ddim = make_sampler(model, params, sched,
                        SamplerConfig(num_inference_steps=5,
                                      clip_sample=False))(
        jax.random.key(1), 4, 16, 3)
    assert np.abs(np.asarray(out) - np.asarray(ddim)).max() > 1e-4


def test_cfg_plms_sampler_runs():
    from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
    from diff_pruning_tpu.models.unet_cond import tiny_cond_config

    ldm = LatentDiffusion(tiny_cond_config(), n_classes=11)
    params = ldm.init(jax.random.key(0))
    hw, ch = ldm.unet.cfg.image_size, ldm.unet.cfg.in_channels
    s = ldm.make_cfg_sampler(params, ddim_steps=3, latent_hw=hw, latent_ch=ch,
                             method="plms")
    lat = s(jax.random.key(2), jnp.zeros((4,), jnp.int32), 4)
    assert lat.shape == (4, hw, hw, ch)
    assert np.isfinite(np.asarray(lat)).all()
    with pytest.raises(ValueError):
        ldm.make_cfg_sampler(params, ddim_steps=3, eta=0.5, method="plms")


def test_plms_rejects_nonzero_eta_everywhere():
    """make_sampler must reject eta != 0 with PLMS like the LDM CFG sampler
    does (plms.py:49) instead of silently sampling with eta=0."""
    import pytest as _pytest

    from diff_pruning_tpu.models.unet2d import UNet2D, tiny_unet_config
    from diff_pruning_tpu.sampling.ddim_sampler import SamplerConfig, make_sampler
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule

    model = UNet2D(tiny_unet_config())
    params = model.init(jax.random.key(0))
    with _pytest.raises(ValueError, match="eta"):
        make_sampler(model, params, DiffusionSchedule.create(),
                     SamplerConfig(num_inference_steps=4, kind="plms", eta=0.5))
