"""DPM-Solver++(2M) tests (schedulers/dpm_solver.py — beyond reference).

Three anchors:
1. order=1 is algebraically DDIM(eta=0): assert near-bit agreement with the
   ddim_step trajectory.
2. Golden: the lax.scan matches an independent numpy transcription of the
   multistep data-prediction update (Lu et al. 2022, Algorithm 2 /
   lower_order_final) step for step.
3. Analytic Gaussian anchor: with x0 ~ N(0, I) the exact eps-posterior is
   eps(x, t) = sqrt(1 - abar(t)) * x and the probability-flow ODE map is the
   identity — the 2nd-order solver must beat DDIM at equal step count and
   show ~2nd-order error decay.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.schedulers.ddim import (ddim_prev_timesteps,
                                              ddim_step, ddim_timesteps)
from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
from diff_pruning_tpu.schedulers.dpm_solver import dpm_solver_sample


def _make_traj(steps, style="ddim_exp"):
    ts = ddim_timesteps(steps, 1000, "uniform", style=style)
    prev = ddim_prev_timesteps(ts)
    return (jnp.asarray(ts, jnp.int32), jnp.asarray(prev, jnp.int32))


def _analytic_eps_jnp(schedule):
    def eps_fn(x, t):
        return jnp.sqrt(1.0 - schedule.alpha_bar(t)) * x
    return eps_fn


def _reference_dpmpp_2m(eps_fn, schedule, x, ts, prev, clip=False):
    """Plain-Python DPM-Solver++(2M), data prediction, lower_order_final."""
    x = np.asarray(x, np.float64)
    lam_prev, x0_prev = None, None
    n = len(ts)
    for i, (t, tp) in enumerate(zip(ts, prev)):
        a_c = np.sqrt(np.float64(schedule.alpha_bar(int(t))))
        s_c = np.sqrt(1.0 - np.float64(schedule.alpha_bar(int(t))))
        a_n = np.sqrt(np.float64(schedule.alpha_bar(int(tp))))
        s_n = np.sqrt(1.0 - np.float64(schedule.alpha_bar(int(tp))))
        e = np.asarray(eps_fn(x, t), np.float64)
        x0 = (x - s_c * e) / a_c
        if clip:
            x0 = np.clip(x0, -1.0, 1.0)
            e = (x - a_c * x0) / s_c
        lam_c = np.log(a_c / s_c)
        if i == 0 or i == n - 1 or lam_prev is None:
            x = a_n * x0 + s_n * e
        else:
            lam_n = np.log(a_n / max(s_n, 1e-20))
            h = lam_n - lam_c
            r = (lam_c - lam_prev) / h
            d = x0 + (0.5 / r) * (x0 - x0_prev)
            x = (s_n / s_c) * x - a_n * (np.exp(-h) - 1.0) * d
        lam_prev, x0_prev = lam_c, x0
    return x


def _run_ddim(eps_fn, schedule, x, ts, prev):
    def step(x, inp):
        t, tp = inp
        e = eps_fn(x, t)
        return ddim_step(schedule, x, e, t, tp, eta=0.0,
                         clip_sample=False), None
    x, _ = jax.lax.scan(step, x, (ts, prev))
    return x


def test_order1_is_ddim():
    schedule = DiffusionSchedule.create()
    ts, prev = _make_traj(8)
    eps_fn = _analytic_eps_jnp(schedule)
    x0 = jax.random.normal(jax.random.key(0), (2, 4, 4, 3))
    got = dpm_solver_sample(eps_fn, schedule, x0, ts, prev, order=1)
    want = _run_ddim(eps_fn, schedule, x0, ts, prev)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("steps,clip", [(1, False), (2, False), (6, False),
                                        (6, True)])
def test_scan_matches_reference_rule(steps, clip):
    with jax.default_matmul_precision("float32"):
        schedule = DiffusionSchedule.create()
        ts, prev = _make_traj(steps)

        def eps_jnp(x, t):
            return jnp.tanh(x) * (1.0 + jnp.float32(t) / 1000.0)

        def eps_np(x, t):
            return np.tanh(x) * (1.0 + np.float32(t) / 1000.0)

        x0 = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
        got = jax.jit(lambda x: dpm_solver_sample(
            eps_jnp, schedule, x, ts, prev, clip_sample=clip))(x0)
        want = _reference_dpmpp_2m(eps_np, schedule, np.asarray(x0),
                                   np.asarray(ts), np.asarray(prev),
                                   clip=clip)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-4)


def test_second_order_beats_ddim_on_analytic_gaussian():
    """x0 ~ N(0, I): exact PF-ODE map is the identity (the marginal is
    N(0, I) at every t, so the deterministic flow preserving it is x = const
    up to the t=0 boundary where abar(t_min) != 1 exactly)."""
    schedule = DiffusionSchedule.create()
    eps_fn = _analytic_eps_jnp(schedule)
    x = jax.random.normal(jax.random.key(2), (4, 8, 8, 3))

    def err(fn, steps):
        ts, prev = _make_traj(steps)
        out = fn(x, ts, prev)
        return float(jnp.abs(out - x).max())

    dpm = lambda x, ts, prev: dpm_solver_sample(eps_fn, schedule, x, ts, prev)
    ddim = lambda x, ts, prev: _run_ddim(eps_fn, schedule, x, ts, prev)

    # At very low step counts (h ~ 1 in lambda) the multistep extrapolation
    # overshoots on this model and DDIM wins (measured: 1.12 vs 0.64 at 10
    # steps) — the 2nd-order advantage is asymptotic, kicking in by ~40 steps.
    e_dpm_40, e_dpm_80 = err(dpm, 40), err(dpm, 80)
    e_ddim_40, e_ddim_80 = err(ddim, 40), err(ddim, 80)
    assert e_dpm_40 < e_ddim_40 and e_dpm_80 < e_ddim_80
    # error decays ~4x per halving (2nd order) vs DDIM's ~2x (1st order)
    assert e_dpm_40 / max(e_dpm_80, 1e-12) > 3.0
    assert e_ddim_40 / max(e_ddim_80, 1e-12) < 3.0


def test_sampler_kind_dpm_end_to_end():
    from diff_pruning_tpu.models.unet2d import UNet2D, tiny_unet_config
    from diff_pruning_tpu.sampling.ddim_sampler import (SamplerConfig,
                                                        make_sampler)

    model = UNet2D(tiny_unet_config(attn=False))
    params = model.init(jax.random.key(0))
    sched = DiffusionSchedule.create()
    out = make_sampler(model, params, sched,
                       SamplerConfig(num_inference_steps=5, kind="dpm",
                                     clip_sample=False))(
        jax.random.key(1), 4, 16, 3)
    assert out.shape == (4, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    ddim = make_sampler(model, params, sched,
                        SamplerConfig(num_inference_steps=5,
                                      clip_sample=False))(
        jax.random.key(1), 4, 16, 3)
    assert np.abs(np.asarray(out) - np.asarray(ddim)).max() > 1e-4
    with pytest.raises(ValueError, match="eta"):
        make_sampler(model, params, sched,
                     SamplerConfig(num_inference_steps=4, kind="dpm",
                                   eta=0.5))


def test_cfg_dpm_sampler_runs():
    from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
    from diff_pruning_tpu.models.unet_cond import tiny_cond_config

    ldm = LatentDiffusion(tiny_cond_config(), n_classes=11)
    params = ldm.init(jax.random.key(0))
    hw, ch = ldm.unet.cfg.image_size, ldm.unet.cfg.in_channels
    s = ldm.make_cfg_sampler(params, ddim_steps=3, latent_hw=hw,
                             latent_ch=ch, method="dpm")
    lat = s(jax.random.key(2), jnp.zeros((4,), jnp.int32), 4)
    assert lat.shape == (4, hw, hw, ch)
    assert np.isfinite(np.asarray(lat)).all()
    with pytest.raises(ValueError):
        ldm.make_cfg_sampler(params, ddim_steps=3, eta=0.5, method="dpm")


def test_dpm20_matches_ddim100_on_exact_mixture_field():
    """Serving-quality claim on the exact eps-posterior of a 5-mode
    Gaussian mixture — the closed-form field a perfectly-trained model
    would learn (tight modes: the sampler's job is picking the right mode
    and landing on it). Measured (tools/dpm_timing.py rationale): DPM-20
    matches DDIM-100's mode fidelity and DPM-10 ≈ DDIM-50, i.e. ~5x fewer
    model evals at equal sample quality."""
    schedule = DiffusionSchedule.create()
    D = 8
    MU = jax.random.normal(jax.random.key(3), (5, D)) * 1.5

    def eps_fn(x, t):
        # E[eps | x_t] for x0 ~ uniform mixture of N(mu_k, 0.1^2 I):
        # q_t(x | x0=mu_k) = N(a mu_k, (s^2 + a^2 0.01) I)
        a = jnp.sqrt(schedule.alpha_bar(t))
        s2 = 1.0 - schedule.alpha_bar(t)
        var = s2 + a * a * 0.01
        logw = -0.5 * jnp.sum((x[:, None, :] - a * MU[None]) ** 2, -1) / var
        x0hat = jax.nn.softmax(logw, axis=1) @ MU
        return (x - a * x0hat) / jnp.sqrt(s2)

    x = jax.random.normal(jax.random.key(103), (256, D))

    def sample(kind, steps):
        ts, prev = _make_traj(steps)
        if kind == "dpm":
            return dpm_solver_sample(eps_fn, schedule, x, ts, prev)
        return _run_ddim(eps_fn, schedule, x, ts, prev)

    def mode(y):
        return jnp.argmin(jnp.sum((y[:, None, :] - MU[None]) ** 2, -1), 1)

    ref = sample("ddim", 1000)
    m_ref = mode(ref)

    def wrong(kind, steps):
        return int(jnp.sum(mode(sample(kind, steps)) != m_ref))

    w_ddim100, w_ddim50, w_ddim25 = (wrong("ddim", s)
                                     for s in (100, 50, 25))
    w_dpm20, w_dpm10 = wrong("dpm", 20), wrong("dpm", 10)
    # measured: ddim 1/2/5 wrong at 100/50/25 steps; dpm 1 at 20, 2 at 10
    assert w_dpm20 <= w_ddim100 + 1          # DPM-20 ~ DDIM-100
    assert w_dpm10 <= w_ddim50 + 1           # DPM-10 ~ DDIM-50
    assert w_ddim25 > w_dpm20                # and DDIM-25 is clearly worse


def test_dpm_rejects_bad_order():
    schedule = DiffusionSchedule.create()
    ts, prev = _make_traj(4)
    with pytest.raises(ValueError, match="order"):
        dpm_solver_sample(lambda x, t: x, schedule,
                          jnp.zeros((1, 2, 2, 1)), ts, prev, order=3)
