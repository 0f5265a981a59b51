"""Scheduler golden tests vs closed-form / reference formulas."""

import numpy as np
import pytest

import jax.numpy as jnp

from diff_pruning_tpu.schedulers.ddim import (
    ddim_prev_timesteps,
    ddim_step,
    ddim_timesteps,
    ddpm_step,
)
from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule, get_beta_schedule


def test_linear_betas_match_diffusers():
    betas = get_beta_schedule("linear", num_train_timesteps=1000)
    assert np.isclose(betas[0], 1e-4) and np.isclose(betas[-1], 0.02)
    assert len(betas) == 1000


def test_timesteps_uniform_diffusers():
    # scheduling_ddim.py:257-260: round(arange(S) * (T-1)/(S-1)), reversed
    ts = ddim_timesteps(100, 1000, "uniform", style="diffusers")
    expected = np.round(np.arange(100) * 999 / 99)[::-1].astype(np.int64)
    assert np.array_equal(ts, expected)
    assert ts[0] == 999 and ts[-1] == 0


def test_timesteps_quad_diffusers():
    # scheduling_ddim.py:262-265: round(arange(S)^2 * (T-1)/(S-1)^2), reversed
    ts = ddim_timesteps(100, 1000, "quad", style="diffusers")
    expected = np.round(np.arange(100) ** 2 * 999 / 99**2)[::-1].astype(np.int64)
    assert np.array_equal(ts, expected)


def test_timesteps_quad_ddim_exp():
    # runners/diffusion.py:506-509: linspace(0, sqrt(0.8T), S)^2 as int
    ts = ddim_timesteps(100, 1000, "quad", style="ddim_exp")
    expected = (np.linspace(0, np.sqrt(1000 * 0.8), 100) ** 2).astype(np.int64)[::-1]
    assert np.array_equal(ts, expected)


def test_prev_timesteps():
    ts = np.array([999, 500, 100, 0])
    prev = ddim_prev_timesteps(ts)
    assert list(prev) == [500, 100, 0, -1]
    prev_d = ddim_prev_timesteps(ts, 1000, diffusers_stride=True)
    assert list(prev_d) == [999 - 250, 500 - 250, 100 - 250, -250]


def test_add_noise_golden():
    sched = DiffusionSchedule.create()
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.full((2, 4, 4, 1), 0.5)
    t = jnp.array([0, 999])
    out = np.asarray(sched.add_noise(x0, noise, t))
    a = np.cumprod(1 - np.asarray(sched.betas, dtype=np.float64))
    for i, ti in enumerate([0, 999]):
        want = np.sqrt(a[ti]) * 1.0 + np.sqrt(1 - a[ti]) * 0.5
        np.testing.assert_allclose(out[i], want, rtol=1e-5)


def test_ddim_step_matches_generalized_steps():
    """eta=0 update equals ddpm_exp generalized_steps algebra
    (functions/denoising.py:10-32)."""
    sched = DiffusionSchedule.create()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    e = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    t, tn = 800, 600
    out = np.asarray(ddim_step(sched, jnp.asarray(x), jnp.asarray(e),
                               jnp.array(t), jnp.array(tn)))
    a = np.cumprod(1 - np.asarray(sched.betas, dtype=np.float64))
    at, atn = a[t], a[tn]
    x0 = (x - e * np.sqrt(1 - at)) / np.sqrt(at)
    want = np.sqrt(atn) * x0 + np.sqrt(1 - atn) * e
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_ddim_step_terminal():
    """t_prev == -1 -> alpha_bar = 1 -> returns the x0 prediction."""
    sched = DiffusionSchedule.create()
    x = jnp.ones((1, 2, 2, 1))
    e = jnp.zeros((1, 2, 2, 1))
    out = np.asarray(ddim_step(sched, x, e, jnp.array(10), jnp.array(-1)))
    a = np.cumprod(1 - np.asarray(sched.betas, dtype=np.float64))
    np.testing.assert_allclose(out, 1.0 / np.sqrt(a[10]), rtol=1e-5)


def test_ddim_step_eta_sigma():
    """eta=1 sigma matches eq.(16)."""
    sched = DiffusionSchedule.create()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 2, 1)).astype(np.float32)
    e = rng.standard_normal((1, 2, 2, 1)).astype(np.float32)
    z = rng.standard_normal((1, 2, 2, 1)).astype(np.float32)
    t, tn = 500, 400
    out = np.asarray(ddim_step(sched, jnp.asarray(x), jnp.asarray(e),
                               jnp.array(t), jnp.array(tn), eta=1.0,
                               noise=jnp.asarray(z)))
    a = np.cumprod(1 - np.asarray(sched.betas, dtype=np.float64))
    at, atn = a[t], a[tn]
    sigma = np.sqrt((1 - atn) / (1 - at)) * np.sqrt(1 - at / atn)
    x0 = (x - e * np.sqrt(1 - at)) / np.sqrt(at)
    want = np.sqrt(atn) * x0 + np.sqrt(1 - atn - sigma**2) * e + sigma * z
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
