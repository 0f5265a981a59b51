"""Trajectory and interpolation sampling (ddpm_exp extras).

Ports of Diffusion.sample_sequence (runners/diffusion.py:429-450: return the
intermediate x_t along the DDIM trajectory) and sample_interpolation
(:452-490: slerp between two noise seeds, then denoise each interpolant).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..schedulers.ddim import ddim_prev_timesteps, ddim_step, ddim_timesteps
from ..schedulers.ddpm import DiffusionSchedule


def slerp(z1: jnp.ndarray, z2: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation (diffusion.py:454-459)."""
    flat1 = z1.reshape(-1)
    flat2 = z2.reshape(-1)
    theta = jnp.arccos(jnp.clip(
        jnp.dot(flat1, flat2) / (jnp.linalg.norm(flat1) * jnp.linalg.norm(flat2)),
        -1.0, 1.0))
    s = jnp.sin(theta)
    a = alpha.reshape((-1,) + (1,) * z1.ndim)
    return (jnp.sin((1 - a) * theta) / s * z1[None]
            + jnp.sin(a * theta) / s * z2[None])


def sample_trajectory(model, params, schedule: DiffusionSchedule, *,
                      key, batch_size: int, hw: int, channels: int = 3,
                      num_inference_steps: int = 100, skip_type: str = "uniform",
                      style: str = "ddim_exp"):
    """Returns every intermediate state: (S+1, B, H, W, C) in [0,1]-mapped."""
    ts = ddim_timesteps(num_inference_steps, schedule.num_train_timesteps,
                        skip_type, style=style)
    prev = ddim_prev_timesteps(ts)
    ts_j, prev_j = jnp.asarray(ts, jnp.int32), jnp.asarray(prev, jnp.int32)

    @jax.jit
    def run(key):
        x = jax.random.normal(key, (batch_size, hw, hw, channels))

        def step(x, inp):
            t, tp = inp
            eps = model(params, x, jnp.full((batch_size,), t, jnp.int32))
            x = ddim_step(schedule, x, eps, t, tp)
            return x, x

        _, traj = jax.lax.scan(step, x, (ts_j, prev_j))
        return jnp.concatenate([x[None], traj], axis=0)

    traj = run(key)
    return jnp.clip(traj / 2.0 + 0.5, 0.0, 1.0)


def sample_interpolation(model, params, schedule: DiffusionSchedule, *,
                         key, hw: int, channels: int = 3, n_alphas: int = 11,
                         num_inference_steps: int = 100,
                         skip_type: str = "uniform", style: str = "ddim_exp"):
    """Slerp z1->z2 with alpha in [0,1], denoise all interpolants
    (diffusion.py:461-489). Returns (n_alphas, H, W, C) in [0,1]."""
    k1, k2, k3 = jax.random.split(key, 3)
    z1 = jax.random.normal(k1, (hw, hw, channels))
    z2 = jax.random.normal(k2, (hw, hw, channels))
    alphas = jnp.arange(n_alphas, dtype=jnp.float32) / (n_alphas - 1)
    x = slerp(z1, z2, alphas)  # (n_alphas, H, W, C)

    ts = ddim_timesteps(num_inference_steps, schedule.num_train_timesteps,
                        skip_type, style=style)
    prev = ddim_prev_timesteps(ts)
    ts_j, prev_j = jnp.asarray(ts, jnp.int32), jnp.asarray(prev, jnp.int32)

    @jax.jit
    def run(x):
        def step(x, inp):
            t, tp = inp
            eps = model(params, x, jnp.full((x.shape[0],), t, jnp.int32))
            return ddim_step(schedule, x, eps, t, tp), None

        x, _ = jax.lax.scan(step, x, (ts_j, prev_j))
        return x

    return jnp.clip(run(x) / 2.0 + 0.5, 0.0, 1.0)
