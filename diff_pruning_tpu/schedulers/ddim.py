"""DDIM timestep schedules and the (jit-friendly) DDIM update rule.

Two timestep-sequence families coexist in the reference and both are
supported:

* diffusers-style (the modified DDIMScheduler.set_timesteps,
  diffusers/schedulers/scheduling_ddim.py:257-268): 'uniform' and 'quad'
  over [0, T-1] with rounding;
* ddpm_exp-style (runners/diffusion.py:502-509): 'uniform' = arange step T/S,
  'quad' = (linspace(0, sqrt(0.8 T), S))^2.

The step math follows DDIM eq. (12)/(16). ``prev_timesteps`` is derived from
the *actual* sequence (seq_next = [-1] + seq[:-1]), matching
ddpm_exp/functions/denoising.py:10-32. The root diffusers pipeline instead
uses a constant stride T//S even under quad skip (scheduling_ddim.py:312) —
that quirk is available as ``diffusers_stride=True`` for output parity with
the root pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ddpm import DiffusionSchedule


def ddim_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    skip_type: str = "uniform",
    style: str = "diffusers",
) -> np.ndarray:
    """Descending timestep sequence t_S-1 > ... > t_0."""
    S, T = num_inference_steps, num_train_timesteps
    if style == "diffusers":
        if skip_type == "uniform":
            r = (T - 1) / (S - 1)
            seq = np.round(np.arange(S) * r)
        elif skip_type == "quad":
            r = (T - 1) / (S - 1) ** 2
            seq = np.round(np.arange(S) ** 2 * r)
        else:
            raise NotImplementedError(skip_type)
    elif style == "ddim_exp":
        # ddpm_exp/runners/diffusion.py:502-509
        if skip_type == "uniform":
            skip = T // S
            seq = np.arange(0, T, skip)
        elif skip_type == "quad":
            seq = np.linspace(0, np.sqrt(T * 0.8), S) ** 2
            seq = seq.astype(np.int64)
        else:
            raise NotImplementedError(skip_type)
    else:
        raise ValueError(style)
    return seq[::-1].astype(np.int64).copy()


def ddim_prev_timesteps(
    timesteps: np.ndarray,
    num_train_timesteps: int = 1000,
    diffusers_stride: bool = False,
) -> np.ndarray:
    """Previous-step indices aligned with ``timesteps`` (both descending).

    Default: the true predecessor in the sequence with -1 terminator
    (generalized_steps' seq_next). diffusers_stride reproduces
    scheduling_ddim.py:312's fixed ``t - T//S``.
    """
    if diffusers_stride:
        return timesteps - num_train_timesteps // len(timesteps)
    prev = np.empty_like(timesteps)
    prev[:-1] = timesteps[1:]
    prev[-1] = -1
    return prev


def ddim_step(
    schedule: DiffusionSchedule,
    sample: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    *,
    eta: float = 0.0,
    clip_sample: bool = False,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One DDIM update x_t -> x_{t_prev} (eq. 12/16; scheduling_ddim.py:312-390).

    t / t_prev are scalars or (B,) int32 arrays; t_prev == -1 means
    alpha_bar = 1 (final step / set_alpha_to_one).
    """
    at = schedule.alpha_bar(t).astype(jnp.float32)
    at_prev = schedule.alpha_bar(t_prev).astype(jnp.float32)
    shape = (-1,) + (1,) * (sample.ndim - 1)
    at = at.reshape(shape) if at.ndim else at
    at_prev = at_prev.reshape(shape) if at_prev.ndim else at_prev

    x = sample.astype(jnp.float32)
    e = eps.astype(jnp.float32)
    x0 = (x - jnp.sqrt(1.0 - at) * e) / jnp.sqrt(at)
    if clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
        e = (x - jnp.sqrt(at) * x0) / jnp.sqrt(1.0 - at)
    if eta > 0.0:
        sigma = eta * jnp.sqrt((1.0 - at_prev) / (1.0 - at)) * jnp.sqrt(1.0 - at / at_prev)
    else:
        sigma = 0.0
    dir_xt = jnp.sqrt(1.0 - at_prev - sigma**2) * e
    prev = jnp.sqrt(at_prev) * x0 + dir_xt
    if eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        prev = prev + sigma * noise.astype(jnp.float32)
    return prev.astype(sample.dtype)


def ddpm_step(
    schedule: DiffusionSchedule,
    sample: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Ancestral DDPM step (ddpm_exp/functions/denoising.py:35-67)."""
    at = schedule.alpha_bar(t).astype(jnp.float32)
    atm1 = schedule.alpha_bar(t_prev).astype(jnp.float32)
    shape = (-1,) + (1,) * (sample.ndim - 1)
    at = at.reshape(shape) if at.ndim else at
    atm1 = atm1.reshape(shape) if atm1.ndim else atm1
    beta_t = 1.0 - at / atm1
    x = sample.astype(jnp.float32)
    e = eps.astype(jnp.float32)
    x0 = jnp.sqrt(1.0 / at) * x - jnp.sqrt(1.0 / at - 1.0) * e
    x0 = jnp.clip(x0, -1.0, 1.0)
    mean = (jnp.sqrt(atm1) * beta_t * x0 + jnp.sqrt(1.0 - beta_t) * (1.0 - atm1) * x) / (1.0 - at)
    mask = (t > 0).astype(jnp.float32)
    mask = mask.reshape(shape) if mask.ndim else mask
    logvar = jnp.log(jnp.maximum(beta_t, 1e-20))
    out = mean + mask * jnp.exp(0.5 * logvar) * noise.astype(jnp.float32)
    return out.astype(sample.dtype)
