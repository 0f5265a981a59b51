"""DDPM forward process: beta schedules and ``add_noise``.

JAX port of the exercised slice of diffusers DDPMScheduler
(diffusers/schedulers/scheduling_ddpm.py: betas at :ctor, add_noise :408) and
the ddpm_exp beta schedules (ddpm_exp/runners/diffusion.py:28-58:
quad/linear/const/jsd/sigmoid). Everything is precomputed numpy/jnp arrays —
no stateful scheduler object; sampling and training index into them inside
jitted code.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """squaredcos_cap_v2 (Glide cosine) schedule (scheduling_ddpm.py)."""

    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1, t2 = i / num_steps, (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def get_beta_schedule(
    schedule: str = "linear",
    *,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
) -> np.ndarray:
    """Beta schedules.

    'linear'/'scaled_linear'/'squaredcos_cap_v2' match diffusers
    (scheduling_ddpm.py ctor); 'quad'/'const'/'jsd'/'sigmoid' match the DDIM
    codebase (ddpm_exp/runners/diffusion.py:28-58).
    """
    n = num_train_timesteps
    if schedule == "linear":
        betas = np.linspace(beta_start, beta_end, n, dtype=np.float64)
    elif schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, n, dtype=np.float64) ** 2
    elif schedule == "squaredcos_cap_v2":
        betas = betas_for_alpha_bar(n)
    elif schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, n, dtype=np.float64) ** 2
    elif schedule == "const":
        betas = beta_end * np.ones(n, dtype=np.float64)
    elif schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(n, 1, n, dtype=np.float64)
    elif schedule == "sigmoid":
        x = np.linspace(-6, 6, n)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(schedule)
    return betas


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed diffusion constants, shared by train/prune/sample paths."""

    betas: jnp.ndarray  # (T,) float32
    alphas_cumprod: jnp.ndarray  # (T,) float32
    num_train_timesteps: int

    @classmethod
    def create(
        cls,
        *,
        num_train_timesteps: int = 1000,
        beta_schedule: str = "linear",
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        trained_betas: Optional[np.ndarray] = None,
    ) -> "DiffusionSchedule":
        if trained_betas is not None:
            betas = np.asarray(trained_betas, dtype=np.float64)
        else:
            betas = get_beta_schedule(
                beta_schedule,
                num_train_timesteps=num_train_timesteps,
                beta_start=beta_start,
                beta_end=beta_end,
            )
        acp = np.cumprod(1.0 - betas)
        return cls(
            betas=jnp.asarray(betas, dtype=jnp.float32),
            alphas_cumprod=jnp.asarray(acp, dtype=jnp.float32),
            num_train_timesteps=num_train_timesteps,
        )

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """sqrt(a_t) x0 + sqrt(1-a_t) eps (scheduling_ddpm.py:408)."""
        a = self.alphas_cumprod[t].astype(x0.dtype)
        a = a.reshape(a.shape + (1,) * (x0.ndim - a.ndim))
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def alpha_bar(self, t: jnp.ndarray) -> jnp.ndarray:
        """alphas_cumprod[t], with t == -1 -> 1.0 (compute_alpha's zero-pad,
        ddpm_exp/functions/denoising.py:4-7)."""
        padded = jnp.concatenate([jnp.ones((1,), self.alphas_cumprod.dtype),
                                  self.alphas_cumprod])
        return padded[t + 1]
