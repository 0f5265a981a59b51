"""The Diff-Pruning sweep: timestep-prefix Taylor gradient accumulation with
relative-loss early stopping.

Reference semantics (ddpm_prune.py:94-106, the paper's core loop):

    for step_k in 0..999:
        t = step_k (whole batch)
        noisy = add_noise(x0, eps, t)
        loss = mse(model(noisy, t), eps); loss.backward()   # grads ACCUMULATE
        loss_max = max(loss_max, loss)
        if loss < loss_max * thr: break                      # AFTER accumulating

Two TPU-native implementations with identical semantics:

* :func:`accumulate_taylor_grads` — one jitted value_and_grad compiled once,
  driven by a host loop that applies the early-exit (simple, exact, one
  device-to-host scalar transfer per step).
* :func:`accumulate_taylor_grads_scan` — the whole sweep as a single jitted
  ``lax.while_loop`` carrying the grad pytree; zero host round-trips, the
  early exit is a traced predicate. This is the production path: the full
  sweep (model fwd+bwd per timestep) stays on-chip.

Both also cover plain 'taylor' pruning (thr=None -> fixed number of steps)
and ddpm_exp's staged ablation (prune_ssim.py:257-269: exactly `stage`
timesteps, no early stop).

The loss here is mean-MSE as in ddpm_prune.py:101 (torch F.mse_loss); the
ddpm_exp prune path uses sum-per-image/mean-batch
(functions/losses.py:4-15) — select with ``loss_type``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..schedulers.ddpm import DiffusionSchedule


def make_loss_fn(model, schedule: DiffusionSchedule, loss_type: str = "mse"):
    """(params, x0, noise, t) -> scalar DDPM noise-prediction loss."""

    def loss_fn(params, x0, noise, t):
        noisy = schedule.add_noise(x0, noise, t)
        out = model(params, noisy, t)
        err = (out - noise).astype(jnp.float32) ** 2
        if loss_type == "mse":  # ddpm_prune.py:101
            return jnp.mean(err)
        if loss_type == "sum":  # ddpm_exp functions/losses.py:14-15
            return jnp.sum(err, axis=(1, 2, 3)).mean()
        raise ValueError(loss_type)

    return loss_fn


@dataclasses.dataclass
class SweepResult:
    grads: dict  # accumulated grad pytree
    losses: jnp.ndarray  # per-step losses (nan-padded in the scan variant)
    steps_run: int


def accumulate_taylor_grads(
    model,
    params,
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    thr: Optional[float] = 0.05,
    max_steps: Optional[int] = None,
    loss_type: str = "mse",
    accumulate_abs: bool = False,
    verbose: bool = False,
) -> SweepResult:
    """Host-driven variant: jit the per-step grad, loop + break on host.

    ``accumulate_abs`` accumulates |grad| per timestep instead of the signed
    sum — the vendored AbsTaylorImportance's accumulation mode
    (ddpm_exp/torch_pruning/pruner/importance.py:553-670)."""
    T = schedule.num_train_timesteps if max_steps is None else max_steps
    loss_fn = make_loss_fn(model, schedule, loss_type)

    @jax.jit
    def step(params, grads, k):
        t = jnp.full((x0.shape[0],), k, dtype=jnp.int32)
        loss, g = jax.value_and_grad(loss_fn)(params, x0, noise, t)
        if accumulate_abs:
            g = jax.tree.map(jnp.abs, g)
        return loss, jax.tree.map(jnp.add, grads, g)

    grads = jax.tree.map(jnp.zeros_like, params)
    losses = []
    loss_max = 0.0
    k = 0
    for k in range(T):
        loss, grads = step(params, grads, k)
        loss = float(loss)
        losses.append(loss)
        if verbose and k % 50 == 0:
            print(f"  sweep step {k}: loss {loss:.5f}")
        if thr is not None:
            loss_max = max(loss_max, loss)
            if loss < loss_max * thr:
                break
    return SweepResult(grads, jnp.asarray(losses), k + 1)


def accumulate_taylor_grads_scan(
    model,
    params,
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    thr: Optional[float] = 0.05,
    max_steps: Optional[int] = None,
    loss_type: str = "mse",
) -> SweepResult:
    """Single-jit variant: the whole early-exit sweep as lax.while_loop."""
    T = schedule.num_train_timesteps if max_steps is None else max_steps
    loss_fn = make_loss_fn(model, schedule, loss_type)
    thr_v = -1.0 if thr is None else float(thr)

    def cond(carry):
        k, _, _, done, _ = carry
        return jnp.logical_and(k < T, jnp.logical_not(done))

    def body(carry):
        k, grads, loss_max, done, losses = carry
        t = jnp.full((x0.shape[0],), k, dtype=jnp.int32)
        loss, g = jax.value_and_grad(loss_fn)(params, x0, noise, t)
        grads = jax.tree.map(jnp.add, grads, g)
        loss_max = jnp.maximum(loss_max, loss)
        # reference order: accumulate, update max, then test (ddpm_prune.py:104-106)
        done = jnp.logical_and(thr_v >= 0.0, loss < loss_max * thr_v)
        losses = losses.at[k].set(loss)
        return k + 1, grads, loss_max, done, losses

    init = (
        jnp.array(0, jnp.int32),
        jax.tree.map(jnp.zeros_like, params),
        jnp.array(0.0, jnp.float32),
        jnp.array(False),
        jnp.full((T,), jnp.nan, jnp.float32),
    )
    k, grads, _, _, losses = jax.jit(
        lambda: jax.lax.while_loop(cond, body, init))()
    return SweepResult(grads, losses, int(k))
