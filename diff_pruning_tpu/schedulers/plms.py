"""PLMS (pseudo linear multistep) sampling — the one LDM sampler family the
reference ships beyond DDIM (ldm_exp/ldm/models/diffusion/plms.py:1-236).

Update rule (p_sample_plms, plms.py:224-235):
* step 0 (no history): pseudo improved Euler — take a trial DDIM step with
  e_t, re-evaluate eps at (x_trial, t_next), average;
* 1/2/3+ steps of history: 2nd/3rd/4th-order Adams-Bashforth combination
  of the raw eps history (55/-59/37/-9 etc.);
* x_prev always comes from the deterministic DDIM update (eta=0; PLMS
  asserts ddim_eta==0, plms.py:49) applied to the combined eps.

The whole trajectory runs as one lax.scan: the carry holds (x, the last 3
raw eps, step count); the Adams-Bashforth order is a lax.switch on the
history length. The first step is unrolled (it needs a second model eval).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .ddim import ddim_step
from .ddpm import DiffusionSchedule


def plms_combine(e_t: jnp.ndarray, old: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """Adams-Bashforth eps combination (plms.py:227-235). ``old`` is
    (3, ...) newest-first; ``count`` is how many entries are valid (>=1)."""
    e_t = e_t.astype(jnp.float32)
    o = old.astype(jnp.float32)
    branches = [
        lambda: (3.0 * e_t - o[0]) / 2.0,
        lambda: (23.0 * e_t - 16.0 * o[0] + 5.0 * o[1]) / 12.0,
        lambda: (55.0 * e_t - 59.0 * o[0] + 37.0 * o[1] - 9.0 * o[2]) / 24.0,
    ]
    return jax.lax.switch(jnp.minimum(count, 3) - 1, branches)


def plms_sample(
    eps_fn: Callable,
    schedule: DiffusionSchedule,
    x: jnp.ndarray,
    ts: jnp.ndarray,
    prev: jnp.ndarray,
    *,
    clip_sample: bool = False,
) -> jnp.ndarray:
    """Run the full PLMS trajectory. ``eps_fn(x, t_scalar) -> eps`` wraps the
    model (incl. any CFG batching); ts/prev are the descending timestep
    sequence and its predecessors (prev[i] == ts[i+1], -1 terminator)."""
    t0, tp0 = ts[0], prev[0]
    # step 0: pseudo improved Euler (plms.py:224-228). t_next is the next
    # timestep of the DESCENDING sequence == prev[0] (for S==1: t0 itself).
    t_next = ts[1] if ts.shape[0] > 1 else ts[0]
    e_t = eps_fn(x, t0)
    x_trial = ddim_step(schedule, x, e_t, t0, tp0, eta=0.0,
                        clip_sample=clip_sample)
    e_next = eps_fn(x_trial, t_next)
    e_prime = (e_t.astype(jnp.float32) + e_next.astype(jnp.float32)) / 2.0
    x = ddim_step(schedule, x, e_prime, t0, tp0, eta=0.0,
                  clip_sample=clip_sample)
    old = jnp.stack([e_t.astype(jnp.float32)] * 3)  # only [0] valid at count=1

    def step(carry, inp):
        x, old, count = carry
        t, tp = inp
        e_t = eps_fn(x, t)
        e_prime = plms_combine(e_t, old, count)
        x = ddim_step(schedule, x, e_prime, t, tp, eta=0.0,
                      clip_sample=clip_sample)
        old = jnp.concatenate([e_t.astype(jnp.float32)[None], old[:2]])
        return (x, old, count + 1), None

    if ts.shape[0] > 1:
        (x, _, _), _ = jax.lax.scan(
            step, (x, old, jnp.asarray(1, jnp.int32)), (ts[1:], prev[1:]))
    return x
