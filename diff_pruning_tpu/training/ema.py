"""EMA as a pytree update inside the jitted train step.

Matches the reference's constant-decay EMA: the modified diffusers EMAModel
with warmup disabled, update s = (1-d)*p + d*s (training_utils.py:201,216),
identical to ddpm_exp's EMAHelper (models/ema.py:41-47) with mu=0.9999.
"""

from __future__ import annotations

import jax


def ema_update(ema_params, params, decay: float):
    return jax.tree.map(lambda s, p: decay * s + (1.0 - decay) * p, ema_params, params)
