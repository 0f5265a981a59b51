"""Pickle-free model checkpoints: (config.json, params.npz).

The reference must pickle whole nn.Modules for pruned models because the
mutated architecture no longer matches its config (ddpm_prune.py:135,
ddpm_train.py:292). Here ``channel_sizes`` in the config captures the pruned
architecture exactly, so a flat npz of arrays suffices.

Training state (step, opt state, EMA) uses the same mechanism via
``save_train_state``/``load_train_state``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..pruning.surgery import flatten_params, unflatten_params


def save_params_npz(path: str, params: dict) -> None:
    flat = {k: np.asarray(v) for k, v in flatten_params(params).items()}
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    with np.load(path) as z:
        flat = {k: jnp.asarray(z[k]) for k in z.files}
    return unflatten_params(flat)


def save_model(model_dir: str, config, params: dict, subfolder: str = "unet") -> None:
    """diffusers-like layout: <dir>/<subfolder>/{config.json, params.npz}."""
    d = os.path.join(model_dir, subfolder) if subfolder else model_dir
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        f.write(config.to_json())
    save_params_npz(os.path.join(d, "params.npz"), params)


def load_model(model_dir: str, subfolder: str = "unet", config_cls=None):
    from ..models.unet2d import UNet2DConfig

    if config_cls is None:
        config_cls = UNet2DConfig
    d = os.path.join(model_dir, subfolder) if subfolder else model_dir
    if not os.path.exists(os.path.join(d, "config.json")) and subfolder:
        d = model_dir  # allow flat layout
    with open(os.path.join(d, "config.json")) as f:
        cfg = config_cls.from_json(f.read())
    params = load_params_npz(os.path.join(d, "params.npz"))
    return cfg, params


def save_train_state(path: str, *, step: int, params: dict, ema_params=None,
                     opt_state_flat=None) -> None:
    os.makedirs(path, exist_ok=True)
    save_params_npz(os.path.join(path, "params.npz"), params)
    if ema_params is not None:
        save_params_npz(os.path.join(path, "ema_params.npz"), ema_params)
    if opt_state_flat is not None:
        np.savez(os.path.join(path, "opt_state.npz"),
                 **{str(i): np.asarray(a) for i, a in enumerate(opt_state_flat)})
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"step": int(step)}, f)


def load_train_state(path: str):
    params = load_params_npz(os.path.join(path, "params.npz"))
    ema = None
    ema_path = os.path.join(path, "ema_params.npz")
    if os.path.exists(ema_path):
        ema = load_params_npz(ema_path)
    opt_flat = None
    opt_path = os.path.join(path, "opt_state.npz")
    if os.path.exists(opt_path):
        with np.load(opt_path) as z:
            opt_flat = [jnp.asarray(z[str(i)]) for i in range(len(z.files))]
    with open(os.path.join(path, "meta.json")) as f:
        step = json.load(f)["step"]
    return step, params, ema, opt_flat
