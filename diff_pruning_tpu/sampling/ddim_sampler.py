"""DDIM/DDPM sampling as a single jitted lax.scan over the timestep sequence.

Replaces the reference's Python pipeline loops
(diffusers/pipelines/ddim/pipeline_ddim.py:103-112,
ddpm_exp/functions/denoising.py:10-67) with one compiled program per
(batch_shape, num_steps): the whole trajectory runs on-chip; data-parallel
sampling shards the batch across the mesh (distributed.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..schedulers.ddim import ddim_prev_timesteps, ddim_step, ddim_timesteps, ddpm_step
from ..schedulers.ddpm import DiffusionSchedule
from ..schedulers.plms import plms_sample


@dataclasses.dataclass
class SamplerConfig:
    num_inference_steps: int = 100
    skip_type: str = "uniform"  # 'uniform' | 'quad'
    style: str = "diffusers"  # timestep-sequence family; 'ddim_exp' for paper runs
    eta: float = 0.0
    clip_sample: bool = True  # DDIMScheduler default for DDPM checkpoints
    kind: str = "ddim"  # 'ddim' | 'ddpm' | 'plms' (ldm_exp plms.py) |
    # 'dpm' (DPM-Solver++ 2M, beyond reference — schedulers/dpm_solver.py)
    diffusers_stride: bool = False  # root-pipeline prev-step quirk (scheduling_ddim.py:312)
    # Model compute dtype. bf16 runs the UNet's convs/matmuls as native-MXU
    # bf16 (the TPU fast path); the DDIM update itself always runs in f32
    # (ddim_step upcasts), so trajectory math stays accurate.
    dtype: str = "float32"


# Above this many param bytes, samplers pass params as jit ARGUMENTS instead
# of closure constants: constants serialize into the program and this
# platform's remote compile service rejects very large programs (HTTP 413 at
# the 400.9M cin256-v2 ≈ 800 MB bf16). Below it, constants stay — measured
# ~5% faster on the CIFAR UNet (XLA folds constant weights into fusions);
# LSUN-256 (227 MB bf16) compiles fine as constants.
PARAMS_AS_ARGS_BYTES = 256 * 1024 * 1024


def params_nbytes(params) -> int:
    import jax as _jax

    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in _jax.tree.leaves(params))


def make_sampler(model, params, schedule: DiffusionSchedule, cfg: SamplerConfig,
                 class_labels: bool = False, mesh=None,
                 data_axis: str = "data", tensor_parallel: bool = False,
                 model_axis: str = "model",
                 params_as_args: Optional[bool] = None) -> Callable:
    """Returns sample(key, batch_size, hw, channels[, labels]) -> images in [0,1].

    ``params_as_args`` overrides the size-based jit policy. With args mode
    the returned fn accepts ``params_override=`` so ONE compiled program
    serves evolving params — callers that sample periodically during
    training (vis grids every checkpoint) MUST use this: closure-constant
    params are baked into the HLO, so every new param value is a full
    recompile (measured ~100 s of overhead per checkpoint save on v5e
    before cli/ddpm_train switched).

    With ``mesh``, the whole trajectory is one SPMD program: the initial
    noise (and labels) are sharded over the mesh's data axis, params are
    replicated, and the output comes back data-sharded — the reference's
    8-process sampling fan-out (ddpm_sample.py:55-77) as a single program.
    batch_size must divide by the data-axis size.

    ``tensor_parallel`` (2-D mesh with a ``model_axis``) additionally shards
    every conv/linear out-axis over the model axis via the model's
    ChannelGraph (parallel/tp.py) — for UNets whose weights/activations
    outgrow one chip (LSUN-256, the 400M LDM). GSPMD inserts the
    activation collectives.
    """
    if cfg.kind in ("plms", "dpm") and cfg.eta != 0.0:
        # match LatentDiffusion.make_cfg_sampler — silently running eta=0
        # would misreport the sampler the user asked for (plms.py:49);
        # DPM-Solver++ is likewise a deterministic ODE solver
        raise ValueError(f"{cfg.kind} requires eta == 0")
    ts = ddim_timesteps(cfg.num_inference_steps, schedule.num_train_timesteps,
                        cfg.skip_type, style=cfg.style)
    prev = ddim_prev_timesteps(ts, schedule.num_train_timesteps,
                               diffusers_stride=cfg.diffusers_stride)
    ts_j = jnp.asarray(ts, jnp.int32)
    prev_j = jnp.asarray(prev, jnp.int32)
    needs_noise = cfg.eta > 0.0 or cfg.kind == "ddpm"

    compute_dtype = jnp.dtype(cfg.dtype)

    if mesh is not None:
        n_shards = mesh.shape[data_axis]
        data_sh = NamedSharding(mesh, P(data_axis))
        if tensor_parallel:
            from ..parallel.tp import tp_param_shardings

            params = jax.device_put(
                params, tp_param_shardings(model.graph, params, mesh,
                                           axis=model_axis))
        else:
            params = jax.device_put(params, NamedSharding(mesh, P()))

    # For big models params enter as a jit ARGUMENT: baked-in closure
    # constants inflate the serialized program by the full param bytes, and
    # this platform's remote compile service rejects the 400M LDM outright
    # (HTTP 413). For small models they stay closure constants — measured
    # ~5% faster (95.1 vs 90.6 imgs/s on the CIFAR UNet: XLA folds the
    # constant weights into its fusions). docs/PERF.md.
    as_args = (params_nbytes(params) > PARAMS_AS_ARGS_BYTES
               if params_as_args is None else params_as_args)

    def _sample_body(params, key, batch_size: int, hw: int, channels: int,
                     labels=None):
        if mesh is not None:
            assert batch_size % n_shards == 0, (
                f"batch {batch_size} not divisible by data axis {n_shards}")
        key, init_key = jax.random.split(key)
        x = jax.random.normal(init_key, (batch_size, hw, hw, channels))
        if mesh is not None:
            x = jax.lax.with_sharding_constraint(x, data_sh)
            if labels is not None:
                labels = jax.lax.with_sharding_constraint(labels, data_sh)

        if cfg.kind in ("plms", "dpm"):
            def eps_fn(x, t):
                tb = jnp.full((batch_size,), t, jnp.int32)
                xm = x.astype(compute_dtype)
                return (model(params, xm, tb, labels) if labels is not None
                        else model(params, xm, tb))

            if cfg.kind == "plms":
                x = plms_sample(eps_fn, schedule, x, ts_j, prev_j,
                                clip_sample=cfg.clip_sample)
            else:
                from ..schedulers.dpm_solver import dpm_solver_sample

                x = dpm_solver_sample(eps_fn, schedule, x, ts_j, prev_j,
                                      clip_sample=cfg.clip_sample)
            return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)

        def step(carry, inp):
            x, key = carry
            t, tp = inp
            tb = jnp.full((batch_size,), t, jnp.int32)
            xm = x.astype(compute_dtype)
            eps = model(params, xm, tb, labels) if labels is not None else model(params, xm, tb)
            if needs_noise:
                key, nk = jax.random.split(key)
                z = jax.random.normal(nk, x.shape)
            else:
                z = None
            if cfg.kind == "ddim":
                x = ddim_step(schedule, x, eps, t, tp, eta=cfg.eta,
                              clip_sample=cfg.clip_sample, noise=z)
            else:
                x = ddpm_step(schedule, x, eps, t, tp, z)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, key), (ts_j, prev_j))
        # [-1,1] -> [0,1] like pipeline_ddim.py (image/2+0.5).clamp(0,1)
        return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)

    out_sh = data_sh if mesh is not None else None
    if as_args:
        jitted = jax.jit(_sample_body, static_argnums=(2, 3, 4),
                         out_shardings=out_sh)

        def sample(key, batch_size: int, hw: int, channels: int, labels=None,
                   params_override=None):
            p = params if params_override is None else params_override
            return jitted(p, key, batch_size, hw, channels, labels)
    else:
        jitted = jax.jit(functools.partial(_sample_body, params),
                         static_argnums=(1, 2, 3), out_shardings=out_sh)

        def sample(key, batch_size: int, hw: int, channels: int, labels=None):
            return jitted(key, batch_size, hw, channels, labels)

    sample.jitted = jitted  # tests/introspection: retrace-count assertions
    return sample


def to_uint8(images) -> np.ndarray:
    """[0,1] float NHWC -> uint8 numpy (reference: numpy round path).

    Pure host-side numpy: a jnp implementation would re-upload
    already-fetched batches to the device and contend with the sampler
    (np.round == jnp.round == round-half-even)."""
    arr = np.asarray(images, dtype=np.float32)
    return np.round(np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)


def save_image_grid(images, path: str, nrow: int = 8) -> None:
    """torchvision.utils.save_image equivalent (PIL, no torch)."""
    from PIL import Image

    arr = to_uint8(images)
    n, h, w, c = arr.shape
    ncol = nrow
    nr = (n + ncol - 1) // ncol
    pad = 2
    grid = np.full(((h + pad) * nr + pad, (w + pad) * ncol + pad, c), 255, np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0, x0 = pad + r * (h + pad), pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = arr[i]
    Image.fromarray(grid.squeeze()).save(path)


def save_images(images, outdir: str, start_index: int = 0) -> None:
    """PNG-encode a batch on a thread pool (zlib compression releases the
    GIL, so encoding parallelizes across host cores)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    os.makedirs(outdir, exist_ok=True)
    arr = to_uint8(images)

    def write(i):
        Image.fromarray(arr[i].squeeze()).save(
            os.path.join(outdir, f"{start_index + i:06d}.png"))

    with ThreadPoolExecutor(max_workers=min(16, os.cpu_count() or 1)) as ex:
        list(ex.map(write, range(len(arr))))
