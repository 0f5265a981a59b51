"""Post-pruning finetune: the data-parallel DDPM training step.

Reference semantics (ddpm_train.py:423-537 and
ddpm_exp/runners/diffusion.py:276-344), kept exactly:

* antithetic timestep sampling: t ~ U[0,T) for bsz//2+1, concat with
  T-1-t, truncate to bsz (ddpm_train.py:446-449);
* loss = sum-squared-error per image, mean over batch (ddpm_train.py:459 —
  NOT mean-MSE; the x3072 factor is part of the LR calibration);
* grad-norm clip 1.0 (ddpm_train.py:462), Adam, optional LR warmup;
* EMA pytree update each optimizer step (ddpm_train.py:467-469);
* gradient accumulation by micro-batch scan.

DDP becomes SPMD: the step is jitted with batch-sharded data and replicated
params over a 1-D 'data' mesh; XLA inserts the grad psum that NCCL/DDP did
in the reference (SURVEY.md §2.6).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..schedulers.ddpm import DiffusionSchedule
from .ema import ema_update


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 2e-4
    adam_beta1: float = 0.9  # ddpm_train.py defaults (:148-156)
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    ema_decay: float = 0.9999
    use_ema: bool = True
    lr_warmup_steps: int = 0
    num_train_steps: int = 100_000
    lr_schedule: str = "constant"  # 'constant' | 'cosine'
    optimizer: str = "adam"  # 'adam' | 'rmsprop' | 'sgd' (ddpm_exp functions/__init__.py:4-15)
    gradient_accumulation_steps: int = 1
    # 'no' | 'bf16': compute the model fwd/bwd in bfloat16 (params, optimizer
    # state, and the loss reduction stay f32 — the accelerate mixed_precision
    # equivalent, ddpm_train.py:199-209, done the TPU way: bf16 on the MXU).
    mixed_precision: str = "no"
    # Rematerialize the model forward during backprop (jax.checkpoint with
    # dots-saveable policy) — the reference's gradient_checkpointing flags
    # (unet_2d_blocks.py:961-982), the TPU way: trade FLOPs for HBM so the
    # 256x256 models fit larger batches.
    remat: bool = False


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: dict
    opt_state: object
    ema_params: Optional[dict]


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.lr_schedule == "constant":
        lr = optax.schedules.warmup_constant_schedule(
            0.0, cfg.learning_rate, cfg.lr_warmup_steps) if cfg.lr_warmup_steps \
            else cfg.learning_rate
    elif cfg.lr_schedule == "cosine":
        lr = optax.schedules.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.lr_warmup_steps, cfg.num_train_steps)
    else:
        raise ValueError(cfg.lr_schedule)
    tx = [optax.clip_by_global_norm(cfg.grad_clip)] if cfg.grad_clip else []
    if cfg.optimizer == "rmsprop":
        tx.append(optax.rmsprop(lr))
    elif cfg.optimizer == "sgd":
        tx.append(optax.sgd(lr))
    elif cfg.weight_decay:
        tx.append(optax.adamw(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                              eps=cfg.adam_eps, weight_decay=cfg.weight_decay))
    else:
        tx.append(optax.adam(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_eps))
    return optax.chain(*tx)


def init_train_state(params: dict, cfg: TrainConfig) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if cfg.use_ema else None,
    )


def antithetic_timesteps(key, batch_size: int, num_train_timesteps: int):
    """t ∪ (T-1-t) (ddpm_train.py:446-449 / diffusion.py:296-299)."""
    half = jax.random.randint(key, (batch_size // 2 + 1,), 0, num_train_timesteps)
    t = jnp.concatenate([half, num_train_timesteps - half - 1])[:batch_size]
    return t


def ddpm_loss(model, params, schedule: DiffusionSchedule, x0, noise, t,
              *, dropout_rng=None, teacher_eps=None, kd_weight: float = 0.7):
    """Sum-SE/batch-mean loss; optional distillation mix
    (0.7 teacher-match + 0.3 noise, ddpm_exp/functions/losses.py:17-31)."""
    noisy = schedule.add_noise(x0, noise, t)
    out = model(params, noisy, t, dropout_rng=dropout_rng)
    nl = ((out - noise).astype(jnp.float32) ** 2).sum(axis=(1, 2, 3)).mean()
    if teacher_eps is None:
        return nl
    kl = ((out - teacher_eps).astype(jnp.float32) ** 2).sum(axis=(1, 2, 3)).mean()
    return kd_weight * kl + (1.0 - kd_weight) * nl


def _build_step_fn(model, schedule: DiffusionSchedule, cfg: TrainConfig,
                   teacher: Optional[Tuple[object, dict]] = None):
    opt = make_optimizer(cfg)
    accum = cfg.gradient_accumulation_steps
    compute_dtype = jnp.bfloat16 if cfg.mixed_precision == "bf16" else None

    def model_apply(p, x, t, rng):
        return model(p, x, t, dropout_rng=rng)

    if cfg.remat:
        model_apply = jax.checkpoint(
            model_apply,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def loss_fn(params, x0, noise, t, dropout_rng):
        if compute_dtype is not None:
            # cast the model inputs; layers follow x.dtype, ddpm_loss upcasts
            # the error to f32 before reduction
            params_c = jax.tree.map(lambda a: a.astype(compute_dtype), params)
            x0_c = x0.astype(compute_dtype)
            noise_c = noise.astype(compute_dtype)
        else:
            params_c, x0_c, noise_c = params, x0, noise
        noisy = schedule.add_noise(x0_c, noise_c, t)
        out = model_apply(params_c, noisy, t, dropout_rng)
        nl = ((out - noise_c).astype(jnp.float32) ** 2).sum(axis=(1, 2, 3)).mean()
        if teacher is None:
            return nl
        tm, tp = teacher
        teacher_eps = tm(tp, noisy, t)
        kl = ((out - teacher_eps).astype(jnp.float32) ** 2).sum(axis=(1, 2, 3)).mean()
        return 0.7 * kl + 0.3 * nl

    def step_fn(state: TrainState, batch: jnp.ndarray, key) -> Tuple[TrainState, dict]:
        nkey, tkey, dkey = jax.random.split(key, 3)
        bsz = batch.shape[0]
        noise = jax.random.normal(nkey, batch.shape, batch.dtype)
        t = antithetic_timesteps(tkey, bsz, schedule.num_train_timesteps)
        if accum > 1:
            mb = bsz // accum

            def micro(g_acc, i):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * mb, mb)
                l, g = jax.value_and_grad(loss_fn)(
                    state.params, sl(batch), sl(noise), sl(t),
                    jax.random.fold_in(dkey, i))
                return jax.tree.map(jnp.add, g_acc, g), l

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            grads, losses = jax.lax.scan(micro, g0, jnp.arange(accum))
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = losses.mean()
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, noise, t, dkey)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, params, cfg.ema_decay)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(state.step + 1, params, opt_state, ema),
            {"loss": loss, "grad_norm": gnorm},
        )

    return step_fn


def make_train_step(model, schedule: DiffusionSchedule, cfg: TrainConfig,
                    mesh=None, teacher: Optional[Tuple[object, dict]] = None):
    """Jitted (state, batch, key) -> (state, metrics); batch NHWC in [-1,1].

    With ``mesh``, the returned step is jitted with batch sharded on the
    'data' axis and state replicated — the DDP equivalent. ``teacher`` is an
    optional (model, params) for KD finetuning (finetune.py --kd).
    """
    step_fn = _build_step_fn(model, schedule, cfg, teacher)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_chunked_train_step(model, schedule: DiffusionSchedule, cfg: TrainConfig,
                            *, chunk: int, mesh=None, teacher=None):
    """K optimizer steps per dispatch: (state, batches[K,B,...], key) -> ...

    The per-call host->device round trip dominates wall clock when the chip
    sits behind a network tunnel (observed ~1-5 s/step vs ~100 ms of compute).
    Scanning `chunk` full train steps inside one jitted program amortizes the
    dispatch to 1/chunk. Semantically identical to calling the plain step K
    times with jax.random.fold_in(key, i).
    """
    inner = _build_step_fn(model, schedule, cfg, teacher)

    def chunk_fn(state: TrainState, batches: jnp.ndarray, key):
        def body(state, inp):
            i, batch = inp
            s2, metrics = inner(state, batch, jax.random.fold_in(key, i))
            return s2, metrics

        state, metrics = jax.lax.scan(
            body, state, (jnp.arange(batches.shape[0]), batches))
        return state, jax.tree.map(lambda m: m[-1], metrics)

    if mesh is None:
        return jax.jit(chunk_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, "data"))
    return jax.jit(chunk_fn, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl), donate_argnums=(0,))


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state, s.ema_params), None),
    lambda _, c: TrainState(*c),
)
