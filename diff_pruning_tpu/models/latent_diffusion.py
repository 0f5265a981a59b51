"""LatentDiffusion: the CompVis LDM wrapper (class-conditional, CFG).

TPU-native equivalent of the exercised slice of
ldm_exp/ldm/models/diffusion/ddpm.py LatentDiffusion (the cin256-v2
ImageNet model): sqrt-spaced linear betas (linear_start=0.0015,
linear_end=0.0195 — make_beta_schedule 'linear' is linspace of sqrt betas),
ClassEmbedder conditioning (ldm/modules/encoders/modules.py: Embedding
(n_classes+1, embed_dim), uncond class = n_classes), ``get_loss_at_t``
(ddpm.py:881-889: p_losses at caller-chosen t = per-sample mean-MSE in
latent space, batch-averaged), and classifier-free-guidance DDIM sampling
(ddim.py:164-203: eps = e_uc + scale (e_c - e_uc)).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..schedulers.ddim import ddim_prev_timesteps, ddim_step
from ..schedulers.ddpm import DiffusionSchedule
from .unet_cond import UNetCond, UNetCondConfig


def ldm_schedule(num_train_timesteps: int = 1000,
                 linear_start: float = 0.0015,
                 linear_end: float = 0.0195) -> DiffusionSchedule:
    """CompVis make_beta_schedule('linear'): sqrt-spaced (util.py)."""
    return DiffusionSchedule.create(
        num_train_timesteps=num_train_timesteps,
        beta_schedule="scaled_linear",
        beta_start=linear_start, beta_end=linear_end)


def compvis_ddim_timesteps(num_steps: int, num_train_timesteps: int = 1000) -> np.ndarray:
    """make_ddim_timesteps('uniform'): arange(0, T, T//S) + 1, descending."""
    c = num_train_timesteps // num_steps
    seq = np.arange(0, num_train_timesteps, c) + 1
    return seq[::-1].astype(np.int64).copy()


@dataclasses.dataclass
class ClassEmbedder:
    """ldm/modules/encoders/modules.py ClassEmbedder: Embedding ->
    (B, 1, embed_dim) context; class n_classes-1 (1000) is the CFG uncond."""

    n_classes: int
    embed_dim: int

    def init(self, key):
        return {"embedding": {"weight": jax.random.normal(
            key, (self.n_classes, self.embed_dim)) * 0.02}}

    def __call__(self, p, labels):
        return p["embedding"]["weight"][labels][:, None, :]


@dataclasses.dataclass
class SpatialRescaler:
    """ldm/modules/encoders/modules.py:106-135: n_stages of
    interpolate(scale_factor=multiplier) + optional 1x1 channel mapper.
    NHWC; methods map to jax.image.resize kernels."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    in_channels: int = 3
    out_channels: Optional[int] = None
    bias: bool = False

    _METHODS = {"nearest": "nearest", "linear": "linear",
                "bilinear": "linear", "trilinear": "linear",
                "bicubic": "cubic", "area": "linear"}

    def __post_init__(self):
        assert self.n_stages >= 0
        assert self.method in self._METHODS

    def init(self, key):
        if self.out_channels is None:
            return {}
        p = {"channel_mapper": {"kernel": 0.02 * jax.random.normal(
            key, (1, 1, self.in_channels, self.out_channels))}}
        if self.bias:
            p["channel_mapper"]["bias"] = jnp.zeros((self.out_channels,))
        return p

    def __call__(self, p, x):
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            oh, ow = int(h * self.multiplier), int(w * self.multiplier)
            if self.method == "nearest":
                # torch F.interpolate nearest: src = floor(dst * in/out)
                # (jax.image.resize 'nearest' uses half-pixel centers)
                iy = (np.arange(oh) * h) // oh
                ix = (np.arange(ow) * w) // ow
                x = x[:, iy][:, :, ix]
            else:
                x = jax.image.resize(x, (b, oh, ow, c),
                                     method=self._METHODS[self.method])
        if self.out_channels is not None:
            x = jax.lax.conv_general_dilated(
                x, p["channel_mapper"]["kernel"].astype(x.dtype), (1, 1),
                [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.bias:
                x = x + p["channel_mapper"]["bias"].astype(x.dtype)
        return x

    def encode(self, p, x):
        return self(p, x)


class IdentityCondStage:
    """`cond_stage_config: torch.nn.Identity` (the RDM yaml,
    configs/retrieval-augmented-diffusion/768x768.yaml): conditioning is
    precomputed CLIP embeddings handed straight to cross-attention —
    `labels` arguments become (B, N, context_dim) context arrays."""

    def init(self, key):
        del key
        return {}

    def __call__(self, p, cond):
        return cond


class LatentDiffusion:
    """Bundles (unet, class embedder, first stage) + schedule; the pruning
    target is unet only (model.model.diffusion_model in the reference)."""

    def __init__(self, unet_cfg: UNetCondConfig, *, n_classes: int = 1001,
                 first_stage=None, scale_factor: float = 1.0,
                 num_train_timesteps: int = 1000,
                 linear_start: float = 0.0015, linear_end: float = 0.0195,
                 cond_stage=None):
        """cond_stage: any object with .init(key) and __call__(params, cond)
        -> (B, N, context_dim); defaults to the ClassEmbedder (cin256-v2).
        Pass models/text_encoder.BERTEmbedder for the txt2img-1p4B family —
        then ``labels`` arguments are (B, 77) token-id arrays."""
        self.unet = UNetCond(unet_cfg)
        self.cond_stage = cond_stage or ClassEmbedder(n_classes, unet_cfg.context_dim)
        self.n_classes = n_classes
        self.uncond_class = n_classes - 1
        self.first_stage = first_stage  # VQModel/AutoencoderKL or None
        self.scale_factor = scale_factor
        self.linear_start, self.linear_end = linear_start, linear_end
        self.schedule = ldm_schedule(num_train_timesteps, linear_start, linear_end)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {"unet": self.unet.init(k1), "cond_stage": self.cond_stage.init(k2)}
        if self.first_stage is not None:
            p["first_stage"] = self.first_stage.init(jax.random.fold_in(key, 7))
        return p

    def get_learned_conditioning(self, params, labels):
        return self.cond_stage(params["cond_stage"], labels)

    def apply_unet(self, unet_params, x, t, context):
        return self.unet(unet_params, x, t, context=context)

    def get_loss_at_t(self, params, x0_latents, labels, t, noise):
        """p_losses at fixed t (ddpm.py:881-889): mean MSE over everything."""
        ctx = self.get_learned_conditioning(params, labels)
        noisy = self.schedule.add_noise(x0_latents, noise, t)
        eps = self.apply_unet(params["unet"], noisy, t, ctx)
        return jnp.mean((eps - noise).astype(jnp.float32) ** 2)

    def make_cfg_sampler(self, params, *, ddim_steps: int = 20,
                         guidance_scale: float = 3.0, eta: float = 0.0,
                         latent_hw: int = 64, latent_ch: int = 3,
                         mesh=None, data_axis: str = "data",
                         tensor_parallel: bool = False,
                         model_axis: str = "model",
                         method: str = "ddim", uncond_input=None):
        """Jitted class-conditional CFG sampler over latents.

        Batches cond+uncond through one UNet call (x_in = cat([x]*2),
        ldm/models/diffusion/ddim.py:188-192). With ``mesh``, the batch is
        sharded over the mesh's data axis (params replicated) — the SPMD
        equivalent of sample_for_FID.py's per-process fan-out.
        ``tensor_parallel`` (2-D mesh with a ``model_axis``) additionally
        shards the UNet's conv/linear out-axes over the model axis via its
        ChannelGraph (parallel/tp.py) — for the 400M-class cross-attention
        models whose weights outgrow one chip; the cond/first stages stay
        replicated. ``method='plms'`` selects the PLMS multistep sampler
        (ldm/models/diffusion/plms.py; requires eta == 0); ``method='dpm'``
        the DPM-Solver++(2M) solver (beyond reference,
        schedulers/dpm_solver.py; also deterministic).
        """
        if method in ("plms", "dpm") and eta != 0.0:
            raise ValueError(f"{method} requires eta == 0")
        # int -> square; (h, w) supported (the reference samplers take an
        # arbitrary shape, e.g. knn2img's H/W flags)
        lat_h, lat_w = ((latent_hw, latent_hw) if isinstance(latent_hw, int)
                        else tuple(latent_hw))
        ts = compvis_ddim_timesteps(ddim_steps, self.schedule.num_train_timesteps)
        prev = ddim_prev_timesteps(ts)
        ts_j, prev_j = jnp.asarray(ts, jnp.int32), jnp.asarray(prev, jnp.int32)
        uc = self.uncond_class
        uncond = uncond_input  # e.g. tokenized "" rows for a text cond stage

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_shards = mesh.shape[data_axis]
            data_sh = NamedSharding(mesh, P(data_axis))
            if tensor_parallel:
                from ..parallel.tp import tp_param_shardings

                repl = NamedSharding(mesh, P())
                sh = {k: (tp_param_shardings(self.unet.graph, v, mesh,
                                             axis=model_axis)
                          if k == "unet" else
                          jax.tree.map(lambda _: repl, v))
                      for k, v in params.items()}
                params = jax.device_put(params, sh)
            else:
                params = jax.device_put(params, NamedSharding(mesh, P()))

        # big models pass params as a jit ARGUMENT (closure constants
        # inflate the serialized program by the full param bytes — the
        # remote compile service rejects the 400M LDM outright); small
        # models keep constants (~5% faster) — ddim_sampler.py's policy
        from ..sampling.ddim_sampler import PARAMS_AS_ARGS_BYTES, params_nbytes

        as_args = params_nbytes(params) > PARAMS_AS_ARGS_BYTES

        def _sample_body(params, key, labels, batch_size: int):
            if mesh is not None:
                assert batch_size % n_shards == 0, (
                    f"batch {batch_size} not divisible by data axis {n_shards}")
                labels = jax.lax.with_sharding_constraint(labels, data_sh)
            ctx_c = self.get_learned_conditioning(params, labels)
            if uncond is not None:
                u = jnp.asarray(uncond)
                if u.shape[0] == 1:
                    u = jnp.broadcast_to(u, (batch_size,) + u.shape[1:])
                ctx_u = self.get_learned_conditioning(params, u)
            else:
                ctx_u = self.get_learned_conditioning(
                    params, jnp.full((batch_size,), uc, jnp.int32))
            ctx = jnp.concatenate([ctx_u, ctx_c], axis=0)
            key, ik = jax.random.split(key)
            x = jax.random.normal(ik, (batch_size, lat_h, lat_w, latent_ch))
            if mesh is not None:
                x = jax.lax.with_sharding_constraint(x, data_sh)

            if method in ("plms", "dpm"):
                def eps_fn(x, t):
                    tb = jnp.full((2 * batch_size,), t, jnp.int32)
                    x2 = jnp.concatenate([x, x], axis=0)
                    eps2 = self.apply_unet(params["unet"], x2, tb, ctx)
                    e_u, e_c = jnp.split(eps2, 2, axis=0)
                    return e_u + guidance_scale * (e_c - e_u)

                if method == "plms":
                    from ..schedulers.plms import plms_sample

                    return plms_sample(eps_fn, self.schedule, x, ts_j, prev_j,
                                       clip_sample=False)
                from ..schedulers.dpm_solver import dpm_solver_sample

                return dpm_solver_sample(eps_fn, self.schedule, x, ts_j,
                                         prev_j, clip_sample=False)

            def step(carry, inp):
                x, key = carry
                t, tp = inp
                tb = jnp.full((2 * batch_size,), t, jnp.int32)
                x2 = jnp.concatenate([x, x], axis=0)
                eps2 = self.apply_unet(params["unet"], x2, tb, ctx)
                e_u, e_c = jnp.split(eps2, 2, axis=0)
                eps = e_u + guidance_scale * (e_c - e_u)
                noise = None
                if eta > 0:
                    key, nk = jax.random.split(key)
                    noise = jax.random.normal(nk, x.shape)
                x = ddim_step(self.schedule, x, eps, t, tp, eta=eta,
                              clip_sample=False, noise=noise)
                return (x, key), None

            (x, _), _ = jax.lax.scan(step, (x, key), (ts_j, prev_j))
            return x

        out_sh = data_sh if mesh is not None else None
        if as_args:
            jitted = jax.jit(_sample_body, static_argnums=(3,),
                             out_shardings=out_sh)

            def sample_latents(key, labels, batch_size: int):
                return jitted(params, key, labels, batch_size)
        else:
            jitted = jax.jit(functools.partial(_sample_body, params),
                             static_argnums=(2,), out_shardings=out_sh)

            def sample_latents(key, labels, batch_size: int):
                return jitted(key, labels, batch_size)

        return sample_latents

    def decode_first_stage(self, params, latents):
        if self.first_stage is None:
            raise ValueError("no first stage attached")
        z = latents / self.scale_factor
        img = self.first_stage.decode(params["first_stage"], z)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)


def make_concat_sampler(unet, unet_params, schedule: DiffusionSchedule, *,
                        ddim_steps: int = 50, eta: float = 0.0,
                        latent_ch: int = 3, method: str = "ddim"):
    """Concat-mode conditional DDIM/PLMS sampler (`concat_mode: true`
    LatentDiffusion — the inpainting_big model): at every step the fixed
    conditioning planes ride along the channel axis,
    eps = unet(cat([x, cond], C), t) (ddpm.py apply_model's c_concat path;
    driven by scripts/inpaint.py:76-86).

    Returns jitted sample(key, cond) -> latents; cond is (B, h, w, Cc) with
    unet.cfg.in_channels == latent_ch + Cc.
    """
    ts = compvis_ddim_timesteps(ddim_steps, schedule.num_train_timesteps)
    prev = ddim_prev_timesteps(ts)
    ts_j, prev_j = jnp.asarray(ts, jnp.int32), jnp.asarray(prev, jnp.int32)

    from ..sampling.ddim_sampler import PARAMS_AS_ARGS_BYTES, params_nbytes

    as_args = params_nbytes(unet_params) > PARAMS_AS_ARGS_BYTES

    def _sample_body(unet_params, key, cond):
        b, h, w = cond.shape[:3]
        key, ik = jax.random.split(key)
        x = jax.random.normal(ik, (b, h, w, latent_ch), cond.dtype)

        def eps_fn(x, t):
            tb = jnp.full((b,), t, jnp.int32)
            return unet(unet_params, jnp.concatenate([x, cond], axis=-1), tb)

        if method == "plms":
            from ..schedulers.plms import plms_sample

            return plms_sample(eps_fn, schedule, x, ts_j, prev_j,
                               clip_sample=False)
        if method == "dpm":
            from ..schedulers.dpm_solver import dpm_solver_sample

            return dpm_solver_sample(eps_fn, schedule, x, ts_j, prev_j,
                                     clip_sample=False)

        def step(carry, inp):
            x, key = carry
            t, tp = inp
            eps = eps_fn(x, t)
            noise = None
            if eta > 0:
                key, nk = jax.random.split(key)
                noise = jax.random.normal(nk, x.shape)
            x = ddim_step(schedule, x, eps, t, tp, eta=eta,
                          clip_sample=False, noise=noise)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, key), (ts_j, prev_j))
        return x

    if as_args:
        jitted = jax.jit(_sample_body)

        def sample(key, cond):
            return jitted(unet_params, key, cond)
    else:
        jitted = jax.jit(functools.partial(_sample_body, unet_params))

        def sample(key, cond):
            return jitted(key, cond)

    return sample
