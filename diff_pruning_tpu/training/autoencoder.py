"""First-stage autoencoder (VQ / KL) GAN training — TPU-native rebuild of the
reference's `ldm_exp/ldm/modules/losses/{contperceptual,vqperceptual}.py`
(LPIPSWithDiscriminator / VQLPIPSWithDiscriminator) plus the two-optimizer
Lightning loop of `ldm_exp/ldm/models/autoencoder.py:142-162,354-372`.

Design (TPU-first, not a port of the Lightning mechanics):
- One jitted step performs BOTH optimizer passes. Lightning calls
  training_step once per optimizer per batch, re-running the forward with
  the just-updated generator before the discriminator pass — reproduced
  exactly (the discriminator pass recomputes reconstructions with the
  updated generator params), but fused into a single dispatch so the
  seconds-scale host<->device latency of this platform is paid once.
- The adaptive discriminator weight (contperceptual.py:32-43: ratio of
  last-layer gradient norms of the NLL vs the generator-GAN loss) uses a
  nested `jax.grad` over ONLY decoder.conv_out params — the exact
  `torch.autograd.grad(loss, last_layer)` semantics — rather than a second
  full backward. The decoder trunk is evaluated once and shared.
- Both optimizers are Adam(betas=(0.5, 0.9)) like autoencoder.py:202-209;
  the loss module's `logvar` parameter is kept as a constant because the
  reference never adds it to either optimizer (autoencoder.py:386-395) —
  it is frozen at `logvar_init` there too.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..eval.lpips import lpips as lpips_distance
from ..models.discriminator import NLayerDiscriminator

sg = jax.lax.stop_gradient


# ---------------------------------------------------------------------------
# losses (vqperceptual.py:11-40 + taming hinge/vanilla)


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def hinge_d_loss_with_exemplar_weights(logits_real, logits_fake, weights):
    """vqperceptual.py:11-18 (per-example weighted hinge)."""
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real), axis=(1, 2, 3))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake), axis=(1, 2, 3))
    wsum = jnp.sum(weights)
    return 0.5 * (jnp.sum(weights * loss_real) / wsum
                  + jnp.sum(weights * loss_fake) / wsum)


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    """vqperceptual.py:20-23 — jit-friendly (global_step may be traced)."""
    return jnp.where(global_step < threshold, value, weight)


def measure_perplexity(predicted_indices, n_embed):
    """vqperceptual.py:26-33: codebook usage perplexity + #used clusters."""
    enc = jax.nn.one_hot(predicted_indices.reshape(-1), n_embed)
    avg = jnp.mean(enc, axis=0)
    perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))
    cluster_use = jnp.sum(avg > 0)
    return perplexity, cluster_use


# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GANLossConfig:
    """Union of LPIPSWithDiscriminator / VQLPIPSWithDiscriminator knobs."""

    disc_start: int = 0            # global step when disc_factor activates
    kl_weight: float = 1.0         # KL variant
    codebook_weight: float = 1.0   # VQ variant
    pixelloss_weight: float = 1.0
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_loss: str = "hinge"       # hinge | vanilla
    pixel_loss: str = "l1"         # VQ variant: l1 | l2 (KL is always l1)
    logvar_init: float = 0.0       # KL variant (frozen — see module doc)
    vq_beta: float = 0.25          # commitment weight (autoencoder.py:39)


class AETrainState(NamedTuple):
    gen_params: dict
    disc_params: dict
    gen_opt: optax.OptState
    disc_opt: optax.OptState
    step: jnp.ndarray


def make_ae_optimizers(lr: float, lr_g_factor: float = 1.0):
    """autoencoder.py:197-209: Adam(betas=(0.5, 0.9)) for both."""
    gen_tx = optax.adam(lr * lr_g_factor, b1=0.5, b2=0.9)
    disc_tx = optax.adam(lr, b1=0.5, b2=0.9)
    return gen_tx, disc_tx


def init_ae_train_state(gen_params, disc_params, gen_tx, disc_tx) -> AETrainState:
    return AETrainState(gen_params, disc_params,
                        gen_tx.init(gen_params), disc_tx.init(disc_params),
                        jnp.zeros((), jnp.int32))


def _pixel_loss(kind, x, y):
    return jnp.abs(x - y) if kind == "l1" else jnp.square(x - y)


def make_autoencoder_train_step(model, cfg: GANLossConfig, lpips_params,
                                disc: NLayerDiscriminator,
                                gen_tx, disc_tx, *,
                                mixed_precision: str = "no",
                                mesh=None, data_axis: str = "data",
                                jit: bool = True):
    """Build the fused two-optimizer train step for a VQModel or
    AutoencoderKL (`model` from models/vae.py — dispatched on
    `model.cfg.num_vq_embeddings`).

    Returns step(state, images, key) -> (state, metrics); images NHWC in
    [-1, 1]. ``mixed_precision='bf16'`` runs the codec/discriminator/LPIPS
    compute in bfloat16 with f32 master params and f32 loss accumulation
    (same policy as the finetune step). With ``mesh``, the batch is sharded
    over the mesh's data axis and state replicated — the SPMD equivalent of
    the reference's Lightning-DDP autoencoder training (XLA inserts the
    gradient psum for BOTH optimizers).
    """
    is_vq = bool(model.cfg.num_vq_embeddings)
    d_loss_fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    use_lpips = cfg.perceptual_weight > 0
    logvar = jnp.asarray(cfg.logvar_init, jnp.float32)
    compute = jnp.bfloat16 if mixed_precision == "bf16" else jnp.float32

    def _cast(tree):
        if compute == jnp.float32:
            return tree
        return jax.tree.map(lambda a: a.astype(compute), tree)

    def reconstruct(gp, x, key):
        """forward (autoencoder.py:117-122 / :335-342): returns
        (trunk features h, aux) where recon = conv_out(h)."""
        gp = _cast(gp)
        x = x.astype(compute)
        if is_vq:
            z = model.encode(gp, x)
            zq, qloss, idx = model.quantize_train(gp, z, beta=cfg.vq_beta)
            aux = {"qloss": qloss, "idx": idx}
            lat = zq
        else:
            moments = model.encode_moments(gp, x)
            mean, lv = jnp.split(moments, 2, axis=-1)
            lv = jnp.clip(lv, -30.0, 20.0)
            z = mean + jnp.exp(0.5 * lv) * jax.random.normal(key, mean.shape,
                                                             mean.dtype)
            # DiagonalGaussianDistribution.kl() vs N(0,1), summed per image
            # (f32 accumulation under bf16 compute)
            m32, lv32 = mean.astype(jnp.float32), lv.astype(jnp.float32)
            kl = 0.5 * jnp.sum(jnp.square(m32) + jnp.exp(lv32) - 1.0 - lv32,
                               axis=(1, 2, 3))
            aux = {"kl": jnp.sum(kl) / x.shape[0]}
            lat = z
        zpq = model.post_quant_conv(gp["post_quant_conv"], lat)
        h = model.decoder.features(gp["decoder"], zpq)
        return h, aux

    def conv_out(w, h):
        return model.decoder.conv_out(w, h)

    def nll_of(x, recon):
        """scalar NLL + the elementwise rec_loss (for logging). The LPIPS
        trunk runs in the compute dtype; pixel terms and all reductions
        accumulate in f32."""
        x = x.astype(compute)
        p_loss = (lpips_distance(lpips_params, x, recon).astype(jnp.float32)
                  if use_lpips else 0.0)
        x32, r32 = x.astype(jnp.float32), recon.astype(jnp.float32)
        if is_vq:
            # NOTE pixelloss_weight is carried in the config but never applied
            # in the reference forward either (vqperceptual.py:103 uses the
            # raw pixel loss; self.pixel_weight is write-only) — kept faithful.
            rec = _pixel_loss(cfg.pixel_loss, x32, r32)
            if use_lpips:
                rec = rec + cfg.perceptual_weight * p_loss[:, None, None, None]
            return jnp.mean(rec), rec
        rec = jnp.abs(x32 - r32)
        if use_lpips:
            rec = rec + cfg.perceptual_weight * p_loss[:, None, None, None]
        nll = rec / jnp.exp(logvar) + logvar
        return jnp.sum(nll) / x.shape[0], rec

    def g_of(dp, recon):
        return -jnp.mean(disc(_cast(dp), recon).astype(jnp.float32))

    def adaptive_weight(gp, dp, x, h):
        """contperceptual.py:32-43 — grads wrt decoder.conv_out params only
        (the reference's last_layer is conv_out.weight)."""
        h, x, dp = sg(h), sg(x), sg(dp)
        w_last = sg(gp["decoder"]["conv_out"])
        nll_g = jax.grad(lambda w: nll_of(x, conv_out(w, h))[0])(w_last)
        g_g = jax.grad(lambda w: g_of(dp, conv_out(w, h)))(w_last)
        num = optax.global_norm(nll_g["kernel"])
        den = optax.global_norm(g_g["kernel"]) + 1e-4
        return sg(jnp.clip(num / den, 0.0, 1e4) * cfg.disc_weight)

    def gen_loss_fn(gp, dp, x, key, step):
        h, aux = reconstruct(gp, x, key)
        recon = conv_out(gp["decoder"]["conv_out"], h)
        nll, rec = nll_of(x, recon)
        g_loss = g_of(dp, recon)
        d_weight = (adaptive_weight(gp, dp, x, h) if cfg.disc_factor > 0
                    else jnp.zeros(()))
        disc_factor = adopt_weight(cfg.disc_factor, step,
                                   threshold=cfg.disc_start)
        if is_vq:
            loss = nll + d_weight * disc_factor * g_loss \
                + cfg.codebook_weight * aux["qloss"]
            perp, used = measure_perplexity(aux["idx"],
                                            model.cfg.num_vq_embeddings)
            extra = {"quant_loss": aux["qloss"], "perplexity": perp,
                     "cluster_usage": used}
        else:
            loss = nll + cfg.kl_weight * aux["kl"] \
                + d_weight * disc_factor * g_loss
            extra = {"kl_loss": aux["kl"], "logvar": logvar}
        metrics = {"total_loss": loss, "nll_loss": nll,
                   "rec_loss": jnp.mean(rec), "d_weight": d_weight,
                   "disc_factor": disc_factor, "g_loss": g_loss, **extra}
        return loss, metrics

    def disc_loss_fn(dp, gp, x, key, step):
        # reconstructions recomputed with the (already updated) generator,
        # exactly like Lightning's second training_step call per batch —
        # including a fresh posterior sample (fold_in), as a second torch
        # forward would draw
        h, _ = reconstruct(sg(gp), x, jax.random.fold_in(key, 1))
        recon = sg(conv_out(_cast(sg(gp["decoder"]["conv_out"])), h))
        dpc = _cast(dp)
        logits_real = disc(dpc, sg(x.astype(compute))).astype(jnp.float32)
        logits_fake = disc(dpc, recon).astype(jnp.float32)
        disc_factor = adopt_weight(cfg.disc_factor, step,
                                   threshold=cfg.disc_start)
        d_loss = disc_factor * d_loss_fn(logits_real, logits_fake)
        return d_loss, {"disc_loss": d_loss,
                        "logits_real": jnp.mean(logits_real),
                        "logits_fake": jnp.mean(logits_fake)}

    def step_fn(state: AETrainState, x, key) -> Tuple[AETrainState, dict]:
        (gl, gm), ggrads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params, state.disc_params, x, key, state.step)
        gupd, gen_opt = gen_tx.update(ggrads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gupd)

        (dl, dm), dgrads = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            state.disc_params, gen_params, x, key, state.step)
        dupd, disc_opt = disc_tx.update(dgrads, state.disc_opt,
                                        state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, dupd)

        new_state = AETrainState(gen_params, disc_params, gen_opt, disc_opt,
                                 state.step + 1)
        return new_state, {**gm, **dm}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(data_axis))
        return jax.jit(step_fn, in_shardings=(repl, data, repl),
                       out_shardings=(repl, repl), donate_argnums=0)
    return jax.jit(step_fn, donate_argnums=0) if jit else step_fn
