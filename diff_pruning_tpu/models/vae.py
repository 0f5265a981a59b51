"""First-stage codecs: VQModel / AutoencoderKL (NHWC JAX).

Port of the exercised slice of diffusers vae.py / vq_model.py /
autoencoder_kl.py (reference: diffusers/models/vae.py Encoder:38 /
Decoder:151 / VectorQuantizer:270 / DiagonalGaussianDistribution:384) — the
latent codecs for the LDM pruning/sampling paths (ldm_prune.py,
pipeline_latent_diffusion_uncond.py:93-101). Channel graph registered like
every other model (the reference never prunes the VAE; having the graph
makes it possible anyway).

Resnet blocks here are the temb-free variant of the UNet ResnetBlock
(temb_channels=None); mid blocks carry optional single-head attention.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..pruning.graph import ChannelGraph, ChannelVar
from .layers import Conv2D, GroupNorm, Scope, SelfAttention2D, downsample_pad, silu, upsample_nearest_2x


@dataclasses.dataclass
class AutoencoderConfig:
    """diffusers VQModel / AutoencoderKL config subset."""

    in_channels: int = 3
    out_channels: int = 3
    down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",)
    up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",)
    block_out_channels: Tuple[int, ...] = (64,)
    layers_per_block: int = 1
    act_fn: str = "silu"
    latent_channels: int = 3
    norm_num_groups: int = 32
    sample_size: int = 32
    # VQ-specific
    num_vq_embeddings: Optional[int] = None  # set => VQModel
    vq_embed_dim: Optional[int] = None
    scaling_factor: float = 0.18215  # KL latent scaling (SD convention)
    mid_block_attention: bool = True
    # CompVis ddconfig attn_resolutions (ldm model.py Encoder:490,534 /
    # Decoder:613,648): spatial self-attention after every resnet at these
    # resolutions. `sample_size` is the training resolution the levels halve
    # from. Empty (the diffusers VAE case) => mid-block attention only.
    attn_resolutions: Tuple[int, ...] = ()
    channel_sizes: Dict[str, int] = dataclasses.field(default_factory=dict)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["_class_name"] = "VQModel" if self.num_vq_embeddings else "AutoencoderKL"
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "AutoencoderConfig":
        d = json.loads(text)
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in fields}
        for key in ("down_block_types", "up_block_types", "block_out_channels",
                    "attn_resolutions"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)

    def with_channel_sizes(self, sizes: Dict[str, int]) -> "AutoencoderConfig":
        return dataclasses.replace(self, channel_sizes=dict(sizes))


class _VaeResnet:
    """ResnetBlock2D with temb_channels=None (vae blocks)."""

    def __init__(self, scope: Scope, g: ChannelGraph, cfg, cin: ChannelVar,
                 default_out: int, default_in: int):
        cs = cfg.channel_sizes
        self.has_shortcut = default_in != default_out
        if self.has_shortcut:
            self.out = g.var(scope.path + "/out",
                             cs.get(scope.path + "/out", default_out))
        else:
            self.out = cin
        self.norm1 = GroupNorm(scope("norm1"), cin, cfg.norm_num_groups, 1e-6)
        self.conv1 = Conv2D(scope("conv1"), cin, self.out, 3, 1, 1)
        self.norm2 = GroupNorm(scope("norm2"), self.out, cfg.norm_num_groups, 1e-6)
        self.conv2 = Conv2D(scope("conv2"), self.out, self.out, 3, 1, 1)
        if self.has_shortcut:
            self.conv_shortcut = Conv2D(scope("conv_shortcut"), cin, self.out, 1, 1, 0)

    def init(self, key):
        ks = jax.random.split(key, 5)
        p = {"norm1": self.norm1.init(ks[0]), "conv1": self.conv1.init(ks[1]),
             "norm2": self.norm2.init(ks[2]), "conv2": self.conv2.init(ks[3])}
        if self.has_shortcut:
            p["conv_shortcut"] = self.conv_shortcut.init(ks[4])
        return p

    def __call__(self, p, x):
        h = self.conv1(p["conv1"], silu(self.norm1(p["norm1"], x)))
        h = self.conv2(p["conv2"], silu(self.norm2(p["norm2"], h)))
        sc = self.conv_shortcut(p["conv_shortcut"], x) if self.has_shortcut else x
        return h + sc


class Encoder:
    """vae.py Encoder:38-149 (DownEncoderBlock2D chain + attn mid block)."""

    def __init__(self, cfg: AutoencoderConfig, g: ChannelGraph, root: Scope,
                 double_z: bool):
        cs = cfg.channel_sizes
        scope = root
        self.cfg = cfg
        v_in = g.var(root.path + "/in" if root.path else "enc_in",
                     cfg.in_channels, prunable=False)
        z_ch = 2 * cfg.latent_channels if double_z else cfg.latent_channels
        self.v_z = g.var(scope.path + "/z", z_ch, prunable=False)

        def mkvar(name, default):
            return g.var(name, cs.get(name, default))

        v0 = mkvar(scope.path + "/conv_in/out", cfg.block_out_channels[0])
        self.conv_in = Conv2D(scope("conv_in"), v_in, v0, 3, 1, 1)
        cur, cur_d = v0, cfg.block_out_channels[0]
        self.down_blocks = []
        curr_res = cfg.sample_size
        for i in range(len(cfg.block_out_channels)):
            out_d = cfg.block_out_channels[i]
            bscope = scope(f"down_blocks/{i}")
            resnets, attns = [], []
            for j in range(cfg.layers_per_block):
                r = _VaeResnet(bscope(f"resnets/{j}"), g, cfg, cur, out_d, cur_d)
                resnets.append(r)
                cur, cur_d = r.out, out_d
                if curr_res in cfg.attn_resolutions:
                    inner = mkvar(f"{bscope.path}/attentions/{j}/inner", out_d)
                    attns.append(SelfAttention2D(
                        bscope(f"attentions/{j}"), cur, inner, heads=1,
                        norm_num_groups=cfg.norm_num_groups, eps=1e-6))
            ds = None
            if i < len(cfg.block_out_channels) - 1:
                dsv = mkvar(f"{scope.path}/down_blocks/{i}/downsamplers/0/out", out_d)
                ds = Conv2D(bscope("downsamplers/0/conv"), cur, dsv, 3, 2, 0)
                cur, cur_d = dsv, out_d
                curr_res //= 2
            self.down_blocks.append((resnets, attns, ds))
        mscope = scope("mid_block")
        self.mid_res1 = _VaeResnet(mscope("resnets/0"), g, cfg, cur, cur_d, cur_d)
        cur = self.mid_res1.out
        self.mid_attn = None
        if cfg.mid_block_attention:
            inner = mkvar(scope.path + "/mid_block/attentions/0/inner", cur_d)
            self.mid_attn = SelfAttention2D(mscope("attentions/0"), cur, inner,
                                            heads=1, norm_num_groups=cfg.norm_num_groups,
                                            eps=1e-6)
        self.mid_res2 = _VaeResnet(mscope("resnets/1"), g, cfg, cur, cur_d, cur_d)
        cur = self.mid_res2.out
        self.conv_norm_out = GroupNorm(scope("conv_norm_out"), cur,
                                       cfg.norm_num_groups, 1e-6)
        self.conv_out = Conv2D(scope("conv_out"), cur, self.v_z, 3, 1, 1)

    def init(self, key):
        cnt = [0]

        def nk():
            cnt[0] += 1
            return jax.random.fold_in(key, cnt[0])

        p = {"conv_in": self.conv_in.init(nk()), "down_blocks": {},
             "mid_block": {"resnets": {"0": self.mid_res1.init(nk()),
                                       "1": self.mid_res2.init(nk())}},
             "conv_norm_out": self.conv_norm_out.init(nk()),
             "conv_out": self.conv_out.init(nk())}
        if self.mid_attn is not None:
            p["mid_block"]["attentions"] = {"0": self.mid_attn.init(nk())}
        for i, (resnets, attns, ds) in enumerate(self.down_blocks):
            bp = {"resnets": {str(j): r.init(nk()) for j, r in enumerate(resnets)}}
            if attns:
                bp["attentions"] = {str(j): a.init(nk()) for j, a in enumerate(attns)}
            if ds is not None:
                bp["downsamplers"] = {"0": {"conv": ds.init(nk())}}
            p["down_blocks"][str(i)] = bp
        return p

    def __call__(self, p, x):
        h = self.conv_in(p["conv_in"], x)
        for i, (resnets, attns, ds) in enumerate(self.down_blocks):
            bp = p["down_blocks"][str(i)]
            for j, r in enumerate(resnets):
                h = r(bp["resnets"][str(j)], h)
                if attns:
                    h = attns[j](bp["attentions"][str(j)], h)
            if ds is not None:
                h = downsample_pad(h)  # downsample_padding=0 (vae.py:80)
                h = ds(bp["downsamplers"]["0"]["conv"], h)
        mp = p["mid_block"]
        h = self.mid_res1(mp["resnets"]["0"], h)
        if self.mid_attn is not None:
            h = self.mid_attn(mp["attentions"]["0"], h)
        h = self.mid_res2(mp["resnets"]["1"], h)
        h = silu(self.conv_norm_out(p["conv_norm_out"], h))
        return self.conv_out(p["conv_out"], h)


class Decoder:
    """vae.py Decoder:151-268 (mid block + UpDecoderBlock2D chain)."""

    def __init__(self, cfg: AutoencoderConfig, g: ChannelGraph, root: Scope):
        cs = cfg.channel_sizes
        scope = root
        self.cfg = cfg
        self.v_z = g.var(scope.path + "/z", cfg.latent_channels, prunable=False)
        self.v_out = g.var(scope.path + "/out_img", cfg.out_channels, prunable=False)

        def mkvar(name, default):
            return g.var(name, cs.get(name, default))

        rev = list(reversed(cfg.block_out_channels))
        v0 = mkvar(scope.path + "/conv_in/out", rev[0])
        self.conv_in = Conv2D(scope("conv_in"), self.v_z, v0, 3, 1, 1)
        cur, cur_d = v0, rev[0]
        mscope = scope("mid_block")
        self.mid_res1 = _VaeResnet(mscope("resnets/0"), g, cfg, cur, cur_d, cur_d)
        cur = self.mid_res1.out
        self.mid_attn = None
        if cfg.mid_block_attention:
            inner = mkvar(scope.path + "/mid_block/attentions/0/inner", cur_d)
            self.mid_attn = SelfAttention2D(mscope("attentions/0"), cur, inner,
                                            heads=1, norm_num_groups=cfg.norm_num_groups,
                                            eps=1e-6)
        self.mid_res2 = _VaeResnet(mscope("resnets/1"), g, cfg, cur, cur_d, cur_d)
        cur = self.mid_res2.out
        self.up_blocks = []
        curr_res = cfg.sample_size // (2 ** (len(rev) - 1))
        for i in range(len(rev)):
            out_d = rev[i]
            bscope = scope(f"up_blocks/{i}")
            resnets, attns = [], []
            for j in range(cfg.layers_per_block + 1):
                r = _VaeResnet(bscope(f"resnets/{j}"), g, cfg, cur, out_d, cur_d)
                resnets.append(r)
                cur, cur_d = r.out, out_d
                if curr_res in cfg.attn_resolutions:
                    inner = mkvar(f"{bscope.path}/attentions/{j}/inner", out_d)
                    attns.append(SelfAttention2D(
                        bscope(f"attentions/{j}"), cur, inner, heads=1,
                        norm_num_groups=cfg.norm_num_groups, eps=1e-6))
            us = None
            if i < len(rev) - 1:
                usv = mkvar(f"{scope.path}/up_blocks/{i}/upsamplers/0/out", out_d)
                us = Conv2D(bscope("upsamplers/0/conv"), cur, usv, 3, 1, 1)
                cur, cur_d = usv, out_d
                curr_res *= 2
            self.up_blocks.append((resnets, attns, us))
        self.conv_norm_out = GroupNorm(scope("conv_norm_out"), cur,
                                       cfg.norm_num_groups, 1e-6)
        self.conv_out = Conv2D(scope("conv_out"), cur, self.v_out, 3, 1, 1)

    def init(self, key):
        cnt = [0]

        def nk():
            cnt[0] += 1
            return jax.random.fold_in(key, cnt[0])

        p = {"conv_in": self.conv_in.init(nk()),
             "mid_block": {"resnets": {"0": self.mid_res1.init(nk()),
                                       "1": self.mid_res2.init(nk())}},
             "up_blocks": {},
             "conv_norm_out": self.conv_norm_out.init(nk()),
             "conv_out": self.conv_out.init(nk())}
        if self.mid_attn is not None:
            p["mid_block"]["attentions"] = {"0": self.mid_attn.init(nk())}
        for i, (resnets, attns, us) in enumerate(self.up_blocks):
            bp = {"resnets": {str(j): r.init(nk()) for j, r in enumerate(resnets)}}
            if attns:
                bp["attentions"] = {str(j): a.init(nk()) for j, a in enumerate(attns)}
            if us is not None:
                bp["upsamplers"] = {"0": {"conv": us.init(nk())}}
            p["up_blocks"][str(i)] = bp
        return p

    def features(self, p, z):
        """Everything up to (excluding) conv_out — the GAN trainer's adaptive
        d_weight differentiates through conv_out alone (the reference's
        `get_last_layer()` = decoder.conv_out.weight, autoencoder.py:397-398),
        so it needs the trunk output separately."""
        h = self.conv_in(p["conv_in"], z)
        mp = p["mid_block"]
        h = self.mid_res1(mp["resnets"]["0"], h)
        if self.mid_attn is not None:
            h = self.mid_attn(mp["attentions"]["0"], h)
        h = self.mid_res2(mp["resnets"]["1"], h)
        for i, (resnets, attns, us) in enumerate(self.up_blocks):
            bp = p["up_blocks"][str(i)]
            for j, r in enumerate(resnets):
                h = r(bp["resnets"][str(j)], h)
                if attns:
                    h = attns[j](bp["attentions"][str(j)], h)
            if us is not None:
                h = upsample_nearest_2x(h)
                h = us(bp["upsamplers"]["0"]["conv"], h)
        return silu(self.conv_norm_out(p["conv_norm_out"], h))

    def __call__(self, p, z):
        return self.conv_out(p["conv_out"], self.features(p, z))


class VQModel:
    """vq_model.py: encoder -> quant_conv -> VectorQuantizer -> post_quant ->
    decoder. decode(force_not_quantize=True) supported like the pipeline uses
    (pipeline_latent_diffusion_uncond.py:98)."""

    def __init__(self, cfg: AutoencoderConfig):
        assert cfg.num_vq_embeddings, "VQModel needs num_vq_embeddings"
        self.cfg = cfg
        g = self.graph = ChannelGraph()
        root = Scope(g)
        self.encoder = Encoder(cfg, g, root("encoder"), double_z=False)
        self.decoder = Decoder(cfg, g, root("decoder"))
        vq_dim = cfg.vq_embed_dim or cfg.latent_channels
        self.vq_dim = vq_dim
        v_q = g.var("quant", vq_dim, prunable=False)
        self.quant_conv = Conv2D(root("quant_conv"), self.encoder.v_z, v_q, 1, 1, 0)
        self.post_quant_conv = Conv2D(root("post_quant_conv"), v_q,
                                      self.decoder.v_z, 1, 1, 0)
        root("quantize/embedding").ref("weight", 1, v_q, "out")

    def init(self, key):
        ks = jax.random.split(key, 5)
        return {
            "encoder": self.encoder.init(ks[0]),
            "decoder": self.decoder.init(ks[1]),
            "quant_conv": self.quant_conv.init(ks[2]),
            "post_quant_conv": self.post_quant_conv.init(ks[3]),
            "quantize": {"embedding": {"weight": jax.random.uniform(
                ks[4], (self.cfg.num_vq_embeddings, self.vq_dim),
                minval=-1.0 / self.cfg.num_vq_embeddings,
                maxval=1.0 / self.cfg.num_vq_embeddings)}},
        }

    def encode(self, p, x):
        return self.quant_conv(p["quant_conv"], self.encoder(p["encoder"], x))

    def quantize(self, p, z):
        """Nearest-codebook lookup (vae.py VectorQuantizer:332)."""
        emb = p["quantize"]["embedding"]["weight"].astype(z.dtype)  # (K, D)
        flat = z.reshape(-1, z.shape[-1])
        d = (jnp.sum(flat**2, 1, keepdims=True)
             - 2.0 * flat @ emb.T + jnp.sum(emb**2, 1)[None, :])
        idx = jnp.argmin(d, axis=1)
        zq = emb[idx].reshape(z.shape)
        return zq, idx.reshape(z.shape[:-1])

    def quantize_train(self, p, z, beta: float = 0.25):
        """Training-mode quantize: straight-through estimator + codebook loss
        (taming VectorQuantizer2 with its default legacy=True weighting, as
        instantiated by ldm autoencoder.py:39-41 with beta=0.25):
        loss = mean((sg[zq]-z)^2) + beta * mean((zq-sg[z])^2).

        Returns (zq_straight_through, codebook_loss, indices)."""
        zq, idx = self.quantize(p, z)
        sg = jax.lax.stop_gradient
        # loss accumulated in f32 regardless of compute dtype (bf16 training)
        zf, qf = z.astype(jnp.float32), zq.astype(jnp.float32)
        loss = (jnp.mean(jnp.square(sg(qf) - zf))
                + beta * jnp.mean(jnp.square(qf - sg(zf))))
        return z + sg(zq - z), loss, idx

    def decode(self, p, z, force_not_quantize: bool = True):
        if not force_not_quantize:
            z, _ = self.quantize(p, z)
        return self.decoder(p["decoder"], self.post_quant_conv(p["post_quant_conv"], z))


class AutoencoderKL:
    """autoencoder_kl.py: encode -> DiagonalGaussian; decode."""

    def __init__(self, cfg: AutoencoderConfig):
        self.cfg = cfg
        g = self.graph = ChannelGraph()
        root = Scope(g)
        self.encoder = Encoder(cfg, g, root("encoder"), double_z=True)
        self.decoder = Decoder(cfg, g, root("decoder"))
        v_moments = g.var("moments", 2 * cfg.latent_channels, prunable=False)
        v_lat = g.var("latent", cfg.latent_channels, prunable=False)
        self.quant_conv = Conv2D(root("quant_conv"), self.encoder.v_z, v_moments, 1, 1, 0)
        self.post_quant_conv = Conv2D(root("post_quant_conv"), v_lat,
                                      self.decoder.v_z, 1, 1, 0)

    def init(self, key):
        ks = jax.random.split(key, 4)
        return {"encoder": self.encoder.init(ks[0]),
                "decoder": self.decoder.init(ks[1]),
                "quant_conv": self.quant_conv.init(ks[2]),
                "post_quant_conv": self.post_quant_conv.init(ks[3])}

    def encode_moments(self, p, x):
        return self.quant_conv(p["quant_conv"], self.encoder(p["encoder"], x))

    def encode(self, p, x, key=None):
        """Sample from the diagonal gaussian posterior (mode when key=None)."""
        moments = self.encode_moments(p, x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if key is None:
            return mean
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)

    def decode(self, p, z):
        return self.decoder(p["decoder"], self.post_quant_conv(p["post_quant_conv"], z))


# ---------------------------------------------------------------------------
# First-stage model zoo presets (ldm_exp/models/first_stage_models/*/config.yaml
# ddconfigs; ch=128, num_res_blocks=2, resolution 256 throughout). Names match
# the reference directories.


def _first_stage(ch_mult, z, *, double_z, n_embed=None, embed_dim=None,
                 attn=(), mid_attn=True):
    # double_z is implied by the VQ-vs-KL dispatch (make_first_stage);
    # assert the preset table stays consistent with the ddconfigs
    assert double_z == (n_embed is None), "KL <=> double_z in the zoo"
    return AutoencoderConfig(
        block_out_channels=tuple(128 * m for m in ch_mult),
        layers_per_block=2, latent_channels=z, sample_size=256,
        num_vq_embeddings=n_embed, vq_embed_dim=embed_dim,
        attn_resolutions=tuple(attn), mid_block_attention=mid_attn)


FIRST_STAGE_PRESETS = {
    # KL (LPIPSWithDiscriminator, double_z)
    "kl-f4": lambda: _first_stage((1, 2, 4), 3, double_z=True),
    "kl-f8": lambda: _first_stage((1, 2, 4, 4), 4, double_z=True),
    "kl-f16": lambda: _first_stage((1, 1, 2, 2, 4), 16, double_z=True,
                                   attn=(16,)),
    "kl-f32": lambda: _first_stage((1, 1, 2, 2, 4, 4), 64, double_z=True,
                                   attn=(16, 8)),
    # VQ (VQLPIPSWithDiscriminator)
    "vq-f4": lambda: _first_stage((1, 2, 4), 3, double_z=False,
                                  n_embed=8192, embed_dim=3),
    "vq-f4-noattn": lambda: _first_stage((1, 2, 4), 3, double_z=False,
                                         n_embed=8192, embed_dim=3,
                                         mid_attn=False),
    "vq-f8": lambda: _first_stage((1, 2, 2, 4), 4, double_z=False,
                                  n_embed=16384, embed_dim=4, attn=(32,)),
    "vq-f8-n256": lambda: _first_stage((1, 2, 2, 4), 4, double_z=False,
                                       n_embed=256, embed_dim=4, attn=(32,)),
    "vq-f16": lambda: _first_stage((1, 1, 2, 2, 4), 8, double_z=False,
                                   n_embed=16384, embed_dim=8, attn=(16,)),
}


def first_stage_config(name: str) -> AutoencoderConfig:
    return FIRST_STAGE_PRESETS[name]()


def make_first_stage(cfg: AutoencoderConfig):
    return VQModel(cfg) if cfg.num_vq_embeddings else AutoencoderKL(cfg)
