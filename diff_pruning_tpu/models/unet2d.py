"""UNet2D — TPU-native DDPM UNet with an integrated channel-dependency graph.

Functional re-design of diffusers ``UNet2DModel``
(reference: diffusers/models/unet_2d.py:38-316, unet_2d_blocks.py
DownBlock2D:911 / AttnDownBlock2D:681 / UNetMidBlock2D:391 / UpBlock2D:1982 /
AttnUpBlock2D:1754, resnet.py ResnetBlock2D:456 / Upsample2D:101 /
Downsample2D:173). The config schema is diffusers ``config.json``-compatible,
extended with ``channel_sizes`` — per-ChannelVar size overrides that encode a
pruned architecture, replacing the reference's whole-nn.Module pickles
(ddpm_prune.py:135) with clean (config, params) checkpoints.

Every residual tie, skip-concat offset, GroupNorm group constraint, and
attention inner dim is registered in the model's ChannelGraph at build time;
the pruning engine needs no tracing.

Activations NHWC; callers converting from the reference's NCHW data should
transpose at the boundary.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..pruning.graph import CatVar, ChannelGraph, ChannelVar
from .layers import (
    Conv2D,
    GroupNorm,
    Linear,
    Scope,
    SelfAttention2D,
    downsample_pad,
    get_timestep_embedding,
    silu,
    upsample_nearest_2x,
)


@dataclasses.dataclass
class UNet2DConfig:
    """diffusers UNet2DModel config (unet_2d.py:82-106) + channel_sizes."""

    sample_size: Optional[int] = None
    in_channels: int = 3
    out_channels: int = 3
    center_input_sample: bool = False
    time_embedding_type: str = "positional"
    freq_shift: float = 0
    flip_sin_to_cos: bool = True
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D", "AttnDownBlock2D", "AttnDownBlock2D", "AttnDownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "AttnUpBlock2D", "AttnUpBlock2D", "AttnUpBlock2D", "UpBlock2D")
    block_out_channels: Tuple[int, ...] = (224, 448, 672, 896)
    layers_per_block: int = 2
    mid_block_scale_factor: float = 1.0
    downsample_padding: int = 1
    act_fn: str = "silu"
    attention_head_dim: Optional[int] = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    resnet_time_scale_shift: str = "default"
    add_attention: bool = True
    class_embed_type: Optional[str] = None
    num_class_embeds: Optional[int] = None
    dropout: float = 0.0
    # Pruning overrides: ChannelVar name -> actual size. Empty = unpruned.
    channel_sizes: Dict[str, int] = dataclasses.field(default_factory=dict)

    _JSON_SKIP = ("dropout",)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["_class_name"] = "UNet2DModel"
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "UNet2DConfig":
        d = json.loads(text)
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in fields}
        for key in ("down_block_types", "up_block_types", "block_out_channels"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)

    def with_channel_sizes(self, sizes: Dict[str, int]) -> "UNet2DConfig":
        return dataclasses.replace(self, channel_sizes=dict(sizes))


class ResnetBlock:
    """ResnetBlock2D (resnet.py:456-644), time_embedding_norm='default'.

    If the *default* (unpruned) in/out sizes differ, a 1x1 conv shortcut
    exists and `out` is a fresh ChannelVar; otherwise the residual add ties
    output to the input var — exactly the coupling torch_pruning discovers
    from the AddBackward node.
    """

    def __init__(self, scope: Scope, g: ChannelGraph, cfg: UNet2DConfig,
                 cin: ChannelVar, default_out: int, temb_var: ChannelVar,
                 default_in: int):
        self.cfg = cfg
        self.has_shortcut = default_in != default_out
        if self.has_shortcut:
            self.out = g.var(scope.path + "/out",
                             cfg.channel_sizes.get(scope.path + "/out", default_out))
        else:
            self.out = cin
        self.norm1 = GroupNorm(scope("norm1"), cin, cfg.norm_num_groups, cfg.norm_eps)
        self.conv1 = Conv2D(scope("conv1"), cin, self.out, 3, 1, 1)
        self.time_emb_proj = Linear(scope("time_emb_proj"), temb_var, self.out)
        self.norm2 = GroupNorm(scope("norm2"), self.out, cfg.norm_num_groups, cfg.norm_eps)
        self.conv2 = Conv2D(scope("conv2"), self.out, self.out, 3, 1, 1)
        if self.has_shortcut:
            self.conv_shortcut = Conv2D(scope("conv_shortcut"), cin, self.out, 1, 1, 0)

    def init(self, key):
        ks = jax.random.split(key, 6)
        p = {
            "norm1": self.norm1.init(ks[0]),
            "conv1": self.conv1.init(ks[1]),
            "time_emb_proj": self.time_emb_proj.init(ks[2]),
            "norm2": self.norm2.init(ks[3]),
            "conv2": self.conv2.init(ks[4]),
        }
        if self.has_shortcut:
            p["conv_shortcut"] = self.conv_shortcut.init(ks[5])
        return p

    def __call__(self, p, x, temb, *, dropout_rng=None):
        h = self.norm1(p["norm1"], x, with_silu=True)
        h = self.conv1(p["conv1"], h)
        t = self.time_emb_proj(p["time_emb_proj"], silu(temb))
        h = h + t[:, None, None, :]
        h = self.norm2(p["norm2"], h, with_silu=True)
        if dropout_rng is not None and self.cfg.dropout > 0.0:
            keep = 1.0 - self.cfg.dropout
            mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0).astype(h.dtype)
        h = self.conv2(p["conv2"], h)
        sc = self.conv_shortcut(p["conv_shortcut"], x) if self.has_shortcut else x
        return h + sc


class ConcatResnetBlock(ResnetBlock):
    """Up-block resnet consuming concat([hidden, skip]) (unet_2d_blocks.py:1822).

    The concatenated input is a CatVar; conv1/conv_shortcut in-axes carry
    (var, offset) parts so surgery slices them at the right offsets — the
    functional equivalent of _ConcatIndexMapping (dependency.py:946-989).
    """

    def __init__(self, scope: Scope, g: ChannelGraph, cfg: UNet2DConfig,
                 hidden: ChannelVar, skip: ChannelVar, default_out: int,
                 temb_var: ChannelVar, default_in: int):
        cat = CatVar((hidden, skip))
        self.cfg = cfg
        # The concat width always exceeds out_channels in these UNets, so the
        # 1x1 shortcut always exists (use_in_shortcut, resnet.py:581).
        if default_in == default_out:
            raise ValueError("concat resnet without shortcut is unsupported")
        self.has_shortcut = True
        self.out = g.var(scope.path + "/out",
                         cfg.channel_sizes.get(scope.path + "/out", default_out))
        self.norm1 = GroupNorm(scope("norm1"), cat, cfg.norm_num_groups, cfg.norm_eps)
        self.conv1 = Conv2D(scope("conv1"), cat, self.out, 3, 1, 1)
        self.time_emb_proj = Linear(scope("time_emb_proj"), temb_var, self.out)
        self.norm2 = GroupNorm(scope("norm2"), self.out, cfg.norm_num_groups, cfg.norm_eps)
        self.conv2 = Conv2D(scope("conv2"), self.out, self.out, 3, 1, 1)
        self.conv_shortcut = Conv2D(scope("conv_shortcut"), cat, self.out, 1, 1, 0)


class UNet2D:
    """Build once from config; ``init`` -> params pytree, ``__call__`` pure."""

    def __init__(self, cfg: UNet2DConfig):
        if cfg.time_embedding_type != "positional":
            raise NotImplementedError("only positional time embedding is supported")
        if cfg.resnet_time_scale_shift != "default":
            raise NotImplementedError("only default time_embedding_norm is supported")
        self.cfg = cfg
        g = self.graph = ChannelGraph()
        root = Scope(g)
        cs = cfg.channel_sizes

        def mkvar(name: str, default: int, **kw) -> ChannelVar:
            return g.var(name, cs.get(name, default), **kw)

        # Fixed (non-prunable) boundary vars.
        self.v_in = g.var("sample_in", cfg.in_channels, prunable=False)
        self.v_out = g.var("sample_out", cfg.out_channels, prunable=False)
        # Sinusoidal projection width is set by config, not by a producer
        # layer, so it is fixed (nothing upstream to prune — matches the
        # reference where no parametrized layer precedes linear_1).
        self.v_tproj = g.var("time_proj", cfg.block_out_channels[0], prunable=False)

        time_embed_default = cfg.block_out_channels[0] * 4
        self.v_temb_hidden = mkvar("time_embedding/hidden", time_embed_default)
        self.v_temb = mkvar("time_embedding/out", time_embed_default)
        te = root("time_embedding")
        self.time_linear_1 = Linear(te("linear_1"), self.v_tproj, self.v_temb_hidden)
        self.time_linear_2 = Linear(te("linear_2"), self.v_temb_hidden, self.v_temb)

        self.class_embedding = None
        if cfg.class_embed_type is None and cfg.num_class_embeds is not None:
            ce = root("class_embedding")
            ce.ref("weight", 1, self.v_temb, "out")
            self.class_embedding = ("embedding", cfg.num_class_embeds)

        # conv_in
        v0 = mkvar("conv_in/out", cfg.block_out_channels[0])
        self.conv_in = Conv2D(root("conv_in"), self.v_in, v0, 3, 1, 1)

        def heads_for(default_c: int) -> int:
            # unet_2d.py:433: heads = C // head_dim if head_dim else 1
            if cfg.attention_head_dim is None:
                return 1
            return max(default_c // cfg.attention_head_dim, 1)

        # --- down path; collect skip vars like down_block_res_samples -------
        skips: List[ChannelVar] = [v0]
        skip_defaults: List[int] = [cfg.block_out_channels[0]]
        self.down_blocks = []
        cur, cur_default = v0, cfg.block_out_channels[0]
        for i, btype in enumerate(cfg.down_block_types):
            bscope = root(f"down_blocks/{i}")
            out_default = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            resnets, attns = [], []
            for j in range(cfg.layers_per_block):
                r = ResnetBlock(bscope(f"resnets/{j}"), g, cfg, cur, out_default,
                                self.v_temb, cur_default)
                resnets.append(r)
                cur, cur_default = r.out, out_default
                if btype == "AttnDownBlock2D":
                    inner = mkvar(f"down_blocks/{i}/attentions/{j}/inner", out_default)
                    a = SelfAttention2D(bscope(f"attentions/{j}"), cur, inner,
                                        heads=heads_for(out_default),
                                        norm_num_groups=cfg.norm_num_groups,
                                        eps=cfg.norm_eps)
                    attns.append(a)
                skips.append(cur)
                skip_defaults.append(out_default)
            downsampler = None
            if not is_final:
                dsv = mkvar(f"down_blocks/{i}/downsamplers/0/out", out_default)
                downsampler = Conv2D(bscope("downsamplers/0/conv"), cur, dsv, 3, 2,
                                     padding=cfg.downsample_padding)
                cur, cur_default = dsv, out_default
                skips.append(cur)
                skip_defaults.append(out_default)
            self.down_blocks.append((btype, resnets, attns, downsampler))

        # --- mid block ------------------------------------------------------
        mscope = root("mid_block")
        mid_default = cfg.block_out_channels[-1]
        self.mid_resnets = [ResnetBlock(mscope("resnets/0"), g, cfg, cur,
                                        mid_default, self.v_temb, cur_default)]
        cur = self.mid_resnets[0].out
        self.mid_attns = []
        if cfg.add_attention:
            inner = mkvar("mid_block/attentions/0/inner", mid_default)
            self.mid_attns.append(SelfAttention2D(
                mscope("attentions/0"), cur, inner, heads=heads_for(mid_default),
                norm_num_groups=cfg.norm_num_groups, eps=cfg.norm_eps))
        self.mid_resnets.append(ResnetBlock(mscope("resnets/1"), g, cfg, cur,
                                            mid_default, self.v_temb, mid_default))
        cur = self.mid_resnets[1].out
        cur_default = mid_default

        # --- up path ---------------------------------------------------------
        rev = list(reversed(cfg.block_out_channels))
        self.up_blocks = []
        for i, btype in enumerate(cfg.up_block_types):
            bscope = root(f"up_blocks/{i}")
            out_default = rev[i]
            is_final = i == len(cfg.block_out_channels) - 1
            resnets, attns = [], []
            for j in range(cfg.layers_per_block + 1):
                skip_v = skips.pop()
                skip_d = skip_defaults.pop()
                r = ConcatResnetBlock(bscope(f"resnets/{j}"), g, cfg, cur, skip_v,
                                      out_default, self.v_temb,
                                      cur_default + skip_d)
                resnets.append(r)
                cur, cur_default = r.out, out_default
                if btype == "AttnUpBlock2D":
                    inner = mkvar(f"up_blocks/{i}/attentions/{j}/inner", out_default)
                    a = SelfAttention2D(bscope(f"attentions/{j}"), cur, inner,
                                        heads=heads_for(out_default),
                                        norm_num_groups=cfg.norm_num_groups,
                                        eps=cfg.norm_eps)
                    attns.append(a)
            upsampler = None
            if not is_final:
                usv = mkvar(f"up_blocks/{i}/upsamplers/0/out", out_default)
                upsampler = Conv2D(bscope("upsamplers/0/conv"), cur, usv, 3, 1, 1)
                cur, cur_default = usv, out_default
            self.up_blocks.append((btype, resnets, attns, upsampler))
        assert not skips, "skip bookkeeping mismatch"

        # --- out head ---------------------------------------------------------
        self.conv_norm_out = GroupNorm(root("conv_norm_out"), cur,
                                       cfg.norm_num_groups, cfg.norm_eps)
        # conv_out is the reference's ignored layer (ddpm_prune.py:71): its
        # out var is the fixed image var; its in-channels follow `cur`.
        self.conv_out = Conv2D(root("conv_out"), cur, self.v_out, 3, 1, 1)

    # -- params ----------------------------------------------------------------

    def init(self, key) -> dict:
        cnt = [0]

        def nk():
            cnt[0] += 1
            return jax.random.fold_in(key, cnt[0])

        p: dict = {
            "time_embedding": {
                "linear_1": self.time_linear_1.init(nk()),
                "linear_2": self.time_linear_2.init(nk()),
            },
            "conv_in": self.conv_in.init(nk()),
            "conv_norm_out": self.conv_norm_out.init(nk()),
            "conv_out": self.conv_out.init(nk()),
        }
        if self.class_embedding is not None:
            n = self.class_embedding[1]
            p["class_embedding"] = {
                "weight": jax.random.normal(nk(), (n, self.v_temb.size)) * 0.02}

        def block_params(resnets, attns):
            bp = {"resnets": {str(j): r.init(nk()) for j, r in enumerate(resnets)}}
            if attns:
                bp["attentions"] = {str(j): a.init(nk()) for j, a in enumerate(attns)}
            return bp

        p["down_blocks"] = {}
        for i, (_, resnets, attns, ds) in enumerate(self.down_blocks):
            bp = block_params(resnets, attns)
            if ds is not None:
                bp["downsamplers"] = {"0": {"conv": ds.init(nk())}}
            p["down_blocks"][str(i)] = bp
        p["mid_block"] = {
            "resnets": {str(j): r.init(nk()) for j, r in enumerate(self.mid_resnets)},
        }
        if self.mid_attns:
            p["mid_block"]["attentions"] = {
                str(j): a.init(nk()) for j, a in enumerate(self.mid_attns)}
        p["up_blocks"] = {}
        for i, (_, resnets, attns, us) in enumerate(self.up_blocks):
            bp = block_params(resnets, attns)
            if us is not None:
                bp["upsamplers"] = {"0": {"conv": us.init(nk())}}
            p["up_blocks"][str(i)] = bp
        return p

    # -- forward ----------------------------------------------------------------

    def __call__(self, params, sample, timesteps, class_labels=None, *,
                 dropout_rng=None):
        """sample: (B,H,W,C) NHWC; timesteps: (B,) int/float -> eps prediction."""
        cfg = self.cfg
        if cfg.center_input_sample:
            sample = 2.0 * sample - 1.0
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps[None], (sample.shape[0],))

        t_emb = get_timestep_embedding(
            timesteps, self.v_tproj.size,
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).astype(sample.dtype)
        temb = self.time_linear_1(params["time_embedding"]["linear_1"], t_emb)
        temb = silu(temb)
        temb = self.time_linear_2(params["time_embedding"]["linear_2"], temb)
        if self.class_embedding is not None:
            if class_labels is None:
                raise ValueError("class_labels required for class-conditional model")
            temb = temb + params["class_embedding"]["weight"][class_labels].astype(temb.dtype)

        rngs = [None] * 64
        if dropout_rng is not None:
            rngs = list(jax.random.split(dropout_rng, 64))
        ri = [0]

        def next_rng():
            r = rngs[ri[0]]
            ri[0] += 1
            return r

        h = self.conv_in(params["conv_in"], sample)
        hs = [h]
        for i, (_, resnets, attns, ds) in enumerate(self.down_blocks):
            bp = params["down_blocks"][str(i)]
            for j, r in enumerate(resnets):
                h = r(bp["resnets"][str(j)], h, temb, dropout_rng=next_rng())
                if attns:
                    h = attns[j](bp["attentions"][str(j)], h)
                hs.append(h)
            if ds is not None:
                if cfg.downsample_padding == 0:
                    # Downsample2D pads (0,1,0,1) then runs a VALID stride-2
                    # conv (resnet.py:213-218); ds was built with padding=0.
                    h = downsample_pad(h)
                h = ds(bp["downsamplers"]["0"]["conv"], h)
                hs.append(h)

        mp = params["mid_block"]
        h = self.mid_resnets[0](mp["resnets"]["0"], h, temb, dropout_rng=next_rng())
        if self.mid_attns:
            h = self.mid_attns[0](mp["attentions"]["0"], h)
        h = self.mid_resnets[1](mp["resnets"]["1"], h, temb, dropout_rng=next_rng())

        for i, (_, resnets, attns, us) in enumerate(self.up_blocks):
            bp = params["up_blocks"][str(i)]
            for j, r in enumerate(resnets):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = r(bp["resnets"][str(j)], h, temb, dropout_rng=next_rng())
                if attns:
                    h = attns[j](bp["attentions"][str(j)], h)
            if us is not None:
                h = upsample_nearest_2x(h)
                h = us(bp["upsamplers"]["0"]["conv"], h)

        h = self.conv_norm_out(params["conv_norm_out"], h, with_silu=True)
        h = self.conv_out(params["conv_out"], h)
        return h


def ddpm_cifar10_config() -> UNet2DConfig:
    """google/ddpm-cifar10-32 architecture (tools/ddpm_cifar10_config.json)."""
    return UNet2DConfig(
        sample_size=32,
        in_channels=3,
        out_channels=3,
        center_input_sample=False,
        time_embedding_type="positional",
        freq_shift=1,
        flip_sin_to_cos=False,
        down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(128, 256, 256, 256),
        layers_per_block=2,
        downsample_padding=0,
        attention_head_dim=None,
        norm_num_groups=32,
        norm_eps=1e-6,
    )


def tiny_unet_config(attn: bool = True) -> UNet2DConfig:
    """Small CPU-testable UNet with the same structural features."""
    return UNet2DConfig(
        sample_size=16,
        block_out_channels=(32, 64),
        down_block_types=("DownBlock2D", "AttnDownBlock2D") if attn else ("DownBlock2D", "DownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D") if attn else ("UpBlock2D", "UpBlock2D"),
        layers_per_block=2,
        downsample_padding=0,
        attention_head_dim=None,
        norm_num_groups=8,
        norm_eps=1e-6,
        freq_shift=1,
        flip_sin_to_cos=False,
    )


def ddpm_celeba64_config() -> UNet2DConfig:
    """CelebA-HQ 64x64 DDPM (ddpm_exp/configs/celeba.yml: ch=128,
    ch_mult [1,2,2,2,4], attn@16). Reference: 78.7M params (BASELINE.md)."""
    return UNet2DConfig(
        sample_size=64,
        block_out_channels=(128, 256, 256, 256, 512),
        down_block_types=("DownBlock2D", "DownBlock2D", "AttnDownBlock2D",
                          "DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D", "AttnUpBlock2D",
                        "UpBlock2D", "UpBlock2D"),
        layers_per_block=2,
        downsample_padding=0,
        attention_head_dim=None,
        norm_num_groups=32,
        norm_eps=1e-6,
        freq_shift=1,
        flip_sin_to_cos=False,
        dropout=0.1,
    )


def ddpm_lsun256_config() -> UNet2DConfig:
    """LSUN church/bedroom 256x256 DDPM (ddpm_exp/configs/church.yml:
    ch=128, ch_mult [1,1,2,2,4,4], attn@16). Reference: 113.7M params."""
    return UNet2DConfig(
        sample_size=256,
        block_out_channels=(128, 128, 256, 256, 512, 512),
        down_block_types=("DownBlock2D", "DownBlock2D", "DownBlock2D",
                          "DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D",
                        "UpBlock2D", "UpBlock2D", "UpBlock2D"),
        layers_per_block=2,
        downsample_padding=0,
        attention_head_dim=None,
        norm_num_groups=32,
        norm_eps=1e-6,
        freq_shift=1,
        flip_sin_to_cos=False,
    )


def ldm_celebahq256_config() -> UNet2DConfig:
    """CompVis/ldm-celebahq-256 UNet (diffusers LDMPipeline layout,
    ldm_prune.py:50-52): operates on 64x64 VQ latents."""
    return UNet2DConfig(
        sample_size=64,
        in_channels=3,
        out_channels=3,
        block_out_channels=(224, 448, 672, 896),
        down_block_types=("DownBlock2D", "AttnDownBlock2D",
                          "AttnDownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "AttnUpBlock2D",
                        "AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=2,
        attention_head_dim=32,
        norm_num_groups=32,
        norm_eps=1e-6,
        freq_shift=0,
        flip_sin_to_cos=True,
    )
