"""UNetCond — the LDM conditional UNet (CompVis openaimodel.UNetModel).

TPU-native re-design of ldm_exp/ldm/modules/diffusionmodules/openaimodel.py
UNetModel:413-744 (the `cin256-v2` class-conditional ImageNet-256 model
pruned by ldm_exp/prune_ldm.py): ResBlocks + SpatialTransformer
(self-attn + cross-attn + GEGLU ff) at the configured attention
resolutions, skip-concat U-Net wiring, sinusoidal time embedding
(cos-then-sin, divisor `half` — util.timestep_embedding), optional additive
label embedding. Channel graph registered at build time, with
attention-head grouping on every q/k/v inner var (ldm_prune.py:79-83) and
the context var non-prunable (conditioning comes from outside the pruned
module).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..pruning.graph import CatVar, ChannelGraph, ChannelVar
from .layers import (
    Conv2D,
    GroupNorm,
    Linear,
    Scope,
    SelfAttention2D,
    SpatialTransformer,
    avg_pool_2x,
    get_timestep_embedding,
    silu,
    upsample_nearest_2x,
)


@dataclasses.dataclass
class UNetCondConfig:
    """openaimodel.UNetModel config subset (cin256-v2.yaml unet_config)."""

    image_size: int = 64
    in_channels: int = 3
    out_channels: int = 3
    model_channels: int = 192
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 4, 2)
    channel_mult: Tuple[int, ...] = (1, 2, 3, 5)
    num_heads: int = 1
    num_head_channels: int = -1
    transformer_depth: int = 1
    context_dim: Optional[int] = 512
    num_classes: Optional[int] = None  # additive label_emb variant
    dropout: float = 0.0
    norm_num_groups: int = 32
    # openaimodel variants used by the other LDM zoo yamls:
    # AttentionBlock instead of SpatialTransformer (celebahq/ffhq/bedrooms,
    # openaimodel.py:278-341 — functionally our SelfAttention2D; original
    # fused-qkv conv weights split in the converter);
    use_spatial_transformer: bool = True
    # FiLM-style conditioning: emb_layers -> 2*out, h = norm(h)*(1+s)+b
    # (openaimodel.py:237-246; lsun_churches-ldm-kl-8.yaml)
    use_scale_shift_norm: bool = False
    # up/downsampling inside ResBlocks instead of standalone convs
    # (openaimodel.py:207-216; lsun_churches-ldm-kl-8.yaml)
    resblock_updown: bool = False
    channel_sizes: Dict[str, int] = dataclasses.field(default_factory=dict)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["_class_name"] = "UNetCond"
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "UNetCondConfig":
        d = json.loads(text)
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in fields}
        for key in ("attention_resolutions", "channel_mult"):
            if key in kw:
                kw[key] = tuple(kw[key])
        return cls(**kw)

    def with_channel_sizes(self, sizes: Dict[str, int]) -> "UNetCondConfig":
        return dataclasses.replace(self, channel_sizes=dict(sizes))


class _ResBlock:
    """openaimodel ResBlock:163-264: in_layers = GN/SiLU/conv3; emb_layers =
    SiLU/Linear(-> out or 2*out for scale_shift); out_layers =
    GN/SiLU/dropout/zero-conv3; 1x1 skip when channels differ. With
    ``use_scale_shift_norm`` (openaimodel.py:237-246) the embedding FiLMs the
    out-norm; with up/down (openaimodel.py:207-216) the block resamples h
    and the residual between in_norm and in_conv."""

    def __init__(self, scope: Scope, g: ChannelGraph, cfg: UNetCondConfig,
                 cin, default_out: int, temb_var: ChannelVar, default_in: int,
                 up: bool = False, down: bool = False):
        cs = cfg.channel_sizes
        self.cfg = cfg
        self.up, self.down = up, down
        self.scale_shift = cfg.use_scale_shift_norm
        self.has_shortcut = default_in != default_out
        if self.has_shortcut:
            self.out = g.var(scope.path + "/out",
                             cs.get(scope.path + "/out", default_out))
        else:
            assert isinstance(cin, ChannelVar)
            self.out = cin
        self.norm1 = GroupNorm(scope("in_norm"), cin, cfg.norm_num_groups, 1e-5)
        self.conv1 = Conv2D(scope("in_conv"), cin, self.out, 3, 1, 1)
        if self.scale_shift:
            # emb_proj kernel (temb, 2*out): [0:out]=scale, [out:]=shift,
            # both indexed by the SAME out var (the GEGLU two-part pattern)
            from ..pruning.graph import AxisRef

            self._emb_path = scope.path + "/emb_proj"
            o = self.out.size
            g.ref(f"{self._emb_path}/kernel", 0, temb_var, "in")
            g.refs.append(AxisRef(f"{self._emb_path}/kernel", 1,
                                  ((self.out, 0), (self.out, o)), "out"))
            g.refs.append(AxisRef(f"{self._emb_path}/bias", 0,
                                  ((self.out, 0), (self.out, o)), "bias"))
            g._by_var = None
            self._temb_size = temb_var.size
        else:
            self.emb_proj = Linear(scope("emb_proj"), temb_var, self.out)
        self.norm2 = GroupNorm(scope("out_norm"), self.out, cfg.norm_num_groups, 1e-5)
        self.conv2 = Conv2D(scope("out_conv"), self.out, self.out, 3, 1, 1)
        if self.has_shortcut:
            self.skip = Conv2D(scope("skip_connection"), cin, self.out, 1, 1, 0)

    def init(self, key):
        ks = jax.random.split(key, 6)
        if self.scale_shift:
            import math

            bound = math.sqrt(1.0 / self._temb_size)
            k1, k2 = jax.random.split(ks[2])
            emb_p = {"kernel": jax.random.uniform(
                k1, (self._temb_size, 2 * self.out.size), jnp.float32,
                -bound, bound),
                "bias": jax.random.uniform(
                    k2, (2 * self.out.size,), jnp.float32, -bound, bound)}
        else:
            emb_p = self.emb_proj.init(ks[2])
        p = {"in_norm": self.norm1.init(ks[0]), "in_conv": self.conv1.init(ks[1]),
             "emb_proj": emb_p, "out_norm": self.norm2.init(ks[3]),
             "out_conv": self.conv2.init(ks[4])}
        # out_conv zero-init (openaimodel.py:230 zero_module)
        p["out_conv"]["kernel"] = jnp.zeros_like(p["out_conv"]["kernel"])
        p["out_conv"]["bias"] = jnp.zeros_like(p["out_conv"]["bias"])
        if self.has_shortcut:
            p["skip_connection"] = self.skip.init(ks[5])
        return p

    def __call__(self, p, x, temb, dropout_rng=None):
        h = silu(self.norm1(p["in_norm"], x))
        if self.up:
            h, x = upsample_nearest_2x(h), upsample_nearest_2x(x)
        elif self.down:
            h, x = avg_pool_2x(h), avg_pool_2x(x)
        h = self.conv1(p["in_conv"], h)
        if self.scale_shift:
            e = silu(temb) @ p["emb_proj"]["kernel"].astype(temb.dtype) \
                + p["emb_proj"]["bias"].astype(temb.dtype)
            scale, shift = jnp.split(e[:, None, None, :], 2, axis=-1)
            h = self.norm2(p["out_norm"], h) * (1.0 + scale) + shift
            h = silu(h)
        else:
            e = self.emb_proj(p["emb_proj"], silu(temb))
            h = h + e[:, None, None, :]
            h = silu(self.norm2(p["out_norm"], h))
        if dropout_rng is not None and self.cfg.dropout > 0.0:
            keep = 1.0 - self.cfg.dropout
            mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0).astype(h.dtype)
        h = self.conv2(p["out_conv"], h)
        sc = self.skip(p["skip_connection"], x) if self.has_shortcut else x
        return h + sc


class _NoContext:
    """Adapter: SelfAttention2D with the SpatialTransformer call signature."""

    def __init__(self, sa: SelfAttention2D):
        self.sa = sa

    def init(self, key):
        return self.sa.init(key)

    def __call__(self, p, x, context=None):
        return self.sa(p, x)


class UNetCond:
    """Build from config; __call__(params, x, timesteps, context=None, y=None)."""

    def __init__(self, cfg: UNetCondConfig):
        self.cfg = cfg
        g = self.graph = ChannelGraph()
        root = Scope(g)
        cs = cfg.channel_sizes

        def mkvar(name, default, **kw):
            return g.var(name, cs.get(name, default), **kw)

        self.attn_heads: Dict[str, int] = {}  # block path -> heads (converter)
        self.v_in = g.var("x_in", cfg.in_channels, prunable=False)
        self.v_out = g.var("x_out", cfg.out_channels, prunable=False)
        self.v_tproj = g.var("t_proj", cfg.model_channels, prunable=False)
        self.v_ctx = None
        if cfg.context_dim is not None:
            self.v_ctx = g.var("context", cfg.context_dim, prunable=False)

        ted = cfg.model_channels * 4
        self.v_temb_hidden = mkvar("time_embed/hidden", ted)
        self.v_temb = mkvar("time_embed/out", ted)
        te = root("time_embed")
        self.time_linear_1 = Linear(te("0"), self.v_tproj, self.v_temb_hidden)
        self.time_linear_2 = Linear(te("2"), self.v_temb_hidden, self.v_temb)
        self.has_label_emb = cfg.num_classes is not None
        if self.has_label_emb:
            root("label_emb").ref("weight", 1, self.v_temb, "out")

        def heads_dimhead(ch_default: int) -> Tuple[int, int]:
            # openaimodel.py:545-553 (legacy=True, spatial transformer):
            # dim_head = ch // num_heads (or num_head_channels if set)
            if cfg.num_head_channels != -1:
                return ch_default // cfg.num_head_channels, cfg.num_head_channels
            return cfg.num_heads, ch_default // cfg.num_heads

        def make_st(name: str, var: ChannelVar, ch_default: int):
            heads, dim_head = heads_dimhead(ch_default)
            inner_default = heads * dim_head
            self.attn_heads[name] = heads
            if not cfg.use_spatial_transformer:
                # openaimodel AttentionBlock (:278-341): GN + fused-qkv conv
                # + proj; functionally SelfAttention2D (the converter splits
                # the fused qkv weights). context is ignored.
                inner = mkvar(f"{name}/inner", inner_default)
                sa = SelfAttention2D(Scope(g, name), var, inner, heads,
                                     norm_num_groups=cfg.norm_num_groups,
                                     eps=1e-5)
                return _NoContext(sa)
            inner = mkvar(f"{name}/inner", inner_default)
            attn_vars = []
            for d in range(cfg.transformer_depth):
                a1 = mkvar(f"{name}/transformer_blocks/{d}/attn1/inner", inner_default)
                a2 = mkvar(f"{name}/transformer_blocks/{d}/attn2/inner", inner_default)
                ffv = mkvar(f"{name}/transformer_blocks/{d}/ff/inner", inner_default * 4)
                attn_vars.append((a1, a2, ffv))
            return SpatialTransformer(
                Scope(g, name), var, inner, heads, self.v_ctx,
                depth=cfg.transformer_depth, norm_num_groups=cfg.norm_num_groups,
                attn_inner_vars=attn_vars)

        mc = cfg.model_channels
        v0 = mkvar("input_blocks/0/conv/out", mc)
        self.conv_in = Conv2D(root("input_blocks/0/conv"), self.v_in, v0, 3, 1, 1)

        # input blocks: list of ('res', rb, st|None) or ('down', conv)
        self.input_blocks: List = []
        skips: List[ChannelVar] = [v0]
        skip_defaults = [mc]
        cur, cur_d = v0, mc
        ds = 1
        idx = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                name = f"input_blocks/{idx}"
                rb = _ResBlock(Scope(g, f"{name}/0"), g, cfg, cur, mult * mc,
                               self.v_temb, cur_d)
                cur, cur_d = rb.out, mult * mc
                st = None
                if ds in cfg.attention_resolutions:
                    st = make_st(f"{name}/1", cur, cur_d)
                self.input_blocks.append(("res", rb, st, idx))
                skips.append(cur)
                skip_defaults.append(cur_d)
                idx += 1
            if level != len(cfg.channel_mult) - 1:
                name = f"input_blocks/{idx}/0"
                if cfg.resblock_updown:
                    rb = _ResBlock(Scope(g, name), g, cfg, cur, cur_d,
                                   self.v_temb, cur_d, down=True)
                    self.input_blocks.append(("downres", rb, None, idx))
                    cur = rb.out
                else:
                    dsv = mkvar(f"{name}/out", cur_d)
                    conv = Conv2D(Scope(g, f"{name}/op"), cur, dsv, 3, 2, 1)
                    self.input_blocks.append(("down", conv, None, idx))
                    cur = dsv
                skips.append(cur)
                skip_defaults.append(cur_d)
                ds *= 2
                idx += 1

        # middle
        self.mid_res1 = _ResBlock(Scope(g, "middle_block/0"), g, cfg, cur, cur_d,
                                  self.v_temb, cur_d)
        self.mid_st = make_st("middle_block/1", self.mid_res1.out, cur_d)
        self.mid_res2 = _ResBlock(Scope(g, "middle_block/2"), g, cfg,
                                  self.mid_res1.out, cur_d, self.v_temb, cur_d)
        cur = self.mid_res2.out

        # output blocks
        self.output_blocks: List = []
        oidx = 0
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                skip_v = skips.pop()
                skip_d = skip_defaults.pop()
                name = f"output_blocks/{oidx}"
                rb = _ResBlock(Scope(g, f"{name}/0"), g, cfg,
                               CatVar((cur, skip_v)), mult * mc,
                               self.v_temb, cur_d + skip_d)
                cur, cur_d = rb.out, mult * mc
                st = None
                if ds in cfg.attention_resolutions:
                    st = make_st(f"{name}/1", cur, cur_d)
                up = None
                if level and i == cfg.num_res_blocks:
                    li = 2 if st is not None else 1
                    if cfg.resblock_updown:
                        up = _ResBlock(Scope(g, f"{name}/{li}"), g, cfg, cur,
                                       cur_d, self.v_temb, cur_d, up=True)
                        cur = up.out
                    else:
                        upv = mkvar(f"{name}/{li}/out", cur_d)
                        up = Conv2D(Scope(g, f"{name}/{li}/conv"), cur, upv,
                                    3, 1, 1)
                        cur = upv
                    ds //= 2
                self.output_blocks.append((rb, st, up, oidx))
                oidx += 1
        assert not skips

        self.out_norm = GroupNorm(root("out/0"), cur, cfg.norm_num_groups, 1e-5)
        self.out_conv = Conv2D(root("out/2"), cur, self.v_out, 3, 1, 1)

    def init(self, key) -> dict:
        cnt = [0]

        def nk():
            cnt[0] += 1
            return jax.random.fold_in(key, cnt[0])

        p: dict = {
            "time_embed": {"0": self.time_linear_1.init(nk()),
                           "2": self.time_linear_2.init(nk())},
            "input_blocks": {"0": {"conv": self.conv_in.init(nk())}},
            "middle_block": {"0": self.mid_res1.init(nk()),
                             "1": self.mid_st.init(nk()),
                             "2": self.mid_res2.init(nk())},
            "output_blocks": {},
            "out": {"0": self.out_norm.init(nk())},
        }
        if self.has_label_emb:
            p["label_emb"] = {"weight": jax.random.normal(
                nk(), (self.cfg.num_classes, self.v_temb.size)) * 0.02}
        for kind, a, b, idx in self.input_blocks:
            if kind == "res":
                blk = {"0": a.init(nk())}
                if b is not None:
                    blk["1"] = b.init(nk())
                p["input_blocks"][str(idx)] = blk
            elif kind == "downres":
                p["input_blocks"][str(idx)] = {"0": a.init(nk())}
            else:
                p["input_blocks"][str(idx)] = {"0": {"op": a.init(nk())}}
        for rb, st, up, oidx in self.output_blocks:
            blk = {"0": rb.init(nk())}
            if st is not None:
                blk["1"] = st.init(nk())
            if up is not None:
                li = "2" if st is not None else "1"
                if self.cfg.resblock_updown:
                    blk[li] = up.init(nk())
                else:
                    blk[li] = {"conv": up.init(nk())}
            p["output_blocks"][str(oidx)] = blk
        oc = self.out_conv.init(nk())
        # zero-init final conv (openaimodel zero_module on out)
        oc["kernel"] = jnp.zeros_like(oc["kernel"])
        oc["bias"] = jnp.zeros_like(oc["bias"])
        p["out"]["2"] = oc
        return p

    def __call__(self, params, x, timesteps, context=None, y=None, *,
                 dropout_rng=None):
        """x: (B,H,W,C) latent; timesteps: (B,); context: (B,N,context_dim)."""
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps[None], (x.shape[0],))
        # util.timestep_embedding: cos-then-sin, divisor half (no shift)
        t_emb = get_timestep_embedding(
            timesteps, cfg.model_channels, flip_sin_to_cos=True,
            downscale_freq_shift=0.0).astype(x.dtype)
        emb = self.time_linear_1(params["time_embed"]["0"], t_emb)
        emb = silu(emb)
        emb = self.time_linear_2(params["time_embed"]["2"], emb)
        if self.has_label_emb:
            if y is None:
                raise ValueError("y (class labels) required when num_classes set")
            emb = emb + params["label_emb"]["weight"][y].astype(emb.dtype)

        rngs = [None] * 96
        if dropout_rng is not None:
            rngs = list(jax.random.split(dropout_rng, 96))
        ri = [0]

        def next_rng():
            r = rngs[ri[0]]
            ri[0] += 1
            return r

        h = self.conv_in(params["input_blocks"]["0"]["conv"], x)
        hs = [h]
        for kind, a, b, idx in self.input_blocks:
            bp = params["input_blocks"][str(idx)]
            if kind == "res":
                h = a(bp["0"], h, emb, dropout_rng=next_rng())
                if b is not None:
                    h = b(bp["1"], h, context=context)
            elif kind == "downres":
                h = a(bp["0"], h, emb, dropout_rng=next_rng())
            else:
                h = a(bp["0"]["op"], h)
            hs.append(h)

        mp = params["middle_block"]
        h = self.mid_res1(mp["0"], h, emb, dropout_rng=next_rng())
        h = self.mid_st(mp["1"], h, context=context)
        h = self.mid_res2(mp["2"], h, emb, dropout_rng=next_rng())

        for rb, st, up, oidx in self.output_blocks:
            bp = params["output_blocks"][str(oidx)]
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = rb(bp["0"], h, emb, dropout_rng=next_rng())
            if st is not None:
                h = st(bp["1"], h, context=context)
            if up is not None:
                li = "2" if st is not None else "1"
                if cfg.resblock_updown:
                    h = up(bp[li], h, emb, dropout_rng=next_rng())
                else:
                    h = upsample_nearest_2x(h)
                    h = up(bp[li]["conv"], h)

        h = silu(self.out_norm(params["out"]["0"], h))
        return self.out_conv(params["out"]["2"], h)


def cin256_v2_config() -> UNetCondConfig:
    """configs/latent-diffusion/cin256-v2.yaml unet_config."""
    return UNetCondConfig(
        image_size=64, in_channels=3, out_channels=3, model_channels=192,
        num_res_blocks=2, attention_resolutions=(8, 4, 2),
        channel_mult=(1, 2, 3, 5), num_heads=1, transformer_depth=1,
        context_dim=512)


def celebahq_ldm_vq4_config() -> UNetCondConfig:
    """configs/latent-diffusion/celebahq-ldm-vq-4.yaml unet_config (the
    openaimodel form of CompVis/ldm-celebahq-256; ldm_prune.py prunes the
    diffusers form — ldm_celebahq256_config in unet2d.py)."""
    return UNetCondConfig(
        image_size=64, in_channels=3, out_channels=3, model_channels=224,
        num_res_blocks=2, attention_resolutions=(8, 4, 2),
        channel_mult=(1, 2, 3, 4), num_head_channels=32,
        context_dim=None, use_spatial_transformer=False)


def ffhq_ldm_vq4_config() -> UNetCondConfig:
    """configs/latent-diffusion/ffhq-ldm-vq-4.yaml (same UNet as celebahq)."""
    return celebahq_ldm_vq4_config()


def lsun_bedrooms_ldm_vq4_config() -> UNetCondConfig:
    """configs/latent-diffusion/lsun_bedrooms-ldm-vq-4.yaml (same UNet)."""
    return celebahq_ldm_vq4_config()


def lsun_churches_ldm_kl8_config() -> UNetCondConfig:
    """configs/latent-diffusion/lsun_churches-ldm-kl-8.yaml unet_config:
    KL-8 latents (32x32x4), scale-shift norm, resblock up/downsampling."""
    return UNetCondConfig(
        image_size=32, in_channels=4, out_channels=4, model_channels=192,
        num_res_blocks=2, attention_resolutions=(1, 2, 4, 8),
        channel_mult=(1, 2, 2, 4, 4), num_heads=8, context_dim=None,
        use_spatial_transformer=False, use_scale_shift_norm=True,
        resblock_updown=True)


def cin_ldm_vq_f8_config() -> UNetCondConfig:
    """configs/latent-diffusion/cin-ldm-vq-f8.yaml unet_config: the f8
    class-conditional ImageNet LDM (spatial transformer, ctx 512)."""
    return UNetCondConfig(
        image_size=32, in_channels=4, out_channels=4, model_channels=256,
        num_res_blocks=2, attention_resolutions=(4, 2, 1),
        channel_mult=(1, 2, 4), num_head_channels=32,
        transformer_depth=1, context_dim=512)


def txt2img_1p4B_config() -> UNetCondConfig:
    """configs/latent-diffusion/txt2img-1p4B-eval.yaml unet_config: the
    LAION-400M text-to-image LDM (KL-8 latents 32x32x4, ctx 1280 from a
    BERTEmbedder — models/text_encoder.py; legacy=False + num_heads=8 gives
    dim_head = ch // 8, same resolution rule as the other presets)."""
    return UNetCondConfig(
        image_size=32, in_channels=4, out_channels=4, model_channels=320,
        num_res_blocks=2, attention_resolutions=(4, 2, 1),
        channel_mult=(1, 2, 4, 4), num_heads=8, transformer_depth=1,
        context_dim=1280)


def bsr_sr_config() -> UNetCondConfig:
    """models/ldm/bsr_sr/config.yaml: BSR super-resolution LDM — concat-mode
    conditioning (in_channels 6 = 3 latent + 3 degraded-LR latent; sampled
    with make_concat_sampler like inpainting_big)."""
    return UNetCondConfig(
        image_size=64, in_channels=6, out_channels=3, model_channels=160,
        num_res_blocks=2, attention_resolutions=(16, 8),
        channel_mult=(1, 2, 2, 4), num_head_channels=32, context_dim=None,
        use_spatial_transformer=False)


def layout2img_openimages256_config() -> UNetCondConfig:
    """models/ldm/layout2img-openimages256/config.yaml: depth-3 spatial
    transformer over a BERT-style layout encoder (n_embed 512, 16 layers,
    vocab 8192, seq 92 — expressible as BERTEmbedderConfig)."""
    return UNetCondConfig(
        image_size=64, in_channels=3, out_channels=3, model_channels=128,
        num_res_blocks=2, attention_resolutions=(8, 4, 2),
        channel_mult=(1, 2, 3, 4), num_head_channels=32,
        transformer_depth=3, context_dim=512)


def semantic_synthesis256_config() -> UNetCondConfig:
    """models/ldm/semantic_synthesis256/config.yaml: concat-mode over a
    SpatialRescaler'd segmentation map (182ch -> 3ch, n_stages 2 — the
    models/latent_diffusion.SpatialRescaler cond stage). NOTE the yaml's
    attention_resolutions (32,16,8) never match the 3-level ds values
    (1,2,4), so the UNet has mid-block attention only — faithful."""
    return UNetCondConfig(
        image_size=64, in_channels=6, out_channels=3, model_channels=128,
        num_res_blocks=2, attention_resolutions=(32, 16, 8),
        channel_mult=(1, 4, 8), num_heads=8, context_dim=None,
        use_spatial_transformer=False)


def semantic_synthesis512_config() -> UNetCondConfig:
    """models/ldm/semantic_synthesis512/config.yaml (same UNet at 128-res
    latents)."""
    import dataclasses as _dc

    return _dc.replace(semantic_synthesis256_config(), image_size=128)


def text2img256_config() -> UNetCondConfig:
    """models/ldm/text2img256/config.yaml: LAION text-to-image at 256
    (BERTEmbedder n_embed 640, 32 layers cond stage)."""
    return UNetCondConfig(
        image_size=64, in_channels=3, out_channels=3, model_channels=192,
        num_res_blocks=2, attention_resolutions=(8, 4, 2),
        channel_mult=(1, 2, 3, 5), num_head_channels=32,
        transformer_depth=1, context_dim=640)


def rdm768_config() -> UNetCondConfig:
    """configs/retrieval-augmented-diffusion/768x768.yaml unet_config: the
    retrieval-augmented LDM sampled by scripts/knn2img.py (1.34B params;
    crossattn over CLIP ViT-L/14 embeddings, KL-f16 first stage at 48x48x16
    latents, scale_factor 0.22765929, linear_end 0.015)."""
    return UNetCondConfig(
        image_size=48, in_channels=16, out_channels=16, model_channels=448,
        num_res_blocks=2, attention_resolutions=(4, 2, 1),
        channel_mult=(1, 2, 3, 4), num_head_channels=32,
        transformer_depth=1, context_dim=768)


def inpainting_big_config() -> UNetCondConfig:
    """models/ldm/inpainting_big/config.yaml unet_config: concat-mode
    conditioning — in_channels 7 = 3 latent + 3 masked-image latent + 1
    downsampled mask (scripts/inpaint.py:76-80); AttentionBlock UNet with
    resblock up/downsampling, VQ-f4-noattn first stage."""
    return UNetCondConfig(
        image_size=64, in_channels=7, out_channels=3, model_channels=256,
        num_res_blocks=2, attention_resolutions=(8, 4, 2),
        channel_mult=(1, 2, 3, 4), num_heads=8, context_dim=None,
        use_spatial_transformer=False, resblock_updown=True)


def tiny_cond_config() -> UNetCondConfig:
    return UNetCondConfig(
        image_size=8, in_channels=3, out_channels=3, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, transformer_depth=1, context_dim=16, norm_num_groups=8)
