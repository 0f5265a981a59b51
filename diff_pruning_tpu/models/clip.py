"""CLIP text & vision towers in JAX — the reference's retrieval/conditioning
encoders (`ldm_exp/ldm/modules/encoders/modules.py:138-201`
FrozenCLIPTextEmbedder / FrozenClipImageEmbedder over OpenAI `clip.load`,
driven by `scripts/knn2img.py` and `scripts/train_searcher.py`).

Architecture = OpenAI CLIP (ViT-L/14 by default): pre-LN transformer with
QuickGELU MLPs and biased q/k/v; text tower is causal with EOT-token pooling
and a learned projection; vision tower is a patch-conv ViT with class token,
ln_pre/ln_post and a projection. NHWC images / (in, out) linear kernels like
the rest of the framework; ChannelGraph-registered so the towers are
prunable with the same machinery as everything else (beyond the reference).

Weights: OpenAI's ViT-L/14 download is zero-egress-blocked; convert a local
copy with `tools/convert_checkpoints.py clip`. Random init supported for
architecture tests. Parity is tested against transformers' CLIP modules
(same architecture, hidden_act='quick_gelu') with transplanted weights.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..pruning.graph import ChannelGraph
from .layers import LayerNorm, Linear, Scope


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """Both towers (clip.model.CLIP ctor args for ViT-L/14)."""

    # text
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12
    # vision
    image_size: int = 224
    patch_size: int = 14
    vision_width: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    # shared joint space
    embed_dim: int = 768
    channel_sizes: Dict[str, int] = dataclasses.field(default_factory=dict)

    def with_channel_sizes(self, sizes: Dict[str, int]) -> "CLIPConfig":
        return dataclasses.replace(self, channel_sizes=dict(sizes))

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "CLIPConfig":
        return cls(**json.loads(s))


def clip_vit_l14_config() -> CLIPConfig:
    """The reference's retriever_version='ViT-L/14' (knn2img.py:143)."""
    return CLIPConfig()


def tiny_clip_config() -> CLIPConfig:
    return CLIPConfig(vocab_size=50, context_length=10, text_width=16,
                      text_layers=2, text_heads=2, image_size=16,
                      patch_size=8, vision_width=16, vision_layers=2,
                      vision_heads=2, embed_dim=12)


class _ClipBlock:
    """Pre-LN residual block: x += attn(ln_1(x)); x += mlp(ln_2(x))."""

    def __init__(self, g, scope: Scope, dim, inner, ffin, heads: int,
                 causal: bool):
        self.heads = heads
        self.causal = causal
        self.inner = inner
        inner.require_group_div(heads)
        self.ln_1 = LayerNorm(scope("ln_1"), dim)
        self.q = Linear(scope("attn/q"), dim, inner)
        self.k = Linear(scope("attn/k"), dim, inner)
        self.v = Linear(scope("attn/v"), dim, inner)
        self.out = Linear(scope("attn/out"), inner, dim)
        self.ln_2 = LayerNorm(scope("ln_2"), dim)
        self.c_fc = Linear(scope("mlp/c_fc"), dim, ffin)
        self.c_proj = Linear(scope("mlp/c_proj"), ffin, dim)

    def init(self, key):
        ks = jax.random.split(key, 7)
        return {"ln_1": self.ln_1.init(ks[0]),
                "attn": {"q": self.q.init(ks[1]), "k": self.k.init(ks[2]),
                         "v": self.v.init(ks[3]), "out": self.out.init(ks[4])},
                "ln_2": self.ln_2.init(ks[5]),
                "mlp": {"c_fc": self.c_fc.init(ks[6]),
                        "c_proj": self.c_proj.init(jax.random.fold_in(key, 9))}}

    def __call__(self, p, x):
        b, n, _ = x.shape
        h = self.ln_1(p["ln_1"], x)
        q = self.q(p["attn"]["q"], h)
        k = self.k(p["attn"]["k"], h)
        v = self.v(p["attn"]["v"], h)
        nh = self.heads
        dh = self.inner.size // nh

        def split(t):
            return t.reshape(b, n, nh, dh).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                         preferred_element_type=jnp.float32) * (dh ** -0.5)
        if self.causal:
            mask = jnp.tril(jnp.ones((n, n), bool))
            sim = jnp.where(mask[None, None], sim, -jnp.inf)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, self.inner.size)
        x = x + self.out(p["attn"]["out"], o)
        h = self.c_fc(p["mlp"]["c_fc"], self.ln_2(p["ln_2"], x))
        return x + self.c_proj(p["mlp"]["c_proj"], quick_gelu(h))


class CLIP:
    """Both towers; `encode_text` / `encode_image` mirror clip.model.CLIP."""

    def __init__(self, cfg: CLIPConfig):
        self.cfg = cfg
        g = self.graph = ChannelGraph()
        cs = cfg.channel_sizes

        def mk(name, default, **kw):
            return g.var(name, cs.get(name, default), **kw)

        s = Scope(g)
        # text tower
        td = mk("text/dim", cfg.text_width)
        self.v_embed = mk("embed", cfg.embed_dim, prunable=False)
        g.ref("text/token_embedding", 1, td, "out")
        g.ref("text/positional_embedding", 1, td, "out")
        self.text_blocks = []
        for i in range(cfg.text_layers):
            inner = mk(f"text/attn{i}.inner", cfg.text_width)
            ffin = mk(f"text/ff{i}.inner", 4 * cfg.text_width)
            self.text_blocks.append(_ClipBlock(
                g, s(f"text/resblocks/{i}"), td, inner, ffin,
                cfg.text_heads, causal=True))
        self.text_ln_final = LayerNorm(s("text/ln_final"), td)
        g.ref("text/projection", 0, td, "in")
        g.ref("text/projection", 1, self.v_embed, "out")
        # vision tower
        vd = mk("vision/dim", cfg.vision_width)
        g.ref("vision/conv1/kernel", 3, vd, "out")
        g.ref("vision/class_embedding", 0, vd, "out")
        g.ref("vision/positional_embedding", 1, vd, "out")
        self.vision_ln_pre = LayerNorm(s("vision/ln_pre"), vd)
        self.vision_blocks = []
        for i in range(cfg.vision_layers):
            inner = mk(f"vision/attn{i}.inner", cfg.vision_width)
            ffin = mk(f"vision/ff{i}.inner", 4 * cfg.vision_width)
            self.vision_blocks.append(_ClipBlock(
                g, s(f"vision/resblocks/{i}"), vd, inner, ffin,
                cfg.vision_heads, causal=False))
        self.vision_ln_post = LayerNorm(s("vision/ln_post"), vd)
        g.ref("vision/projection", 0, vd, "in")
        g.ref("vision/projection", 1, self.v_embed, "out")
        self.td, self.vd = td, vd

    def init(self, key):
        cnt = [0]

        def nk():
            cnt[0] += 1
            return jax.random.fold_in(key, cnt[0])

        cfg = self.cfg
        td, vd = self.td.size, self.vd.size
        p = {"text": {
            "token_embedding": 0.02 * jax.random.normal(
                nk(), (cfg.vocab_size, td)),
            "positional_embedding": 0.01 * jax.random.normal(
                nk(), (cfg.context_length, td)),
            "resblocks": {str(i): b.init(nk())
                          for i, b in enumerate(self.text_blocks)},
            "ln_final": self.text_ln_final.init(nk()),
            "projection": (td ** -0.5) * jax.random.normal(
                nk(), (td, cfg.embed_dim)),
        }}
        n_patches = (cfg.image_size // cfg.patch_size) ** 2
        p["vision"] = {
            "conv1": {"kernel": (vd ** -0.5) * jax.random.normal(
                nk(), (cfg.patch_size, cfg.patch_size, 3, vd))},
            "class_embedding": (vd ** -0.5) * jax.random.normal(nk(), (vd,)),
            "positional_embedding": (vd ** -0.5) * jax.random.normal(
                nk(), (n_patches + 1, vd)),
            "ln_pre": self.vision_ln_pre.init(nk()),
            "resblocks": {str(i): b.init(nk())
                          for i, b in enumerate(self.vision_blocks)},
            "ln_post": self.vision_ln_post.init(nk()),
            "projection": (vd ** -0.5) * jax.random.normal(
                nk(), (vd, cfg.embed_dim)),
        }
        p["logit_scale"] = jnp.asarray(np.log(1 / 0.07), jnp.float32)
        return p

    def encode_text(self, p, tokens):
        """(B, N) int ids -> (B, embed_dim). EOT pooling = features at the
        argmax token id (clip.model.CLIP.encode_text — EOT is the highest
        id in every tokenized sequence)."""
        tp = p["text"]
        n = tokens.shape[1]
        x = jnp.take(tp["token_embedding"], tokens, axis=0)
        x = x + tp["positional_embedding"][None, :n].astype(x.dtype)
        for i, b in enumerate(self.text_blocks):
            x = b(tp["resblocks"][str(i)], x)
        x = self.text_ln_final(tp["ln_final"], x)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        return pooled @ tp["projection"].astype(pooled.dtype)

    def encode_image(self, p, images):
        """(B, H, W, 3) preprocessed images -> (B, embed_dim)."""
        vp = p["vision"]
        ps = self.cfg.patch_size
        x = jax.lax.conv_general_dilated(
            images, vp["conv1"]["kernel"].astype(images.dtype),
            (ps, ps), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        cls = jnp.broadcast_to(vp["class_embedding"].astype(x.dtype),
                               (b, 1, c))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + vp["positional_embedding"][None].astype(x.dtype)
        x = self.vision_ln_pre(vp["ln_pre"], x)
        for i, blk in enumerate(self.vision_blocks):
            x = blk(vp["resblocks"][str(i)], x)
        pooled = self.vision_ln_post(vp["ln_post"], x[:, 0])
        return pooled @ vp["projection"].astype(pooled.dtype)


# ---------------------------------------------------------------------------
# FrozenCLIPTextEmbedder / FrozenClipImageEmbedder equivalents

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_text_embed(model: CLIP, params, tokens, *, normalize: bool = True,
                    n_repeat: int = 1):
    """FrozenCLIPTextEmbedder.encode (modules.py:155-167): encode_text,
    L2-normalize, (B, D) -> (B, n_repeat, D) for cross-attention."""
    z = model.encode_text(params, tokens)
    if normalize:
        z = z / jnp.linalg.norm(z, axis=1, keepdims=True)
    return jnp.repeat(z[:, None, :], n_repeat, axis=1)


def clip_preprocess_images(images, image_size: int = 224):
    """FrozenClipImageEmbedder.preprocess (modules.py:189-197): [-1,1] NHWC
    -> resized to 224, [0,1], CLIP-normalized. Bicubic resize via
    jax.image (kornia align_corners=True differs at sub-pixel level; the
    retrieval embeddings are insensitive to that — documented tradeoff)."""
    b, h, w, c = images.shape
    if (h, w) != (image_size, image_size):
        images = jax.image.resize(images, (b, image_size, image_size, c),
                                  method="cubic")
    x01 = (images + 1.0) / 2.0
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype)
    return (x01 - mean) / std


def clip_image_embed(model: CLIP, params, images):
    """FrozenClipImageEmbedder.forward: images in [-1,1] NHWC."""
    return model.encode_image(params, clip_preprocess_images(
        images, model.cfg.image_size))


# ---------------------------------------------------------------------------
# converter (OpenAI clip state_dict layout — what `clip.load` saves)


def openai_clip_state_dict_to_params(sd: Mapping[str, "object"]) -> dict:
    """OpenAI CLIP state_dict -> params pytree (both towers).

    in_proj (3W, W) fused attention weights split into q/k/v in torch
    MultiheadAttention order; (out, in) linears transposed to (in, out);
    the projection Parameters (width, embed) keep their layout (applied as
    x @ proj on both sides).
    """

    def arr(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    def block(prefix):
        inw = arr(f"{prefix}.attn.in_proj_weight")
        inb = arr(f"{prefix}.attn.in_proj_bias")
        w = inw.shape[0] // 3
        qw, kw, vw = inw[:w], inw[w:2 * w], inw[2 * w:]
        qb, kb, vb = inb[:w], inb[w:2 * w], inb[2 * w:]
        return {
            "ln_1": {"scale": arr(f"{prefix}.ln_1.weight"),
                     "bias": arr(f"{prefix}.ln_1.bias")},
            "attn": {
                "q": {"kernel": qw.T, "bias": qb},
                "k": {"kernel": kw.T, "bias": kb},
                "v": {"kernel": vw.T, "bias": vb},
                "out": {"kernel": arr(f"{prefix}.attn.out_proj.weight").T,
                        "bias": arr(f"{prefix}.attn.out_proj.bias")},
            },
            "ln_2": {"scale": arr(f"{prefix}.ln_2.weight"),
                     "bias": arr(f"{prefix}.ln_2.bias")},
            "mlp": {
                "c_fc": {"kernel": arr(f"{prefix}.mlp.c_fc.weight").T,
                         "bias": arr(f"{prefix}.mlp.c_fc.bias")},
                "c_proj": {"kernel": arr(f"{prefix}.mlp.c_proj.weight").T,
                           "bias": arr(f"{prefix}.mlp.c_proj.bias")},
            },
        }

    def count_blocks(fmt):
        i = 0
        while fmt.format(i) + ".ln_1.weight" in sd:
            i += 1
        return i

    p = {"text": {
        "token_embedding": arr("token_embedding.weight"),
        "positional_embedding": arr("positional_embedding"),
        "resblocks": {str(i): block(f"transformer.resblocks.{i}")
                      for i in range(count_blocks("transformer.resblocks.{}"))},
        "ln_final": {"scale": arr("ln_final.weight"),
                     "bias": arr("ln_final.bias")},
        "projection": arr("text_projection"),
    }}
    if "visual.conv1.weight" in sd:
        p["vision"] = {
            "conv1": {"kernel": arr("visual.conv1.weight").transpose(2, 3, 1, 0)},
            "class_embedding": arr("visual.class_embedding"),
            "positional_embedding": arr("visual.positional_embedding"),
            "ln_pre": {"scale": arr("visual.ln_pre.weight"),
                       "bias": arr("visual.ln_pre.bias")},
            "resblocks": {str(i): block(f"visual.transformer.resblocks.{i}")
                          for i in range(
                              count_blocks("visual.transformer.resblocks.{}"))},
            "ln_post": {"scale": arr("visual.ln_post.weight"),
                        "bias": arr("visual.ln_post.bias")},
            "projection": arr("visual.proj"),
        }
    if "logit_scale" in sd:
        p["logit_scale"] = jnp.asarray(arr("logit_scale"))
    return jax.tree.map(jnp.asarray, p)
