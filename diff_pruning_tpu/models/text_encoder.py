"""BERTEmbedder text encoder for the txt2img-1p4B LDM.

TPU-native rebuild of the reference's conditioning stack for
configs/latent-diffusion/txt2img-1p4B-eval.yaml:
  - ldm_exp/ldm/modules/encoders/modules.py:80-104 (BERTEmbedder) over the
    vendored x-transformers ``TransformerWrapper(num_tokens, max_seq_len,
    Encoder(dim, depth))`` (ldm/modules/x_transformer.py:548-641).
  - Encoder defaults (x_transformer.py:370-478): pre-norm LayerNorm,
    ('a','f') per depth, plain residuals, heads=8, dim_head=64 (so the
    attention inner dim is 512 independent of the 1280 residual stream),
    FF = Linear(d, 4d) + exact GELU + Linear(4d, d), final LayerNorm, and a
    ``to_logits`` Linear that exists (and counts parameters) even though
    BERTEmbedder always asks for embeddings.

Beyond the reference: the whole encoder is ChannelGraph-registered — the
residual stream, every attention inner dim, and every FF inner dim are
ChannelVars — so the text encoder is prunable with the same machinery as
the UNets (the reference never structures its text encoder for pruning).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict

import jax
import jax.numpy as jnp

from ..pruning.graph import ChannelGraph
from .layers import CrossAttention, LayerNorm, Linear, Scope


@dataclasses.dataclass(frozen=True)
class BERTEmbedderConfig:
    """BERTEmbedder(n_embed=1280, n_layer=32) in the txt2img yaml."""

    n_embed: int = 1280
    n_layer: int = 32
    vocab_size: int = 30522
    max_seq_len: int = 77
    heads: int = 8
    dim_head: int = 64  # x_transformer.py:12 DEFAULT_DIM_HEAD
    ff_mult: int = 4
    channel_sizes: Dict[str, int] = dataclasses.field(default_factory=dict)

    def with_channel_sizes(self, sizes: Dict[str, int]) -> "BERTEmbedderConfig":
        return dataclasses.replace(self, channel_sizes=dict(sizes))

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "BERTEmbedderConfig":
        return cls(**json.loads(s))


def bert_txt2img_config() -> BERTEmbedderConfig:
    """cond_stage_config of txt2img-1p4B-eval.yaml (n_embed 1280, 32 layers)."""
    return BERTEmbedderConfig()


def tiny_bert_config() -> BERTEmbedderConfig:
    return BERTEmbedderConfig(n_embed=16, n_layer=2, vocab_size=40,
                              max_seq_len=11, heads=2, dim_head=4)


class BERTEmbedder:
    """Graph-registered functional transformer encoder over token ids."""

    def __init__(self, cfg: BERTEmbedderConfig):
        self.cfg = cfg
        g = ChannelGraph()
        self.graph = g
        cs = cfg.channel_sizes

        def mk(name: str, default: int, **kw):
            return g.var(name, cs.get(name, default), **kw)

        dim = mk("dim", cfg.n_embed)
        self.dim = dim
        s = Scope(g)
        g.ref("token_emb/embedding", 1, dim, "out")
        g.ref("pos_emb/embedding", 1, dim, "out")
        self.blocks = []
        for i in range(cfg.n_layer):
            bs = s(f"layers/{i}")
            inner = mk(f"attn{i}.inner", cfg.heads * cfg.dim_head)
            ffin = mk(f"ff{i}.inner", cfg.n_embed * cfg.ff_mult)
            self.blocks.append((
                LayerNorm(bs("attn_norm"), dim),
                CrossAttention(bs("attn"), dim, inner, cfg.heads),
                LayerNorm(bs("ff_norm"), dim),
                Linear(bs("ff/fc1"), dim, ffin),
                Linear(bs("ff/fc2"), ffin, dim),
            ))
        self.final_norm = LayerNorm(s("norm"), dim)
        vocab = mk("vocab", cfg.vocab_size, prunable=False)
        self.to_logits = Linear(s("to_logits"), dim, vocab)

    def init(self, key):
        cnt = [0]

        def nk():
            cnt[0] += 1
            return jax.random.fold_in(key, cnt[0])

        cfg = self.cfg
        d = self.dim.size
        # token/pos embeddings: normal(std=0.02) (x_transformer.py:32,648)
        p = {
            "token_emb": {"embedding": 0.02 * jax.random.normal(
                nk(), (cfg.vocab_size, d))},
            "pos_emb": {"embedding": 0.02 * jax.random.normal(
                nk(), (cfg.max_seq_len, d))},
            "layers": {},
            "norm": self.final_norm.init(nk()),
            "to_logits": self.to_logits.init(nk()),
        }
        for i, (na, attn, nf, fc1, fc2) in enumerate(self.blocks):
            p["layers"][str(i)] = {
                "attn_norm": na.init(nk()), "attn": attn.init(nk()),
                "ff_norm": nf.init(nk()),
                "ff": {"fc1": fc1.init(nk()), "fc2": fc2.init(nk())},
            }
        return p

    def __call__(self, p, tokens, *, return_embeddings: bool = True):
        """tokens: (B, N) int ids -> (B, N, dim) embeddings (or vocab logits)."""
        n = tokens.shape[1]
        x = jnp.take(p["token_emb"]["embedding"], tokens, axis=0)
        x = x + p["pos_emb"]["embedding"][None, :n, :].astype(x.dtype)
        for i, (na, attn, nf, fc1, fc2) in enumerate(self.blocks):
            bp = p["layers"][str(i)]
            x = attn(bp["attn"], na(bp["attn_norm"], x)) + x
            h = fc1(bp["ff"]["fc1"], nf(bp["ff_norm"], x))
            h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU default
            x = fc2(bp["ff"]["fc2"], h) + x
        x = self.final_norm(p["norm"], x)
        if return_embeddings:
            return x
        return self.to_logits(p["to_logits"], x)
