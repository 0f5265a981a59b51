"""BERTEmbedder text encoder (txt2img-1p4B cond stage): forward parity vs
the vendored x-transformers TransformerWrapper, param-count pins, pruning,
and the offline WordPiece tokenizer vs transformers' BertTokenizer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.text_encoder import (
    BERTEmbedder,
    BERTEmbedderConfig,
    bert_txt2img_config,
    tiny_bert_config,
)
from diff_pruning_tpu.utils.convert import bert_embedder_state_dict_to_params

torch = pytest.importorskip("torch")


def _install_omegaconf_stub():
    """openaimodel imports omegaconf.listconfig.ListConfig; stub it (same
    shim as test_unet_cond_parity._ref_unet)."""
    import importlib.machinery
    import sys
    import types

    if "omegaconf" in sys.modules:
        return
    om = types.ModuleType("omegaconf")
    lc = types.ModuleType("omegaconf.listconfig")
    lc.ListConfig = list
    om.listconfig = lc
    om.__version__ = "0.0.0-stub"
    om.__spec__ = importlib.machinery.ModuleSpec("omegaconf", None)
    lc.__spec__ = importlib.machinery.ModuleSpec("omegaconf.listconfig", None)
    sys.modules["omegaconf"] = om
    sys.modules["omegaconf.listconfig"] = lc


def _ref_transformer(cfg: BERTEmbedderConfig):
    import sys

    if "/root/reference/ldm_exp" not in sys.path:
        sys.path.insert(0, "/root/reference/ldm_exp")
    from ldm.modules.x_transformer import Encoder, TransformerWrapper

    return TransformerWrapper(
        num_tokens=cfg.vocab_size, max_seq_len=cfg.max_seq_len,
        attn_layers=Encoder(dim=cfg.n_embed, depth=cfg.n_layer,
                            heads=cfg.heads, attn_dim_head=cfg.dim_head))


def _n_params(tree):
    return sum(int(np.prod(v.shape)) for v in jax.tree.leaves(tree))


def test_bert_embedder_parity_vs_reference():
    cfg = tiny_bert_config()
    torch.manual_seed(0)
    ref = _ref_transformer(cfg).eval()
    model = BERTEmbedder(cfg)
    params = bert_embedder_state_dict_to_params(ref.state_dict())
    model.graph.validate(params)
    assert _n_params(params) == sum(p.numel() for p in ref.parameters())

    tokens = np.array([[1, 5, 9, 30, 2], [3, 3, 0, 7, 39]], np.int32)
    with torch.no_grad():
        # BERTEmbedder always asks for embeddings (modules.py:98-100)
        y_ref = ref(torch.from_numpy(tokens.astype(np.int64)),
                    return_embeddings=True).numpy()
    with jax.default_matmul_precision("float32"):
        y = np.asarray(model(params, jnp.asarray(tokens)))
    np.testing.assert_allclose(y, y_ref, atol=2e-5, rtol=2e-5)
    # logits head exists and matches too (it carries 39M params at full size)
    with torch.no_grad():
        l_ref = ref(torch.from_numpy(tokens.astype(np.int64))).numpy()
    with jax.default_matmul_precision("float32"):
        l = np.asarray(model(params, jnp.asarray(tokens), return_embeddings=False))
    np.testing.assert_allclose(l, l_ref, atol=2e-5, rtol=2e-5)


def test_bert_txt2img_param_count_pin():
    """Full-size BERTEmbedder(1280, 32): pinned against the reference
    instantiated on torch's meta device (no memory)."""
    cfg = bert_txt2img_config()
    model = BERTEmbedder(cfg)
    # shape-only init: counting params needs no values, and the full-size
    # materialized init alone cost ~20s of suite time (r5 budget pass)
    params = jax.eval_shape(lambda k: model.init(k), jax.random.key(0))
    model.graph.validate(params)
    n = sum(int(np.prod(l.shape))
            for l in jax.tree.leaves(params))
    with torch.device("meta"):
        ref = _ref_transformer(cfg)
    assert n == sum(p.numel() for p in ref.parameters())


def test_bert_embedder_prune_rebuild():
    from diff_pruning_tpu.pruning.importance import make_importance
    from diff_pruning_tpu.pruning.pruner import apply_pruning, prune

    cfg = tiny_bert_config()
    model = BERTEmbedder(cfg)
    params = model.init(jax.random.key(0))
    res = prune(model.graph, params, make_importance("magnitude"), sparsity=0.5)
    p2 = apply_pruning(params, model.graph, res)
    m2 = BERTEmbedder(cfg.with_channel_sizes(res.channel_sizes))
    m2.graph.validate(p2)
    y = m2(p2, jnp.zeros((2, 5), jnp.int32))
    assert y.shape == (2, 5, res.channel_sizes["dim"])
    # heads constraint: attention inners stay divisible by heads
    for i in range(cfg.n_layer):
        assert res.channel_sizes[f"attn{i}.inner"] % cfg.heads == 0


def test_txt2img_unet_preset_params():
    """txt2img-1p4B-eval.yaml unet_config param count, pinned against the
    reference openaimodel UNetModel on torch's meta device."""
    import sys

    from diff_pruning_tpu.models.unet_cond import UNetCond, txt2img_1p4B_config

    cfg = txt2img_1p4B_config()
    m = UNetCond(cfg)
    # shapes only — no need to materialize 872M params to count them
    p = jax.eval_shape(m.init, jax.random.key(0))
    n = _n_params(p)

    _install_omegaconf_stub()
    if "/root/reference/ldm_exp" not in sys.path:
        sys.path.insert(0, "/root/reference/ldm_exp")
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    with torch.device("meta"):
        ref = UNetModel(
            image_size=32, in_channels=4, out_channels=4, model_channels=320,
            num_res_blocks=2, attention_resolutions=[4, 2, 1],
            channel_mult=[1, 2, 4, 4], num_heads=8,
            use_spatial_transformer=True, transformer_depth=1,
            context_dim=1280, legacy=False)
    assert n == sum(p_.numel() for p_ in ref.parameters())


def test_latent_diffusion_text_cond_stage():
    """LatentDiffusion with a BERTEmbedder cond stage: token ids -> context
    -> conditional UNet."""
    from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
    from diff_pruning_tpu.models.unet_cond import UNetCondConfig

    bcfg = tiny_bert_config()
    ucfg = UNetCondConfig(
        image_size=8, in_channels=3, out_channels=3, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, transformer_depth=1, context_dim=bcfg.n_embed,
        norm_num_groups=8)
    ld = LatentDiffusion(ucfg, cond_stage=BERTEmbedder(bcfg))
    params = ld.init(jax.random.key(0))
    tokens = jnp.zeros((2, 7), jnp.int32)
    ctx = ld.get_learned_conditioning(params, tokens)
    assert ctx.shape == (2, 7, bcfg.n_embed)
    loss = ld.get_loss_at_t(params, jnp.zeros((2, 8, 8, 3)), tokens,
                            jnp.array([5, 9]), jnp.ones((2, 8, 8, 3)))
    assert np.isfinite(float(loss))


def test_wordpiece_tokenizer_vs_transformers(tmp_path):
    """Offline WordPiece vs transformers' BertTokenizer built from the SAME
    local vocab file (no network)."""
    from diff_pruning_tpu.data.tokenizer import BERTTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "the", "un", "##aff", "##able", "##ly", "cat", "sat",
             "on", "mat", "hello", "world", ",", ".", "!", "run", "##ning",
             "deep", "##er", "caf", "##e"]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n")
    tok = BERTTokenizer(str(vf), max_length=16)

    texts = [
        "The cat sat on the mat.",
        "Hello, world! unaffable running deeper",
        "Café cat",          # accent stripping
        "zzz unknownword cat",    # [UNK] fallback
        "",
    ]
    ours = tok(texts)

    transformers = pytest.importorskip("transformers")
    ref_tok = transformers.BertTokenizer(str(vf), do_lower_case=True)
    ref = ref_tok(texts, truncation=True, max_length=16,
                  padding="max_length", return_tensors="np")["input_ids"]
    np.testing.assert_array_equal(ours, ref.astype(np.int32))
