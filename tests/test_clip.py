"""CLIP towers: parity vs transformers' CLIP modules (same architecture as
OpenAI clip, hidden_act='quick_gelu') with transplanted weights, via the
OpenAI-layout converter; embedder semantics; graph registration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.models.clip import (CLIP, clip_image_embed,
                                          clip_text_embed,
                                          clip_vit_l14_config,
                                          openai_clip_state_dict_to_params,
                                          tiny_clip_config)

torch = pytest.importorskip("torch")


def _hf_models(cfg):
    from transformers import (CLIPTextConfig, CLIPTextModelWithProjection,
                              CLIPVisionConfig, CLIPVisionModelWithProjection)

    torch.manual_seed(0)
    tc = CLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.text_width,
        intermediate_size=4 * cfg.text_width,
        num_hidden_layers=cfg.text_layers,
        num_attention_heads=cfg.text_heads,
        max_position_embeddings=cfg.context_length,
        projection_dim=cfg.embed_dim, hidden_act="quick_gelu",
        eos_token_id=cfg.vocab_size - 1, bos_token_id=cfg.vocab_size - 2)
    vc = CLIPVisionConfig(
        hidden_size=cfg.vision_width, intermediate_size=4 * cfg.vision_width,
        num_hidden_layers=cfg.vision_layers,
        num_attention_heads=cfg.vision_heads, image_size=cfg.image_size,
        patch_size=cfg.patch_size, projection_dim=cfg.embed_dim,
        hidden_act="quick_gelu")
    return (CLIPTextModelWithProjection(tc).eval(),
            CLIPVisionModelWithProjection(vc).eval())


def _openai_sd_from_hf(text, vision):
    """Assemble an OpenAI-clip-layout state dict from the HF modules (the
    inverse of transformers' own conversion script)."""
    sd = {}
    tm = text.text_model
    sd["token_embedding.weight"] = tm.embeddings.token_embedding.weight
    sd["positional_embedding"] = tm.embeddings.position_embedding.weight
    for i, layer in enumerate(tm.encoder.layers):
        pre = f"transformer.resblocks.{i}"
        sd[f"{pre}.ln_1.weight"] = layer.layer_norm1.weight
        sd[f"{pre}.ln_1.bias"] = layer.layer_norm1.bias
        sd[f"{pre}.attn.in_proj_weight"] = torch.cat(
            [layer.self_attn.q_proj.weight, layer.self_attn.k_proj.weight,
             layer.self_attn.v_proj.weight], 0)
        sd[f"{pre}.attn.in_proj_bias"] = torch.cat(
            [layer.self_attn.q_proj.bias, layer.self_attn.k_proj.bias,
             layer.self_attn.v_proj.bias], 0)
        sd[f"{pre}.attn.out_proj.weight"] = layer.self_attn.out_proj.weight
        sd[f"{pre}.attn.out_proj.bias"] = layer.self_attn.out_proj.bias
        sd[f"{pre}.ln_2.weight"] = layer.layer_norm2.weight
        sd[f"{pre}.ln_2.bias"] = layer.layer_norm2.bias
        sd[f"{pre}.mlp.c_fc.weight"] = layer.mlp.fc1.weight
        sd[f"{pre}.mlp.c_fc.bias"] = layer.mlp.fc1.bias
        sd[f"{pre}.mlp.c_proj.weight"] = layer.mlp.fc2.weight
        sd[f"{pre}.mlp.c_proj.bias"] = layer.mlp.fc2.bias
    sd["ln_final.weight"] = tm.final_layer_norm.weight
    sd["ln_final.bias"] = tm.final_layer_norm.bias
    sd["text_projection"] = text.text_projection.weight.T
    vm = vision.vision_model
    sd["visual.conv1.weight"] = vm.embeddings.patch_embedding.weight
    sd["visual.class_embedding"] = vm.embeddings.class_embedding
    sd["visual.positional_embedding"] = vm.embeddings.position_embedding.weight
    sd["visual.ln_pre.weight"] = vm.pre_layrnorm.weight
    sd["visual.ln_pre.bias"] = vm.pre_layrnorm.bias
    for i, layer in enumerate(vm.encoder.layers):
        pre = f"visual.transformer.resblocks.{i}"
        sd[f"{pre}.ln_1.weight"] = layer.layer_norm1.weight
        sd[f"{pre}.ln_1.bias"] = layer.layer_norm1.bias
        sd[f"{pre}.attn.in_proj_weight"] = torch.cat(
            [layer.self_attn.q_proj.weight, layer.self_attn.k_proj.weight,
             layer.self_attn.v_proj.weight], 0)
        sd[f"{pre}.attn.in_proj_bias"] = torch.cat(
            [layer.self_attn.q_proj.bias, layer.self_attn.k_proj.bias,
             layer.self_attn.v_proj.bias], 0)
        sd[f"{pre}.attn.out_proj.weight"] = layer.self_attn.out_proj.weight
        sd[f"{pre}.attn.out_proj.bias"] = layer.self_attn.out_proj.bias
        sd[f"{pre}.ln_2.weight"] = layer.layer_norm2.weight
        sd[f"{pre}.ln_2.bias"] = layer.layer_norm2.bias
        sd[f"{pre}.mlp.c_fc.weight"] = layer.mlp.fc1.weight
        sd[f"{pre}.mlp.c_proj.weight"] = layer.mlp.fc2.weight
        sd[f"{pre}.mlp.c_fc.bias"] = layer.mlp.fc1.bias
        sd[f"{pre}.mlp.c_proj.bias"] = layer.mlp.fc2.bias
    sd["visual.ln_post.weight"] = vm.post_layernorm.weight
    sd["visual.ln_post.bias"] = vm.post_layernorm.bias
    sd["visual.proj"] = vision.visual_projection.weight.T
    sd["logit_scale"] = torch.tensor(np.log(1 / 0.07))
    return {k: v.detach() for k, v in sd.items()}


@pytest.fixture(scope="module")
def towers():
    cfg = tiny_clip_config()
    text, vision = _hf_models(cfg)
    sd = _openai_sd_from_hf(text, vision)
    params = openai_clip_state_dict_to_params(sd)
    model = CLIP(cfg)
    model.graph.validate(params)
    return cfg, text, vision, model, params


def test_text_tower_parity(towers):
    cfg, text, _, model, params = towers
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size - 2, (3, cfg.context_length))
    # exactly one EOT (= max id) per row => HF first-eos pooling == our
    # argmax pooling
    tokens[:, 5] = cfg.vocab_size - 1
    with torch.no_grad():
        z_ref = text(input_ids=torch.from_numpy(tokens)).text_embeds.numpy()
    with jax.default_matmul_precision("float32"):
        z = model.encode_text(params, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=2e-4, rtol=2e-3)


def test_vision_tower_parity(towers):
    cfg, _, vision, model, params = towers
    rng = np.random.default_rng(1)
    x = rng.standard_normal(
        (2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        z_ref = vision(pixel_values=torch.from_numpy(x)).image_embeds.numpy()
    with jax.default_matmul_precision("float32"):
        z = model.encode_image(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=2e-4, rtol=2e-3)


def test_text_embedder_normalize_repeat(towers):
    cfg, _, _, model, params = towers
    tokens = jnp.asarray(np.full((2, cfg.context_length), 3))
    tokens = tokens.at[:, -1].set(cfg.vocab_size - 1)
    z = clip_text_embed(model, params, tokens, n_repeat=4)
    assert z.shape == (2, 4, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1), 1.0,
                               rtol=1e-5)


def test_image_embedder_preprocess_shapes(towers):
    cfg, _, _, model, params = towers
    # [-1,1] images at a non-native resolution get resized
    x = jnp.zeros((2, 24, 24, 3))
    z = clip_image_embed(model, params, x)
    assert z.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(z)).all()


def test_vit_l14_param_count():
    """ViT-L/14 totals (sum of both towers + projections + logit_scale):
    the published model has 123.65M text + 303.97M vision params."""
    model = CLIP(clip_vit_l14_config())
    # shapes only — counting 427M params doesn't need the arrays
    p = jax.eval_shape(model.init, jax.random.key(0))
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(p))
    # OpenAI ViT-L/14: 427,616,513 total state-dict params
    assert n == 427_616_513, n


def test_clip_prunable(towers):
    from diff_pruning_tpu.pruning.importance import make_importance
    from diff_pruning_tpu.pruning.pruner import apply_pruning, prune

    cfg, _, _, model, params = towers
    res = prune(model.graph, params, make_importance("magnitude"),
                sparsity=0.25)
    p2 = apply_pruning(params, model.graph, res)
    m2 = CLIP(cfg.with_channel_sizes(res.channel_sizes))
    m2.graph.validate(p2)
    tokens = jnp.asarray(np.full((1, cfg.context_length), 3))
    z = m2.encode_text(p2, tokens)
    assert z.shape == (1, cfg.embed_dim) and np.isfinite(np.asarray(z)).all()
