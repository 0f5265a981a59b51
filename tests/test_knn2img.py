"""Retrieval (exact searcher, database build) + the knn2img CLI end-to-end
on tiny models (reference: scripts/{train_searcher,knn2img}.py)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_pruning_tpu.retrieval import (ExactSearcher, build_database,
                                        load_datapool, load_searcher,
                                        save_searcher)


def test_exact_searcher_topk_golden():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((50, 8)).astype(np.float32)
    db = {"embedding": emb, "img_id": np.arange(50),
          "patch_coords": np.zeros((50, 4), np.int64)}
    s = ExactSearcher(db)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    out = s(q, 5)
    # golden: normalized dot-product argsort
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    ref = np.argsort(-(qn @ en.T), axis=1)[:, :5]
    np.testing.assert_array_equal(out["nns"], ref)
    assert out["nn_embeddings"].shape == (3, 5, 8)
    np.testing.assert_allclose(
        np.linalg.norm(out["nn_embeddings"], axis=-1), 1.0, rtol=1e-5)
    # (B, 1, D) context rows accepted like the reference (knn2img.py:142)
    out2 = s(q[:, None, :], 5)
    np.testing.assert_array_equal(out2["nns"], ref)


def test_load_datapool_multi_file(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(3):
        np.savez(tmp_path / f"part{i}.npz",
                 embedding=rng.standard_normal((1, 4, 8)).astype(np.float32),
                 img_id=np.arange(4)[None], patch_coords=np.zeros((1, 4, 4)))
    pool = load_datapool(str(tmp_path))
    assert pool["embedding"].shape == (12, 8)
    assert pool["img_id"].shape == (12,)


def _write_bpe(d):
    p = d / "merges.txt"
    p.write_text("#version: 0.2\n" + "\n".join(
        ["h e</w>", "l l", "t h", "th e</w>", "a n", "an d</w>"]) + "\n")
    return str(p)


def test_knn2img_cli_end_to_end(tmp_path):
    from PIL import Image

    from diff_pruning_tpu.cli.knn2img import main as knn2img_main
    from diff_pruning_tpu.cli.train_searcher import main as searcher_main
    from diff_pruning_tpu.models.clip import CLIP, tiny_clip_config
    from diff_pruning_tpu.models.unet_cond import UNetCond, UNetCondConfig
    from diff_pruning_tpu.models.vae import AutoencoderConfig, AutoencoderKL
    from diff_pruning_tpu.utils.checkpoint import save_model, save_params_npz

    import dataclasses

    # vocab must cover the fixture tokenizer's 520 ids (the CLI enforces it)
    ccfg = dataclasses.replace(tiny_clip_config(), vocab_size=520)
    ucfg = UNetCondConfig(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, transformer_depth=1, context_dim=ccfg.embed_dim,
        norm_num_groups=8)
    fcfg = AutoencoderConfig(block_out_channels=(8, 8), layers_per_block=1,
                             latent_channels=4, norm_num_groups=4,
                             mid_block_attention=False, sample_size=16)
    mdir = tmp_path / "model"
    save_model(str(mdir), ucfg, UNetCond(ucfg).init(jax.random.key(0)),
               subfolder="unet")
    save_model(str(mdir), fcfg, AutoencoderKL(fcfg).init(jax.random.key(1)),
               subfolder="first_stage")
    clip_model = CLIP(ccfg)
    cdir = mdir / "clip"
    os.makedirs(cdir)
    (cdir / "config.json").write_text(ccfg.to_json())
    save_params_npz(str(cdir / "params.npz"),
                    clip_model.init(jax.random.key(2)))

    # retrieval database from a tiny image folder via the CLI
    imdir = tmp_path / "imgs"
    imdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8),
                        "RGB").save(imdir / f"{i}.png")
    sdir = tmp_path / "searcher"
    searcher_main(["--images", str(imdir), "--clip_path", str(cdir),
                   "--target_path", str(sdir), "--batch_size", "4"])
    pool = load_datapool(str(sdir))
    assert pool["embedding"].shape == (6, ccfg.embed_dim)

    bpe = _write_bpe(tmp_path)
    outdir = tmp_path / "out"
    knn2img_main(["--prompt", "the hell and the", "--outdir", str(outdir),
                  "--model_path", str(mdir), "--bpe", bpe,
                  "--database", str(sdir), "--use_neighbors", "--knn", "3",
                  "--ddim_steps", "2", "--n_samples", "2",
                  "--H", "16", "--W", "16", "--scale", "2.0"])
    samples = os.listdir(outdir / "samples")
    assert len(samples) == 2
    img = np.asarray(Image.open(outdir / "samples" / samples[0]))
    assert img.shape == (16, 16, 3)
    assert any(f.startswith("grid-") for f in os.listdir(outdir))
