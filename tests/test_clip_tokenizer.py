"""CLIP BPE tokenizer golden tests vs transformers' CLIPTokenizer built
from the same local vocab/merges (the hub download is zero-egress-blocked,
like the WordPiece tokenizer's test in test_text_encoder.py)."""

import json

import numpy as np
import pytest

from diff_pruning_tpu.data.clip_tokenizer import CLIPTokenizer, bytes_to_unicode

MERGES = [
    ("h", "e</w>"), ("l", "l"), ("ll", "o</w>"), ("t", "h"), ("th", "e</w>"),
    ("w", "o"), ("wo", "r"), ("wor", "l"), ("worl", "d</w>"), ("i", "n"),
    ("a", "n"), ("an", "d</w>"), ("o", "f</w>"), ("1", "2"),
]

TEXTS = [
    "Hello world",
    "the  quick   brown fox!",
    "a painting OF a virus monster, playing guitar & more...",
    "numbers 123 and 45",
    "hello, world; of worlds?",
]


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_tok")
    merges_path = d / "merges.txt"
    merges_path.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n")
    # vocab.json in exactly the construction order our tokenizer uses
    vocab = list(bytes_to_unicode().values())
    vocab = vocab + [v + "</w>" for v in vocab]
    vocab += ["".join(m) for m in MERGES]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    vocab_path = d / "vocab.json"
    vocab_path.write_text(json.dumps({t: i for i, t in enumerate(vocab)}))
    return str(vocab_path), str(merges_path)


def test_matches_transformers_cliptokenizer(files):
    from transformers import CLIPTokenizer as HFTok

    vocab_path, merges_path = files
    hf = HFTok(vocab_file=vocab_path, merges_file=merges_path)
    ours = CLIPTokenizer(merges_path)
    assert ours.vocab_size == hf.vocab_size
    for text in TEXTS:
        ref = hf(text)["input_ids"]
        got = [ours.sot] + ours.encode(text) + [ours.eot]
        assert got == ref, (text, got, ref)


def test_tokenize_pads_and_truncates(files):
    _, merges_path = files
    tok = CLIPTokenizer(merges_path)
    out = tok.tokenize(["hello world", "of"], context_length=8)
    assert out.shape == (2, 8) and out.dtype == np.int32
    assert out[0, 0] == tok.sot
    # row 2: sot, 'of</w>', eot, then zero padding
    assert out[1, 2] == tok.eot and out[1, 3:].sum() == 0
    # truncation keeps a final eot
    long = tok.tokenize("hello " * 50, context_length=8)
    assert long[0, -1] == tok.eot
    with pytest.raises(RuntimeError):
        tok.tokenize("hello " * 50, context_length=8, truncate=False)


def test_roundtrip_decode(files):
    _, merges_path = files
    tok = CLIPTokenizer(merges_path)
    ids = tok.encode("hello world of worlds")
    assert tok.decode(ids).strip() == "hello world of worlds"
