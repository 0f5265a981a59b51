"""CLIP byte-BPE tokenizer — offline rebuild of OpenAI `clip.tokenize`
(clip/simple_tokenizer.py), which FrozenCLIPTextEmbedder calls
(ldm_exp/ldm/modules/encoders/modules.py:156).

Reads the standard `bpe_simple_vocab_16e6.txt.gz` (or an uncompressed
merges file in the same format: version header line, then one merge pair
per line) from a LOCAL path — the download is zero-egress-blocked here,
like every other pretrained asset. The vocabulary is constructed exactly
as OpenAI does: 256 byte symbols, their '</w>' word-final forms, one token
per merge, then the two special tokens (=> 49408 for the full file).

Deviation (documented): OpenAI's `basic_clean` runs ftfy.fix_text, which
is not installed here; we apply html.unescape twice (the rest of
basic_clean) — identical output for any text that doesn't contain mojibake.
"""

from __future__ import annotations

import gzip
import html
from functools import lru_cache
from typing import Iterable, List, Sequence, Union

import numpy as np
import regex as re


@lru_cache()
def bytes_to_unicode():
    """GPT-2/CLIP byte -> printable-unicode table."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    # ftfy.fix_text omitted (module docstring); the double-unescape matches
    # clip simple_tokenizer.basic_clean
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    """clip.simple_tokenizer.SimpleTokenizer + clip.tokenize."""

    PAT = re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
        r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", re.IGNORECASE)

    def __init__(self, bpe_path: str):
        self.byte_encoder = bytes_to_unicode()
        if bpe_path.endswith(".gz"):
            raw = gzip.open(bpe_path, "rt", encoding="utf-8").read()
        else:
            with open(bpe_path, encoding="utf-8") as f:
                raw = f.read()
        merges = raw.split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]  # simple_tokenizer.py:65
        merges = [tuple(m.split()) for m in merges if m]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in re.findall(self.PAT, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens: Iterable[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        return bytearray(byte_decoder[c] for c in text).decode(
            "utf-8", errors="replace").replace("</w>", " ")

    def tokenize(self, texts: Union[str, Sequence[str]],
                 context_length: int = 77,
                 truncate: bool = True) -> np.ndarray:
        """clip.tokenize: (B, context_length) int32, <sot> ids <eot>,
        zero-padded; on overflow truncate and force a final <eot>."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text) + [self.eot]
            if len(ids) > context_length:
                if not truncate:
                    raise RuntimeError(
                        f"input {text!r} too long for context {context_length}")
                ids = ids[:context_length]
                ids[-1] = self.eot
            out[i, :len(ids)] = ids
        return out
