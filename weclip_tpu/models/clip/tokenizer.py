"""CLIP byte-pair-encoding tokenizer.

A fresh implementation of the BPE scheme CLIP uses (reference:
clip/simple_tokenizer.py, clip/clip.py:205-245): GPT-2-style byte-to-unicode
encoding, lowercased word-level regex split, merge ranks from the
``bpe_simple_vocab_16e6.txt.gz`` merges file, ``</w>`` end-of-word markers,
and ``<|startoftext|>`` / ``<|endoftext|>`` specials with a fixed 77-token
context.

The merges file is *data* (OpenAI's), not code; it is located at runtime via
``WECLIP_BPE_PATH`` or an explicit path, exactly like the model checkpoint.
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import Dict, List, Sequence

import numpy as np

try:
    import regex as re
except ImportError:                               # pragma: no cover
    # stdlib re cannot compile the \p{L}/\p{N} classes in _WORD_RE, so a
    # silent fallback would only move the failure to a cryptic re.error at
    # compile time — fail with an actionable message instead.
    re = None  # type: ignore

CONTEXT_LENGTH = 77
_WORD_RE = (r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+")


def default_bpe_path() -> str:
    env = os.environ.get("WECLIP_BPE_PATH")
    if env:
        return env
    here = os.path.join(os.path.dirname(__file__), "bpe_vocab.txt.gz")
    if os.path.exists(here):
        return here
    raise FileNotFoundError(
        "CLIP BPE merges file not found; set WECLIP_BPE_PATH to a "
        "bpe_simple_vocab_16e6.txt.gz file.")


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> printable-unicode map (GPT-2 scheme)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _clean(text: str) -> str:
    try:                                          # ftfy if available
        import ftfy
        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text.strip())
    return text.strip().lower()


class Tokenizer:
    def __init__(self, bpe_path: str | None = None, n_merges: int | None = None):
        bpe_path = bpe_path or default_bpe_path()
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # first line is a version header; CLIP uses merges [1 : 49152-256-2+1]
        limit = n_merges if n_merges is not None else 49152 - 256 - 2
        merges = [tuple(m.split()) for m in lines[1:limit + 1] if m]

        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        base = list(self.byte_encoder.values())
        vocab: List[str] = base + [v + "</w>" for v in base]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self._cache: Dict[str, str] = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        if re is None:
            raise ImportError(
                "the CLIP tokenizer's word pattern uses \\p{L}/\\p{N} "
                "classes, which need the `regex` package — stdlib re "
                "cannot compile them (pip install regex)")
        self._word_re = re.compile(_WORD_RE, re.IGNORECASE)

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in self._word_re.findall(_clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        data = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return data.decode("utf-8", errors="replace").replace("</w>", " ")


def tokenize(texts: Sequence[str], tokenizer: Tokenizer,
             context_length: int = CONTEXT_LENGTH) -> np.ndarray:
    """Fixed-context batch tokenization (clip/clip.py:205-245)."""
    if isinstance(texts, str):
        texts = [texts]
    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        ids = [tokenizer.sot] + tokenizer.encode(t) + [tokenizer.eot]
        if len(ids) > context_length:
            raise RuntimeError(f"input too long for context {context_length}: {t!r}")
        out[i, :len(ids)] = ids
    return out
