"""CLIP byte-level BPE tokenizer.

Functional rebuild of the reference's utils/tokenizer.py:64-151 (itself the
standard CLIP SimpleTokenizer): byte-level BPE over the public
bpe_simple_vocab_16e6 merge table (shipped in assets/), lower-cased, with
<|startoftext|>/<|endoftext|> specials and fixed 77-token context padding.

ftfy is optional in this environment; when absent, unicode fixing degrades
gracefully to a plain pass-through (the class-name vocabulary of the TTA
datasets is pure ASCII, so tokenisation is unaffected).
"""
from __future__ import annotations

import functools
import gzip
import html
import os
from typing import List, Union

import regex as re

import numpy as np

try:
    import ftfy
    _HAS_FTFY = True
except ImportError:
    _HAS_FTFY = False

DEFAULT_BPE_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                "assets", "bpe_simple_vocab_16e6.txt.gz")

CONTEXT_LENGTH = 77


@functools.lru_cache()
def bytes_to_unicode() -> dict:
    """Reversible byte → printable-unicode map (standard GPT-2/CLIP table)."""
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
    return dict(zip(bs, (chr(c) for c in cs)))


def get_pairs(word: tuple) -> set:
    return {(a, b) for a, b in zip(word, word[1:])}


def basic_clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    """CLIP BPE tokenizer with the reference's vocab layout: 256 byte tokens,
    256 </w> variants, 48894 merges, then the two specials (49408 total)."""

    def __init__(self, bpe_path: str = DEFAULT_BPE_PATH):
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
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
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t]
                              for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (bytearray(self.byte_decoder[c] for c in text)
                .decode("utf-8", errors="replace").replace("</w>", " "))

    def __call__(self, texts: Union[str, List[str]],
                 context_length: int = CONTEXT_LENGTH) -> np.ndarray:
        """Tokenize → (B, 77) int32 array with SOT/EOT, zero-padded,
        truncated to context length (reference tokenizer.py:127-151 /
        clip.tokenize semantics)."""
        if isinstance(texts, str):
            texts = [texts]
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        result = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            tokens = [sot] + self.encode(text) + [eot]
            # plain truncation, EOT dropped when it falls off the end —
            # the reference's exact behaviour (tokenizer.py:146-147; the
            # open_clip variant force-appends EOT instead, which would
            # move the encoder's EOT-argmax pooling position)
            tokens = tokens[:context_length]
            result[i, :len(tokens)] = tokens
        return result


def tokenize(texts, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
    """Module-level convenience mirroring clip.tokenize."""
    return _default_tokenizer()(texts, context_length)


@functools.lru_cache()
def _default_tokenizer() -> SimpleTokenizer:
    return SimpleTokenizer()
