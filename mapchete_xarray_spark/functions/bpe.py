"""Byte-level BPE tokenizer (GPT-2-style algorithm, committed vocab).

Replaces the regex token-count proxy (VERDICT r7 next #5) with a real
byte-pair-encoding tokenizer: the public GPT-2 scheme — pretokenize,
map UTF-8 bytes through the reversible byte↔unicode table, then
repeatedly merge the lowest-rank adjacent symbol pair until none of
the remaining pairs is in the merge table (Sennrich et al. 2016;
Radford et al. 2019 §2.2).  Two deliberate deviations from GPT-2
proper, both documented spec here:

* the pretokenizer uses ASCII letter/digit classes (stdlib ``re`` has
  no ``\\p{L}``); non-ASCII codepoints fall into the "other" branch
  and tokenize as raw byte merges — still lossless;
* the merge table is OUR OWN, trained on this repo's synthetic
  document corpus by ``scripts/train_bpe.py`` (512 merges, committed
  as ``bpe_merges.txt`` next to this file) — token counts are then
  deterministic with no external artifact.

Lossless: ``decode(encode(s)) == s`` for every unicode string (pinned
with adversarial cases in tests/test_bpe.py).

Execution shape: ``count_tokens_pdf`` is called from Arrow batches
(mapInPandas) only; a per-pretoken LRU makes corpus tokenization
~O(distinct words), and the merge loop is rank-dict lookups, no
regex in the inner loop.
"""

from __future__ import annotations

import functools
import os
import re

__all__ = [
    "PRETOKEN_RE",
    "bytes_to_unicode",
    "load_merges",
    "encode",
    "decode",
    "count_tokens",
]

# GPT-2-style contraction + class pretokenizer, ASCII classes (see
# module docstring).  Order matters: contractions, space-prefixed
# runs, trailing-space lookahead, whitespace runs.
PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
    r"|\s+(?!\S)|\s+"
)

_MERGES_PATH = os.path.join(os.path.dirname(__file__), "bpe_merges.txt")


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte → printable-unicode map (public
    algorithm): printable latin-1 bytes map to themselves, the rest
    to U+0100+offset so merges files stay readable text."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


@functools.lru_cache(maxsize=4)
def load_merges(path: str = _MERGES_PATH) -> dict[tuple[str, str], int]:
    """merge-pair → rank (file order == training order == rank)."""
    ranks: dict[tuple[str, str], int] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split(" ")
            ranks[(a, b)] = len(ranks)
    return ranks


def _merge_word(symbols: tuple[str, ...], ranks) -> tuple[str, ...]:
    """GPT-2 merge loop: find the lowest-rank adjacent pair, merge ALL
    its occurrences (greedy left-to-right), repeat."""
    word = list(symbols)
    while len(word) > 1:
        best = None
        best_rank = None
        for pair in zip(word, word[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            break
        a, b = best
        out = []
        i = 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = out
    return tuple(word)


@functools.lru_cache(maxsize=65536)
def _encode_pretoken(tok: str) -> tuple[str, ...]:
    b2u = bytes_to_unicode()
    ranks = load_merges()
    return _merge_word(tuple(b2u[b] for b in tok.encode("utf-8")), ranks)


def encode(text: str) -> list[str]:
    """Token strings (byte-unicode alphabet) for ``text``."""
    out: list[str] = []
    for m in PRETOKEN_RE.finditer(text):
        out.extend(_encode_pretoken(m.group()))
    return out


def decode(tokens: list[str]) -> str:
    u2b = {v: k for k, v in bytes_to_unicode().items()}
    return bytes(u2b[ch] for tok in tokens for ch in tok).decode(
        "utf-8", errors="strict"
    )


def count_tokens(text: str) -> int:
    n = 0
    for m in PRETOKEN_RE.finditer(text):
        n += len(_encode_pretoken(m.group()))
    return n
