"""Byte-level BPE tokenizer: losslessness, merge-strategy parity, and
the committed-vocab contract.

The engine (``bpe.count_tokens``: merge ALL occurrences of the
lowest-rank pair per pass) and the oracle twin
(``queries._bpe_serial_count``: one-at-a-time leftmost-lowest-rank)
are independent implementations of the same published algorithm; they
must agree on every string — including the adversarial set VERDICT r7
next #5 asks for (unicode, whitespace runs, long words)."""

from __future__ import annotations

import numpy as np
import pytest

from mapchete_xarray_spark.functions import bpe
from mapchete_xarray_spark.queries import _bpe_serial_count

ADVERSARIAL = [
    "",
    " ",
    "   \t\n  ",
    "hello world",
    "the batch scan over the column",
    "  spaces   run  wild   ",
    "trailing space ",
    " leading",
    "naïve café — 東京タワー 😀",
    "don't you'll we're i'm they'd it's",
    "x" * 500,
    "ab" * 250,
    "word " * 100,
    "MixedCASE and 12345 numbers, punct!!! ...",
    " nbsp and em-space",
    "a\nb\r\nc\td",
    "ÿ þ ¬ ®",  # printable-latin1 edge of the byte↔unicode table
    "\x00\x01\x7f control bytes",
]


class TestLossless:
    @pytest.mark.parametrize("s", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
    def test_roundtrip(self, s):
        assert bpe.decode(bpe.encode(s)) == s

    def test_pretokens_cover_text(self):
        s = "the quick   brown fox's 99 jumps—over"
        assert "".join(m.group() for m in bpe.PRETOKEN_RE.finditer(s)) == s


class TestMergeStrategyParity:
    @pytest.mark.parametrize("s", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
    def test_engine_vs_serial_twin(self, s):
        assert bpe.count_tokens(s) == _bpe_serial_count(s)

    def test_on_corpus_sample(self):
        import duckdb

        texts = [
            r[0]
            for r in duckdb.sql(
                "select text from '/root/testdata/sf0.001/documents.parquet' "
                "order by doc_id limit 60"
            ).fetchall()
        ]
        for t in texts:
            assert bpe.count_tokens(t) == _bpe_serial_count(t)

    def test_random_bytes_fuzz(self):
        rng = np.random.default_rng(17)
        for _ in range(40):
            n = int(rng.integers(1, 200))
            s = bytes(rng.integers(0, 256, n, dtype=np.uint8)).decode(
                "utf-8", errors="replace"
            )
            assert bpe.count_tokens(s) == _bpe_serial_count(s)
            assert bpe.decode(bpe.encode(s)) == s


class TestVocabContract:
    def test_merges_actually_merge(self):
        # corpus-trained merges compress corpus-like text
        s = "the scan over the batch with the column"
        assert bpe.count_tokens(s) < len(s.encode())

    def test_byte_table_reversible(self):
        m = bpe.bytes_to_unicode()
        assert len(m) == 256
        assert len(set(m.values())) == 256

    def test_ranks_loaded(self):
        ranks = bpe.load_merges()
        assert len(ranks) > 100
        assert min(ranks.values()) == 0
        assert max(ranks.values()) == len(ranks) - 1
