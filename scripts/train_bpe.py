#!/usr/bin/env python
"""Train the committed BPE merge table (functions/bpe_merges.txt).

Classic BPE training (Sennrich et al. 2016) over the synthetic
document corpus: pretokenize every text with ``bpe.PRETOKEN_RE``, map
bytes through the GPT-2 byte↔unicode table, then repeatedly merge the
most frequent adjacent symbol pair (ties broken lexicographically so
the table is DETERMINISTIC) until N_MERGES merges are recorded.

Training corpus: /root/testdata/sf0.001/documents.parquet (the
smallest fixture — vocab quality is irrelevant to correctness, only
determinism matters; the committed file is the spec).

    python scripts/train_bpe.py          # rewrites bpe_merges.txt
"""

from __future__ import annotations

import collections
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapchete_xarray_spark.functions import bpe  # noqa: E402

N_MERGES = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "512"))
CORPUS = "/root/testdata/sf0.001/documents.parquet"
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "mapchete_xarray_spark", "functions", "bpe_merges.txt",
)


def main() -> None:
    texts = [
        r[0]
        for r in duckdb.sql(
            f"select text from '{CORPUS}' order by doc_id"
        ).fetchall()
    ]
    b2u = bpe.bytes_to_unicode()
    vocab: collections.Counter = collections.Counter()
    for t in texts:
        for m in bpe.PRETOKEN_RE.finditer(t):
            vocab[tuple(b2u[b] for b in m.group().encode("utf-8"))] += 1

    merges: list[tuple[str, str]] = []
    words = dict(vocab)
    for _ in range(N_MERGES):
        pairs: collections.Counter = collections.Counter()
        for w, c in words.items():
            for p in zip(w, w[1:]):
                pairs[p] += c
        if not pairs:
            break
        top = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        # frequency-1 pairs carry no signal; stop early
        if top[1] < 2:
            break
        (a, b), _cnt = top
        merges.append((a, b))
        nxt: dict[tuple[str, ...], int] = {}
        for w, c in words.items():
            out = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + c
        words = nxt

    with open(os.path.abspath(OUT), "w", encoding="utf-8") as f:
        f.write("# BPE merges, one per line, rank = line order.\n")
        f.write(f"# trained by scripts/train_bpe.py on {CORPUS}\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
