#!/usr/bin/env python
"""Materialize a FULL sf1 fixture (all 10 tables, 10x the sf0.1 row
counts) so the complete 42-query bench suite can run at sf1 — the
scale where the r3 regressions are signal, not noise (VERDICT r3 #7).

/root/testdata is read-only, so this lands in /tmp (env
SPARK_GRAFT_SF1_DIR, default /tmp/spark_graft_sf1).  Deterministic
(seed 42), schema- and value-domain-compatible with the driver
fixtures (same columns/dtypes, same categorical domains: order
status/priority, mktsegment, event types, langs/sources, JSON props
shape) — but NOT a row-level clone: correctness is gated at sf0.01
against the driver fixtures; this corpus exists for performance
measurement only.

Documents follow the scale_sweep twin-generator discipline: near-dup
density LINEAR in N (each doc is, with p=0.12, a one-word-mutated
clone of its predecessor), because 10 shifted copies of the dup-dense
sf0.1 corpus would quadratically inflate pair outputs and measure
output size, not the engine.  Embeddings are 16-cluster gaussians.

Usage: python scripts/make_sf1.py   (idempotent via _DONE marker)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
SCALE = 10  # vs sf0.1

N = {
    "region": 5,
    "nation": 25,
    "customer": 15_000 * SCALE,
    "supplier": 1_000 * SCALE,
    "part": 20_000 * SCALE,
    "orders": 150_000 * SCALE,
    "lineitem": 600_000 * SCALE,
    "events": 100_000 * SCALE,
    "documents": 5_000 * SCALE,
    "embeddings": 2_000 * SCALE,
}

_SEGMENTS = ["MACHINERY", "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"]
_STATUS = ["P", "F", "O"]
_PRIORITY = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_EVENTS = ["click", "view", "purchase", "signup", "error"]
_RETFLAG = ["A", "N", "R"]
_LINESTATUS = ["O", "F"]
_PTYPES = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM"]
_ADJ = ["large", "hot", "small", "cold", "shiny", "plain", "round", "flat"]
_NOUN = ["ring", "bolt", "gear", "pin", "cog", "axle", "washer", "spring"]
_LANGS = ["en", "en", "zh", "es", "fr", "de"]
_VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "query", "agg", "table", "scan", "vector", "join", "shuffle",
    "tile", "grid", "zoom", "cell", "index", "hash", "band", "merge",
] + [f"w{i:03d}" for i in range(376)]


def _day_range(rng, n, lo="1995-01-01", hi="2001-08-01"):
    lo64 = np.datetime64(lo)
    days = int((np.datetime64(hi) - lo64) / np.timedelta64(1, "D"))
    return (lo64 + rng.integers(0, days + 1, size=n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def gen_region():
    names = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    return pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
            "r_name": pa.array(names),
        }
    )


def gen_nation():
    return pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
            "n_name": pa.array([f"NATION{i:02d}" for i in range(25)]),
            "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
        }
    )


def gen_customer(rng, n):
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, n), 2)),
            "c_mktsegment": pa.array(np.asarray(_SEGMENTS)[rng.integers(0, 5, n)]),
        }
    )


def gen_supplier(rng, n):
    return pa.table(
        {
            "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
            "s_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
            "s_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, n), 2)),
        }
    )


def gen_part(rng, n):
    a = rng.integers(0, len(_ADJ), n)
    b = rng.integers(0, len(_NOUN), n)
    return pa.table(
        {
            "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
            "p_name": pa.array([f"{_ADJ[i]} {_NOUN[j]}" for i, j in zip(a, b)]),
            "p_brand": pa.array([f"Brand#{k}" for k in rng.integers(1, 26, n)]),
            "p_type": pa.array(np.asarray(_PTYPES)[rng.integers(0, len(_PTYPES), n)]),
            "p_size": pa.array(rng.integers(1, 51, n).astype(np.int32)),
            "p_retailprice": pa.array(np.round(rng.uniform(900, 2100, n), 2)),
        }
    )


def gen_orders(rng, n, n_cust):
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(0, n_cust, n).astype(np.int64)),
            "o_orderstatus": pa.array(np.asarray(_STATUS)[rng.integers(0, 3, n)]),
            "o_totalprice": pa.array(np.round(rng.uniform(900, 450_000, n), 2)),
            "o_orderdate": pa.array(_day_range(rng, n)),
            "o_orderpriority": pa.array(np.asarray(_PRIORITY)[rng.integers(0, 5, n)]),
        }
    )


def gen_lineitem(rng, n, n_orders, n_part, n_supp):
    okey = np.sort(rng.integers(0, n_orders, n).astype(np.int64))
    # line numbers 1..k within each order: position minus the start
    # index of the row's run (vectorized cumcount — identical values
    # to the naive scan, no interpreted n-iteration loop)
    same = np.concatenate(([False], okey[1:] == okey[:-1]))
    idx = np.arange(n, dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(~same, idx, 0))
    run = (idx - run_start + 1).astype(np.int32)
    price = np.round(rng.uniform(900, 105_000, n), 2)
    return pa.table(
        {
            "l_orderkey": pa.array(okey),
            "l_partkey": pa.array(rng.integers(0, n_part, n).astype(np.int64)),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n).astype(np.int64)),
            "l_linenumber": pa.array(run),
            "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
            "l_extendedprice": pa.array(price),
            "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n), 2)),
            "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n), 2)),
            "l_returnflag": pa.array(np.asarray(_RETFLAG)[rng.integers(0, 3, n)]),
            "l_linestatus": pa.array(np.asarray(_LINESTATUS)[rng.integers(0, 2, n)]),
            "l_shipdate": pa.array(_day_range(rng, n, "1995-01-02", "2001-11-04")),
        }
    )


def gen_events(rng, n, n_users):
    base = np.datetime64("2024-01-01T00:00:00")
    off = np.sort(rng.integers(0, 30 * 86_400_000_000, n))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array((base + off.astype("timedelta64[us]")).astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
            "event_type": pa.array(np.asarray(_EVENTS)[rng.integers(0, 5, n)]),
            "value": pa.array(np.round(rng.uniform(0, 100, n), 3)),
            "props": pa.array([f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n)]),
        }
    )


def gen_documents(rng, n):
    texts, langs, sources = [], [], []
    lens = rng.integers(8, 90, size=n)
    clone = rng.random(n) < 0.12
    prev = None
    for i in range(n):
        if clone[i] and prev is not None:
            words = list(prev)
            words[int(rng.integers(0, len(words)))] = f"MUT{i}"
        else:
            words = [_VOCAB[j] for j in rng.integers(0, len(_VOCAB), size=lens[i])]
        prev = words
        texts.append(" ".join(words))
        langs.append(_LANGS[i % len(_LANGS)])
        sources.append(f"src{i % 20}")
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(np.asarray([len(t) for t in texts], dtype=np.int64)),
        }
    )


def gen_embeddings(rng, n):
    centers = rng.normal(size=(16, 64)) * 3.0
    labels = rng.integers(0, 16, size=n).astype(np.int32)
    vecs = centers[labels] + rng.normal(scale=0.5, size=(n, 64))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs.astype(np.float32))),
            "label": pa.array(labels),
        }
    )


def main() -> str:
    done = os.path.join(OUT, "_DONE")
    if os.path.exists(done):
        print(OUT)
        return OUT
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_region(), f"{OUT}/region.parquet")
    pq.write_table(gen_nation(), f"{OUT}/nation.parquet")
    pq.write_table(gen_customer(rng, N["customer"]), f"{OUT}/customer.parquet")
    pq.write_table(gen_supplier(rng, N["supplier"]), f"{OUT}/supplier.parquet")
    pq.write_table(gen_part(rng, N["part"]), f"{OUT}/part.parquet")
    pq.write_table(gen_orders(rng, N["orders"], N["customer"]), f"{OUT}/orders.parquet")
    pq.write_table(
        gen_lineitem(rng, N["lineitem"], N["orders"], N["part"], N["supplier"]),
        f"{OUT}/lineitem.parquet",
        row_group_size=200_000,
    )
    pq.write_table(gen_events(rng, N["events"], 15_000), f"{OUT}/events.parquet")
    pq.write_table(gen_documents(rng, N["documents"]), f"{OUT}/documents.parquet")
    pq.write_table(gen_embeddings(rng, N["embeddings"]), f"{OUT}/embeddings.parquet")
    open(done, "w").write("ok")
    print(OUT)
    return OUT


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
