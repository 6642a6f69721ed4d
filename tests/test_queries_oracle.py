"""Replicates the driver's correctness gate locally: for every query
with an oracle, run Spark vs DuckDB at sf0.001 and compare row count,
schema width, and an order-insensitive value hash over name-sorted
columns."""

import hashlib

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    return con


def _canon(val):
    if val is None:
        return "∅"
    if isinstance(val, float):
        if val != val:
            return "nan"
        return f"{val:.6g}"
    if isinstance(val, bool):
        return str(int(val))
    return str(val)


def _value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


ALL = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.spark
@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row counts differ"
    assert _value_hash(spark_rows, [c.lower() for c in spark_cols]) == _value_hash(
        duck_rows, [c.lower() for c in duck_cols]
    ), f"{name}: value hash differs"


@pytest.mark.spark
def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"tile_row", "tile_col", "tile_id", "n_images"}
