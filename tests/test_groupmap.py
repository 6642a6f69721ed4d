"""batched_group_map: parity with per-group grouped-map under
adversarial Arrow batch sizes (groups straddling batch boundaries),
multi-row and None returns, empty input."""

import pandas as pd
import pytest
from pyspark.sql import types as T

from mapchete_xarray_spark.operators.groupmap import batched_group_map

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("s", T.LongType(), False),
    ]
)


def _mk_reduce():
    # defined per-call so cloudpickle ships it by value (a test-module
    # top-level function is not importable on executors)
    def _reduce(key, g):
        return (int(key[0]), len(g), int(g.v.sum()))

    return _reduce


@pytest.fixture()
def tiny_batches(spark):
    """Force 3-row Arrow batches so multi-row groups straddle batch
    boundaries — the carry path must reassemble them."""
    k = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(k)
    spark.conf.set(k, "3")
    yield
    spark.conf.set(k, old)


class TestGroupMap:
    def test_parity_with_grouped_map_across_batch_boundaries(
        self, spark, tiny_batches
    ):
        # 40 groups of sizes 1..8 — with 3-row batches most groups
        # straddle at least one boundary
        rows = []
        v = 0
        for k in range(40):
            for i in range(k % 8 + 1):
                rows.append((k, v))
                v += 1
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            r.k: (r.n, r.s)
            for r in batched_group_map(df, ["k"], _mk_reduce(), SCHEMA).collect()
        }
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=["k", "v"])
        want = {
            int(k): (len(g), int(g.v.sum())) for k, g in pdf.groupby("k")
        }
        assert got == want

    def test_none_skips_and_list_expands(self, spark, tiny_batches):
        def reduce2(key, g):
            k = int(key[0])
            if k % 3 == 0:
                return None
            if k % 3 == 1:
                return [(k, len(g), 0), (k, len(g), 1)]
            return (k, len(g), int(g.v.sum()))

        rows = [(k, i) for k in range(12) for i in range(2)]
        df = spark.createDataFrame(rows, "k long, v long")
        out = batched_group_map(df, ["k"], reduce2, SCHEMA).collect()
        ks = sorted(r.k for r in out)
        # k%3==0 dropped (4 groups), k%3==1 doubled (4 groups x2),
        # k%3==2 single (4 groups)
        assert ks == sorted([k for k in range(12) if k % 3 == 1] * 2
                            + [k for k in range(12) if k % 3 == 2])

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "k long, v long")
        out = batched_group_map(df, ["k"], _mk_reduce(), SCHEMA)
        assert out.count() == 0
        assert out.schema == SCHEMA

    def test_single_exchange_plan(self, spark):
        df = spark.createDataFrame([(1, 2)], "k long, v long")
        plan = (
            batched_group_map(df, ["k"], _mk_reduce(), SCHEMA)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1, plan

    def test_multi_key_groups(self, spark, tiny_batches):
        rows = [(a, b, a * 10 + b) for a in range(5) for b in range(4)]
        df = spark.createDataFrame(rows, "a long, b long, v long")

        schema = T.StructType(
            [
                T.StructField("a", T.LongType(), False),
                T.StructField("b", T.LongType(), False),
                T.StructField("s", T.LongType(), False),
            ]
        )

        def r2(key, g):
            return (int(key[0]), int(key[1]), int(g.v.sum()))

        got = {
            (r.a, r.b): r.s
            for r in batched_group_map(df, ["a", "b"], r2, schema).collect()
        }
        assert got == {(a, b): a * 10 + b for a in range(5) for b in range(4)}