#!/usr/bin/env python
"""Time a subset of registered queries with bench.py's exact
methodology (same session config, count() drain, min-of-QREPS,
clearCache between reps) — for before/after comparisons during
optimization without paying the full 61-query suite.

Usage: python scripts/bench_some.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QREPS = int(os.environ.get("SPARK_GRAFT_QREPS", "2"))


def main() -> None:
    import bench

    names = sys.argv[1:]
    spark = bench.make_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    bench._scaling_job(spark, 10_000)

    from mapchete_xarray_spark import queries as q

    registry = q.all_queries()
    results = {}
    for name in names:
        dt = float("inf")
        for _ in range(max(QREPS, 1)):
            t0 = time.perf_counter()
            registry[name](spark, SF_DIR).count()
            dt = min(dt, time.perf_counter() - t0)
            spark.catalog.clearCache()
        results[name] = round(dt, 3)
        print(f"{name}: {results[name]}", file=sys.stderr)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
