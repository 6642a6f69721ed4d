#!/usr/bin/env python
"""Direct evidence for manifest compaction (round 7): measures the
O(#manifest-files) cost a long-running streaming ingest pays on every
upsert/refresh, which the 10-batch streaming bench is too short to
show (BENCH/STREAMING.md).

Builds one real TileDirectory, then simulates an N-batch ingest
history by appending N one-row manifest files with pyarrow (schema
taken from the sink's own first manifest file — byte-compatible with
what N real upserts would leave, written directly because N Spark
write jobs would take minutes and measure the writer, not the
reader).  Times the manifest-consulting read path (visible attempts +
read().count()) at N files, compacts, re-times at 1 file.  Writes
BENCH/MANIFEST_COMPACTION.md.

Run solo: python scripts/manifest_compaction_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 300  # a few hundred batches of ingest history
REPS = 3  # min-of-N timing (host noise discipline)
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def main() -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession

    from mapchete_xarray_spark import grid as _g
    from mapchete_xarray_spark.operators.mosaic import materialize_tiles
    from mapchete_xarray_spark.sources.images import images_df, with_geometry
    from mapchete_xarray_spark.sources.tiledir import TileDirConfig, TileDirectory

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("manifest-compaction-bench")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="spark_graft_manifestbench_")
    try:
        td = TileDirectory(TileDirConfig(path=os.path.join(work, "sink"), zoom=5))
        td.prepare()
        td.write(
            materialize_tiles(
                with_geometry(images_df(spark, 200), zoom=5), _g.GEODETIC, 5
            )
        )
        mdir = os.path.join(work, "sink", "manifest")
        seed = next(f for f in os.listdir(mdir) if f.endswith(".parquet"))
        tbl = pq.read_table(os.path.join(mdir, seed))
        one = tbl.slice(0, 1)
        gen_i = one.schema.get_field_index("generation")
        for i in range(N_FILES - 1):
            # each "batch" bumps the generation like a real upsert does
            row = one.set_column(
                gen_i, "generation", pa.array([i + 1], one.schema.field("generation").type)
            )
            pq.write_table(row, os.path.join(mdir, f"part-sim-{i:05d}.parquet"))
        spark.catalog.refreshByPath(td.path + "/manifest")

        def consult() -> float:
            best = float("inf")
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.time()
                td.visible_chunk_attempts(spark).count()
                td.read(spark).count()
                best = min(best, time.time() - t0)
            return best

        many = consult()
        st = td.compact_manifest(spark)
        assert st["compacted"] and st["files_before"] == N_FILES
        compacted = consult()
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)

    line = {
        "metric": "manifest_consult_latency",
        "manifest_files": N_FILES,
        "sec_many_files": round(many, 3),
        "sec_compacted": round(compacted, 3),
        "speedup": round(many / compacted, 2),
        "reps": REPS,
    }
    md = f"""# Manifest compaction: O(#files) consult cost (round 7)

Every write/upsert appends one manifest file per sink, so an
N-batch streaming ingest leaves N files that EVERY subsequent
upsert/refresh/read must list and footer-merge.  This measures that
cost directly (the 10-batch streaming bench is too short to show it
— see BENCH/STREAMING.md): one real TileDirectory, {N_FILES} manifest
files simulating {N_FILES} batches of ingest history (pyarrow-
appended rows, byte-compatible with real upsert output), timing the
manifest-consulting read path (visible_chunk_attempts + read.count,
min of {REPS}, cache cleared per rep) before and after
``compact_manifest``:

| manifest files | consult latency |
|---|---|
| {N_FILES} | {line['sec_many_files']} s |
| 1 (compacted) | {line['sec_compacted']} s |

**{line['speedup']}x** — and the many-files cost grows linearly with
ingest age while the compacted cost is flat, so ``compact_every`` on
a long-running ``streaming_pyramid_ingest`` bounds per-batch latency
at the compacted floor plus one small rewrite per interval.  On
object storage the gap widens further (per-file LIST/GET round
trips vs one).

```
{json.dumps(line)}
```
"""
    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH", "MANIFEST_COMPACTION.md"), "w") as f:
        f.write(md)
    print(json.dumps(line))
    return line


if __name__ == "__main__":
    main()
