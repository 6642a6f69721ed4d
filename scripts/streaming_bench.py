#!/usr/bin/env python
"""Streaming ingest backlog/latency evidence (VERDICT r6 task 8).

Drives a 10-micro-batch ``streaming_pyramid_ingest`` run (parquet
drop-folder, one file per trigger) at the bench image scale and
reports per-batch wall time + rows/sec from the engine's own
StreamingQueryProgress, then ASSERTS batch latency does not grow as
the sinks accumulate (the cascade is O(changed tiles), so batch N's
cost must look like batch 1's — a growing trend would mean the
refresh re-derives the whole pyramid).  Writes BENCH/STREAMING.md.

Run solo (the usual host-noise discipline):

    python scripts/streaming_bench.py            # 10 x 500 images
    SPARK_GRAFT_STREAM_IMAGES=200 python scripts/streaming_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "10"))
PER_BATCH = int(os.environ.get("SPARK_GRAFT_STREAM_IMAGES", "500"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
ZOOM = 6


def main() -> dict:
    from pyspark.sql import SparkSession

    from mapchete_xarray_spark import grid as _g
    from mapchete_xarray_spark.sources.images import images_df, with_geometry
    from mapchete_xarray_spark.sources.tiledir import TileDirConfig, TileDirectory
    from mapchete_xarray_spark.streaming.ingest import streaming_pyramid_ingest

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("streaming-bench")
        .config("spark.sql.shuffle.partitions", str(max(CPUS * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="spark_graft_streambench_")
    try:
        drop = os.path.join(work, "drop")
        # N_BATCHES parquet files, one per trigger; each batch is a
        # disjoint image-id range of the deterministic fixture, so
        # every batch's changed-tile set has the same character
        total = N_BATCHES * PER_BATCH
        imgs = with_geometry(images_df(spark, total), zoom=ZOOM)
        for b in range(N_BATCHES):
            imgs.where(
                (imgs.image_id >= f"img{b * PER_BATCH:012d}")
                & (imgs.image_id < f"img{(b + 1) * PER_BATCH:012d}")
            ).coalesce(1).write.mode("append").parquet(drop)

        base_td = TileDirectory(
            TileDirConfig(path=os.path.join(work, "base"), zoom=ZOOM, bands=3)
        )
        base_td.prepare()
        ovs = []
        for z in (ZOOM - 1, ZOOM - 2):
            td = TileDirectory(
                TileDirConfig(path=os.path.join(work, f"ov{z}"), zoom=z, bands=3)
            )
            td.prepare()
            ovs.append(td)

        schema = spark.read.parquet(drop).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop)
        )
        t0 = time.perf_counter()
        q = (
            streaming_pyramid_ingest(
                stream, base_td, ovs, _g.GEODETIC, ZOOM,
                os.path.join(work, "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        wall = time.perf_counter() - t0

        # numInputRows is NOT used for throughput: the foreachBatch
        # body scans the micro-batch more than once (candidate-tile
        # explode + paste), so the engine double-counts source rows —
        # the image count is known exactly
        batches = [
            {
                "batch": int(p["batchId"]),
                "sec": round(p["durationMs"]["triggerExecution"] / 1000.0, 3),
            }
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)

    secs = [b["sec"] for b in batches]
    rows = total
    line = {
        "metric": "streaming_pyramid_ingest",
        "batches": len(batches),
        "images": rows,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(rows / wall, 1),
        "per_batch_sec": secs,
        "first3_min": round(min(secs[:3]), 3),
        "last3_min": round(min(secs[-3:]), 3),
    }
    # NO-GROWTH assertion: min-of-first-3 vs min-of-last-3 (min beats
    # mean on this host's heavy-tailed noise windows).  The cascade is
    # O(changed tiles per batch) — 2x headroom covers accumulated
    # manifest/listing growth and noise, a re-derive-the-pyramid bug
    # shows up as ~N_BATCHES x
    assert line["last3_min"] <= 2.0 * line["first3_min"], (
        f"streaming batch latency grew: first3_min={line['first3_min']} "
        f"last3_min={line['last3_min']} — the incremental cascade is "
        "no longer incremental"
    )
    _write_md(line)
    print(json.dumps(line))
    return line


def _write_md(line: dict) -> None:
    rows = "\n".join(
        f"| {i} | {s:.3f} |" for i, s in enumerate(line["per_batch_sec"])
    )
    md = f"""# Streaming ingest latency (streaming_pyramid_ingest)

{line['batches']} micro-batches x {line['images'] // max(line['batches'], 1)}
images (parquet drop-folder, one file per trigger, availableNow), base
z6 + 2 cascaded overview levels, local[{CPUS}]:

- **{line['rows_per_sec']} images/sec** end-to-end
  ({line['images']} images in {line['wall_sec']} s wall).
- Per-batch trigger wall times (engine StreamingQueryProgress):

| batch | sec |
|---|---|
{rows}

**No-growth check: min of first 3 = {line['first3_min']} s, min of
last 3 = {line['last3_min']} s** (asserted <= 2x by
scripts/streaming_bench.py — the cascade refresh is O(changed tiles),
so batch latency must not trend upward as the sinks accumulate; a
full re-derive bug would show as ~{line['batches']}x growth).

Measurement notes: run SOLO; this host's noise windows hit the
Arrow+Python+IO pipeline hardest (same caveat as the write-throughput
leg in BENCH/BASELINE.md) — min-based comparisons are the honest
signal, single batches can spike 2-6x.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/STREAMING.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
