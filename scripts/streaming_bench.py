#!/usr/bin/env python
"""Streaming ingest backlog/latency evidence (VERDICT r6 task 8).

Drives a 30-micro-batch ``streaming_pyramid_ingest`` run (parquet
drop-folder, one file per trigger) at the bench image scale, TWICE —
without and with periodic manifest compaction (``compact_every``) —
and reports per-batch wall time + images/sec from the engine's own
StreamingQueryProgress, PLUS the per-stage split (materialize+upsert
vs overview refresh vs manifest compaction) from
``streaming.ingest.STAGE_LOG`` (VERDICT r7 next #3: attribute the
growth).  ASSERTS batch latency does not grow unboundedly as the
sinks accumulate (the cascade is O(changed tiles), so late batches
must look like mid-run batches — a growing trend would mean a hidden
O(total sink) term).  Writes BENCH/STREAMING.md.

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

N_BATCHES = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "30"))
PER_BATCH = int(os.environ.get("SPARK_GRAFT_STREAM_IMAGES", "500"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
ZOOM = 6
# late-window min may exceed mid-window min by at most this factor.
# Measured plateau band (BENCH/STREAMING.md, 30-batch solo run):
# 1.14x with compaction, 1.05x without — 1.35 adds host-noise
# headroom on top (VERDICT r7 next #3: gate tightened from 2x to the
# measured band).
PLATEAU_BAND = float(os.environ.get("SPARK_GRAFT_STREAM_BAND", "1.35"))


def _run_leg(spark, compact_every: int) -> dict:
    from mapchete_xarray_spark import grid as _g
    from mapchete_xarray_spark.sources.images import images_df, with_geometry
    from mapchete_xarray_spark.sources.tiledir import TileDirConfig, TileDirectory
    from mapchete_xarray_spark.streaming.ingest import streaming_pyramid_ingest

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

        from mapchete_xarray_spark.streaming import ingest as _ing

        _ing.STAGE_LOG.clear()
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
                compact_every=compact_every,
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
        stage_by_id = {e["batch_id"]: e for e in _ing.STAGE_LOG}
        batches = [
            {
                "batch": int(p["batchId"]),
                "sec": round(p["durationMs"]["triggerExecution"] / 1000.0, 3),
                **{
                    k: stage_by_id.get(int(p["batchId"]), {}).get(k, 0.0)
                    for k in ("upsert_s", "refresh_s", "compact_s")
                },
            }
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
    finally:
        shutil.rmtree(work, ignore_errors=True)

    secs = [b["sec"] for b in batches]
    n = len(secs)
    third = max(n // 3, 1)

    def _win(key, lo, hi):
        vals = [b[key] for b in batches[lo:hi]] or [0.0]
        return round(min(vals), 3)

    windows = {
        w: {
            k: _win(k, lo, hi)
            for k in ("sec", "upsert_s", "refresh_s", "compact_s")
        }
        for w, (lo, hi) in {
            "early": (0, third),
            "mid": (third, 2 * third),
            "late": (2 * third, n),
        }.items()
    }
    line = {
        "metric": "streaming_pyramid_ingest",
        "compact_every": compact_every,
        "batches": n,
        "images": total,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(total / wall, 1),
        "per_batch": batches,
        "windows": windows,
    }
    return line


def main() -> list[dict]:
    from pyspark.sql import SparkSession

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
    try:
        # leg order: compaction first so the JVM-warmup penalty lands
        # on the leg we expect to be FASTER — any bias is against the
        # claim, not for it
        legs = [_run_leg(spark, 3), _run_leg(spark, 0)]
    finally:
        spark.stop()
    _write_md(legs)
    for line in legs:
        print(json.dumps(line))
    # PLATEAU assertion (VERDICT r7 next #3) — checked AFTER the MD is
    # written so a failure leaves the evidence on disk.  Min-of-window
    # beats mean on this host's heavy-tailed noise.  The early window
    # is excluded — it legitimately rises while chunks fill (batch 1
    # writes fresh chunks, later batches read+merge them: O(chunk
    # density) saturation).  Once saturated (mid window), late batches
    # must hold the plateau within PLATEAU_BAND; a hidden
    # O(total sink) term would show as monotone growth ~N_BATCHES/10x,
    # far outside the band.
    for line in legs:
        w = line["windows"]
        assert w["late"]["sec"] <= PLATEAU_BAND * w["mid"]["sec"], (
            f"streaming batch latency kept growing past saturation "
            f"(compact_every={line['compact_every']}): "
            f"mid={w['mid']['sec']} late={w['late']['sec']} "
            f"(> {PLATEAU_BAND}x) — suspect an O(total sink) term; see "
            "the per-stage split in BENCH/STREAMING.md to attribute it"
        )
    return legs


def _write_md(legs: list[dict]) -> None:
    sections = []
    for line in legs:
        rows = "\n".join(
            f"| {b['batch']} | {b['sec']:.3f} | {b['upsert_s']:.3f} | "
            f"{b['refresh_s']:.3f} | {b['compact_s']:.3f} |"
            for b in line["per_batch"]
        )
        w = line["windows"]
        wrows = "\n".join(
            f"| {name} | {w[name]['sec']:.3f} | {w[name]['upsert_s']:.3f} | "
            f"{w[name]['refresh_s']:.3f} | {w[name]['compact_s']:.3f} |"
            for name in ("early", "mid", "late")
        )
        label = (
            f"compact_every={line['compact_every']}"
            if line["compact_every"]
            else "no compaction"
        )
        sections.append(
            f"""## {label}

- **{line['rows_per_sec']} images/sec** end-to-end
  ({line['images']} images in {line['wall_sec']} s wall).
- Per-batch trigger wall + per-stage split (engine
  StreamingQueryProgress + streaming.ingest.STAGE_LOG):

| batch | sec | upsert | refresh | compact |
|---|---|---|---|---|
{rows}

Window minima (min-of-window beats mean under this host's
heavy-tailed noise):

| window | sec | upsert | refresh | compact |
|---|---|---|---|---|
{wrows}

Plateau check: late <= {PLATEAU_BAND} x mid (asserted).
"""
        )
    body = "\n".join(sections)
    n_b = legs[0]["batches"]
    md = f"""# Streaming ingest latency + per-stage attribution

{n_b} micro-batches x {legs[0]['images'] // max(n_b, 1)} images
(parquet drop-folder, one file per trigger, availableNow), base z6 +
2 cascaded overview levels, local[{CPUS}].  Two legs: with periodic
manifest compaction (TileDirectory.compact_manifest) run FIRST so JVM
warmup biases against it, and without.

{body}
Interpretation: the per-stage split attributes the r7 watch-item's
upward trend.  The EARLY window legitimately rises while chunks fill
(batch 1 writes fresh chunks; once every chunk exists, every later
upsert/refresh reads + merges committed chunk content — an O(chunk
density) saturation, not a leak).  After saturation the mid and late
windows must agree: a hidden O(total sink) term would keep ALL
stages' floors climbing monotonically; O(#manifest files) listing
creep would show in the upsert/refresh columns of the NO-compaction
leg only (and is measured directly at 300-file scale in
BENCH/MANIFEST_COMPACTION.md).

Measurement notes: run SOLO; min-based comparisons are the honest
signal on this host — single batches can spike 2-6x inside noise
windows.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/STREAMING.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
