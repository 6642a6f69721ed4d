#!/usr/bin/env python
"""Input-size scaling for the raster operator family.

The text/embedding queries have BENCH/SCALING_SF1.md; the raster
operators scale with TILE COUNT, not corpus rows, so their sweep is a
ZOOM sweep: the same 200-AOI table burned at z5 → z6 → z7 covers ~4×
the tiles per step (pixel area of the zones is resolution², tiles
follow).  Each op runs over the (cached) burned plane so the op
timing excludes the burn itself; the burn is its own row.

exponent = log(t_next / t_prev) / log(4) per zoom step: 1.0 = linear
in tile count, < 1 = fixed overhead still amortizing, > 1 = flag.

Writes BENCH/RASTER_SCALING.md.  Solo-run discipline applies (host
noise windows) — run nothing else Spark-side concurrently.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_SWEEP_CPUS", "16"))
REPS = int(os.environ.get("SPARK_GRAFT_SWEEP_REPS", "2"))
ZOOMS = [5, 6, 7]


def main() -> None:
    from pyspark.sql import SparkSession

    from mapchete_xarray_spark import grid
    from mapchete_xarray_spark.operators.labeling import label_components
    from mapchete_xarray_spark.operators.rasterize import rasterize_zones
    from mapchete_xarray_spark.operators.zonal import (
        raster_zonal_stats,
        zonal_histogram,
        zonal_stats,
    )
    from mapchete_xarray_spark.sources.aoi import aoi_pandas

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("raster-scale-sweep")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    zones = aoi_pandas()

    def timeit(fn):
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    rows = {}  # op -> {zoom: (sec, out_rows)}
    tiles_at = {}
    for z in ZOOMS:
        plane = rasterize_zones(spark, zones, grid.GEODETIC, z)
        t_burn = timeit(lambda: plane.count())
        cached = plane.persist()
        n_tiles = cached.count()
        tiles_at[z] = n_tiles
        ops = {
            "rasterize_burn": (lambda: rasterize_zones(
                spark, zones, grid.GEODETIC, z).count(), t_burn),
            "zonal_stats_polygon": (lambda: zonal_stats(
                cached, zones, grid.GEODETIC, z, nodata=0).count(), None),
            "zonal_histogram": (lambda: zonal_histogram(
                cached, zones, grid.GEODETIC, z, nodata=0).count(), None),
            "raster_zonal": (lambda: raster_zonal_stats(
                cached, cached).count(), None),
            "label_components": (lambda: label_components(
                cached, grid.GEODETIC, z, nodata=0).count(), None),
        }
        for name, (fn, pre) in ops.items():
            sec = pre if pre is not None else timeit(fn)
            rows.setdefault(name, {})[z] = round(sec, 3)
        cached.unpersist()
        print(f"z{z}: {n_tiles} tiles done", flush=True)

    lines = [
        "# Raster operator family — zoom (tile-count) scaling",
        "",
        f"200-AOI table burned at z{ZOOMS[0]}..z{ZOOMS[-1]} "
        f"(bbox tile cover grows ~2-2.5x per step at these zone sizes, converging to 4x as zones span more tiles; exponents use the ACTUAL tile ratio), local[{CPUS}], min-of-{REPS}; ops run "
        "over the persisted burned plane so timings exclude the burn.",
        "",
        "| zoom | " + " | ".join(f"z{z}" for z in ZOOMS) + " |",
        "|---|" + "---|" * len(ZOOMS),
        "| tiles | " + " | ".join(f"{tiles_at[z]:,}" for z in ZOOMS) + " |",
        "",
        "| op | " + " | ".join(f"t_z{z} (s)" for z in ZOOMS)
        + " | exp z5→z6 | exp z6→z7 |",
        "|---|" + "---|" * (len(ZOOMS) + 2),
    ]
    for name, tz in rows.items():
        exps = []
        for a, b in zip(ZOOMS, ZOOMS[1:]):
            ratio = tiles_at[b] / tiles_at[a]
            exps.append(
                round(math.log(tz[b] / tz[a]) / math.log(ratio), 2)
            )
        lines.append(
            f"| {name} | " + " | ".join(f"{tz[z]}" for z in ZOOMS)
            + " | " + " | ".join(str(e) for e in exps) + " |"
        )
    lines += [
        "",
        "exponent = log(t_ratio)/log(tile_ratio): 1.0 = linear in tile",
        "count; < 1 = fixed overhead (session, zone broadcast, CC",
        "rounds) still amortizing; > 1 would flag a superlinear plan.",
        "label_components includes the global CC rounds — its edge set",
        "grows with border length (~sqrt of pixels per region times",
        "region count), not tile area, so sublinear exponents are the",
        "expected shape.",
    ]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/RASTER_SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
