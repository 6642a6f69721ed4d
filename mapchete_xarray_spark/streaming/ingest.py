"""Structured Streaming tile ingest.

The reference is batch-only (its incrementality = resume anti-join,
SURVEY §2.A #11, implemented in sources/tiledir.py).  This module
covers the streaming-ingest shape a live image feed would need:

    readStream → tile assignment (same Catalyst expressions as batch
    — code reuse is the point) → watermarked windowed counts per tile
    → sink (foreachBatch → TileDirectory manifest-style appends, or
    memory/console for tests).

The tile expressions are identical Columns to the batch path, so
correctness is inherited from the batch oracles; streaming tests
check plumbing (watermark, window, availableNow termination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import portable
from ..functions.tiling import with_tile_columns


def rate_points(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Unbounded deterministic point stream: the rate source's value
    column feeds the same synth formulas as the batch fixtures."""
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return (
        src.withColumnRenamed("value", "key")
        .withColumn("lon", F.expr(portable.synth_lon_sql("key")))
        .withColumn("lat", F.expr(portable.synth_lat_sql("key")))
    )


def streaming_tile_counts(
    points: DataFrame,
    zoom: int = 6,
    grid: str = "geodetic",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Watermarked per-(window, tile) counts — late rows beyond the
    watermark are dropped by the engine, state is bounded."""
    t = with_tile_columns(points, "lon", "lat", grid, zoom)
    return (
        t.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("tile_id"))
        .agg(F.count("*").alias("n_images"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "tile_id",
            "n_images",
        )
    )


def file_ingest_points(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source variant (parquet drop-folder → stream), the shape a
    real feed (S3 notifications / Iceberg incremental scan) plugs into."""
    return spark.readStream.schema(schema).parquet(path)


def run_to_memory(stream_df: DataFrame, query_name: str, timeout_sec: float = 60.0):
    """Drain all currently-available input (availableNow) into an
    in-memory table and stop — the deterministic test harness."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
