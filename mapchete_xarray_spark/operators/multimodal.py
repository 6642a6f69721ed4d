"""Multimodal column operators: image/audio/video as opaque binary +
typed metadata, processed in Arrow batches (mapInPandas) — never
per-row Python.

Real in this sandbox (numpy-only):
- ``decode_stats``: decode pixels, emit per-image feature stats
  (mean/std per channel, luminance histogram coarse bins, phash) —
  the "feature-extract" stage of a training-data pipeline.
- ``resize_images``: nearest-neighbor resize to a target (w, h),
  re-encode with the same codec — the canonical preprocessing op.

STUBBED (libs not in container; the Spark-side plumbing — schema,
batch shape, partitioning — is real and tested):
- ``decode_external``: JPEG/PNG/WebP decode would go here; raises
  NotImplementedError naming the missing codec.
- ``sample_video_frames``: frame extraction for video payloads;
  deterministic fake emits evenly-spaced "frames" sliced from the
  byte stream so the pipeline shape (1 row in → n frame rows out)
  is exercised without ffmpeg.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import codecs

STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("std_lum", T.DoubleType(), False),
        T.StructField("hist4", T.ArrayType(T.LongType()), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Per-image decoded-pixel statistics; map-only Arrow stage."""
    from ..sources.images import _phash

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                arr = codecs.decode_image(r.bytes, int(r.w), int(r.h), r.fmt)
                lum = arr.astype(np.float64).mean(axis=2)
                hist, _ = np.histogram(lum, bins=4, range=(0, 256))
                rows.append(
                    (
                        r.image_id,
                        float(arr[:, :, 0].mean()),
                        float(arr[:, :, 1].mean()),
                        float(arr[:, :, 2].mean()),
                        float(lum.std()),
                        hist.astype(np.int64).tolist(),
                        _phash(arr),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in STATS_SCHEMA.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, STATS_SCHEMA
    )


def resize_images(images: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize, same schema out (bytes/w/h replaced)."""
    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                arr = codecs.decode_image(r.bytes, int(r.w), int(r.h), r.fmt)
                sy = np.clip(
                    (np.arange(target_h) + 0.5) * r.h / target_h, 0, r.h - 1
                ).astype(np.int64)
                sx = np.clip(
                    (np.arange(target_w) + 0.5) * r.w / target_w, 0, r.w - 1
                ).astype(np.int64)
                res = arr[np.ix_(sy, sx)]
                rows.append(
                    (r.image_id, codecs.encode_image(res, r.fmt), target_w, target_h, r.fmt)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, out_schema
    )


def decode_external(images: DataFrame, fmt: str) -> DataFrame:
    """JPEG/PNG/WebP decode stub — the container has no image codec
    libraries.  The interface (binary in, (h,w,3) uint8 out inside
    Arrow batches) is what a Pillow/libvips-backed implementation
    would plug into."""
    raise NotImplementedError(
        f"decoding fmt={fmt!r} requires an image codec library (Pillow/"
        "libvips/turbojpeg), none of which exist in this sandbox; "
        "supported here: 'raw', 'q8' via codecs.decode_image"
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), False),
    ]
)


def sample_video_frames(videos: DataFrame, n_frames: int = 4, id_col: str = "video_id", bytes_col: str = "bytes") -> DataFrame:
    """Deterministic STAND-IN for video frame sampling (no ffmpeg in
    sandbox): slices ``n_frames`` evenly-spaced byte windows from the
    payload, exercising the 1→n fan-out shape a real extractor has."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                payload = bytes(getattr(r, bytes_col))
                n = max(len(payload), 1)
                step = max(n // n_frames, 1)
                for i in range(n_frames):
                    start = min(i * step, n - 1)
                    rows.append(
                        (getattr(r, id_col), i, payload[start : start + min(256, n)])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return videos.select(
        videos[id_col].alias("video_id"), videos[bytes_col].alias("bytes")
    ).mapInPandas(run, FRAMES_SCHEMA)
