"""Raster↔vector tile materialization (north_star op; the Spark twin
of the reference's extract_subset/write dataflow, SURVEY §2.A #6/#13).

Pipeline shape (all sizes are the 100 TB design point):

1. **Candidate assignment** (JVM): every image footprint
   (minx,miny,maxx,maxy) is exploded to the (buffered) tiles it
   intersects — two `sequence()` explodes over the tile row/col
   ranges; pixelbuffer widens the range arithmetic, not a UDF.
2. **Shuffle once** on (tile_row, tile_col) — range partitioning via
   ``repartitionByRange`` keeps spatially-adjacent tiles in the same
   files downstream (Z-order locality of tile_id).
3. **Paste** (`applyInPandas` per tile): decode payloads (Arrow
   batch → numpy), nearest-neighbor resample each image onto the
   tile's pixel grid via the affine math of ``grid.py``, paste in
   deterministic image_id order (later wins, like mosaic overwrite),
   emit one row per (tile, band) with the band plane bytes.

Empty tiles are simply absent (the reference skips empty writes,
``_output.py:362-364``); readers materialize fill_value planes on
demand (``sources/tiledir.py``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codecs, grid

TILE_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("tile_zoom", T.IntegerType(), False),
        T.StructField("tile_row", T.LongType(), False),
        T.StructField("tile_col", T.LongType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("ts_idx", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("dtype", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_sources", T.IntegerType(), False),
    ]
)


def candidate_tiles(
    images: DataFrame,
    pyr: grid.Pyramid,
    zoom: int,
    pixelbuffer: int = 0,
) -> DataFrame:
    """Explode each image to the tiles whose *buffered* bounds its
    footprint intersects.  Pure Catalyst: floor arithmetic + sequence
    explode.  A tile buffered by P pixels intersects footprints up to
    P*PS outside it, so the candidate range uses bounds ± P*PS.

    Footprints entirely OUTSIDE the grid produce no candidates: the
    row/col range bounds are computed first and rows where hi < lo are
    dropped before the explode — Spark's sequence(lo, hi) would
    otherwise auto-step DOWNWARD for hi < lo (an off-grid footprint
    used to explode onto negative tile ids)."""
    span = pyr.tile_span(zoom)
    ps = pyr.pixel_size(zoom)
    buf = pixelbuffer * ps
    nrows = pyr.matrix_height(zoom)
    ncols = pyr.matrix_width(zoom)
    b = pyr.bounds
    return (
        images.withColumn(
            "_r_lo",
            F.expr(
                f"greatest(cast(floor(({b.top!r} - (maxy + {buf!r})) / {span!r}) as bigint), cast(0 as bigint))"
            ),
        )
        .withColumn(
            "_r_hi",
            F.expr(
                f"least(cast(floor(({b.top!r} - (miny - {buf!r})) / {span!r}) as bigint), cast({nrows - 1} as bigint))"
            ),
        )
        .withColumn(
            "_c_lo",
            F.expr(
                f"greatest(cast(floor(((minx - {buf!r}) - {b.left!r}) / {span!r}) as bigint), cast(0 as bigint))"
            ),
        )
        .withColumn(
            "_c_hi",
            F.expr(
                f"least(cast(floor(((maxx + {buf!r}) - {b.left!r}) / {span!r}) as bigint), cast({ncols - 1} as bigint))"
            ),
        )
        .where(F.expr("_r_hi >= _r_lo and _c_hi >= _c_lo"))
        .withColumn("tile_row", F.expr("explode(sequence(_r_lo, _r_hi))"))
        .withColumn("tile_col", F.expr("explode(sequence(_c_lo, _c_hi))"))
        .drop("_r_lo", "_r_hi", "_c_lo", "_c_hi")
        .withColumn("tile_zoom", F.lit(zoom))
    )


def materialize_tiles(
    images: DataFrame,
    pyr: grid.Pyramid,
    zoom: int,
    pixelbuffer: int = 0,
    bands: int = 3,
    dtype: str = "uint8",
    fill_value: int = 0,
    ts_index: dict | None = None,
) -> DataFrame:
    """images (image_id, bytes, w, h, fmt, minx..maxy[, ts]) →
    one row per (tile, band) with the mosaicked pixel plane.

    ts_index: optional {timestamp → time-axis index}; images carry a
    ``ts`` column and tiles are materialized per (tile, ts_idx).
    Unknown timestamps raise inside the task (fixed-axis rule,
    reference ``_output.py:213-217``)."""
    if bands > codecs.CHANNELS:
        # decode_image always yields CHANNELS planes — fail fast with a
        # config error instead of a shape-mismatch deep inside a task
        raise ValueError(
            f"bands={bands} exceeds the {codecs.CHANNELS}-channel image "
            f"payload format (codecs.CHANNELS); declare at most "
            f"{codecs.CHANNELS} bands or extend the codec"
        )
    cand = candidate_tiles(images, pyr, zoom, pixelbuffer)
    group_cols = ["tile_zoom", "tile_row", "tile_col"]
    if ts_index is not None:
        cand = cand.withColumn("_ts", F.col("ts").cast("string"))
        group_cols.append("_ts")

    tile_px = pyr.tile_size * pyr.metatiling + 2 * pixelbuffer
    span = pyr.tile_span(zoom)
    ps = pyr.pixel_size(zoom)
    gb = pyr.bounds
    np_dtype = np.dtype(dtype)
    ts_map = dict(ts_index or {})

    def paste(key, pdf):  # no hints: stringified annotations trip applyInPandas inference
        zoom_v, row_v, col_v = int(key[0]), int(key[1]), int(key[2])
        if ts_map:
            # the axis granularity is whole seconds; Spark's
            # cast(ts as string) appends a fraction ONLY when the
            # sub-second component is nonzero — such a timestamp is
            # off-axis and must raise (reference .sel exact-match
            # semantics, _output.py:213-217), never be silently
            # truncated onto the nearest axis step
            ts_full = str(key[3])
            if len(ts_full) > 19:
                raise ValueError(
                    f"time slice {ts_full} not available to insert: "
                    f"sub-second timestamps are off the fixed axis "
                    f"{sorted(ts_map)}"
                )
            ts_v = ts_full[:19].replace("T", " ")
            if len(ts_v) == 10:
                # bare-date ts (DateType column): pad to midnight, the
                # same normalization the axis itself went through
                # (normalize_step) — an on-axis midnight step must not
                # raise just because the column type dropped the time
                ts_v = ts_v + " 00:00:00"
            if ts_v not in ts_map:
                raise ValueError(
                    f"time slice {ts_v} not available to insert: {sorted(ts_map)}"
                )
            ts_idx = int(ts_map[ts_v])
        else:
            ts_idx = 0
        # buffered tile bounds (clipped at grid edge like grid.py)
        left = gb.left + col_v * span - pixelbuffer * ps
        top = gb.top - row_v * span + pixelbuffer * ps
        canvas = np.full((tile_px, tile_px, bands), fill_value, dtype=np_dtype)
        touched = 0
        for r in pdf.sort_values("image_id").itertuples():
            arr = codecs.decode_image(r.bytes, int(r.w), int(r.h), r.fmt)
            # nearest-neighbor resample footprint → tile pixel grid
            # (float() guards against DECIMAL-typed bounds columns —
            # Spark parses plain decimal literals as DecimalType)
            c0 = (float(r.minx) - left) / ps
            r0 = (top - float(r.maxy)) / ps
            c1 = (float(r.maxx) - left) / ps
            r1 = (top - float(r.miny)) / ps
            tc0, tr0 = max(0, int(round(c0))), max(0, int(round(r0)))
            tc1, tr1 = min(tile_px, int(round(c1))), min(tile_px, int(round(r1)))
            if tc1 <= tc0 or tr1 <= tr0:
                continue
            # source index per target pixel center
            tgt_cols = np.arange(tc0, tc1)
            tgt_rows = np.arange(tr0, tr1)
            fx = ((tgt_cols + 0.5) - c0) / max(c1 - c0, 1e-12) * r.w
            fy = ((tgt_rows + 0.5) - r0) / max(r1 - r0, 1e-12) * r.h
            sx = np.clip(fx.astype(np.int64), 0, r.w - 1)
            sy = np.clip(fy.astype(np.int64), 0, r.h - 1)
            canvas[np.ix_(tgt_rows, tgt_cols)] = arr[np.ix_(sy, sx)][..., :bands]
            touched += 1
        if touched == 0:
            # a candidate tile every image missed after pixel rounding
            # (sub-half-pixel sliver on a boundary): EMPTY TILES ARE
            # ABSENT (reference _output.py:362-364) — emitting a full
            # fill-value plane would make tiles_exist claim it exists
            # and readers could no longer tell empty from written
            # nodata
            return None
        return [
            (
                zoom_v,
                row_v,
                col_v,
                b,
                ts_idx,
                tile_px,
                tile_px,
                dtype,
                np.ascontiguousarray(canvas[:, :, b]).tobytes(),
                touched,
            )
            for b in range(bands)
        ]

    from .groupmap import batched_group_map

    # ONE shuffle hashed on the tile key (a repartitionByRange first
    # would just shuffle twice); per-tile groups are batched per Arrow
    # batch (groupmap), not dispatched per-group.  Output file
    # locality is the sink's job: it range-sorts the far smaller
    # (tile, band) rows on the chunk key at write time.
    return batched_group_map(cand, list(group_cols), paste, TILE_BANDS_SCHEMA)
