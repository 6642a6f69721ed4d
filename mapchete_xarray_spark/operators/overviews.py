"""Zoom-pyramid overview building (mapchete baselevels analog).

mapchete core processes a zoom range by "baselevels": the base zoom is
computed from inputs and every coarser zoom is derived from the level
below it (mapchete/_processing.py — the reference plugin itself is
single-zoom, `_output.py:343-349`, but its host always builds the
pyramid this way; GDAL's BuildOverviews is the raster twin).

Spark shape (one shuffle per level, the canonical overview build):

- each (zoom, row, col, band, ts_idx) tile-band row maps to its
  parent (row//2, col//2) carrying its quadrant (row%2, col%2) —
  pure Catalyst arithmetic, no UDF;
- groupBy the parent key → ``applyInPandas`` over ≤4 child rows:
  decode the raw plane, 2× decimate (``average`` of each 2x2 block
  or ``nearest`` top-left), paste into the parent quadrant; absent
  children stay fill_value (empty tiles are absent by contract,
  reference ``_output.py:362-364``).

At 10^12 tiles each level is ~1/4 the rows of the level below, so the
whole pyramid costs ~4/3 of one extra pass over the base level; the
parent key is the shuffle key with the same skew properties as the
base tile key (hot city blobs shrink by 4x per level).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mosaic import TILE_BANDS_SCHEMA


def overview_level(
    tiles: DataFrame,
    method: str = "average",
    fill_value: int = 0,
) -> DataFrame:
    """One pyramid level up: tile-band rows at zoom z → rows at z-1.

    Input/output schema is ``TILE_BANDS_SCHEMA`` (what
    ``materialize_tiles`` emits and ``TileDirectory.write`` accepts),
    so levels chain and every level is sink-compatible.  Tile planes
    must be square with an even edge (the 256/512 grid sizes always
    are); ``n_sources`` aggregates as the sum over present children.
    """
    if method not in ("average", "nearest"):
        raise ValueError(f"unknown overview method {method!r}")

    child = tiles.select(
        (F.col("tile_zoom") - F.lit(1)).alias("tile_zoom"),
        F.expr("tile_row div 2").cast("long").alias("p_row"),
        F.expr("tile_col div 2").cast("long").alias("p_col"),
        (F.col("tile_row") % 2).cast("int").alias("qr"),
        (F.col("tile_col") % 2).cast("int").alias("qc"),
        "band",
        "ts_idx",
        "height",
        "width",
        "dtype",
        "payload",
        "n_sources",
    )

    fv = int(fill_value)
    meth = method

    # r9 (guide §2.3, shuffle fewer bytes): each child's 2× decimation
    # depends only on that child, so it runs MAP-SIDE before the parent
    # exchange — the shuffle then carries quarter planes (payload/4)
    # instead of full child planes.  The assemble stage only pastes.
    import pandas as pd

    from typing import Iterator

    def decimate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "tile_zoom", "p_row", "p_col", "qr", "qc", "band", "ts_idx",
            "height", "width", "dtype", "payload", "n_sources",
        ]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                h, w = int(r.height), int(r.width)
                if h != w or h % 2:
                    raise ValueError(
                        f"overview needs square even-edge tiles, got {h}x{w}"
                    )
                dt = np.dtype(r.dtype)
                arr = np.frombuffer(r.payload, dtype=dt).reshape(h, w)
                half = h // 2
                if meth == "nearest":
                    ds = arr[::2, ::2]
                else:
                    # mean in float64, round-half-up back to the plane
                    # dtype (GDAL 'average' overview semantics for
                    # integer bands)
                    m = (
                        arr.reshape(half, 2, half, 2)
                        .astype(np.float64)
                        .mean(axis=(1, 3))
                    )
                    ds = (
                        np.floor(m + 0.5).astype(dt)
                        if np.issubdtype(dt, np.integer)
                        else m.astype(dt)
                    )
                rows.append(
                    (
                        int(r.tile_zoom), int(r.p_row), int(r.p_col),
                        int(r.qr), int(r.qc), int(r.band), int(r.ts_idx),
                        h, w, str(dt),
                        np.ascontiguousarray(ds).tobytes(), int(r.n_sources),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    from pyspark.sql import types as T

    quarter_schema = T.StructType(
        [
            T.StructField("tile_zoom", T.IntegerType(), False),
            T.StructField("p_row", T.LongType(), False),
            T.StructField("p_col", T.LongType(), False),
            T.StructField("qr", T.IntegerType(), False),
            T.StructField("qc", T.IntegerType(), False),
            T.StructField("band", T.IntegerType(), False),
            T.StructField("ts_idx", T.IntegerType(), False),
            # height/width are the PARENT canvas dims (the child's
            # original edge); the quarter payload is (height/2)²
            T.StructField("height", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("dtype", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("n_sources", T.IntegerType(), False),
        ]
    )
    quarters = child.mapInPandas(decimate, quarter_schema)

    def assemble(key, pdf):
        zoom_v, row_v, col_v, band_v, ts_v = (int(k) for k in key)
        h = int(pdf.height.iloc[0])
        w = int(pdf.width.iloc[0])
        dt = np.dtype(pdf.dtype.iloc[0])
        canvas = np.full((h, w), fv, dtype=dt)
        n_src = 0
        half = h // 2
        for r in pdf.itertuples():
            ds = np.frombuffer(r.payload, dtype=dt).reshape(half, half)
            r0, c0 = int(r.qr) * half, int(r.qc) * half
            canvas[r0 : r0 + half, c0 : c0 + half] = ds
            n_src += int(r.n_sources)
        return (
            zoom_v,
            row_v,
            col_v,
            band_v,
            ts_v,
            h,
            w,
            str(dt),
            np.ascontiguousarray(canvas).tobytes(),
            n_src,
        )

    from .groupmap import batched_group_map

    # ≤4-child groups: batched per Arrow batch (groupmap), not
    # per-group applyInPandas — same single exchange on the parent key
    return batched_group_map(
        quarters,
        ["tile_zoom", "p_row", "p_col", "band", "ts_idx"],
        assemble,
        TILE_BANDS_SCHEMA,
    )


def _pruned_base_read(spark, base_td, ov_chunks, ct: int, max_keys: int = 10_000):
    """Base-level read restricted to the children of the given
    overview chunks, as a (chunk_row, chunk_col) IN-list on the BASE
    sink's PARTITION columns — the filter Catalyst can turn into
    directory pruning (PartitionFilters), which a join on derived
    tile columns never could.

    The full-scan fallback gates on the number of EMITTED IN-list
    tuples (``base_keys``), not the overview chunk count: when the
    base sink's chunk_tiles is smaller than the overview's, each
    overview chunk expands to ((2·ct/bct)+1)² base keys, so a
    chunk-count gate could admit a 10k×16+-tuple struct IN-list — a
    giant Catalyst expression that cliffs planning/codegen.  The key
    enumeration aborts the moment it crosses the cap, so an oversized
    refresh never materializes the full key set either."""
    base = base_td.read(spark)
    bct = int(base_td.cfg.chunk_tiles)
    base_keys = set()
    for cr, cc in ov_chunks:
        for br in range(cr * ct * 2 // bct, ((cr + 1) * ct * 2 - 1) // bct + 1):
            for bc in range(cc * ct * 2 // bct, ((cc + 1) * ct * 2 - 1) // bct + 1):
                base_keys.add((br, bc))
        if len(base_keys) > max_keys:
            # past the cap the IN-list stops paying and a full scan is
            # the honest plan
            return base
    from ..sources.tiledir import chunk_in_list_pred

    return base.where(chunk_in_list_pred(base, base_keys))


def refresh_overviews(
    spark,
    base_td,
    ov_td,
    changed_tiles: DataFrame,
    method: str = "average",
) -> dict:
    """Incremental pyramid maintenance: after some base tiles were
    re-written, recompute ONLY the overview chunks they touch and
    commit them with the sink's ``refresh`` mode (a new attempt per
    covered chunk; the reader's chunk-level last-writer-wins flips
    each chunk atomically, untouched chunks keep their attempts).

    ``changed_tiles``: (tile_row, tile_col) at the BASE zoom — e.g.
    the keys of a reprocessing job's output.  The refresh unit is the
    overview CHUNK (refresh writes must cover complete chunks), so
    every parent in a touched chunk is rebuilt from its children: at
    10^12 tiles a k-tile change reads O(k) chunk neighborhoods, not
    the pyramid.  Returns the sink write stats."""
    from ..sources.tiledir import TileDirError

    if int(ov_td.cfg.zoom) != int(base_td.cfg.zoom) - 1:
        raise TileDirError(
            f"refresh_overviews maintains one level: base zoom "
            f"{base_td.cfg.zoom}, overview zoom {ov_td.cfg.zoom}"
        )
    ct = int(ov_td.cfg.chunk_tiles)
    # the changed set is small by contract → the touched overview
    # chunks are a bounded driver list, which lets the child read push
    # a (chunk_row, chunk_col) IN-list onto the BASE sink's partition
    # columns — without it the broadcast join on derived columns
    # cannot prune and every refresh scans the whole base level's
    # payload bytes (the O(k) claim would be false at the design
    # point).  Past ~10k touched chunks the IN-list stops paying and
    # a full-scan refresh is the honest plan anyway.
    ov_chunks = [
        (int(r._cr), int(r._cc))
        for r in changed_tiles.selectExpr(
            f"(tile_row div 2) div {ct} as _cr",
            f"(tile_col div 2) div {ct} as _cc",
        )
        .distinct()
        .collect()
    ]
    if not ov_chunks:
        return {"attempt_id": None, "chunks": 0, "tiles": 0}
    base = _pruned_base_read(spark, base_td, ov_chunks, ct).drop(
        "chunk_row", "chunk_col"
    )
    chunks = spark.createDataFrame(ov_chunks, "_cr long, _cc long")
    kids = (
        base.withColumn("_cr", F.expr(f"(tile_row div 2) div {ct}"))
        .withColumn("_cc", F.expr(f"(tile_col div 2) div {ct}"))
        .join(F.broadcast(chunks), ["_cr", "_cc"])
        .drop("_cr", "_cc")
    )
    # fill belongs to the level being WRITTEN: absent-child quadrants
    # must carry the overview sink's nodata, not the base's
    lvl = overview_level(kids, method=method, fill_value=ov_td.cfg.fill_value)
    return ov_td.write(lvl, mode="refresh")


def refresh_pyramid(
    spark,
    base_td,
    ov_tds,
    changed_tiles: DataFrame,
    method: str = "average",
) -> list[dict]:
    """CASCADING incremental pyramid maintenance (mapchete's
    baselevels workflow, host-side `_processing` zoom descent — the
    plugin context is ``_output.py:343-349``): a base change must
    propagate z-1 → z-2 → … through the whole overview chain, not
    just the first level.

    ``ov_tds``: the overview sinks ordered top-down from the base
    (zoom base-1, base-2, …; each level's ``refresh_overviews`` call
    re-validates the one-step zoom relation, so a mis-ordered chain
    raises instead of writing garbage).  ``changed_tiles``:
    (tile_row, tile_col) at the BASE zoom.

    Each level's changed-tile set is the PARENTS of the previous
    level's (``div 2`` on both axes — shrinking ~4× per level), so a
    k-tile base change touches O(k) chunk neighborhoods at every
    level and the whole cascade costs ~4/3 of one level-1 refresh.
    Level i reads level i-1's SINK, which the previous loop iteration
    has already committed — the sequential order is the correctness
    contract, not an implementation detail.  Returns one write-stats
    dict per level."""
    stats = []
    prev_td = base_td
    changed = changed_tiles.select("tile_row", "tile_col")
    for ov_td in ov_tds:
        stats.append(
            refresh_overviews(spark, prev_td, ov_td, changed, method=method)
        )
        changed = (
            changed.selectExpr(
                "tile_row div 2 as tile_row", "tile_col div 2 as tile_col"
            ).distinct()
        )
        prev_td = ov_td
    return stats


def build_overviews(
    tiles: DataFrame,
    levels: int,
    method: str = "average",
    fill_value: int = 0,
) -> DataFrame:
    """The full pyramid: base rows unioned with ``levels`` coarser
    zooms, each derived from the level below (so a 3-level build is 3
    chained single shuffles over geometrically shrinking data, ~4/3 of
    one base pass in total).  Returns one TILE_BANDS_SCHEMA frame.

    SINK NOTE: a ``TileDirectory`` holds exactly ONE zoom level (its
    chunk/merge keys deliberately ignore tile_zoom, and ``write``
    refuses rows at any other zoom) — to persist a pyramid, split this
    union by ``tile_zoom`` and write each level to its own sink, as
    ``plans.job`` and ``streaming.streaming_pyramid_ingest`` do."""
    from pyspark import StorageLevel

    if levels < 1:
        raise ValueError("levels must be >= 1")
    out = tiles
    level = tiles
    for i in range(levels):
        level = overview_level(level, method=method, fill_value=fill_value)
        if i < levels - 1:
            # each level is BOTH a union branch and the next level's
            # input; without a persist the deeper levels' lineage
            # re-runs every shallower assemble stage (ReuseExchange is
            # not guaranteed, e.g. under AQE replanning) and the
            # "~4/3 of one base pass" claim breaks to O(L) passes
            level = level.persist(StorageLevel.MEMORY_AND_DISK)
        out = out.unionByName(level)
    return out
