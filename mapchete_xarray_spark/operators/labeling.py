"""Raster connected-component labeling — GDAL ``polygonize``'s
region-extraction core (same-valued 4-connected pixel regions →
features) at archive scale.

The classic algorithm is global flood fill — inherently serial.  The
distributed decomposition here is the standard stitching shape (and
the inverse of ``rasterize``'s burn, closing the raster→vector loop):

1. **Per-tile labeling, map-only**: each tile plane is labeled
   independently (two-pass run-based union-find, vectorized row runs
   — no scipy in this sandbox), and ONE unified scan emits (a) one
   NODE row per local component — value, pixel count, global-pixel
   bbox — and (b) the tile's four BORDER pixel rows (side, index,
   value, local label).  Payload pixels never leave the task.
2. **Stitch join**: adjacent tiles' facing borders equi-join on
   (position, value) — two tiny shuffles of border rows (≤4·T px per
   tile, runs of one region collapse into one edge after dedup).
   The antimeridian wraps columns like every x-aware operator here
   (``focal.py``'s rule) so a region crossing the dateline is ONE
   component.
3. **Global union**: the stitch edges feed
   ``cc.connected_components`` (alternating large-star/small-star —
   the SAME operator that clusters near-dup documents; one engine,
   one CC).  Local components never seen at a border keep their own
   label (left join + coalesce-to-self, the cc caller contract).
4. **Aggregate**: per global component — value, total pixels, merged
   bbox, tile span.  Output rows ≈ #regions, never #pixels.

Node ids pack (tile_index, local_label) into an int64:
``tile_index * tile_px² + label`` — local labels are bounded by the
pixels in a tile, so the packing is collision-free by construction
(and gated against int64 overflow at absurd zoom × tile_size).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import grid

_SCAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.IntegerType(), False),  # 0=node 1=border
        T.StructField("tile_row", T.LongType(), False),
        T.StructField("tile_col", T.LongType(), False),
        T.StructField("label", T.IntegerType(), False),
        T.StructField("side", T.IntegerType(), True),  # 0 top 1 bottom 2 left 3 right
        T.StructField("idx", T.IntegerType(), True),
        T.StructField("val", T.DoubleType(), False),
        T.StructField("n_px", T.LongType(), True),
        T.StructField("min_r", T.LongType(), True),
        T.StructField("min_c", T.LongType(), True),
        T.StructField("max_r", T.LongType(), True),
        T.StructField("max_c", T.LongType(), True),
    ]
)


def label_plane(arr: np.ndarray, nodata=None):
    """Two-pass run-based 4-connectivity labeling of one plane.

    Returns ``(labels, stats)``: ``labels`` int32 (−1 = nodata
    background, else 0..k−1 compact component ids), ``stats`` a list
    of (val, n_px, min_r, min_c, max_r, max_c) per component id —
    tile-local pixel coordinates."""
    h, w = arr.shape
    parent: list[int] = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    labels = np.full((h, w), -1, dtype=np.int32)
    run_rows = []  # (row, start, end, run_id)
    prev: list[tuple[int, int, float, int]] = []  # (start, end, val, rid)
    for i in range(h):
        row = arr[i]
        cuts = np.flatnonzero(row[1:] != row[:-1]) + 1
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [w]))
        vals = row[starts]
        cur = []
        pj = 0
        for s, e, v in zip(starts.tolist(), ends.tolist(), vals.tolist()):
            if nodata is not None and v == nodata:
                continue
            rid = len(parent)
            parent.append(rid)
            # union with overlapping same-valued runs in the previous row
            while pj < len(prev) and prev[pj][1] <= s:
                pj += 1
            k = pj
            while k < len(prev) and prev[k][0] < e:
                if prev[k][2] == v:
                    ra, rb = find(rid), find(prev[k][3])
                    if ra != rb:
                        parent[rb] = ra
                k += 1
            cur.append((s, e, v, rid))
            run_rows.append((i, s, e, rid))
        prev = cur
    # compact roots → 0..k-1, paint labels, accumulate stats
    root_of = [find(r) for r in range(len(parent))]
    compact: dict[int, int] = {}
    stats: list[list] = []
    for i, s, e, rid in run_rows:
        root = root_of[rid]
        cid = compact.get(root)
        if cid is None:
            cid = len(stats)
            compact[root] = cid
            stats.append([float(arr[i, s]), 0, i, s, i, e - 1])
        st = stats[cid]
        st[1] += e - s
        if i < st[2]:
            st[2] = i
        if s < st[3]:
            st[3] = s
        if i > st[4]:
            st[4] = i
        if e - 1 > st[5]:
            st[5] = e - 1
        labels[i, s:e] = cid
    return labels, [tuple(s) for s in stats]


def _scanned_df(
    tiles: DataFrame,
    pyr: grid.Pyramid,
    zoom: int,
    band: int,
    ts_idx: int,
    nodata,
) -> DataFrame:
    """The LAZY per-tile pixel scan (map-only — no Exchange above the
    mapInPandas; tests/test_labeling.py audits this plan directly):
    one row per local component (kind=0) plus one per border pixel
    (kind=1)."""
    zoom_v = int(zoom)
    tile_px = pyr.tile_size * pyr.metatiling
    ncols = pyr.matrix_width(zoom_v)
    nrows = pyr.matrix_height(zoom_v)
    if (nrows * ncols) * (tile_px * tile_px) >= 2**62:
        raise ValueError(
            f"label_components: node packing overflows int64 at zoom "
            f"{zoom_v} with {tile_px}px tiles"
        )
    nd = None if nodata is None else float(nodata)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _SCAN_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if int(r.tile_zoom) != zoom_v:
                    raise ValueError(
                        f"label_components(zoom={zoom_v}) got a tile at "
                        f"zoom {r.tile_zoom} — single-zoom input by contract"
                    )
                h, w = int(r.height), int(r.width)
                if h != tile_px or w != tile_px:
                    raise ValueError(
                        f"tile plane {h}x{w} != pyramid tile_px {tile_px}"
                    )
                tr, tc = int(r.tile_row), int(r.tile_col)
                arr = np.frombuffer(r.payload, dtype=np.dtype(r.dtype)).reshape(
                    h, w
                )
                labels, stats = label_plane(arr, nodata=nd)
                for cid, (v, n, i0, j0, i1, j1) in enumerate(stats):
                    rows.append(
                        (0, tr, tc, cid, None, None, v, n,
                         tr * tile_px + i0, tc * tile_px + j0,
                         tr * tile_px + i1, tc * tile_px + j1)
                    )
                for side, lab_line, val_line in (
                    (0, labels[0, :], arr[0, :]),
                    (1, labels[-1, :], arr[-1, :]),
                    (2, labels[:, 0], arr[:, 0]),
                    (3, labels[:, -1], arr[:, -1]),
                ):
                    idxs = np.flatnonzero(lab_line >= 0)
                    for i in idxs.tolist():
                        rows.append(
                            (1, tr, tc, int(lab_line[i]), side, i,
                             float(val_line[i]), None, None, None, None,
                             None)
                        )
            yield pd.DataFrame(rows, columns=cols)

    return tiles.where(
        (F.col("band") == int(band)) & (F.col("ts_idx") == int(ts_idx))
    ).mapInPandas(scan, _SCAN_SCHEMA)


def _labeled_nodes(
    tiles: DataFrame,
    pyr: grid.Pyramid,
    zoom: int,
    band: int,
    ts_idx: int,
    nodata,
    wrap_x: bool,
):
    """Shared pipeline of ``label_components`` / ``labeled_raster``:
    per-tile scan → border stitch → global cc.  Returns ``(labeled,
    ncols, lmax)`` where ``labeled`` has one row per LOCAL component:
    (id, tile_index, val, n_px, min_r, min_c, max_r, max_c,
    component)."""
    from .cc import connected_components

    zoom_v = int(zoom)
    tile_px = pyr.tile_size * pyr.metatiling
    ncols = pyr.matrix_width(zoom_v)
    lmax = tile_px * tile_px
    scanned = _scanned_df(tiles, pyr, zoom_v, band, ts_idx, nodata).persist()

    node = (F.col("tile_row") * ncols + F.col("tile_col")) * lmax + F.col(
        "label"
    )
    border = scanned.where(F.col("kind") == 1).select(
        "tile_row", "tile_col", "side", "idx", "val",
        node.alias("node"),
    )
    # vertical stitch: bottom of (r,c) faces top of (r+1,c)
    bot = border.where(F.col("side") == 1)
    top = border.where(F.col("side") == 0)
    v_edges = bot.alias("a").join(
        top.alias("b"),
        (F.col("a.tile_row") + 1 == F.col("b.tile_row"))
        & (F.col("a.tile_col") == F.col("b.tile_col"))
        & (F.col("a.idx") == F.col("b.idx"))
        & (F.col("a.val") == F.col("b.val")),
    )
    # horizontal stitch: right of (r,c) faces left of (r,c+1); the
    # antimeridian wraps the last column onto column 0 (focal's rule)
    right = border.where(F.col("side") == 3)
    left = border.where(F.col("side") == 2)
    ncol_expr = (
        (F.col("a.tile_col") + 1) % ncols if wrap_x else F.col("a.tile_col") + 1
    )
    h_edges = right.alias("a").join(
        left.alias("b"),
        (F.col("a.tile_row") == F.col("b.tile_row"))
        & (ncol_expr == F.col("b.tile_col"))
        & (F.col("a.idx") == F.col("b.idx"))
        & (F.col("a.val") == F.col("b.val")),
    )
    edges = (
        v_edges.select(
            F.col("a.node").alias("src"), F.col("b.node").alias("dst")
        )
        .unionByName(
            h_edges.select(
                F.col("a.node").alias("src"), F.col("b.node").alias("dst")
            )
        )
        # a one-column-wide wrapped world stitches a tile to itself —
        # self-edges carry no union information
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

    # connected_components materializes eagerly (per-round
    # localCheckpoint), consuming scanned's edge read.  Checkpoint the
    # small nodes projection (one row per per-tile region) eagerly for
    # scanned's second read, then RELEASE the persisted scan — leaving
    # it pinned leaked executor storage for the whole session
    # (ADVICE r5).
    comp = connected_components(edges)
    nodes = (
        scanned.where(F.col("kind") == 0)
        .select(
            node.alias("id"),
            (F.col("tile_row") * ncols + F.col("tile_col")).alias("tile_index"),
            "val",
            "n_px",
            "min_r",
            "min_c",
            "max_r",
            "max_c",
        )
        .localCheckpoint(eager=True)
    )
    scanned.unpersist()
    labeled = nodes.join(comp, "id", "left").withColumn(
        "component", F.coalesce("component", "id")
    )
    return labeled, ncols, lmax


def label_components(
    tiles: DataFrame,
    pyr: grid.Pyramid,
    zoom: int,
    *,
    band: int = 0,
    ts_idx: int = 0,
    nodata: float | None = None,
    wrap_x: bool = True,
) -> DataFrame:
    """Global connected components of same-valued pixel regions over
    TILE_BANDS_SCHEMA planes at ``zoom`` → one row per region:
    (component, val, n_pixels, min_row, min_col, max_row, max_col —
    GLOBAL pixel coordinates — n_tiles).  ``component`` is the
    minimum packed node id of the region (deterministic canonical
    label, the cc operator's contract)."""
    labeled, _, _ = _labeled_nodes(
        tiles, pyr, zoom, band, ts_idx, nodata, wrap_x
    )
    # first(val) is safe: every member of a component carries the SAME
    # value by construction (edges require value equality).  The bbox
    # is in unwrapped global pixel coordinates — a dateline-crossing
    # component reports the full column span (the standard caveat).
    return labeled.groupBy("component").agg(
        F.first("val").alias("val"),
        F.sum("n_px").alias("n_pixels"),
        F.min("min_r").alias("min_row"),
        F.min("min_c").alias("min_col"),
        F.max("max_r").alias("max_row"),
        F.max("max_c").alias("max_col"),
        F.countDistinct("tile_index").alias("n_tiles"),
    )


def labeled_raster(
    tiles: DataFrame,
    pyr: grid.Pyramid,
    zoom: int,
    *,
    band: int = 0,
    ts_idx: int = 0,
    nodata: float | None = None,
    wrap_x: bool = True,
) -> DataFrame:
    """Paint GLOBAL component ids back into tile planes: one int64
    TILE_BANDS_SCHEMA plane per input tile where each pixel holds
    ``component + 1`` (0 = background/nodata — the +1 keeps 0 free
    because a packed component id can itself be 0).  The labeled
    raster is sink-compatible (dtype int64) and feeds every
    raster-defined operator: ``raster_zonal_stats`` over it gives
    per-REGION statistics of any co-located raster.

    Shape: the component pipeline runs once (scan → stitch → cc),
    its (tile, local label) → component mapping shrinks to one
    array-struct row per tile, broadcast-or-shuffle-joins back to the
    input tiles, and a second map-only pass re-labels each plane (the
    per-tile labeling is deterministic, so the two scans agree) and
    paints through the mapping.  Pixels cross exactly ONE exchange
    (the mapping join's tile co-location); the mapping rows are
    key-sized."""
    from .mosaic import TILE_BANDS_SCHEMA

    labeled, ncols, lmax = _labeled_nodes(
        tiles, pyr, zoom, band, ts_idx, nodata, wrap_x
    )
    mapping = (
        labeled.select(
            "tile_index",
            (F.col("id") % lmax).cast("int").alias("local"),
            "component",
        )
        .groupBy("tile_index")
        .agg(F.collect_list(F.struct("local", "component")).alias("m"))
    )
    zoom_v = int(zoom)
    tile_px = pyr.tile_size * pyr.metatiling
    nd = None if nodata is None else float(nodata)

    src = tiles.where(
        (F.col("band") == int(band)) & (F.col("ts_idx") == int(ts_idx))
    ).withColumn(
        "tile_index", F.col("tile_row") * ncols + F.col("tile_col")
    )
    joined = src.join(mapping, "tile_index", "inner")

    def paint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TILE_BANDS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                h, w = int(r.height), int(r.width)
                arr = np.frombuffer(
                    r.payload, dtype=np.dtype(r.dtype)
                ).reshape(h, w)
                labels, _stats = label_plane(arr, nodata=nd)
                lut = np.zeros(int(labels.max()) + 2, dtype=np.int64)
                for m in r.m:
                    lut[int(m["local"])] = int(m["component"]) + 1
                out = np.where(labels >= 0, lut[labels], 0)
                rows.append(
                    (zoom_v, int(r.tile_row), int(r.tile_col),
                     int(r.band), int(r.ts_idx), h, w, "int64",
                     np.ascontiguousarray(out).tobytes(),
                     int(r.n_sources))
                )
            yield pd.DataFrame(rows, columns=cols)

    return joined.mapInPandas(paint, TILE_BANDS_SCHEMA)
