"""Exact, vectorized tile-pyramid grid math.

Reimplements (from public formulas + the reference's committed fixture
golden values — NOT a code port) the grid arithmetic that
``ungarj/mapchete_xarray`` delegates to mapchete/tilematrix:

- geodetic + WebMercator zoom pyramids
  (constants per ``/root/reference/tests/testdata/s2_stack.zarr/.zmetadata``
  ``mapchete.pyramid.grid``),
- tile ID from point           (semantics of tilematrix ``tile_from_xy``),
- snap_bounds                  (``/root/reference/mapchete_xarray/_output.py:71-75``),
- affine / raster shape        (``_output.py:76-91``),
- bounds → pixel ranges        (``_output.py:202-205``),
- pixel-center coordinates     (``_output.py:616-626``),
- zarr chunk id from point     (``_output.py:281-297`` incl. the
  ``round(tile_span, 20)`` and pixel-center-origin quirks),
- buffered (pixelbuffer) tile bounds.

Everything is pure numpy (scalars broadcast fine) so the same functions
serve unit tests, pandas/Arrow UDFs, and driver-side planning.  The Spark
hot path does NOT call these per row: tile assignment is emitted as
Catalyst column expressions in ``functions/tiling.py`` (JVM-side,
whole-stage codegen); these numpy twins are the executable spec they are
tested against.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

__all__ = [
    "Pyramid",
    "GEODETIC",
    "MERCATOR",
    "pyramid",
    "Bounds",
    "snap_bounds",
    "tile_from_xy",
    "tile_bounds",
    "buffered_tile_bounds",
    "raster_shape",
    "affine_from_bounds",
    "bounds_to_ranges",
    "pixel_center_coords",
    "zarr_chunk_from_xy",
    "timestamp_regions",
    "EPSG",
    "CRS_WKT",
    "lonlat_to_mercator",
    "mercator_to_lonlat",
    "reproject_bounds",
]

MERCATOR_HALF_WORLD = 20037508.342789244

# CRS identity per grid (reference stores per-band _CRS WKT in zarr
# attrs, _output.py:699, and refuses cross-CRS opens, _input.py:31-35)
EPSG = {"geodetic": 4326, "mercator": 3857}
CRS_WKT = {
    "geodetic": (
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
        '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",'
        '0.0174532925199433],AUTHORITY["EPSG","4326"]]'
    ),
    "mercator": (
        'PROJCS["WGS 84 / Pseudo-Mercator",GEOGCS["WGS 84",DATUM['
        '"WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM['
        '"Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION['
        '"Mercator_1SP"],PARAMETER["central_meridian",0],PARAMETER['
        '"scale_factor",1],PARAMETER["false_easting",0],PARAMETER['
        '"false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","3857"]]'
    ),
}


def lonlat_to_mercator(lon, lat):
    """WGS84 degrees → WebMercator meters; identical formulas to the
    portable SQL (functions/portable.py mercator_x_sql/mercator_y_sql)
    so Python- and Catalyst-side projections agree."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = lon * MERCATOR_HALF_WORLD / 180.0
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) / np.pi * MERCATOR_HALF_WORLD
    return x, y


def mercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x * 180.0 / MERCATOR_HALF_WORLD
    lat = np.degrees(2.0 * (np.arctan(np.exp(y * np.pi / MERCATOR_HALF_WORLD)) - np.pi / 4.0))
    return lon, lat


def reproject_bounds(bounds, src_grid: str, dst_grid: str):
    """Axis-aligned bounds between the two pyramid CRSs (the
    reference's InputData.bbox reprojection, _input.py:99-104).  Both
    transforms are separable and monotone per axis, so the box maps to
    a box — no densification needed.  Mercator clips latitude to the
    square-world ±85.051129° limit."""
    if src_grid == dst_grid:
        return Bounds(*bounds)
    left, bottom, right, top = (float(v) for v in bounds)
    if src_grid == "geodetic" and dst_grid == "mercator":
        lat_max = math.degrees(2 * math.atan(math.exp(math.pi)) - math.pi / 2)
        bottom = max(bottom, -lat_max)
        top = min(top, lat_max)
        (x0, x1), (y0, y1) = lonlat_to_mercator([left, right], [bottom, top])
        return Bounds(float(x0), float(y0), float(x1), float(y1))
    if src_grid == "mercator" and dst_grid == "geodetic":
        (l0, l1), (la0, la1) = mercator_to_lonlat([left, right], [bottom, top])
        return Bounds(float(l0), float(la0), float(l1), float(la1))
    raise ValueError(f"cannot reproject {src_grid} → {dst_grid}")


@dataclass(frozen=True)
class Bounds:
    left: float
    bottom: float
    right: float
    top: float

    def __iter__(self):
        yield from (self.left, self.bottom, self.right, self.top)


@dataclass(frozen=True)
class Pyramid:
    """A fixed global zoom pyramid.

    grid constants: geodetic = bounds [-180,-90,180,90], zoom-0 shape
    1 row x 2 cols; mercator = +/-20037508.342789244 square, zoom-0
    1 x 1.  ``tile_size`` pixels per tile edge; ``metatiling`` groups
    m x m tiles into one storage/work chunk.
    """

    grid: str = "geodetic"
    tile_size: int = 256
    metatiling: int = 1
    pixelbuffer: int = 0

    def __post_init__(self):
        if self.grid not in ("geodetic", "mercator"):
            raise ValueError(f"unknown grid: {self.grid}")
        if self.metatiling not in (1, 2, 4, 8, 16):
            raise ValueError(f"metatiling must be in (1,2,4,8,16): {self.metatiling}")

    @property
    def bounds(self) -> Bounds:
        if self.grid == "geodetic":
            return Bounds(-180.0, -90.0, 180.0, 90.0)
        h = MERCATOR_HALF_WORLD
        return Bounds(-h, -h, h, h)

    @property
    def left(self) -> float:
        return self.bounds.left

    @property
    def top(self) -> float:
        return self.bounds.top

    def matrix_height(self, zoom: int) -> int:
        """Rows of (meta)tiles at zoom (geodetic and mercator heights
        genuinely coincide — only widths differ)."""
        base = 2**zoom
        return max(1, math.ceil(base / self.metatiling))

    def matrix_width(self, zoom: int) -> int:
        base = 2 ** (zoom + 1) if self.grid == "geodetic" else 2**zoom
        return max(1, math.ceil(base / self.metatiling))

    def tile_span(self, zoom: int) -> float:
        """Degrees/meters per (meta)tile edge at zoom (square tiles)."""
        if self.grid == "geodetic":
            base = 180.0 / 2**zoom
        else:
            base = (2 * MERCATOR_HALF_WORLD) / 2**zoom
        return base * self.metatiling

    def pixel_size(self, zoom: int) -> float:
        """Pixel edge length; identical for x/y (square-pixel grids).

        The reference uses pixel_x_size for both axes
        (``_output.py:85,89``) — same value here.
        """
        if self.grid == "geodetic":
            return 180.0 / 2**zoom / self.tile_size
        return (2 * MERCATOR_HALF_WORLD) / 2**zoom / self.tile_size


GEODETIC = Pyramid("geodetic")
MERCATOR = Pyramid("mercator")


def pyramid(grid: str, metatiling: int = 1, tile_size: int = 256, pixelbuffer: int = 0) -> Pyramid:
    return Pyramid(grid, tile_size, metatiling, pixelbuffer)


# ---------------------------------------------------------------------------
# tile assignment
# ---------------------------------------------------------------------------

def tile_from_xy(pyr: Pyramid, x, y, zoom: int):
    """(row, col) of the (meta)tile containing point(s) (x, y).

    Half-open semantics: a point on a tile's left/top edge belongs to
    that tile; on the right/bottom edge it belongs to the next tile —
    except at the grid edge, where it is clipped into the last tile
    (tilematrix ``on_edge_use="rb"`` default behavior).  Vectorized:
    x, y may be numpy arrays.
    """
    span = pyr.tile_span(zoom)
    b = pyr.bounds
    col = np.floor((np.asarray(x, dtype=np.float64) - b.left) / span).astype(np.int64)
    row = np.floor((b.top - np.asarray(y, dtype=np.float64)) / span).astype(np.int64)
    ncols = pyr.matrix_width(zoom)
    nrows = pyr.matrix_height(zoom)
    col = np.clip(col, 0, ncols - 1)
    row = np.clip(row, 0, nrows - 1)
    return row, col


def tile_bounds(pyr: Pyramid, zoom: int, row, col) -> Bounds:
    """Unbuffered bounds of tile (zoom, row, col); vectorized."""
    span = pyr.tile_span(zoom)
    b = pyr.bounds
    row = np.asarray(row, dtype=np.float64)
    col = np.asarray(col, dtype=np.float64)
    left = b.left + col * span
    top = b.top - row * span
    return Bounds(left, top - span, left + span, top)


def buffered_tile_bounds(pyr: Pyramid, zoom: int, row, col, pixelbuffer: int | None = None) -> Bounds:
    """Tile bounds grown by ``pixelbuffer`` pixels on each side.

    Clipped at the top/bottom grid edge (non-crossable); the geodetic
    grid wraps in x conceptually, but for assignment purposes we clip
    x as well (matches mapchete's clipped buffered bounds for
    non-crossing tiles).
    """
    pb = pyr.pixelbuffer if pixelbuffer is None else pixelbuffer
    tb = tile_bounds(pyr, zoom, row, col)
    if pb == 0:
        return tb
    d = pb * pyr.pixel_size(zoom)
    b = pyr.bounds
    return Bounds(
        np.maximum(tb.left - d, b.left),
        np.maximum(tb.bottom - d, b.bottom),
        np.minimum(tb.right + d, b.right),
        np.minimum(tb.top + d, b.top),
    )


# ---------------------------------------------------------------------------
# bounds handling (snap / shape / affine / ranges)
# ---------------------------------------------------------------------------

def snap_bounds(pyr: Pyramid, bounds, zoom: int) -> Bounds:
    """Expand bounds outward to the (meta)tile grid of ``zoom``.

    Golden case (reference fixture ``.zmetadata`` delimiters):
    [15.0064, 47.7604, 16.4863, 48.7485] @ z5 geodetic →
    [11.25, 45.0, 16.875, 50.625].
    """
    left, bottom, right, top = bounds
    span = pyr.tile_span(zoom)
    gb = pyr.bounds
    sl = gb.left + math.floor((left - gb.left) / span) * span
    sr = gb.left + math.ceil((right - gb.left) / span) * span
    sb = gb.top - math.ceil((gb.top - bottom) / span) * span
    st = gb.top - math.floor((gb.top - top) / span) * span
    return Bounds(
        max(sl, gb.left), max(sb, gb.bottom), min(sr, gb.right), min(st, gb.top)
    )


def raster_shape(pyr: Pyramid, bounds, zoom: int) -> tuple[int, int]:
    """(height, width) in pixels of a (snapped) extent.

    Mirrors ``_output.py:82-91``: ceil of extent / pixel_x_size for
    BOTH axes.
    """
    left, bottom, right, top = bounds
    ps = pyr.pixel_size(zoom)
    return (math.ceil((top - bottom) / ps), math.ceil((right - left) / ps))


def affine_from_bounds(pyr: Pyramid, bounds, zoom: int) -> tuple[float, float, float, float, float, float]:
    """rasterio-style ``from_origin``: (a,b,c,d,e,f) = (PS,0,left,0,-PS,top)."""
    left, _, _, top = bounds
    ps = pyr.pixel_size(zoom)
    return (ps, 0.0, float(left), 0.0, -ps, float(top))


def bounds_to_ranges(out_bounds, in_affine, in_shape) -> tuple[int, int, int, int]:
    """(minrow, maxrow, mincol, maxcol) pixel window of ``out_bounds``
    inside the raster described by ``in_affine``/``in_shape``; rounded
    to the nearest pixel and clipped (semantics of
    ``mapchete.io.raster.bounds_to_ranges`` as used at
    ``_output.py:202-205, 365-370``).
    """
    ps, _, left, _, neg_ps, top = in_affine
    height, width = in_shape
    l, b, r, t = out_bounds
    minrow = int(round((top - t) / ps))
    maxrow = int(round((top - b) / ps))
    mincol = int(round((l - left) / ps))
    maxcol = int(round((r - left) / ps))
    return (
        max(0, minrow),
        min(height, maxrow),
        max(0, mincol),
        min(width, maxcol),
    )


def pixel_center_coords(bounds, shape, pyr: Pyramid, zoom: int):
    """(X ascending, Y descending) float64 pixel-center coordinate
    arrays (``_output.py:616-626``): coord = edge ± PS/2 ± i*PS.
    """
    ps = pyr.pixel_size(zoom)
    left, bottom, right, top = bounds
    height, width = shape
    xs = left + ps / 2 + np.arange(width, dtype=np.float64) * ps
    ys = top - ps / 2 - np.arange(height, dtype=np.float64) * ps
    return xs, ys


# ---------------------------------------------------------------------------
# zarr-chunk assignment (storage-chunk id from a point)
# ---------------------------------------------------------------------------

def zarr_chunk_from_xy(pyr: Pyramid, bounds, zoom: int, x, y):
    """Storage-chunk (row, col) for point(s) — the reference's core
    tile-assignment operator (``_output.py:281-297``).

    Quirks reproduced exactly: the chunk span is ``round(PS *
    tile_size * metatiling, 20)``; the origin is the **pixel center**
    (Y.max() / X.min() of the snapped extent), i.e. offset PS/2 inside
    the snapped bounds; ``abs(int(...))`` truncates toward zero.
    Vectorized over x/y.
    """
    ps = pyr.pixel_size(zoom)
    chunk_span = round(ps * pyr.tile_size * pyr.metatiling, 20)
    left, bottom, right, top = bounds
    y_max = top - ps / 2  # first pixel-center row
    x_min = left + ps / 2
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    row = np.abs(((y_max - y) / chunk_span).astype(np.int64))
    col = np.abs(((x - x_min) / chunk_span).astype(np.int64))
    return row, col


# ---------------------------------------------------------------------------
# timestamp-region coalescing (gaps and islands)
# ---------------------------------------------------------------------------

def timestamp_regions(timestamps, time_axis):
    """Group timestamps into runs of consecutive time-axis indexes.

    Pure-python twin of ``_output.py:207-228`` (used by the write path
    to minimize region writes); raises ValueError on a timestamp not
    in the fixed axis (``_output.py:213-217`` — the axis can never be
    extended).  Yields ``(list_of_timestamps, (start_idx, stop_idx))``.
    The distributed twin is the gaps-and-islands window query
    registered as ``sessionize_gaps_islands`` in ``queries.py``.
    """
    axis = list(time_axis)
    idx_map = {t: i for i, t in enumerate(axis)}
    run_ts: list = []
    run_idx: list[int] = []
    for t in sorted(timestamps):
        if t not in idx_map:
            raise ValueError(f"time slice {t} not available to insert: {axis}")
        idx = idx_map[t]
        if run_idx and idx > run_idx[-1] + 1:
            yield run_ts, (run_idx[0], run_idx[-1] + 1)
            run_ts, run_idx = [], []
        run_ts.append(t)
        run_idx.append(idx)
    if run_idx:
        yield run_ts, (run_idx[0], run_idx[-1] + 1)
