"""Raster reprojection (UTM → geodetic tile grid), GDAL-parity nearest warp.

The reference's one real-satellite dataflow reads UTM 33N GeoTIFFs and
warps them onto geodetic zoom-5 tiles (``s2_stack.mapchete`` +
``generate_s2_stack.py:11-17``, via mapchete→rasterio→GDAL).  This
module re-expresses that warp in pure numpy so it can run inside a
Spark ``mapInPandas`` stage, and reproduces GDAL's output *bit-exactly*
(0 / 983 040 pixel mismatches against the reference's committed golden
``s2_stack.zarr`` across all 5 scenes × 3 bands — pinned by
``tests/test_s2_stack.py``).

Bit parity requires copying GDAL's two public conventions (both from
the GDAL source tree, an MIT/X-licensed public project — algorithm
reproduced from its documented behavior, no code copied):

* **Approximate transformer** (``alg/gdaltransformer.cpp``,
  ``GDALApproxTransform``): per destination scanline, the exact
  dst→src transform is evaluated at the first / middle / last pixel
  only; if the middle's deviation from the endpoint chord is within
  ``tolerance`` (default 0.125 src px, L1: ``|dx|+|dy|``), the whole
  span is linearly interpolated, else the span splits into
  ``[first, mid-1]`` and ``[mid, last]`` and recurses (midpoint index
  ``(n-1)//2``; spans of <3 pixels transform exactly).  The calibrated
  details that matter for parity — L1 metric, asymmetric split, the
  midpoint landing in the *right* child — were established
  empirically against the golden zarr (see test); plausible variants
  (L2/L∞ metric, shared-midpoint split, ``n//2``) each leave 100-600
  mismatched pixels.
* **Nearest pick** (``alg/gdalwarpkernel.cpp``): source pixel index is
  ``trunc(coord + 1e-10)``, i.e. floor-with-epsilon for the
  non-negative in-bounds case, on continuous src pixel coordinates
  where integers are pixel edges.

The exact transform itself is the Krüger n-series
(``functions/tmerc.py``), nanometer-equal to PROJ inside a UTM zone —
far below the 0.125 px tolerance, so engine/PROJ ulp differences are
absorbed by the shared approximation grid.

Scale shape: one ``warp_plane`` call handles one (scene band × tile)
pair and is embarrassingly parallel across both; the exact transform
is evaluated at O(segments) sample points per row (~10-30 for a 256 px
row at z5), everything else is numpy interpolation + one fancy-index
gather.  No Python per-pixel work outside the recursion's sample
points.
"""

from __future__ import annotations

import numpy as np

from ..functions import tmerc

__all__ = ["approx_transform_row", "warp_plane", "TileWarper"]

#: GDAL's default approximation tolerance, in source pixel units.
DEFAULT_TOLERANCE = 0.125


def approx_transform_row(
    xin: np.ndarray, exact_fn, tol: float = DEFAULT_TOLERANCE
) -> tuple[np.ndarray, np.ndarray]:
    """GDAL-style approximate dst→src transform of one scanline.

    ``xin``: monotonically increasing dst x coordinates (pixel
    centers); ``exact_fn(idx_array) -> (sx, sy)`` evaluates the exact
    transform at those *indices* of ``xin``.  Returns (sx, sy) source
    pixel coordinates for every input point.
    """
    n = len(xin)
    sx = np.empty(n, dtype=np.float64)
    sy = np.empty(n, dtype=np.float64)
    # In GDAL the exact transform is costly per point, so only the
    # recursion's sample points are evaluated.  Here the exact
    # transform is a vectorized numpy series — one whole-row call is
    # cheaper than Python-level per-sample calls — so we precompute
    # every exact value and let the recursion pick which positions
    # keep exact values vs chord-interpolated ones.  Output is
    # identical to sample-on-demand: the recursion's decisions depend
    # only on the sampled values, which are the same either way.
    exx, exy = exact_fn(np.arange(n))

    def ex(i: int) -> tuple[float, float]:
        return float(exx[i]), float(exy[i])

    def rec(i0: int, i1: int) -> None:
        m = i1 - i0 + 1
        if m < 3:
            sx[i0 : i1 + 1] = exx[i0 : i1 + 1]
            sy[i0 : i1 + 1] = exy[i0 : i1 + 1]
            return
        im = i0 + (m - 1) // 2
        p0, p1, pm = ex(i0), ex(i1), ex(im)
        t = (xin[im] - xin[i0]) / (xin[i1] - xin[i0])
        ex_ = pm[0] - (p0[0] + t * (p1[0] - p0[0]))
        ey_ = pm[1] - (p0[1] + t * (p1[1] - p0[1]))
        if abs(ex_) + abs(ey_) <= tol:
            tt = (xin[i0 : i1 + 1] - xin[i0]) / (xin[i1] - xin[i0])
            sx[i0 : i1 + 1] = p0[0] + tt * (p1[0] - p0[0])
            sy[i0 : i1 + 1] = p0[1] + tt * (p1[1] - p0[1])
        else:
            rec(i0, im - 1)
            rec(im, i1)

    rec(0, n - 1)
    return sx, sy


class TileWarper:
    """dst geodetic tile grid → one UTM source raster, nearest warp."""

    def __init__(
        self,
        src_transform: tuple[float, float, float, float, float, float],
        src_shape: tuple[int, int],
        src_epsg: int,
        tolerance: float = DEFAULT_TOLERANCE,
    ):
        x0, pw, rx, y0, ry, ph = src_transform
        if rx != 0.0 or ry != 0.0:
            raise NotImplementedError("rotated source geotransform")
        self.x0, self.pw, self.y0, self.ph = x0, pw, y0, ph
        self.h, self.w = src_shape
        self.proj = tmerc.Tmerc(src_epsg)
        self.tol = tolerance

    def _exact_row(self, lons: np.ndarray, lat: float):
        e, n = self.proj.to_projected(lons, np.full(len(lons), lat))
        return (e - self.x0) / self.pw, (n - self.y0) / self.ph

    def warp_plane(
        self,
        src: np.ndarray,
        dst_bounds: tuple[float, float, float, float],
        out_shape: tuple[int, int],
        fill=0,
    ) -> np.ndarray:
        """Warp one source band onto one dst tile, GDAL-parity nearest."""
        minx, miny, maxx, maxy = dst_bounds
        out_h, out_w = out_shape
        res_x = (maxx - minx) / out_w
        res_y = (maxy - miny) / out_h
        lons = minx + (np.arange(out_w) + 0.5) * res_x
        xin = np.arange(out_w, dtype=np.float64) + 0.5
        out = np.full(out_shape, fill, dtype=src.dtype)
        for j in range(out_h):
            lat = maxy - (j + 0.5) * res_y
            sx, sy = approx_transform_row(
                xin,
                lambda idx, lat=lat: self._exact_row(lons[idx], lat),
                self.tol,
            )
            col = (sx + 1e-10).astype(np.int64)
            row = (sy + 1e-10).astype(np.int64)
            ok = (sx >= 0) & (sy >= 0) & (col < self.w) & (row < self.h)
            if ok.any():
                out[j, ok] = src[
                    np.clip(row, 0, self.h - 1)[ok],
                    np.clip(col, 0, self.w - 1)[ok],
                ]
        return out


def warp_plane(src, src_transform, src_epsg, dst_bounds, out_shape, fill=0):
    """One-shot convenience wrapper around :class:`TileWarper`."""
    return TileWarper(src_transform, src.shape, src_epsg).warp_plane(
        src, dst_bounds, out_shape, fill
    )
