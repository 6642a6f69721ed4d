"""Temporal compositing: collapse a time stack of tile planes into
one cloud-free-style composite per (tile, band).

The reference's s2 test process builds (time, bands, y, x) stacks per
tile (SURVEY §1/§2 op 30 — per-(tile, ts_idx) planes here); the
canonical downstream is a per-pixel reduction over the time axis
(median / mean / min / max "best pixel", or first/latest valid —
what every satellite mosaic pipeline runs to kill clouds and gaps).
The reference leaves this to its xarray host (``ds.median('time')``);
here it is a distributed operator with the same shuffle shape as
every tile op in this engine:

- ONE shuffle on the (tile, band) key — ``applyInPandas`` groups the
  ≤T time planes of each tile-band (T = the fixed time axis length,
  single digits by config), stacks them in ``ts_idx`` order and
  reduces per pixel in vectorized numpy;
- nodata-aware: ``nodata`` pixels are holes (NaN in the float64
  stack) — a pixel's composite uses only its valid observations, and
  an all-hole pixel comes back ``nodata`` (axis semantics mirror
  ``xarray``'s skipna reductions);
- absent planes are absent (empty tiles don't exist by contract,
  reference ``_output.py:362-364``) — a tile-band with no planes at
  all produces no composite row.

At 10^12 tiles this is embarrassingly parallel per tile-band: the
shuffle moves each plane exactly once (same bytes as one base pass),
the key space is the tile key (same skew profile as every other tile
op — hot-city chunks fall out to the same salting/AQE discipline),
and the output is ~1/T of the input.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .mosaic import TILE_BANDS_SCHEMA

_METHODS = ("median", "mean", "min", "max", "first", "latest")


def temporal_composite(
    tiles: DataFrame,
    method: str = "median",
    nodata: float | None = None,
) -> DataFrame:
    """Per-pixel reduction over the time axis of TILE_BANDS_SCHEMA
    planes → one plane per (tile, band) with ``ts_idx = 0``.

    ``method``: ``median`` (even counts average the two middles, the
    numpy/xarray rule) / ``mean`` / ``min`` / ``max`` / ``first``
    (earliest valid observation per pixel) / ``latest`` (most recent
    valid).  ``nodata`` values never contribute; pixels with no valid
    observation across the whole stack come back as ``nodata`` (or 0
    when no nodata is declared).  Values are computed in float64 and
    cast back to the plane dtype round-half-up (the overview/focal
    convention), so integer-dtype composites are bit-deterministic
    under any partitioning.  ``n_sources`` sums over the stack.
    """
    if method not in _METHODS:
        raise ValueError(f"unknown composite method {method!r}")
    meth = method
    nd = None if nodata is None else float(nodata)
    fill = 0.0 if nd is None else nd

    def reduce(key, pdf):
        zoom_v, row_v, col_v, band_v = (int(k) for k in key)
        pdf = pdf.sort_values("ts_idx", kind="stable")
        h = int(pdf.height.iloc[0])
        w = int(pdf.width.iloc[0])
        dt = np.dtype(pdf.dtype.iloc[0])
        stack = np.empty((len(pdf), h, w), dtype=np.float64)
        for i, r in enumerate(pdf.itertuples()):
            if int(r.height) != h or int(r.width) != w:
                raise ValueError(
                    f"time stack planes disagree on shape: {h}x{w} vs "
                    f"{r.height}x{r.width}"
                )
            stack[i] = np.frombuffer(r.payload, dtype=np.dtype(r.dtype)).reshape(
                h, w
            )
        if nd is not None:
            stack[stack == nd] = np.nan
        valid = ~np.isnan(stack)
        any_valid = valid.any(axis=0)
        # nan-reductions warn on all-NaN pixel columns; those are
        # legitimate holes, patched to fill below
        with np.errstate(invalid="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            if meth == "median":
                out = np.nanmedian(stack, axis=0)
            elif meth == "mean":
                out = np.nanmean(stack, axis=0)
            elif meth == "min":
                out = np.nanmin(stack, axis=0)
            elif meth == "max":
                out = np.nanmax(stack, axis=0)
            elif meth == "first":
                idx = valid.argmax(axis=0)
                out = np.take_along_axis(stack, idx[None], axis=0)[0]
            else:  # latest
                idx = len(pdf) - 1 - valid[::-1].argmax(axis=0)
                out = np.take_along_axis(stack, idx[None], axis=0)[0]
        out = np.where(any_valid, out, fill)
        if np.issubdtype(dt, np.integer):
            info = np.iinfo(dt)
            out = np.floor(out + 0.5).clip(info.min, info.max).astype(dt)
        else:
            out = out.astype(dt)
        return pd.DataFrame(
            [
                (
                    zoom_v,
                    row_v,
                    col_v,
                    band_v,
                    0,
                    h,
                    w,
                    str(dt),
                    np.ascontiguousarray(out).tobytes(),
                    int(pdf.n_sources.sum()),
                )
            ],
            columns=[f.name for f in TILE_BANDS_SCHEMA.fields],
        )

    return tiles.groupBy(
        "tile_zoom", "tile_row", "tile_col", "band"
    ).applyInPandas(reduce, TILE_BANDS_SCHEMA)
