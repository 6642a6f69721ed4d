"""Band math: a raster calculator over TILE_BANDS_SCHEMA planes.

The classic mapchete user-process shape (an NDVI process is the
canonical example: read bands, arithmetic, write one band) promoted to
an engine operator, so an expression string is the whole program:

    band_math(tiles, "(b1 - b0) / (b1 + b0 + 1e-9)")

1. **One shuffle**: the (tile_row, tile_col, ts_idx) key aligns a
   tile's band planes (the same tile-sized exchange the XYZ export
   uses — chunk-partitioned sinks keep it mostly node-local), batched
   per Arrow batch via ``groupmap.batched_group_map`` (≤3-row groups
   make per-group UDF dispatch the dominant cost otherwise).
2. **Map-side evaluate**: each group's planes become float64 arrays
   ``b0..bN`` and the expression runs vectorized in numpy.

The expression is compiled from a WHITELISTED AST — names ``b<k>``,
numeric literals, arithmetic/comparison operators, and a fixed numpy
function set (sqrt/abs/minimum/maximum/clip/where/log/log1p/exp/
power).  Attribute access, subscripts, calls outside the whitelist,
and any other syntax are rejected at plan time, driver-side — the
expression can compute pixels and nothing else.

``nodata`` masking: where ANY referenced input band equals the
``nodata`` value, the output pixel is ``nodata`` (GDAL raster-calc
convention), applied after evaluation so the expression itself stays
oblivious.
"""

from __future__ import annotations

import ast
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .mosaic import TILE_BANDS_SCHEMA

_FUNCS = {
    "sqrt": np.sqrt,
    "abs": np.abs,
    "minimum": np.minimum,
    "maximum": np.maximum,
    "clip": np.clip,
    "where": np.where,
    "log": np.log,
    "log1p": np.log1p,
    "exp": np.exp,
    "power": np.power,
}

_ALLOWED_NODES = (
    ast.Expression,
    ast.BinOp, ast.UnaryOp, ast.Compare, ast.BoolOp, ast.IfExp,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Mod, ast.Pow, ast.FloorDiv,
    ast.USub, ast.UAdd, ast.Not,
    ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.Eq, ast.NotEq,
    ast.And, ast.Or,
    ast.Call, ast.Name, ast.Load, ast.Constant,
)

_BAND_RE = re.compile(r"^b(\d+)$")


def compile_expr(expr: str) -> tuple:
    """Validate + compile a band expression.  Returns (code object,
    sorted list of referenced band indexes).  Raises ``ValueError``
    for anything outside the whitelisted grammar."""
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as e:
        raise ValueError(f"band_math: cannot parse {expr!r}: {e}") from None
    bands: set[int] = set()
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"band_math: {type(node).__name__} not allowed in "
                f"expression {expr!r}"
            )
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
                raise ValueError(
                    f"band_math: only {sorted(_FUNCS)} callable, got "
                    f"{ast.dump(node.func)}"
                )
            if node.keywords:
                raise ValueError("band_math: keyword arguments not allowed")
        if isinstance(node, ast.Name):
            m = _BAND_RE.match(node.id)
            if m:
                bands.add(int(m.group(1)))
            elif node.id not in _FUNCS:
                raise ValueError(
                    f"band_math: unknown name {node.id!r} (bands are "
                    f"b0, b1, …)"
                )
        if isinstance(node, ast.Constant) and not isinstance(
            node.value, (int, float)
        ):
            raise ValueError(
                f"band_math: only numeric literals, got {node.value!r}"
            )
    if not bands:
        raise ValueError(f"band_math: {expr!r} references no band")
    return compile(tree, "<band_math>", "eval"), sorted(bands)


def band_math(
    tiles: DataFrame,
    expr: str,
    *,
    out_dtype: str = "float32",
    nodata: float | None = None,
    out_band: int = 0,
) -> DataFrame:
    """Evaluate ``expr`` over each tile's band planes → one
    TILE_BANDS_SCHEMA plane per (tile, ts_idx) with ``band=
    out_band``.  Planes are promoted to float64 for evaluation and
    cast to ``out_dtype`` on emit (float results round-half-away via
    ``np.rint`` when cast to an integer dtype)."""
    from pyspark.sql import functions as F

    code, needs = compile_expr(expr)
    nd = None if nodata is None else float(nodata)
    odt = str(np.dtype(out_dtype))
    ob = int(out_band)
    expr_s = str(expr)
    if nd is not None:
        # plan-time (driver-side) round-trip check, mirroring
        # rasterize's _burn_values gate: nodata=-9999 with
        # out_dtype='uint8' must fail HERE, not as an OverflowError
        # (numpy>=2) deep inside an executor task
        try:
            rt = float(np.dtype(odt).type(nd))
        except (OverflowError, ValueError):
            rt = None
        if rt != nd:
            raise ValueError(
                f"band_math: nodata {nodata!r} does not round-trip "
                f"through out_dtype {odt!r}"
            )

    def evaluate(key, pdf: pd.DataFrame):
        code_l, needs_l = compile_expr(expr_s)
        got = {int(r.band): r for r in pdf.itertuples()}
        missing = [b for b in needs_l if b not in got]
        if missing:
            tr = int(pdf.tile_row.iloc[0])
            tc = int(pdf.tile_col.iloc[0])
            raise ValueError(
                f"band_math: tile ({tr},{tc}) missing bands {missing} "
                f"needed by {expr_s!r}"
            )
        h = int(pdf.height.iloc[0])
        w = int(pdf.width.iloc[0])
        env = {}
        hole = None
        for b in needs_l:
            r = got[b]
            arr = np.frombuffer(r.payload, dtype=np.dtype(r.dtype)).reshape(
                h, w
            ).astype(np.float64)
            env[f"b{b}"] = arr
            if nd is not None:
                m = arr == nd
                hole = m if hole is None else (hole | m)
        out = eval(code_l, {"__builtins__": {}, **_FUNCS}, env)
        out = np.broadcast_to(np.asarray(out, dtype=np.float64), (h, w))
        if np.dtype(odt).kind in "iub":
            # NaN/inf (e.g. 0/0 the nodata mask didn't cover) through
            # astype(int) is undefined behavior — map to nodata when
            # one is declared, else refuse with the tile named
            bad = ~np.isfinite(out)
            if bad.any():
                if nd is None:
                    tr = int(pdf.tile_row.iloc[0])
                    tc = int(pdf.tile_col.iloc[0])
                    raise ValueError(
                        f"band_math: non-finite result at tile "
                        f"({tr},{tc}) with integer out_dtype {odt!r} "
                        f"and no nodata to absorb it"
                    )
                out = np.where(bad, nd, out)
            info = np.iinfo(np.dtype(odt))
            out = np.clip(np.rint(out), info.min, info.max)
        out = out.astype(np.dtype(odt))
        if hole is not None and hole.any():
            out = out.copy()
            out[hole] = np.dtype(odt).type(nd)
        r0 = pdf.iloc[0]
        return (
            int(r0.tile_zoom), int(r0.tile_row), int(r0.tile_col),
            ob, int(r0.ts_idx), h, w, odt,
            np.ascontiguousarray(out).tobytes(),
            int(pdf.n_sources.max()),
        )

    from .groupmap import batched_group_map

    return batched_group_map(
        # tile_zoom in the keys: a multi-zoom input (e.g. an
        # overview_pyramid output) must evaluate per zoom level, not
        # silently merge planes from different zooms into one group
        tiles.where(F.col("band").isin(needs)),
        ["tile_zoom", "tile_row", "tile_col", "ts_idx"],
        evaluate,
        TILE_BANDS_SCHEMA,
    )
