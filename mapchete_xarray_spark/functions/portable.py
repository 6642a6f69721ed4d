"""Portable SQL expression generators — one formula, two engines.

Every exactness-critical formula (grid math §1.3 of SURVEY.md, Morton
cell encoding, deterministic point synthesis) is emitted as a SQL
string that parses identically in Spark SQL (via ``F.expr`` →
Catalyst, whole-stage codegen, NO Python in the hot path) and in
DuckDB (the correctness oracle).  Using the *same string* on both
sides makes Spark-vs-oracle mismatches impossible by construction for
these operators; the numpy twins in ``grid.py``/``cells.py`` pin the
semantics in unit tests.

Verified-common dialect surface: ``<<  >>  &  |  %  floor ceil least
greatest cast ln tan radians pi case``.  Engine-specific pieces go
through ``dialect(engine)``.
"""

from __future__ import annotations

MERCATOR_HALF_WORLD = 20037508.342789244
_MAX_ZOOM = 28


def hex2int_sql(engine: str, h: str) -> str:
    """Engine-dialect shim: hex string expression → bigint.  The ONE
    definition — ann.py and dedup.py route through it."""
    if engine == "spark":
        return f"cast(conv({h}, 16, 10) as bigint)"
    if engine == "duckdb":
        return f"cast(('0x' || {h}) as bigint)"
    raise ValueError(f"unknown engine: {engine}")


# ---------------------------------------------------------------------------
# grid constants
# ---------------------------------------------------------------------------

def grid_params(grid: str, zoom: int, metatiling: int = 1):
    """(left, top, span, nrows, ncols) of the (meta)tile matrix."""
    import math

    if grid == "geodetic":
        left, top = -180.0, 90.0
        span = 180.0 / 2**zoom * metatiling
        nrows = max(1, math.ceil(2**zoom / metatiling))
        ncols = max(1, math.ceil(2 ** (zoom + 1) / metatiling))
    elif grid == "mercator":
        h = MERCATOR_HALF_WORLD
        left, top = -h, h
        span = 2 * h / 2**zoom * metatiling
        nrows = ncols = max(1, math.ceil(2**zoom / metatiling))
    else:
        raise ValueError(f"unknown grid: {grid}")
    return left, top, span, nrows, ncols


# ---------------------------------------------------------------------------
# tile assignment (pure floor arithmetic — SURVEY.md §1.3)
# ---------------------------------------------------------------------------

def mercator_x_sql(lon: str) -> str:
    """WebMercator x from lon (degrees): x = lon/180 * HALF_WORLD."""
    return f"(({lon}) * {MERCATOR_HALF_WORLD!r} / 180.0)"


def mercator_y_sql(lat: str) -> str:
    """WebMercator y from lat: y = ln(tan(pi/4 + lat*pi/360)) / pi *
    HALF_WORLD, with lat clamped to the projection's ±85.0511° domain
    FIRST — a polar latitude (±90, legal geodetic data) would hit
    ln(0)/ln(negative): DuckDB raises an Out of Range error outright
    and Spark produces ±inf that the ANSI bigint cast then rejects.
    Clamped poles land on the edge tiles, which is what the post-floor
    row clip produced for every in-domain extreme latitude anyway."""
    clamped = f"least(greatest(({lat}), -85.05112877980659), 85.05112877980659)"
    return (
        f"(ln(tan(pi()/4.0 + radians({clamped})/2.0)) / pi() * {MERCATOR_HALF_WORLD!r})"
    )


def tile_col_sql(x: str, grid: str, zoom: int, metatiling: int = 1) -> str:
    """col = clip(floor((x - left)/span), 0, ncols-1) — half-open with
    grid-edge clip, identical to ``grid.tile_from_xy``."""
    left, _, span, _, ncols = grid_params(grid, zoom, metatiling)
    # clamp in the DOUBLE domain, then cast: a mercator y of ±inf/NaN
    # (poles / dirty latitudes through ln∘tan) would make the ANSI
    # bigint cast throw; greatest/least treat NaN as the largest
    # double in BOTH engines, so ±inf → edge tiles and NaN → the max
    # edge, identically
    raw = f"floor((({x}) - ({left!r})) / ({span!r}))"
    clamped = f"least(greatest({raw}, cast(0 as double)), cast({ncols - 1} as double))"
    return f"cast({clamped} as bigint)"


def tile_row_sql(y: str, grid: str, zoom: int, metatiling: int = 1) -> str:
    """row = clip(floor((top - y)/span), 0, nrows-1)."""
    _, top, span, nrows, _ = grid_params(grid, zoom, metatiling)
    # double-domain clamp before the cast — see tile_col_sql
    raw = f"floor((({top!r}) - ({y})) / ({span!r}))"
    clamped = f"least(greatest({raw}, cast(0 as double)), cast({nrows - 1} as double))"
    return f"cast({clamped} as bigint)"


def lonlat_tile_sql(lon: str, lat: str, grid: str, zoom: int, metatiling: int = 1):
    """(row_sql, col_sql) straight from lon/lat (projects for mercator)."""
    if grid == "mercator":
        x, y = mercator_x_sql(lon), mercator_y_sql(lat)
    else:
        x, y = lon, lat
    return (
        tile_row_sql(y, grid, zoom, metatiling),
        tile_col_sql(x, grid, zoom, metatiling),
    )


# ---------------------------------------------------------------------------
# Morton / cell ids (twin of cells.py, as pure bit-math SQL)
# ---------------------------------------------------------------------------

def morton_spread_sql(v: str, nbits: int = 29) -> str:
    """Spread the low ``nbits`` of v so bit i lands at bit 2i.

    Linear sum-of-terms form, one reference to ``v`` per bit: at a
    fixed zoom only ``zoom`` bits can be set, so the expression stays
    small (the classic mask-shift cascade references its operand
    twice per step — 2^5 textual copies after Catalyst inlining,
    which blew generated-method sizes past what the JVM will JIT)."""
    terms = [f"(((({v}) >> {i}) & 1) << {2 * i})" for i in range(nbits)]
    return "(" + " | ".join(terms) + ")"


def cell_id_sql(row: str, col: str, zoom: int) -> str:
    """64-bit cell id: (zoom << 58) | interleave(col even bits, row odd).

    row/col at zoom z fit in z bits (z+1 for geodetic cols) → only
    that many interleave terms are emitted."""
    if zoom > _MAX_ZOOM:
        raise ValueError(f"zoom > {_MAX_ZOOM} overflows 64-bit cell ids")
    nbits = max(zoom + 1, 1)
    return (
        f"((cast({zoom} as bigint) << 58)"
        f" | {morton_spread_sql(col, nbits)}"
        f" | ({morton_spread_sql(row, nbits)} << 1))"
    )


def cell_parent_sql(cell: str, steps: int = 1) -> str:
    """Ancestor ``steps`` zooms up: new_zoom in top bits, morton >> 2*steps."""
    z = f"(({cell}) >> 58)"
    m = f"(({cell}) & {(1 << 58) - 1})"
    return f"(((({z}) - {steps}) << 58) | (({m}) >> {2 * steps}))"


# ---------------------------------------------------------------------------
# deterministic point synthesis (fixtures + queries share this)
# ---------------------------------------------------------------------------

HOT_CITIES = ((16.37, 48.21), (-74.0, 40.71), (139.69, 35.69))  # Vienna, NYC, Tokyo


def synth_lon_sql(key: str) -> str:
    """Deterministic skew-clustered longitude from an integer key:
    30% of rows pile into 3 city blobs (hot-cell/salting exercise,
    FIXTURES.md §1), the rest spread uniformly."""
    k = f"cast(({key}) as bigint)"
    # /1e3 (double literal): plain decimal literals would make both
    # engines do DECIMAL division, whose scale rules differ → last-ulp
    # lon/lat divergence that flips near-tie kNN orderings
    blob = lambda cx, mul: f"({cx!r} + ((({k}) * {mul}) % 2000) / 1e3 - 1.0)"
    return (
        f"(case when ({k}) % 10 = 0 then {blob(HOT_CITIES[0][0], 7)} "
        f"when ({k}) % 10 = 1 then {blob(HOT_CITIES[1][0], 11)} "
        f"when ({k}) % 10 = 2 then {blob(HOT_CITIES[2][0], 13)} "
        f"else ((({k}) * 9973) % 360000) / 1e3 - 180.0 end)"
    )


def synth_lat_sql(key: str) -> str:
    k = f"cast(({key}) as bigint)"
    blob = lambda cy, mul: f"({cy!r} + ((({k}) * {mul}) % 2000) / 1e3 - 1.0)"
    return (
        f"(case when ({k}) % 10 = 0 then {blob(HOT_CITIES[0][1], 17)} "
        f"when ({k}) % 10 = 1 then {blob(HOT_CITIES[1][1], 19)} "
        f"when ({k}) % 10 = 2 then {blob(HOT_CITIES[2][1], 23)} "
        f"else ((({k}) * 7919) % 170000) / 1e3 - 85.0 end)"
    )
