"""Deterministic AOI polygon table (FIXTURES.md §2).

200 seeded blobs (6–12 vertices) with envelope columns; one polygon
parked on each hot city so the PIP join exercises the skew path.
Since round 7 the fixture also contains real-world geometry shapes —
admin-boundary analogs the reference's bbox gate cannot express:

- every j ≥ 3 with ``j % 10 == 7``: polygon with an interior ring
  (hole) — a square centered on the blob's deterministic
  point-on-surface (midpoint of the widest interior run on the bbox
  mid-latitude scanline), half-size 0.6× the exact clearance to the
  exterior ring, so the hole is strictly inside by construction
  (corner distance 0.6·√2 ≈ 0.85 of clearance);
- every j ≥ 3 with ``j % 10 == 3``: MultiPolygon of two disjoint
  blobs (second part offset toward the antimeridian-safe side by
  2.5× the radius, so parts never touch).

All other j keep their round-1 single-ring geometry bit-for-bit (the
extra rng draws happen after the main ring's).  Small by design →
broadcast side of every spatial join (reference analog: the
dataset-bbox intersects gate,
``/root/reference/mapchete_xarray/_input.py:203-211``; hole/multipart
containment is our extension beyond it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.portable import HOT_CITIES
from ..geom import multipolygon_wkb, polygon_bounds, polygon_wkb

N_AOI = 200


def _blob(rng: np.random.Generator, cx: float, cy: float, radius: float) -> np.ndarray:
    nv = int(rng.integers(6, 13))
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    r = radius * rng.uniform(0.6, 1.0, nv)
    xs = np.clip(cx + r * np.cos(ang), -180, 180)
    ys = np.clip(cy + r * np.sin(ang), -90, 90)
    ring = np.column_stack([xs, ys])
    return np.vstack([ring, ring[:1]])


def _point_on_surface(ring: np.ndarray) -> tuple[float, float]:
    """Deterministic interior point: midpoint of the widest interior
    x-run where the bbox mid-latitude scanline crosses the ring.
    (The blob rings are not star-shaped about their seed center when
    a sorted-angle gap exceeds π, so center-scaling is NOT a valid
    hole construction — this is.)"""
    miny, maxy = ring[:, 1].min(), ring[:, 1].max()
    yl = (miny + maxy) / 2.0
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = (y0 > yl) != (y1 > yl)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x0 + (yl - y0) / (y1 - y0) * (x1 - x0)
    xs = np.sort(xi[cross])
    # crossings pair up (even count): (xs[0], xs[1]) interior, etc.
    # ADVICE r7 #4: a scanline through an exact ring vertex can yield
    # an odd/degenerate crossing count, which would silently mispair
    # the runs and place the "interior" point outside — fail loudly so
    # a future fixture change surfaces here instead of as a bad hole.
    if len(xs) == 0 or len(xs) % 2:
        raise ValueError(
            f"degenerate scanline: {len(xs)} crossings at y={yl!r} "
            "(ring vertex on the mid-latitude scanline?)"
        )
    widths = xs[1::2] - xs[0::2]
    k = int(np.argmax(widths))
    return (float((xs[2 * k] + xs[2 * k + 1]) / 2.0), float(yl))


def _clearance(px: float, py: float, ring: np.ndarray) -> float:
    """Exact min distance from a point to the ring's segments."""
    a = ring[:-1]
    b = ring[1:]
    d = b - a
    t = ((px - a[:, 0]) * d[:, 0] + (py - a[:, 1]) * d[:, 1]) / np.maximum(
        (d * d).sum(1), 1e-300
    )
    t = np.clip(t, 0.0, 1.0)
    cx = a[:, 0] + t * d[:, 0]
    cy = a[:, 1] + t * d[:, 1]
    return float(np.sqrt(((cx - px) ** 2 + (cy - py) ** 2).min()))


def aoi_geometry(j: int) -> list[list[np.ndarray]]:
    """Seeded geometry: list of parts, each a list of closed rings
    (exterior first, then holes)."""
    rng = np.random.default_rng(1000 + j)
    if j < len(HOT_CITIES):
        cx, cy = HOT_CITIES[j]
        radius = 1.5
    else:
        cx = rng.uniform(-170, 170)
        cy = rng.uniform(-75, 75)
        radius = rng.uniform(0.1, 5.0)
    main = _blob(rng, cx, cy, radius)
    if j >= len(HOT_CITIES) and j % 10 == 7:
        ax, ay = _point_on_surface(main)
        h = 0.6 * _clearance(ax, ay, main)
        # also clamp to half the gap to the bbox so the hole's own
        # bounds stay strictly inside the exterior's
        minx, miny_, maxx, maxy_ = (
            main[:, 0].min(),
            main[:, 1].min(),
            main[:, 0].max(),
            main[:, 1].max(),
        )
        h = min(h, 0.5 * min(ax - minx, maxx - ax, ay - miny_, maxy_ - ay))
        hole = np.array(
            [
                [ax - h, ay - h],
                [ax + h, ay - h],
                [ax + h, ay + h],
                [ax - h, ay + h],
                [ax - h, ay - h],
            ]
        )
        return [[main, hole]]
    if j >= len(HOT_CITIES) and j % 10 == 3:
        # second disjoint part: center 2.5·radius away toward lon 0
        # (stays inside ±180 since |cx| ≤ 170, radius ≤ 5) — gap
        # 2.5r between centers > r + 0.6r max extent sum → disjoint
        dx = -2.5 * radius if cx >= 0 else 2.5 * radius
        part2 = _blob(rng, cx + dx, cy, 0.6 * radius)
        return [[main], [part2]]
    return [[main]]


def aoi_ring(j: int) -> np.ndarray:
    """Exterior ring of the first part (legacy accessor — identical
    coords to the pre-round-7 fixture for every j)."""
    return aoi_geometry(j)[0][0]


def aoi_wkb(j: int) -> bytes:
    parts = aoi_geometry(j)
    if len(parts) == 1:
        return polygon_wkb(parts[0])
    return multipolygon_wkb(parts)


def aoi_pandas(n: int = N_AOI) -> pd.DataFrame:
    rows = []
    for j in range(n):
        parts = aoi_geometry(j)
        minx, miny, maxx, maxy = polygon_bounds(
            [r for part in parts for r in part]
        )
        rows.append((f"aoi{j:04d}", aoi_wkb(j), minx, miny, maxx, maxy))
    return pd.DataFrame(
        rows, columns=["aoi_id", "wkb", "minx", "miny", "maxx", "maxy"]
    )
