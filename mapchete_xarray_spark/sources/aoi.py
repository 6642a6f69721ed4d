"""Deterministic AOI polygon table (FIXTURES.md §2).

200 seeded convex blobs (6–12 vertices) with envelope columns; one
polygon parked on each hot city so the PIP join exercises the skew
path.  Small by design → broadcast side of every spatial join
(reference analog: the dataset-bbox intersects gate,
``/root/reference/mapchete_xarray/_input.py:203-211``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.portable import HOT_CITIES
from ..geom import polygon_bounds, polygon_wkb

N_AOI = 200


def aoi_ring(j: int) -> np.ndarray:
    """Seeded convex blob: sorted angles around a seeded center."""
    rng = np.random.default_rng(1000 + j)
    if j < len(HOT_CITIES):
        cx, cy = HOT_CITIES[j]
        radius = 1.5
    else:
        cx = rng.uniform(-170, 170)
        cy = rng.uniform(-75, 75)
        radius = rng.uniform(0.1, 5.0)
    nv = int(rng.integers(6, 13))
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    r = radius * rng.uniform(0.6, 1.0, nv)
    xs = np.clip(cx + r * np.cos(ang), -180, 180)
    ys = np.clip(cy + r * np.sin(ang), -90, 90)
    ring = np.column_stack([xs, ys])
    return np.vstack([ring, ring[:1]])


def aoi_pandas(n: int = N_AOI) -> pd.DataFrame:
    rows = []
    for j in range(n):
        ring = aoi_ring(j)
        minx, miny, maxx, maxy = polygon_bounds(ring)
        rows.append((f"aoi{j:04d}", polygon_wkb(ring), minx, miny, maxx, maxy))
    return pd.DataFrame(
        rows, columns=["aoi_id", "wkb", "minx", "miny", "maxx", "maxy"]
    )
