"""Minimal computational geometry — pure numpy (no shapely/GEOS in
this sandbox).

Implements exactly what the spatial operators need, from public
textbook algorithms:

- ``STRtree``: Sort-Tile-Recursive packed R-tree (Leutenegger et al.
  1997) over rectangles, bulk point/box queries fully vectorized.
  Built once from the broadcast AOI table on each executor
  (``operators/pip.py``), queried per Arrow batch.
- ``points_in_polygon``: even-odd ray casting, vectorized over the
  point axis, with an on-edge-inclusive tolerance-free convention:
  boundary points count as inside iff the ray-cast parity says so
  (standard half-open crossing rule — deterministic, matches the
  brute-force oracle in tests by construction).
- tiny WKB (de)serialization for Polygon (shapely analog used by the
  reference only for bbox intersects — ``_input.py:211``).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["STRtree", "points_in_polygon", "polygon_wkb", "wkb_polygon", "polygon_bounds"]


# ---------------------------------------------------------------------------
# WKB Polygon (single exterior ring, little-endian)
# ---------------------------------------------------------------------------

def polygon_wkb(coords: np.ndarray) -> bytes:
    """coords: (n, 2) ring (closed or open; we close it)."""
    c = np.asarray(coords, dtype=np.float64)
    if not (c[0] == c[-1]).all():
        c = np.vstack([c, c[:1]])
    header = struct.pack("<BII I", 1, 3, 1, len(c))  # LE, Polygon, 1 ring, n pts
    return header + c.astype("<f8").tobytes()


def wkb_polygon(wkb: bytes) -> np.ndarray:
    """WKB Polygon → (n, 2) exterior ring coords (closed)."""
    byte_order, geom_type = struct.unpack_from("<BI", wkb, 0)
    if byte_order != 1 or geom_type != 3:
        raise ValueError("only little-endian WKB Polygon supported")
    (nrings,) = struct.unpack_from("<I", wkb, 5)
    if nrings < 1:
        raise ValueError("empty polygon")
    (npts,) = struct.unpack_from("<I", wkb, 9)
    return np.frombuffer(wkb, dtype="<f8", count=npts * 2, offset=13).reshape(npts, 2)


def polygon_bounds(coords: np.ndarray) -> tuple[float, float, float, float]:
    c = np.asarray(coords, dtype=np.float64)
    return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())


# ---------------------------------------------------------------------------
# ray casting
# ---------------------------------------------------------------------------

def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd test of points against one polygon ring.

    px, py: (n,) point coords; ring: (m, 2) closed ring.
    Returns (n,) bool.  Crossing rule: edge counts if one endpoint is
    strictly above the point's y and the other is at-or-below
    (half-open in y), intersection strictly to the right of the
    point — the classic Franklin PNPOLY convention.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    # (n, m) edge conditions; m is small (AOI rings 6-16 vertices)
    pyv = py[:, None]
    pxv = px[:, None]
    cond = (y0[None, :] > pyv) != (y1[None, :] > pyv)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0[None, :] + (pyv - y0[None, :]) / (y1[None, :] - y0[None, :]) * (
            x1[None, :] - x0[None, :]
        )
    crossings = cond & (pxv < xint)
    return crossings.sum(axis=1) % 2 == 1


# ---------------------------------------------------------------------------
# STR-packed R-tree
# ---------------------------------------------------------------------------

class STRtree:
    """Static packed R-tree over n rectangles, Sort-Tile-Recursive
    bulk-load, node capacity ``leaf_size``.  Stored as flat numpy
    level arrays → cheap to pickle into a Spark broadcast and shared
    read-only across executor task threads.
    """

    def __init__(self, boxes: np.ndarray, leaf_size: int = 8):
        """boxes: (n, 4) [minx, miny, maxx, maxy]."""
        boxes = np.asarray(boxes, dtype=np.float64)
        if boxes.ndim != 2 or boxes.shape[1] != 4:
            raise ValueError("boxes must be (n, 4)")
        if leaf_size < 2:
            # the bottom-up level build shrinks by ceil(n/leaf_size):
            # leaf_size=1 never shrinks → infinite loop
            raise ValueError(f"leaf_size must be >= 2, got {leaf_size}")
        self.leaf_size = leaf_size
        n = len(boxes)
        # STR ordering: sort by center x into vertical slabs, then by
        # center y within each slab
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        nleaves = max(1, -(-n // leaf_size))
        nslabs = max(1, int(np.ceil(np.sqrt(nleaves))))
        slab_cap = -(-n // nslabs)
        order = np.argsort(cx, kind="stable")
        for s in range(nslabs):
            sl = order[s * slab_cap : (s + 1) * slab_cap]
            sl_sorted = sl[np.argsort(cy[sl], kind="stable")]
            order[s * slab_cap : (s + 1) * slab_cap] = sl_sorted
        self.order = order  # permutation: tree position -> original index
        self.boxes = boxes[order]
        # build levels bottom-up: level[i] = (m_i, 4) node bounds;
        # always at least one level so the query descent runs even for n<=1
        self.levels: list[np.ndarray] = []
        cur = self.boxes
        while True:
            m = -(-max(len(cur), 1) // leaf_size)
            pad = m * leaf_size - len(cur)
            if pad:
                padded = np.vstack(
                    [cur, np.repeat([[np.inf, np.inf, -np.inf, -np.inf]], pad, 0)]
                )
            else:
                padded = cur
            g = padded.reshape(m, leaf_size, 4)
            nodes = np.column_stack(
                [
                    g[:, :, 0].min(1),
                    g[:, :, 1].min(1),
                    g[:, :, 2].max(1),
                    g[:, :, 3].max(1),
                ]
            )
            self.levels.append(nodes)
            if len(nodes) <= 1:
                break
            cur = nodes

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """Bulk query: returns (point_idx, box_idx) candidate pairs
        where point lies within the rectangle (inclusive edges)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        pts = np.arange(len(px))
        # start at root level, descend; keep (point, node) frontier
        frontier_p = pts
        frontier_n = np.zeros(len(px), dtype=np.int64)
        for depth in range(len(self.levels) - 1, -1, -1):
            # expand each (p, node) to the node's children at depth-1
            child0 = frontier_n * self.leaf_size
            nchild = self.leaf_size
            p_rep = np.repeat(frontier_p, nchild)
            c_idx = (child0[:, None] + np.arange(nchild)[None, :]).ravel()
            lower = self.levels[depth - 1] if depth > 0 else self.boxes
            valid = c_idx < len(lower)
            p_rep, c_idx = p_rep[valid], c_idx[valid]
            b = lower[c_idx]
            hit = (
                (px[p_rep] >= b[:, 0])
                & (px[p_rep] <= b[:, 2])
                & (py[p_rep] >= b[:, 1])
                & (py[p_rep] <= b[:, 3])
            )
            frontier_p, frontier_n = p_rep[hit], c_idx[hit]
        return frontier_p, self.order[frontier_n]

    def query_boxes(self, qboxes: np.ndarray):
        """Bulk rectangle-overlap query: (query_idx, box_idx) pairs."""
        qboxes = np.asarray(qboxes, dtype=np.float64)
        qs = np.arange(len(qboxes))
        frontier_q = qs
        frontier_n = np.zeros(len(qboxes), dtype=np.int64)
        for depth in range(len(self.levels) - 1, -1, -1):
            child0 = frontier_n * self.leaf_size
            p_rep = np.repeat(frontier_q, self.leaf_size)
            c_idx = (
                child0[:, None] + np.arange(self.leaf_size)[None, :]
            ).ravel()
            lower = self.levels[depth - 1] if depth > 0 else self.boxes
            valid = c_idx < len(lower)
            p_rep, c_idx = p_rep[valid], c_idx[valid]
            b = lower[c_idx]
            q = qboxes[p_rep]
            hit = (
                (q[:, 0] <= b[:, 2])
                & (q[:, 2] >= b[:, 0])
                & (q[:, 1] <= b[:, 3])
                & (q[:, 3] >= b[:, 1])
            )
            frontier_q, frontier_n = p_rep[hit], c_idx[hit]
        return frontier_q, self.order[frontier_n]
