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
  brute-force oracle in tests by construction).  Accepts a single
  ring OR a list of rings: total crossing parity over ALL edges
  handles interior rings (holes) and disjoint MultiPolygon parts in
  one pass — a point inside a hole crosses both the exterior and the
  hole ring → even parity → outside, with zero special-casing.
- tiny WKB (de)serialization for Polygon (with interior rings) and
  MultiPolygon (shapely analog used by the reference only for bbox
  intersects — ``_input.py:211``; holes/multiparts are our
  north-star extension beyond the reference's envelope gate).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "STRtree",
    "points_in_polygon",
    "polygon_wkb",
    "multipolygon_wkb",
    "wkb_polygon",
    "wkb_rings",
    "polygon_bounds",
]


# ---------------------------------------------------------------------------
# WKB Polygon / MultiPolygon (little-endian)
# ---------------------------------------------------------------------------

def _close_ring(coords) -> np.ndarray:
    c = np.asarray(coords, dtype=np.float64)
    if not (c[0] == c[-1]).all():
        c = np.vstack([c, c[:1]])
    return c


def _as_ring_list(rings) -> list[np.ndarray]:
    """Normalize ring / list-of-rings input to a list of closed rings."""
    if isinstance(rings, np.ndarray):
        return [_close_ring(rings)]
    return [_close_ring(r) for r in rings]


def polygon_wkb(rings) -> bytes:
    """Polygon WKB from one (n, 2) ring or a list of rings
    (first = exterior, rest = interior holes; closed or open — we
    close them)."""
    rr = _as_ring_list(rings)
    out = [struct.pack("<BII", 1, 3, len(rr))]  # LE, Polygon, nrings
    for c in rr:
        out.append(struct.pack("<I", len(c)))
        out.append(c.astype("<f8").tobytes())
    return b"".join(out)


def multipolygon_wkb(parts) -> bytes:
    """MultiPolygon WKB from a list of parts, each a ring or a list
    of rings (exterior + holes)."""
    out = [struct.pack("<BII", 1, 6, len(parts))]  # LE, MultiPolygon, nparts
    for p in parts:
        out.append(polygon_wkb(p))
    return b"".join(out)


def _parse_polygon_rings(wkb: bytes, off: int) -> tuple[list[np.ndarray], int]:
    """Parse the body of one LE Polygon starting at its byte-order
    byte; returns (rings, next offset)."""
    byte_order, geom_type = struct.unpack_from("<BI", wkb, off)
    if byte_order != 1 or geom_type != 3:
        raise ValueError("only little-endian WKB Polygon parts supported")
    (nrings,) = struct.unpack_from("<I", wkb, off + 5)
    if nrings < 1:
        raise ValueError("empty polygon")
    off += 9
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", wkb, off)
        off += 4
        rings.append(
            np.frombuffer(wkb, dtype="<f8", count=npts * 2, offset=off).reshape(npts, 2)
        )
        off += npts * 16
    return rings, off


def wkb_rings(wkb: bytes) -> list[np.ndarray]:
    """WKB Polygon or MultiPolygon → flat list of closed (n, 2)
    rings (exteriors + holes of every part).  Even-odd parity over
    this flat list is exactly the containment test for the geometry,
    provided parts are disjoint and holes nest properly (the OGC
    validity contract)."""
    byte_order, geom_type = struct.unpack_from("<BI", wkb, 0)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    if geom_type == 3:
        return _parse_polygon_rings(wkb, 0)[0]
    if geom_type == 6:
        (nparts,) = struct.unpack_from("<I", wkb, 5)
        off = 9
        rings: list[np.ndarray] = []
        for _ in range(nparts):
            rr, off = _parse_polygon_rings(wkb, off)
            rings.extend(rr)
        return rings
    raise ValueError(f"unsupported WKB geometry type {geom_type}")


def wkb_polygon(wkb: bytes) -> np.ndarray:
    """WKB single-ring Polygon → (n, 2) exterior ring coords
    (closed).  STRICT: raises on interior rings or MultiPolygon so a
    hole can never be silently dropped — multi-ring consumers use
    ``wkb_rings``."""
    rings = wkb_rings(wkb)
    if len(rings) != 1:
        raise ValueError(
            f"geometry has {len(rings)} rings; use wkb_rings for holes/multiparts"
        )
    return rings[0]


def polygon_bounds(rings) -> tuple[float, float, float, float]:
    """Union envelope of one ring or a (possibly nested) list of
    rings."""
    if isinstance(rings, np.ndarray):
        c = np.asarray(rings, dtype=np.float64)
    else:
        flat: list[np.ndarray] = []
        for r in rings:
            if isinstance(r, np.ndarray):
                flat.append(np.asarray(r, dtype=np.float64))
            else:
                flat.extend(np.asarray(q, dtype=np.float64) for q in r)
        c = np.vstack(flat)
    return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())


# ---------------------------------------------------------------------------
# ray casting
# ---------------------------------------------------------------------------

def points_in_polygon(px: np.ndarray, py: np.ndarray, ring) -> np.ndarray:
    """Vectorized even-odd test of points against a polygon geometry.

    px, py: (n,) point coords; ring: (m, 2) closed ring OR a list of
    closed rings (exterior(s) + holes — parity over all edges).
    Returns (n,) bool.  Crossing rule: edge counts if one endpoint is
    strictly above the point's y and the other is at-or-below
    (half-open in y), intersection strictly to the right of the
    point — the classic Franklin PNPOLY convention.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if isinstance(ring, np.ndarray):
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
    else:
        # concatenate edges of every ring; rings are closed, so the
        # per-ring edge set is ring[:-1] → ring[1:] — no cross-ring
        # edges are introduced
        x0 = np.concatenate([r[:-1, 0] for r in ring])
        y0 = np.concatenate([r[:-1, 1] for r in ring])
        x1 = np.concatenate([r[1:, 0] for r in ring])
        y1 = np.concatenate([r[1:, 1] for r in ring])
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
