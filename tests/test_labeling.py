"""Connected-component labeling: in-tile parity vs flood fill,
cross-tile stitching, antimeridian wrap, nodata, scale gates."""

from collections import deque

import numpy as np
import pytest

from mapchete_xarray_spark import grid
from mapchete_xarray_spark.operators.labeling import (
    label_components,
    label_plane,
)
from mapchete_xarray_spark.operators.mosaic import TILE_BANDS_SCHEMA

TPX = 8
ZOOM = 2  # geodetic z2: 4 x 8 tiles
PYR = grid.Pyramid("geodetic", tile_size=TPX)
NCOLS = PYR.matrix_width(ZOOM)


def _flood(global_arr, nodata=None, wrap_x=False):
    """Reference labeling: BFS flood fill over the stitched array →
    multiset of (val, n_pixels, min_r, min_c, max_r, max_c)."""
    h, w = global_arr.shape
    seen = np.zeros((h, w), dtype=bool)
    out = []
    for i in range(h):
        for j in range(w):
            if seen[i, j]:
                continue
            v = global_arr[i, j]
            if nodata is not None and v == nodata:
                seen[i, j] = True
                continue
            q = deque([(i, j)])
            seen[i, j] = True
            n = 0
            i0 = i1 = i
            j0 = j1 = j
            while q:
                a, b = q.popleft()
                n += 1
                i0, i1 = min(i0, a), max(i1, a)
                j0, j1 = min(j0, b), max(j1, b)
                for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    na, nb = a + da, b + db
                    if wrap_x:
                        nb %= w
                    if 0 <= na < h and 0 <= nb < w and not seen[na, nb] \
                            and global_arr[na, nb] == v:
                        seen[na, nb] = True
                        q.append((na, nb))
            out.append((float(v), n, i0, j0, i1, j1))
    return sorted(out)


def _tiles_from_global(spark, global_arr, rows, cols, dtype="uint8"):
    recs = []
    for tr in rows:
        for tc in cols:
            plane = global_arr[
                (tr - rows[0]) * TPX : (tr - rows[0] + 1) * TPX,
                (tc - cols[0]) * TPX : (tc - cols[0] + 1) * TPX,
            ]
            recs.append(
                (ZOOM, tr, tc, 0, 0, TPX, TPX, dtype,
                 np.ascontiguousarray(plane.astype(np.dtype(dtype))).tobytes(),
                 1)
            )
    return spark.createDataFrame(recs, TILE_BANDS_SCHEMA)


def _collect(df):
    return sorted(
        (r.val, r.n_pixels, r.min_row, r.min_col, r.max_row, r.max_col)
        for r in df.collect()
    )


class TestLabelPlane:
    def test_checkerboard_every_pixel_separate(self):
        a = (np.indices((4, 4)).sum(axis=0) % 2).astype(np.uint8)
        labels, stats = label_plane(a)
        assert len(stats) == 16
        assert (labels >= 0).all()

    def test_diagonal_not_connected(self):
        a = np.zeros((3, 3), np.uint8)
        a[0, 0] = a[1, 1] = a[2, 2] = 7
        _, stats = label_plane(a)
        sevens = [s for s in stats if s[0] == 7.0]
        assert len(sevens) == 3

    def test_u_shape_one_component(self):
        a = np.zeros((4, 4), np.uint8)
        a[:, 0] = a[:, 3] = a[3, :] = 5
        _, stats = label_plane(a, nodata=0)
        assert len(stats) == 1
        v, n, i0, j0, i1, j1 = stats[0]
        assert (v, n, i0, j0, i1, j1) == (5.0, 4 + 4 + 2, 0, 0, 3, 3)

    def test_nodata_excluded(self):
        a = np.zeros((3, 3), np.uint8)
        a[1, 1] = 9
        labels, stats = label_plane(a, nodata=0)
        assert len(stats) == 1 and stats[0][0] == 9.0
        assert labels[0, 0] == -1 and labels[1, 1] == 0


class TestLabelComponents:
    def _global_fixture(self, seed=71, h_tiles=2, w_tiles=3, kvals=4):
        rng = np.random.default_rng(seed)
        # coarse blobs so regions CROSS tile borders: upsample a small
        # random grid 4x
        small = rng.integers(0, kvals,
                             (h_tiles * TPX // 4, w_tiles * TPX // 4))
        return np.repeat(np.repeat(small, 4, axis=0), 4, axis=1).astype(
            np.uint8
        )

    def test_matches_flood_fill(self, spark):
        g = self._global_fixture()
        df = _tiles_from_global(spark, g, rows=[1, 2], cols=[2, 3, 4])
        out = label_components(df, PYR, ZOOM, wrap_x=False)
        got = [
            (v, n, r0 - 1 * TPX, c0 - 2 * TPX, r1 - 1 * TPX, c1 - 2 * TPX)
            for (v, n, r0, c0, r1, c1) in _collect(out)
        ]
        assert sorted(got) == _flood(g)
        # multi-tile components exist in the fixture
        assert out.where("n_tiles > 1").count() > 0

    def test_nodata_and_value_preserved(self, spark):
        g = self._global_fixture(seed=72)
        df = _tiles_from_global(spark, g, rows=[1, 2], cols=[2, 3, 4])
        out = label_components(df, PYR, ZOOM, nodata=0, wrap_x=False)
        got = [
            (v, n, r0 - 1 * TPX, c0 - 2 * TPX, r1 - 1 * TPX, c1 - 2 * TPX)
            for (v, n, r0, c0, r1, c1) in _collect(out)
        ]
        assert sorted(got) == _flood(g, nodata=0)
        assert out.where("val = 0").count() == 0

    def test_antimeridian_wrap_joins_components(self, spark):
        # one full tile row (all 8 columns at z2): a stripe of value 3
        # spanning the dateline via cols 7 and 0
        g = np.zeros((TPX, NCOLS * TPX), np.uint8)
        g[3, : 2] = 3            # west edge of col 0
        g[3, -2:] = 3            # east edge of col 7
        df = _tiles_from_global(spark, g, rows=[1], cols=list(range(NCOLS)))
        wrapped = label_components(df, PYR, ZOOM, nodata=0, wrap_x=True)
        flat = label_components(df, PYR, ZOOM, nodata=0, wrap_x=False)
        assert wrapped.count() == 1 and flat.count() == 2
        r = wrapped.collect()[0]
        assert r.n_pixels == 4 and r.val == 3.0

    def test_single_exchangefree_scan(self, spark):
        # the pixel scan itself is map-only: no Exchange above the
        # mapInPandas.  Audited on the lazy scan stage directly —
        # label_components now eagerly checkpoints past it (releasing
        # the persisted scan, ADVICE r5), so the final plan no longer
        # carries the MapInPandas node.
        from mapchete_xarray_spark.operators.labeling import _scanned_df

        g = self._global_fixture(seed=73)
        df = _tiles_from_global(spark, g, rows=[1, 2], cols=[2, 3, 4])
        scanned = _scanned_df(df, PYR, ZOOM, 0, 0, None)
        plan = scanned._jdf.queryExecution().executedPlan().toString()
        scan_part = plan.split("MapInPandas")[-1]
        assert "Exchange" not in scan_part, plan

    def test_no_lingering_persisted_scan(self, spark):
        # ADVICE r5: the scan persist must be RELEASED once the
        # component pipeline has consumed it — no session-long pin
        g = self._global_fixture(seed=73)
        df = _tiles_from_global(spark, g, rows=[1, 2], cols=[2, 3, 4])
        before = {
            rid for rid, r in
            spark.sparkContext._jsc.getPersistentRDDs().items()
        }
        label_components(df, PYR, ZOOM, wrap_x=False).collect()
        after = spark.sparkContext._jsc.getPersistentRDDs()
        # localCheckpoint RDDs register as persistent too — assert no
        # NEW persisted rdd whose storage survives at MEMORY_AND_DISK
        # from the scan (checkpointed rounds are GC-reclaimed; the
        # explicit persist we used to leak is what must be gone)
        leaked = [
            r for rid, r in after.items()
            if rid not in before and "MapInPandas" in r.toDebugString()
        ]
        assert not leaked, [r.toDebugString() for r in leaked]

    def test_labeled_raster_paints_global_ids(self, spark):
        from mapchete_xarray_spark.operators.labeling import labeled_raster

        g = self._global_fixture(seed=75)
        df = _tiles_from_global(spark, g, rows=[1, 2], cols=[2, 3, 4])
        comps = label_components(df, PYR, ZOOM, nodata=0, wrap_x=False)
        painted = labeled_raster(df, PYR, ZOOM, nodata=0, wrap_x=False)
        planes = {
            (r.tile_row, r.tile_col): np.frombuffer(
                r.payload, np.int64
            ).reshape(r.height, r.width)
            for r in painted.collect()
        }
        assert all(r.dtype == "int64" for r in painted.collect())
        # stitch painted planes back to a global array
        G = np.zeros_like(g, dtype=np.int64)
        for (tr, tc), p in planes.items():
            G[(tr - 1) * TPX : (tr - 1 + 1) * TPX,
              (tc - 2) * TPX : (tc - 2 + 1) * TPX] = p
        # 1) background exactly where source is nodata
        np.testing.assert_array_equal(G == 0, g == 0)
        # 2) one painted id per component; its pixel count and value
        #    match the component table
        comp_rows = {r.component + 1: (r.val, r.n_pixels)
                     for r in comps.collect()}
        ids = set(np.unique(G[G > 0]).tolist())
        assert ids == set(comp_rows)
        for cid, (val, n) in comp_rows.items():
            mask = G == cid
            assert int(mask.sum()) == n
            assert (g[mask] == val).all()
        # 3) a multi-tile component carries ONE id across tiles
        multi = [r for r in comps.collect() if r.n_tiles > 1]
        assert multi
        m = multi[0]
        mask = G == m.component + 1
        touched_tiles = {
            (i // TPX, j // TPX)
            for i, j in zip(*np.nonzero(mask))
        }
        assert len(touched_tiles) == m.n_tiles > 1

    def test_zoom_gate(self, spark):
        g = self._global_fixture(seed=74)
        df = _tiles_from_global(spark, g, rows=[1], cols=[2, 3, 4])
        with pytest.raises(Exception, match="single-zoom"):
            label_components(df, PYR, ZOOM + 1, wrap_x=False).collect()

class TestVectorizedKernelParity:
    def test_matches_pre_r9_serial_kernel_exactly(self):
        """The r9 vectorized label_plane must reproduce the pre-r9
        serial kernel BIT-EXACTLY — labels, stats VALUES and component
        id ORDER (the region oracle inlines node ids derived from
        them, so compaction order is observable behavior)."""

        def serial_label_plane(arr, nodata=None):
            h, w = arr.shape
            parent = []

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            labels = np.full((h, w), -1, dtype=np.int32)
            run_rows = []
            prev = []
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
            root_of = [find(r) for r in range(len(parent))]
            compact = {}
            stats = []
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

        rng = np.random.default_rng(42)
        cases = []
        for nvals in (2, 3, 6):
            cases.append(rng.integers(0, nvals, (23, 31)).astype(np.float64))
        snake = np.zeros((16, 16), np.float64)
        snake[0, :] = 1
        snake[:, -1] = 1
        snake[-1, :] = 1
        cases.append(snake)
        cases.append(np.full((8, 8), 5.0))
        for nd in (None, 0.0):
            for a in cases:
                got_l, got_s = label_plane(a, nodata=nd)
                want_l, want_s = serial_label_plane(a, nodata=nd)
                np.testing.assert_array_equal(got_l, want_l)
                assert got_s == want_s, (nd, a.shape)
