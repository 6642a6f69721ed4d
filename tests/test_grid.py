"""Golden-value + property tests for the grid-math core.

Golden values come from the reference's committed fixtures
(/root/reference/tests/testdata/s2_stack.zarr/.zmetadata and
tests/test_zarr_creation.py) — see FIXTURES.md §5.
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mapchete_xarray_spark import grid
from mapchete_xarray_spark.grid import (
    GEODETIC,
    MERCATOR,
    Pyramid,
    bounds_to_ranges,
    affine_from_bounds,
    buffered_tile_bounds,
    pixel_center_coords,
    raster_shape,
    snap_bounds,
    tile_bounds,
    tile_from_xy,
    timestamp_regions,
    zarr_chunk_from_xy,
)

S2_PROCESS_BOUNDS = (15.0064, 47.7604, 16.4863, 48.7485)
S2_SNAPPED = (11.25, 45.0, 16.875, 50.625)


class TestPyramidConstants:
    def test_geodetic_zoom0(self):
        assert GEODETIC.matrix_height(0) == 1
        assert GEODETIC.matrix_width(0) == 2
        assert tuple(GEODETIC.bounds) == (-180.0, -90.0, 180.0, 90.0)

    def test_mercator_zoom0(self):
        assert MERCATOR.matrix_height(0) == 1
        assert MERCATOR.matrix_width(0) == 1
        assert MERCATOR.bounds.left == pytest.approx(-20037508.342789244)

    def test_pixel_size_z5(self):
        # PS(5) = 5.625/256 — FIXTURES.md §5
        assert GEODETIC.pixel_size(5) == 0.02197265625

    def test_metatiling_validation(self):
        with pytest.raises(ValueError):
            Pyramid("geodetic", metatiling=3)
        with pytest.raises(ValueError):
            Pyramid("utm")


class TestSnapBounds:
    def test_golden_s2(self):
        # fixture .zmetadata delimiters: process → effective bounds
        sb = snap_bounds(GEODETIC, S2_PROCESS_BOUNDS, 5)
        assert tuple(sb) == S2_SNAPPED

    def test_already_snapped_is_identity(self):
        sb = snap_bounds(GEODETIC, S2_SNAPPED, 5)
        assert tuple(sb) == S2_SNAPPED

    def test_clip_to_grid(self):
        sb = snap_bounds(GEODETIC, (-200, -100, 200, 100), 3)
        assert tuple(sb) == (-180.0, -90.0, 180.0, 90.0)

    @given(
        st.floats(-179.9, 179.0),
        st.floats(-89.9, 89.0),
        st.floats(0.01, 10.0),
        st.floats(0.01, 10.0),
        st.integers(0, 10),
    )
    @settings(max_examples=200, deadline=None)
    def test_snap_idempotent_and_covers(self, left, bottom, w, h, zoom):
        b = (left, bottom, min(left + w, 180.0), min(bottom + h, 90.0))
        s1 = snap_bounds(GEODETIC, b, zoom)
        s2 = snap_bounds(GEODETIC, tuple(s1), zoom)
        assert tuple(s1) == tuple(s2)
        # coverage up to float64 rounding of the pinned formula itself
        eps = 1e-12 * GEODETIC.tile_span(zoom)
        assert s1.left <= b[0] + eps and s1.bottom <= b[1] + eps
        assert s1.right >= b[2] - eps and s1.top >= b[3] - eps


class TestTileFromXY:
    def test_golden_tile_5_7_34(self):
        # FIXTURES.md §5: bounds [15.0064,...] @ z5 → single tile (5,7,34)
        row, col = tile_from_xy(GEODETIC, 15.0064, 48.7485, 5)
        assert (int(row), int(col)) == (7, 34)
        row, col = tile_from_xy(GEODETIC, 16.4863, 47.7604, 5)
        assert (int(row), int(col)) == (7, 34)
        tb = tile_bounds(GEODETIC, 5, 7, 34)
        assert tuple(np.asarray(v).item() for v in tb) == S2_SNAPPED

    def test_half_open_edges(self):
        # on left/top edge → that tile; on right/bottom edge → next tile
        row, col = tile_from_xy(GEODETIC, 11.25, 50.625, 5)
        assert (int(row), int(col)) == (7, 34)
        row, col = tile_from_xy(GEODETIC, 16.875, 45.0, 5)
        assert (int(row), int(col)) == (8, 35)

    def test_grid_edge_clip(self):
        row, col = tile_from_xy(GEODETIC, 180.0, -90.0, 5)
        assert (int(row), int(col)) == (31, 63)

    def test_vectorized(self):
        xs = np.array([15.0064, -180.0, 179.999])
        ys = np.array([48.0, 90.0, -89.999])
        row, col = tile_from_xy(GEODETIC, xs, ys, 5)
        assert row.tolist() == [7, 0, 31]
        assert col.tolist() == [34, 0, 63]

    def test_mercator(self):
        # center point of the world → tile (2^z/2) at z=5: row 16, col 16
        row, col = tile_from_xy(MERCATOR, 0.0, 0.0, 5)
        assert (int(row), int(col)) == (16, 16)

    @given(
        st.floats(-180.0, 179.999999),
        st.floats(-89.999999, 90.0),
        st.integers(0, 12),
    )
    @settings(max_examples=300, deadline=None)
    def test_roundtrip_contains_point(self, x, y, zoom):
        row, col = tile_from_xy(GEODETIC, x, y, zoom)
        tb = tile_bounds(GEODETIC, zoom, int(row), int(col))
        left = float(np.asarray(tb.left))
        right = float(np.asarray(tb.right))
        bottom = float(np.asarray(tb.bottom))
        top = float(np.asarray(tb.top))
        # half-open with grid-edge clip; tolerance = float64 rounding of
        # the pinned floor formula near exact tile boundaries
        eps = 1e-9 * GEODETIC.tile_span(zoom)
        assert left - eps <= x <= right + eps
        assert bottom - eps <= y <= top + eps

    @given(st.integers(0, 10), st.integers(-2, 2))
    @settings(max_examples=100, deadline=None)
    def test_boundary_adversary(self, zoom, k):
        """Points at exact multiples of TS(z) assign per floor rule."""
        ts = GEODETIC.tile_span(zoom)
        x = k * ts
        if not (-180.0 <= x < 180.0):
            return
        row, col = tile_from_xy(GEODETIC, x, 0.0, zoom)
        expected_col = math.floor((x + 180.0) / ts)
        assert int(col) == min(expected_col, GEODETIC.matrix_width(zoom) - 1)


class TestRasterShapeAffine:
    def test_golden_shape_2048(self):
        # snapped [-180,45,-135,90] @ z5 → (2048, 2048) px
        assert raster_shape(GEODETIC, (-180, 45, -135, 90), 5) == (2048, 2048)

    def test_golden_s2_shape(self):
        # s2 fixture: snapped spans 5.625° x 5.625° → 256x256... no:
        # snapped [11.25,45,16.875,50.625] = 5.625° → 256 px? 5.625/PS(5)=256
        assert raster_shape(GEODETIC, S2_SNAPPED, 5) == (256, 256)

    def test_affine(self):
        a = affine_from_bounds(GEODETIC, S2_SNAPPED, 5)
        ps = GEODETIC.pixel_size(5)
        assert a == (ps, 0.0, 11.25, 0.0, -ps, 50.625)

    def test_bounds_to_ranges_full(self):
        a = affine_from_bounds(GEODETIC, S2_SNAPPED, 5)
        assert bounds_to_ranges(S2_SNAPPED, a, (256, 256)) == (0, 256, 0, 256)

    def test_bounds_to_ranges_window(self):
        # one z6 tile inside the z5-snapped region
        a = affine_from_bounds(GEODETIC, S2_SNAPPED, 5)
        sub = (11.25, 47.8125, 14.0625, 50.625)  # top-left z6 quadrant
        assert bounds_to_ranges(sub, a, (256, 256)) == (0, 128, 0, 128)

    def test_bounds_to_ranges_clips(self):
        a = affine_from_bounds(GEODETIC, S2_SNAPPED, 5)
        assert bounds_to_ranges((0, 0, 90, 90), a, (256, 256)) == (0, 256, 0, 256)


class TestPixelCenterCoords:
    def test_golden_s2_coords(self):
        # FIXTURES.md §5: X[0]=11.260986328125, X[255]=16.864013671875,
        # Y[0]=50.614013671875 descending
        xs, ys = pixel_center_coords(S2_SNAPPED, (256, 256), GEODETIC, 5)
        assert xs[0] == 11.260986328125
        assert xs[-1] == 16.864013671875
        assert ys[0] == 50.614013671875
        assert ys[1] < ys[0]
        assert len(xs) == len(ys) == 256


class TestZarrChunkFromXY:
    def test_golden_centroid(self):
        # centroid of tile (5,7,34) in the s2 snapped extent → chunk (0,0)
        row, col = zarr_chunk_from_xy(GEODETIC, S2_SNAPPED, 5, 14.0625, 47.8125)
        assert (int(row), int(col)) == (0, 0)

    def test_second_chunk(self):
        # extent two tiles wide: centroid of the second tile → chunk (0,1)
        b = (11.25, 45.0, 22.5, 50.625)
        row, col = zarr_chunk_from_xy(GEODETIC, b, 5, 19.6875, 47.8125)
        assert (int(row), int(col)) == (0, 1)
        row, col = zarr_chunk_from_xy(GEODETIC, b, 5, 14.0625, 47.8125)
        assert (int(row), int(col)) == (0, 0)

    def test_vectorized(self):
        b = (-180.0, 45.0, -135.0, 90.0)  # 8x8 z5 tiles
        xs = np.array([-177.0, -136.0])
        ys = np.array([88.0, 46.0])
        row, col = zarr_chunk_from_xy(GEODETIC, b, 5, xs, ys)
        assert row.tolist() == [0, 7]
        assert col.tolist() == [0, 7]


class TestBufferedBounds:
    def test_zero_buffer_identity(self):
        tb = tile_bounds(GEODETIC, 5, 7, 34)
        bb = buffered_tile_bounds(GEODETIC, 5, 7, 34, pixelbuffer=0)
        assert tuple(tb) == tuple(bb)

    def test_buffer_grows_by_pixels(self):
        ps = GEODETIC.pixel_size(5)
        bb = buffered_tile_bounds(GEODETIC, 5, 7, 34, pixelbuffer=10)
        assert float(np.asarray(bb.left)) == pytest.approx(11.25 - 10 * ps)
        assert float(np.asarray(bb.top)) == pytest.approx(50.625 + 10 * ps)

    def test_buffer_clipped_at_pole(self):
        bb = buffered_tile_bounds(GEODETIC, 5, 0, 0, pixelbuffer=10)
        assert float(np.asarray(bb.top)) == 90.0
        assert float(np.asarray(bb.left)) == -180.0


class TestTimestampRegions:
    AXIS = ["t0", "t1", "t2", "t3", "t4"]

    def test_golden_runs(self):
        # FIXTURES.md §5: runs [0,1,2] ∪ [4] → slices [0:3], [4:5]
        out = list(timestamp_regions(["t0", "t1", "t2", "t4"], self.AXIS))
        assert out == [(["t0", "t1", "t2"], (0, 3)), (["t4"], (4, 5))]

    def test_unsorted_input(self):
        out = list(timestamp_regions(["t4", "t0"], self.AXIS))
        assert out == [(["t0"], (0, 1)), (["t4"], (4, 5))]

    def test_unknown_timestamp_raises(self):
        # fixed axis can never be extended (_output.py:213-217 semantics)
        with pytest.raises(ValueError, match="not available"):
            list(timestamp_regions(["t9"], self.AXIS))


class TestMetatiling:
    def test_meta2_matrix(self):
        p = Pyramid("geodetic", metatiling=2)
        assert p.matrix_height(1) == 1
        assert p.matrix_width(1) == 2
        assert p.tile_span(1) == 180.0

    def test_meta2_assignment(self):
        p = Pyramid("geodetic", metatiling=2)
        row, col = tile_from_xy(p, 100.0, 50.0, 5)
        r1, c1 = tile_from_xy(GEODETIC, 100.0, 50.0, 5)
        assert int(row) == int(r1) // 2
        assert int(col) == int(c1) // 2
