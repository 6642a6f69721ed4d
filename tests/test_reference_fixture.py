"""Parity against the reference's OWN committed fixture, read at
runtime: /root/reference/tests/testdata/s2_stack.zarr/.zmetadata is
the golden record the reference's CI asserts against
(tests/test_zarr_creation.py) — our grid math must reproduce it
byte-for-byte.  Plus determinism of the synthetic image table
(caption equality + decoded-pixel stability across regeneration,
BASELINE.json per-row invariant)."""

import json
import os

import numpy as np
import pytest

from mapchete_xarray_spark import codecs, grid

FIXTURE = "/root/reference/tests/testdata/s2_stack.zarr/.zmetadata"


@pytest.fixture(scope="module")
def zmeta():
    if not os.path.exists(FIXTURE):
        pytest.skip("reference fixture not present")
    with open(FIXTURE) as f:
        return json.load(f)["metadata"]


class TestReferenceFixtureParity:
    def test_snap_bounds_equals_effective_bounds(self, zmeta):
        delim = zmeta[".zattrs"]["mapchete"]["driver"]["delimiters"]
        zoom = delim["zoom"][0]
        ours = list(grid.snap_bounds(grid.GEODETIC, delim["process_bounds"], zoom))
        assert ours == delim["effective_bounds"]

    def test_band_array_shape(self, zmeta):
        drv = zmeta[".zattrs"]["mapchete"]["driver"]
        delim = drv["delimiters"]
        H, W = grid.raster_shape(grid.GEODETIC, delim["effective_bounds"], delim["zoom"][0])
        nsteps = len(drv["time"]["steps"])
        assert [nsteps, H, W] == zmeta["Band1/.zarray"]["shape"]

    def test_pixel_center_coord_lengths(self, zmeta):
        delim = zmeta[".zattrs"]["mapchete"]["driver"]["delimiters"]
        zoom = delim["zoom"][0]
        shape = grid.raster_shape(grid.GEODETIC, delim["effective_bounds"], zoom)
        xs, ys = grid.pixel_center_coords(delim["effective_bounds"], shape, grid.GEODETIC, zoom)
        assert len(xs) == zmeta["X/.zarray"]["shape"][0]
        assert len(ys) == zmeta["Y/.zarray"]["shape"][0]

    def test_chunk_assignment_names_existing_file(self, zmeta):
        """The chunk id our math derives from the tile centroid must
        name a chunk file the reference actually committed —
        tiles_exist semantics (_output.py:299-328)."""
        delim = zmeta[".zattrs"]["mapchete"]["driver"]["delimiters"]
        zoom = delim["zoom"][0]
        eb = delim["effective_bounds"]
        cx, cy = (eb[0] + eb[2]) / 2, (eb[1] + eb[3]) / 2
        row, col = grid.zarr_chunk_from_xy(grid.GEODETIC, eb, zoom, cx, cy)
        f = os.path.join(
            os.path.dirname(FIXTURE), "Band1", f"0.{int(row)}.{int(col)}"
        )
        assert os.path.exists(f), f"expected chunk file {f}"

    def test_grid_constants_match_pyramid_metadata(self, zmeta):
        g = zmeta[".zattrs"]["mapchete"]["pyramid"]["grid"]
        assert list(grid.GEODETIC.bounds) == g["bounds"]
        assert [grid.GEODETIC.matrix_height(0), grid.GEODETIC.matrix_width(0)] == g["shape"]

    def test_dtype_and_fill(self, zmeta):
        assert zmeta["Band1/.zarray"]["dtype"] == "<u2"  # uint16 fixtures
        assert zmeta["Band1/.zarray"]["fill_value"] == 0  # nodata default


@pytest.mark.spark
class TestImageTableDeterminism:
    def test_regeneration_identical(self, spark):
        """Caption equality + per-row decoded-pixel equality across two
        independent generations (the per-row invariant of
        BASELINE.json input_hint)."""
        from mapchete_xarray_spark.sources.images import images_df

        a = images_df(spark, 64, partitions=4).toPandas().set_index("image_id").sort_index()
        b = images_df(spark, 64, partitions=8).toPandas().set_index("image_id").sort_index()
        assert (a.caption == b.caption).all()
        assert (a.phash == b.phash).all()
        for iid in a.index[:10]:
            pa = codecs.decode_image(a.loc[iid, "bytes"], a.loc[iid, "w"], a.loc[iid, "h"], a.loc[iid, "fmt"])
            pb = codecs.decode_image(b.loc[iid, "bytes"], b.loc[iid, "w"], b.loc[iid, "h"], b.loc[iid, "fmt"])
            np.testing.assert_array_equal(pa, pb)

    def test_lossy_rows_meet_psnr(self, spark):
        from mapchete_xarray_spark.sources.images import images_df, synth_pixels

        rows = images_df(spark, 40).where("fmt = 'q8'").toPandas()
        assert len(rows) == 4  # every 10th image is lossy
        for r in rows.itertuples():
            i = int(r.image_id[3:])
            original = synth_pixels(i, r.h, r.w)
            decoded = codecs.decode_image(r.bytes, r.w, r.h, r.fmt)
            assert codecs.psnr(original, decoded) >= 40.0
