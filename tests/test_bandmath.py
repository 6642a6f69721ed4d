"""Band math raster calculator: numpy parity, expression whitelist,
nodata propagation, dtype cast, plan shape, Job surface."""

import numpy as np
import pytest

from mapchete_xarray_spark.operators.bandmath import (
    band_math,
    compile_expr,
)
from mapchete_xarray_spark.operators.mosaic import TILE_BANDS_SCHEMA

TPX = 8
ZOOM = 3


def _rows(bands, tile=(2, 3), ts=0, dtype="uint8"):
    """bands: {idx: 2d array}"""
    out = []
    for b, arr in bands.items():
        a = np.asarray(arr, dtype=np.dtype(dtype))
        out.append(
            (ZOOM, tile[0], tile[1], b, ts, a.shape[0], a.shape[1], dtype,
             np.ascontiguousarray(a).tobytes(), 1)
        )
    return out


def _plane(df, tile=(2, 3), ts=0):
    sel = [r for r in df.collect()
           if (r.tile_row, r.tile_col, r.ts_idx) == (*tile, ts)]
    assert len(sel) == 1
    r = sel[0]
    return np.frombuffer(r.payload, dtype=np.dtype(r.dtype)).reshape(
        r.height, r.width
    ), r


class TestCompile:
    def test_rejects_non_whitelisted(self):
        for bad in (
            "__import__('os')",
            "b0.real",
            "b0[0]",
            "open('x')",
            "lambda: 1",
            "[b0]",
            "b0; b1",
            "c0 + 1",
            "'str' + b0",
            "where(b0, x=1)",
            "1 + 1",  # no band referenced
        ):
            with pytest.raises(ValueError):
                compile_expr(bad)

    def test_band_discovery(self):
        _, bands = compile_expr("(b3 - b0) / maximum(b3 + b0, 1)")
        assert bands == [0, 3]


class TestBandMath:
    def test_ndvi_matches_numpy(self, spark):
        rng = np.random.default_rng(61)
        red = rng.integers(1, 255, (TPX, TPX))
        nir = rng.integers(1, 255, (TPX, TPX))
        df = spark.createDataFrame(
            _rows({0: red, 1: nir}), TILE_BANDS_SCHEMA
        )
        got, row = _plane(band_math(df, "(b1 - b0) / (b1 + b0)"))
        want = ((nir - red) / (nir + red)).astype(np.float32)
        np.testing.assert_array_equal(got, want)
        assert row.band == 0 and row.dtype == "float32"

    def test_funcs_and_integer_cast(self, spark):
        a = np.arange(TPX * TPX).reshape(TPX, TPX) % 250
        df = spark.createDataFrame(_rows({0: a}), TILE_BANDS_SCHEMA)
        got, row = _plane(
            band_math(df, "clip(sqrt(b0) * 10, 0, 255)", out_dtype="uint8")
        )
        want = np.clip(np.rint(np.sqrt(a.astype(np.float64)) * 10), 0, 255
                       ).astype(np.uint8)
        np.testing.assert_array_equal(got, want)

    def test_nodata_any_band_propagates(self, spark):
        red = np.full((TPX, TPX), 100, np.uint8)
        nir = np.full((TPX, TPX), 200, np.uint8)
        red[0, 0] = 0
        nir[1, 1] = 0
        df = spark.createDataFrame(
            _rows({0: red, 1: nir}), TILE_BANDS_SCHEMA
        )
        got, _ = _plane(band_math(df, "b1 - b0", nodata=0))
        assert got[0, 0] == 0 and got[1, 1] == 0
        assert got[2, 2] == 100.0

    def test_groups_per_tile_and_ts(self, spark):
        rows = (
            _rows({0: np.full((TPX, TPX), 10)}, tile=(2, 3), ts=0)
            + _rows({0: np.full((TPX, TPX), 20)}, tile=(2, 3), ts=1)
            + _rows({0: np.full((TPX, TPX), 30)}, tile=(4, 5), ts=0)
        )
        df = spark.createDataFrame(rows, TILE_BANDS_SCHEMA)
        out = band_math(df, "b0 * 2")
        assert out.count() == 3
        g, _ = _plane(out, tile=(2, 3), ts=1)
        assert g[0, 0] == 40.0

    def test_missing_band_raises(self, spark):
        df = spark.createDataFrame(
            _rows({0: np.zeros((TPX, TPX))}), TILE_BANDS_SCHEMA
        )
        with pytest.raises(Exception, match="missing bands"):
            band_math(df, "b0 + b2").collect()

    def test_nodata_out_dtype_mismatch_fails_at_plan_time(self, spark):
        # ADVICE r5: nodata=-9999 with out_dtype='uint8' must raise
        # driver-side, at the band_math() call, not OverflowError deep
        # inside an executor task on numpy>=2
        df = spark.createDataFrame(
            _rows({0: np.zeros((TPX, TPX))}), TILE_BANDS_SCHEMA
        )
        with pytest.raises(ValueError, match="round-trip"):
            band_math(df, "b0 * 1", nodata=-9999, out_dtype="uint8")

    def test_nan_result_maps_to_nodata_for_integer_dtype(self, spark):
        # ADVICE r5: 0/0 the nodata mask didn't cover must become the
        # declared nodata, not astype(int) undefined behavior
        a = np.zeros((TPX, TPX), np.uint8)
        a[0, 0] = 10
        df = spark.createDataFrame(_rows({0: a}), TILE_BANDS_SCHEMA)
        got, _ = _plane(
            band_math(df, "b0 / b0", out_dtype="uint8", nodata=7)
        )
        assert got[0, 0] == 1
        assert got[1, 1] == 7  # 0/0 → nodata

    def test_nan_result_without_nodata_raises(self, spark):
        a = np.zeros((TPX, TPX), np.uint8)
        df = spark.createDataFrame(_rows({0: a}), TILE_BANDS_SCHEMA)
        with pytest.raises(Exception, match="non-finite"):
            band_math(df, "b0 / b0", out_dtype="uint8").collect()

    def test_multi_zoom_input_groups_per_zoom(self, spark):
        # ADVICE r5: tile_zoom is in the group keys — a pyramid input
        # with the same (row, col, ts) at two zooms yields two planes
        rows = _rows({0: np.full((TPX, TPX), 10)})
        z4 = [(4, *r[1:]) for r in _rows({0: np.full((TPX, TPX), 20)})]
        df = spark.createDataFrame(rows + z4, TILE_BANDS_SCHEMA)
        out = band_math(df, "b0 * 2").collect()
        by_zoom = {r.tile_zoom: np.frombuffer(
            r.payload, np.float32)[0] for r in out}
        assert by_zoom == {ZOOM: 20.0, 4: 40.0}

    def test_one_exchange_in_plan(self, spark):
        df = spark.createDataFrame(
            _rows({0: np.zeros((TPX, TPX)), 1: np.ones((TPX, TPX))}),
            TILE_BANDS_SCHEMA,
        )
        plan = (band_math(df, "b1 - b0")
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1, plan

    def test_job_band_math_process(self, spark, tmp_path):
        from mapchete_xarray_spark.plans.job import Job
        from mapchete_xarray_spark.sources.tiledir import (
            TileDirConfig,
            TileDirectory,
            TileDirError,
        )

        src = TileDirectory(
            TileDirConfig(path=str(tmp_path / "base"), zoom=ZOOM, bands=2,
                          tile_size=TPX)
        )
        src.prepare()
        rng = np.random.default_rng(62)
        red = rng.integers(1, 255, (TPX, TPX))
        nir = rng.integers(1, 255, (TPX, TPX))
        src.write(spark.createDataFrame(
            _rows({0: red, 1: nir}), TILE_BANDS_SCHEMA
        ))
        spec = {
            "process": "band_math",
            "expr": "(b1 - b0) / (b1 + b0)",
            "zoom_levels": [ZOOM],
            "input": {"path": str(tmp_path / "base")},
            "output": {"path": str(tmp_path / "ndvi"), "bands": 1,
                       "dtype": "float32", "tile_size": TPX},
        }
        r = Job(spec).run(spark)
        assert r["tiles"] == 1
        td = TileDirectory.open(str(tmp_path / "ndvi"))
        got, _ = _plane(
            td.read(spark).drop("chunk_row", "chunk_col", "attempt_id")
        )
        want = ((nir - red) / (nir + red)).astype(np.float32)
        np.testing.assert_array_equal(got, want)

        with pytest.raises(TileDirError, match="needs params.expr"):
            Job({k: v for k, v in spec.items() if k != "expr"}).run(spark)