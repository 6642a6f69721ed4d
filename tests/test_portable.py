"""Three-way parity: numpy spec (grid.py/cells.py) ↔ DuckDB ↔ Spark.

The portable SQL strings are used verbatim by both engines, so any
divergence from the numpy golden spec is a real formula bug.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from mapchete_xarray_spark import cells, grid
from mapchete_xarray_spark.functions import portable, tiling

RNG = np.random.default_rng(42)
N = 2000


@pytest.fixture(scope="module")
def points():
    lon = RNG.uniform(-180, 180, N)
    lat = RNG.uniform(-85, 85, N)  # mercator-valid band
    # adversarial: exact tile boundaries at several zooms
    edges = np.array([-180.0, -90.0, 0.0, 5.625, 11.25, 90.0, 179.999, 45.0])
    lon[: len(edges)] = edges
    lat[: len(edges)] = edges / 2.1
    return pd.DataFrame({"key": np.arange(N, dtype=np.int64), "lon": lon, "lat": lat})


@pytest.mark.parametrize("grid_name,zoom", [("geodetic", 5), ("geodetic", 12), ("mercator", 5), ("mercator", 11)])
def test_numpy_vs_duckdb_tile_assignment(points, grid_name, zoom):
    row_sql, col_sql = portable.lonlat_tile_sql("lon", "lat", grid_name, zoom)
    duck = duckdb.sql(
        f"select {row_sql} as r, {col_sql} as c from points"
    ).df()

    pyr = grid.pyramid(grid_name)
    if grid_name == "mercator":
        x = points.lon.to_numpy() * grid.MERCATOR_HALF_WORLD / 180.0
        y = (
            np.log(np.tan(np.pi / 4 + np.radians(points.lat.to_numpy()) / 2))
            / np.pi
            * grid.MERCATOR_HALF_WORLD
        )
    else:
        x, y = points.lon.to_numpy(), points.lat.to_numpy()
    r_np, c_np = grid.tile_from_xy(pyr, x, y, zoom)

    np.testing.assert_array_equal(duck.r.to_numpy(), r_np)
    np.testing.assert_array_equal(duck.c.to_numpy(), c_np)


def test_numpy_vs_duckdb_cell_id(points):
    zoom = 12
    row_sql, col_sql = portable.lonlat_tile_sql("lon", "lat", "geodetic", zoom)
    cid_sql = portable.cell_id_sql(row_sql, col_sql, zoom)
    duck = duckdb.sql(f"select {cid_sql} as cid from points").df()
    r_np, c_np = grid.tile_from_xy(grid.GEODETIC, points.lon.to_numpy(), points.lat.to_numpy(), zoom)
    cid_np = cells.cell_id(np.full(N, zoom), r_np, c_np)
    np.testing.assert_array_equal(duck.cid.to_numpy(), cid_np)


def test_cell_parent_sql_matches(points):
    zoom = 10
    r_np, c_np = grid.tile_from_xy(grid.GEODETIC, points.lon.to_numpy(), points.lat.to_numpy(), zoom)
    cid = cells.cell_id(np.full(N, zoom), r_np, c_np)
    df = pd.DataFrame({"cid": cid})
    duck = duckdb.sql(
        f"select {portable.cell_parent_sql('cid', 2)} as p from df"
    ).df()
    np.testing.assert_array_equal(duck.p.to_numpy(), cells.cell_parent(cid, 2))


def test_synth_points_in_range():
    df = pd.DataFrame({"k": np.arange(50000, dtype=np.int64)})
    duck = duckdb.sql(
        f"select {portable.synth_lon_sql('k')} as lon, {portable.synth_lat_sql('k')} as lat from df"
    ).df()
    assert duck.lon.between(-180, 180).all()
    assert duck.lat.between(-90, 90).all()
    # skew: the three hot blobs must dominate some cells (salting exercise)
    r, c = grid.tile_from_xy(grid.GEODETIC, duck.lon.to_numpy(), duck.lat.to_numpy(), 8)
    counts = pd.Series(cells.cell_id(np.full(len(r), 8), r, c)).value_counts()
    assert counts.iloc[0] > 20 * counts.median()


@pytest.mark.spark
class TestSparkParity:
    def test_spark_vs_numpy_tile_and_cell(self, spark, points):
        sdf = spark.createDataFrame(points)
        for grid_name, zoom in [("geodetic", 7), ("mercator", 7)]:
            out = (
                tiling.with_tile_columns(sdf, "lon", "lat", grid_name, zoom)
                .select("key", "tile_row", "tile_col", "tile_id")
                .toPandas()
                .sort_values("key")
            )
            pyr = grid.pyramid(grid_name)
            if grid_name == "mercator":
                x = points.lon.to_numpy() * grid.MERCATOR_HALF_WORLD / 180.0
                y = (
                    np.log(np.tan(np.pi / 4 + np.radians(points.lat.to_numpy()) / 2))
                    / np.pi
                    * grid.MERCATOR_HALF_WORLD
                )
            else:
                x, y = points.lon.to_numpy(), points.lat.to_numpy()
            r_np, c_np = grid.tile_from_xy(pyr, x, y, zoom)
            np.testing.assert_array_equal(out.tile_row.to_numpy(), r_np)
            np.testing.assert_array_equal(out.tile_col.to_numpy(), c_np)
            np.testing.assert_array_equal(
                out.tile_id.to_numpy(), cells.cell_id(np.full(N, zoom), r_np, c_np)
            )

    def test_plan_is_codegen_only(self, spark, points, tmp_path):
        """Tile assignment must stay inside WholeStageCodegen — no
        Python/Arrow eval node in the plan.  (On a local relation
        Catalyst constant-folds the whole thing away; scan parquet so
        the physical plan is real.)"""
        p = str(tmp_path / "pts.parquet")
        spark.createDataFrame(points).write.parquet(p)
        out = tiling.with_tile_columns(spark.read.parquet(p), "lon", "lat", "geodetic", 9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert "*(1)" in plan  # WholeStageCodegen stage 1 covers the project
