"""Vector→raster rasterization: brute-force parity, paint order,
burn-column validation, zonal round-trip, sink e2e, plan shape."""

import numpy as np
import pandas as pd
import pytest

from mapchete_xarray_spark import grid
from mapchete_xarray_spark.geom import polygon_bounds, polygon_wkb
from mapchete_xarray_spark.operators.rasterize import (
    rasterize_bruteforce,
    rasterize_zones,
    zone_tile_ranges,
)
from mapchete_xarray_spark.sources.aoi import aoi_pandas

TPX = 16
ZOOM = 3
PYR = grid.Pyramid("geodetic", tile_size=TPX)


def _zone(aoi_id, ring, value=None):
    ring = np.asarray(ring, dtype=np.float64)
    row = {
        "aoi_id": aoi_id,
        "wkb": polygon_wkb(ring),
    }
    row["minx"], row["miny"], row["maxx"], row["maxy"] = polygon_bounds(ring)
    if value is not None:
        row["value"] = value
    return row


def _collect_planes(df, dtype=np.uint16):
    return {
        (r.tile_row, r.tile_col): np.frombuffer(
            r.payload, dtype=dtype
        ).reshape(r.height, r.width)
        for r in df.collect()
    }


class TestRasterize:
    def test_matches_bruteforce(self, spark):
        zones = aoi_pandas(25)
        out = rasterize_zones(spark, zones, PYR, ZOOM)
        got = _collect_planes(out)
        assert got, "fixture must burn at least one tile"
        # brute-force over the full candidate tile set (every tile any
        # zone bbox covers), so missing-tile errors surface both ways
        rg = zone_tile_ranges(zones, PYR, ZOOM)
        tiles = {
            (r, c)
            for row in rg.itertuples()
            for r in range(row.row0, row.row1 + 1)
            for c in range(row.col0, row.col1 + 1)
        }
        want = rasterize_bruteforce(zones, PYR, ZOOM, sorted(tiles))
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=str(k))

    def test_paint_order_later_zone_wins(self, spark):
        sq1 = [[0.0, 0.0], [40.0, 0.0], [40.0, 40.0], [0.0, 40.0], [0.0, 0.0]]
        sq2 = [[20.0, 20.0], [60.0, 20.0], [60.0, 60.0], [20.0, 60.0],
               [20.0, 20.0]]
        zones = pd.DataFrame([_zone("a", sq1), _zone("b", sq2)])
        got = _collect_planes(rasterize_zones(spark, zones, PYR, ZOOM))
        allpx = np.concatenate([p.ravel() for p in got.values()])
        # overlap region burned 2 (zone b), not 1
        assert set(np.unique(allpx)) == {0, 1, 2}
        # the overlap square [20,40]x[20,40] must be entirely 2
        for (tr, tc), plane in got.items():
            b = grid.tile_bounds(PYR, ZOOM, tr, tc)
            xs, ys = grid.pixel_center_coords(b, (TPX, TPX), PYR, ZOOM)
            gx = np.broadcast_to(xs, (TPX, TPX))
            gy = np.broadcast_to(ys[:, None], (TPX, TPX))
            inside = (gx > 20) & (gx < 40) & (gy > 20) & (gy < 40)
            assert (plane[inside] == 2).all()

    def test_burn_column_and_dtype_gate(self, spark):
        sq = [[0.0, 0.0], [30.0, 0.0], [30.0, 30.0], [0.0, 30.0], [0.0, 0.0]]
        zones = pd.DataFrame([_zone("a", sq, value=7.0)])
        got = _collect_planes(
            rasterize_zones(spark, zones, PYR, ZOOM, burn="value")
        )
        vals = set(np.unique(np.concatenate([p.ravel() for p in got.values()])))
        assert vals == {0, 7}
        # non-integral burn value must not silently truncate
        zones_bad = pd.DataFrame([_zone("a", sq, value=7.5)])
        with pytest.raises(ValueError, match="does not fit dtype"):
            rasterize_zones(spark, zones_bad, PYR, ZOOM, burn="value")
        # uint8 overflow refused, not wrapped
        zones_big = pd.DataFrame([_zone("a", sq, value=300.0)])
        with pytest.raises(ValueError, match="does not fit dtype"):
            rasterize_zones(
                spark, zones_big, PYR, ZOOM, burn="value", dtype="uint8"
            )
        with pytest.raises(ValueError, match="not in zones"):
            rasterize_zones(spark, zones, PYR, ZOOM, burn="nope")

    def test_zonal_roundtrip_pixel_counts(self, spark):
        """rasterize → zonal_stats over the label plane: each zone's
        n_pixels equals its PNPOLY membership count (disjoint zones, so
        paint order can't steal pixels) — the two operators share one
        coord rule by construction."""
        from mapchete_xarray_spark.operators.zonal import zonal_stats

        z1 = [[-60.0, -30.0], [-20.0, -35.0], [-25.0, 5.0], [-55.0, 10.0],
              [-60.0, -30.0]]
        z2 = [[100.0, 20.0], [140.0, 15.0], [135.0, 50.0], [105.0, 55.0],
              [100.0, 20.0]]
        zones = pd.DataFrame([_zone("z1", z1), _zone("z2", z2)])
        plane = rasterize_zones(spark, zones, PYR, ZOOM)
        stats = {
            r.aoi_id: r
            for r in zonal_stats(
                plane, zones, PYR, ZOOM, nodata=0
            ).collect()
        }
        burned = _collect_planes(plane)
        for idx, aoi_id in enumerate(("z1", "z2"), start=1):
            n_burned = sum(
                int((p == idx).sum()) for p in burned.values()
            )
            assert stats[aoi_id].n_pixels == n_burned > 0
            # the label plane is constant inside the zone
            assert stats[aoi_id].px_min == stats[aoi_id].px_max == idx

    def test_sink_roundtrip(self, spark, tmp_path):
        from mapchete_xarray_spark.sources.tiledir import (
            TileDirConfig,
            TileDirectory,
        )

        zones = aoi_pandas(10)
        td = TileDirectory(
            TileDirConfig(path=str(tmp_path / "labels"), zoom=ZOOM, bands=1,
                          tile_size=TPX, dtype="uint16")
        )
        td.prepare()
        plane = rasterize_zones(spark, zones, PYR, ZOOM)
        td.write(plane)
        want = _collect_planes(rasterize_zones(spark, zones, PYR, ZOOM))
        got = _collect_planes(
            td.read(spark).drop("chunk_row", "chunk_col", "attempt_id")
        )
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])

    def test_job_rasterize_process(self, spark, tmp_path):
        """Job surface: zones parquet → process: rasterize → sink; the
        sink planes equal a direct rasterize_zones of the same zones
        at the job's pyramid (256-px tiles)."""
        from mapchete_xarray_spark.plans.job import Job
        from mapchete_xarray_spark.sources.tiledir import TileDirectory

        zones = aoi_pandas(8)
        spark.createDataFrame(zones).coalesce(1).write.parquet(
            str(tmp_path / "zones")
        )
        spec = {
            "process": "rasterize",
            "zoom_levels": [3],
            "input": {"format": "zones", "path": str(tmp_path / "zones")},
            "output": {"path": str(tmp_path / "labels"), "bands": 1,
                       "dtype": "uint16"},
        }
        r = Job(spec).run(spark)
        assert r["tiles"] > 0
        td = TileDirectory.open(str(tmp_path / "labels"))
        got = _collect_planes(
            td.read(spark).drop("chunk_row", "chunk_col", "attempt_id")
        )
        pyr256 = grid.Pyramid("geodetic", tile_size=256)
        want = {
            (r2.tile_row, r2.tile_col): np.frombuffer(
                r2.payload, dtype=np.uint16
            ).reshape(r2.height, r2.width)
            for r2 in rasterize_zones(spark, zones, pyr256, 3).collect()
        }
        assert set(got) == set(want) and want
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])

        bad = dict(spec, input={"format": "zones",
                                "path": str(tmp_path / "zones")})
        zless = zones.drop(columns=["wkb"])
        spark.createDataFrame(zless).write.parquet(str(tmp_path / "zbad"))
        bad["input"]["path"] = str(tmp_path / "zbad")
        bad["output"] = {"path": str(tmp_path / "labels2"), "bands": 1,
                         "dtype": "uint16"}
        with pytest.raises(Exception, match="missing columns"):
            Job(bad).run(spark)

    def test_off_grid_zone_burns_nothing(self, spark):
        # a sliver between pixel centers burns no pixel → no tiles
        eps = 1e-6
        sq = [[10.0, 10.0], [10.0 + eps, 10.0], [10.0 + eps, 10.0 + eps],
              [10.0, 10.0 + eps], [10.0, 10.0]]
        zones = pd.DataFrame([_zone("sliver", sq)])
        assert rasterize_zones(spark, zones, PYR, ZOOM).count() == 0

    def test_key_only_exchanges_in_plan(self, spark):
        zones = aoi_pandas(5)
        plan = (
            rasterize_zones(spark, zones, PYR, ZOOM)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # TWO key-only shuffles (distinct + the anti-AQE-coalesce
        # respread); the burn itself is map-only and no pixel crosses
        # a wire — every Exchange in the plan sits BEFORE the
        # mapInPandas burn
        assert plan.count("Exchange") == 2, plan
        assert plan.index("MapInPandas") < plan.index("Exchange"), plan

    def test_burn_spreads_across_tasks(self, spark):
        """The respread must defeat AQE's size-based coalescing: the
        burn stage runs over multiple partitions, none holding more
        than half the tiles."""
        import pyspark.sql.functions as F

        zones = aoi_pandas(25)
        df = rasterize_zones(spark, zones, PYR, ZOOM)
        per = (
            df.select(F.spark_partition_id().alias("p"))
            .groupBy("p").count().collect()
        )
        total = sum(r["count"] for r in per)
        assert len(per) > 1
        # the invariant is "not serialized", not perfect balance — 22
        # keys over 2 hash partitions can land 13/9
        assert max(r["count"] for r in per) < total
