"""Parity for the driver-side oracle reconstructions
(functions/oracle_raster.py): the serial numpy twins must match the
distributed pipelines BIT-EXACTLY, because the raster-family DuckDB
oracles inline their output as ground truth."""

import numpy as np
import pytest

from mapchete_xarray_spark import grid
from mapchete_xarray_spark.functions import oracle_raster as orr


@pytest.mark.spark
class TestBasePlaneParity:
    N = 300  # queries._overview_n at every correctness sf

    def test_matches_spark_materialize(self, spark):
        from mapchete_xarray_spark.operators.mosaic import materialize_tiles
        from mapchete_xarray_spark.sources.images import (
            images_df,
            with_geometry,
        )

        imgs = with_geometry(images_df(spark, self.N, partitions=8), zoom=6)
        rows = materialize_tiles(imgs, grid.GEODETIC, 6).collect()
        spark_planes = {}
        for r in rows:
            a = np.frombuffer(r.payload, np.uint8).reshape(r.height, r.width)
            spark_planes.setdefault((r.tile_row, r.tile_col), {})[r.band] = a
        mine = orr.base_planes(self.N)
        assert set(spark_planes) == set(mine)
        for k, bands in spark_planes.items():
            for b, a in bands.items():
                np.testing.assert_array_equal(a, mine[k][:, :, b])


@pytest.mark.spark
class TestLabelPlaneParity:
    def test_matches_spark_rasterize(self, spark):
        from mapchete_xarray_spark.operators.rasterize import rasterize_zones
        from mapchete_xarray_spark.sources.aoi import aoi_pandas

        rows = rasterize_zones(
            spark, aoi_pandas(), grid.GEODETIC, 6
        ).collect()
        spark_planes = {
            (r.tile_row, r.tile_col): np.frombuffer(
                r.payload, np.dtype(r.dtype)
            ).reshape(r.height, r.width)
            for r in rows
        }
        mine = orr.label_planes(6)
        assert set(spark_planes) == set(mine)
        for k, a in spark_planes.items():
            np.testing.assert_array_equal(a, mine[k])


class TestSynthFormulaParity:
    def test_lonlat_matches_sql_text_semantics(self):
        # spot-check the numpy twins against hand-evaluated SQL cases
        k = np.arange(40)
        lon, lat = orr.synth_lon(k), orr.synth_lat(k)
        # k=0: hot city 0 blob
        assert lon[0] == 16.37 + 0.0 - 1.0 and lat[0] == 48.21 - 1.0
        # k=3: uniform branch
        assert lon[3] == ((3 * 9973) % 360000) / 1e3 - 180.0
        assert lat[3] == ((3 * 7919) % 170000) / 1e3 - 85.0
        # k=11: city 1 blob
        assert lon[11] == -74.0 + ((11 * 11) % 2000) / 1e3 - 1.0
