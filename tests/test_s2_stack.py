"""The reference's s2-stack dataflow, bit-exact against its committed
golden output.

``s2_stack.mapchete`` + ``generate_s2_stack.py:11-17`` read five UTM
33N deflate GeoTIFF scenes and warp them onto geodetic zoom-5 tiles;
the committed ``s2_stack.zarr`` is the reference engine's own output
for that job.  These tests run OUR pipeline — ``tiff.decode`` →
``operators/warp.TileWarper`` (Krüger tmerc + GDAL-parity approximate
transformer) — and require every one of the 983 040 golden pixels
(5 scenes × 3 bands × 256²) to match exactly.

The golden store is decoded by ``zarrio`` (LZ4/blosc), which shares no
code with the TIFF/warp path, so a bug in either side cannot pass.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from mapchete_xarray_spark import tiff, zarrio
from mapchete_xarray_spark.operators import warp

S2_DIR = "/root/reference/tests/testdata/s2_samples"
GOLDEN = "/root/reference/tests/testdata/s2_stack.zarr"
TILE_BOUNDS = (11.25, 45.0, 16.875, 50.625)  # geodetic z5, row 7, col 34
DATES = ["20220601", "20220604", "20220606", "20220609", "20220611"]

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(S2_DIR) and os.path.isdir(GOLDEN)),
    reason="reference fixtures absent",
)


def _scenes():
    by_date = {
        os.path.basename(p).split("_")[2][:8]: p
        for p in glob.glob(f"{S2_DIR}/*.tif")
    }
    return [by_date[d] for d in DATES]


def test_golden_bit_parity_all_planes():
    golden = [zarrio.read_zarray(f"{GOLDEN}/Band{b}") for b in (1, 2, 3)]
    total_px = 0
    for ti, path in enumerate(_scenes()):
        g = tiff.decode(open(path, "rb").read())
        warper = warp.TileWarper(g.transform, g.array.shape[1:], g.epsg)
        for b in range(3):
            plane = warper.warp_plane(g.array[b], TILE_BOUNDS, (256, 256))
            np.testing.assert_array_equal(
                plane, golden[b][ti], err_msg=f"scene {DATES[ti]} band {b + 1}"
            )
            total_px += plane.size
    assert total_px == 983_040


def test_approximation_is_load_bearing():
    """With tolerance→0 (pure exact transform, no chord interpolation)
    a small set of edge-adjacent pixels flips vs golden — pinning that
    GDAL's approximate transformer semantics, not just the projection,
    are what the golden encodes.  Guards against 'simplifying' the
    recursion away and silently losing parity."""
    path = _scenes()[0]
    g = tiff.decode(open(path, "rb").read())
    gold = zarrio.read_zarray(f"{GOLDEN}/Band1")[0]
    exact_warper = warp.TileWarper(
        g.transform, g.array.shape[1:], g.epsg, tolerance=0.0
    )
    plane = exact_warper.warp_plane(g.array[0], TILE_BOUNDS, (256, 256))
    diff = int((plane != gold).sum())
    assert 0 < diff < 200, diff


def test_warper_identity_on_synthetic():
    """A synthetic checkerboard warped onto a tiny window keeps exact
    values (nearest never invents data) and fills outside with fill."""
    rng = np.random.default_rng(9)
    src = rng.integers(0, 65535, (64, 64)).astype(np.uint16)
    tr = (499980.0, 480.0, 0.0, 5400000.0, 0.0, -480.0)
    w = warp.TileWarper(tr, src.shape, 32633)
    out = w.warp_plane(src, (14.9, 48.4, 15.1, 48.6), (64, 64), fill=7)
    vals = set(np.unique(out))
    assert vals <= (set(np.unique(src)) | {7})
    assert (out != 7).any()


@pytest.mark.spark
class TestSinkIngestEndToEnd:
    def test_s2_stack_through_tiledir_sink(self, spark, tmp_path):
        """The FULL reference dataflow through the engine's own sink:
        binaryFile scan → decode+warp (mapInPandas) → TileDirectory
        write with the job's 5-step time axis → single-tile read-back
        — every plane bit-equal to the committed golden zarr.  This is
        ``s2_stack.mapchete`` end to end, sink included (the registry
        query s2_stack_ingest checks the same pixels as checksums
        without materializing a sink)."""
        from pyspark.sql import functions as F  # noqa: F401

        from mapchete_xarray_spark.sources.tiledir import (
            TileDirConfig,
            TileDirectory,
        )

        dates = list(DATES)
        date_idx = {d: i for i, d in enumerate(dates)}

        def ingest(batches):
            import os as _os

            import pandas as _pd

            from mapchete_xarray_spark import tiff as _tiff
            from mapchete_xarray_spark.operators.warp import TileWarper

            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    d = _os.path.basename(path).split("_")[2][:8]
                    g = _tiff.decode(bytes(content))
                    warper = TileWarper(g.transform, g.array.shape[1:], g.epsg)
                    for b in range(3):
                        plane = warper.warp_plane(
                            g.array[b], TILE_BOUNDS, (256, 256)
                        )
                        rows.append(
                            (
                                5, 7, 34, b, date_idx[d], 256, 256,
                                "uint16", plane.tobytes(order="C"), 1,
                            )
                        )
                yield _pd.DataFrame(
                    rows,
                    columns=[
                        "tile_zoom", "tile_row", "tile_col", "band",
                        "ts_idx", "height", "width", "dtype", "payload",
                        "n_sources",
                    ],
                )

        tiles = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.tif")
            .load(S2_DIR)
            .select("path", "content")
            .mapInPandas(
                ingest,
                "tile_zoom int, tile_row long, tile_col long, band int, "
                "ts_idx int, height int, width int, dtype string, "
                "payload binary, n_sources int",
            )
        )
        td = TileDirectory(
            TileDirConfig(
                path=str(tmp_path / "s2sink"),
                zoom=5,
                bands=3,
                dtype="uint16",
                time={"steps": dates_iso(dates)},
            )
        )
        td.prepare()
        td.write(tiles)

        golden = [
            zarrio.read_zarray(f"{GOLDEN}/Band{b}") for b in (1, 2, 3)
        ]
        for ts in range(5):
            arr = td.read_tile_array(spark, 7, 34, ts_idx=ts)
            for b in range(3):
                np.testing.assert_array_equal(
                    arr[b], golden[b][ts], err_msg=f"ts {ts} band {b}"
                )


def dates_iso(dates):
    return [f"{d[:4]}-{d[4:6]}-{d[6:]}" for d in dates]
