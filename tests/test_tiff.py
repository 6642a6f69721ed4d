"""GeoTIFF codec: round-trips, hand-assembled layout fixtures, loud
refusals, and decode of the reference's committed s2 scenes.

Reference parity anchors: the five deflate GeoTIFFs under
``/root/reference/tests/testdata/s2_samples/`` (written by the
reference's ``create_s2_samples.py:96-124`` via rasterio) must decode
to the exact grids that reproduce the committed golden
``s2_stack.zarr`` — that end-to-end check lives in
``test_s2_stack.py``; here we pin the decoded shape/georeferencing and
cheap whole-array statistics.
"""

from __future__ import annotations

import glob
import os
import struct
import zlib

import numpy as np
import pytest

from mapchete_xarray_spark import tiff

S2_DIR = "/root/reference/tests/testdata/s2_samples"


def _rng(seed):
    return np.random.default_rng(seed)


class TestRoundTrip:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.uint32])
    @pytest.mark.parametrize("compression", ["deflate", "none"])
    def test_dtype_compression(self, dtype, compression):
        arr = _rng(7).integers(0, np.iinfo(dtype).max, (3, 37, 53)).astype(dtype)
        buf = tiff.encode(arr, compression=compression)
        g = tiff.decode(buf)
        np.testing.assert_array_equal(g.array, arr)
        assert g.transform is None and g.epsg is None

    @pytest.mark.parametrize("big_endian", [False, True])
    def test_byte_order(self, big_endian):
        arr = _rng(3).integers(0, 65535, (2, 21, 33)).astype(np.uint16)
        g = tiff.decode(tiff.encode(arr, big_endian=big_endian))
        np.testing.assert_array_equal(g.array, arr)
        assert g.array.dtype == np.uint16  # native order out

    def test_predictor2(self):
        arr = (np.cumsum(_rng(5).integers(0, 9, (1, 40, 40)), axis=2)).astype(
            np.uint16
        )
        buf = tiff.encode(arr, predictor=2)
        np.testing.assert_array_equal(tiff.decode(buf).array, arr)

    def test_multi_strip_partial_last(self):
        # height 70 with rows_per_strip 32 → strips 32/32/6
        arr = _rng(11).integers(0, 255, (3, 70, 29)).astype(np.uint8)
        buf = tiff.encode(arr, rows_per_strip=32)
        np.testing.assert_array_equal(tiff.decode(buf).array, arr)

    def test_georeferencing_tags(self):
        arr = np.zeros((1, 8, 8), dtype=np.uint8)
        tr = (499980.0, 480.0, 0.0, 5400000.0, 0.0, -480.0)
        g = tiff.decode(tiff.encode(arr, transform=tr, epsg=32633, nodata=0.0))
        assert g.transform == tr
        assert g.epsg == 32633
        assert g.nodata == 0.0
        assert g.bounds == (499980.0, 5400000.0 - 8 * 480.0, 499980.0 + 8 * 480.0, 5400000.0)

    def test_geographic_epsg(self):
        arr = np.zeros((1, 4, 4), dtype=np.uint8)
        tr = (11.25, 0.01, 0.0, 50.625, 0.0, -0.01)
        g = tiff.decode(tiff.encode(arr, transform=tr, epsg=4326))
        assert g.epsg == 4326
        assert g.geo_keys[1024] == 2  # geographic model type


def _minimal_tiled_tiff(arr: np.ndarray, tw: int, tl: int) -> bytes:
    """Hand-assemble a tiled, chunky, uncompressed little-endian TIFF
    (the encoder only writes strips, so tiled decode needs its own
    from-scratch fixture)."""
    spp, h, w = arr.shape
    across, down = (w + tw - 1) // tw, (h + tl - 1) // tl
    tiles = []
    for ty in range(down):
        for tx in range(across):
            pad = np.zeros((tl, tw, spp), dtype=arr.dtype)
            block = arr[:, ty * tl : ty * tl + tl, tx * tw : tx * tw + tw]
            pad[: block.shape[1], : block.shape[2]] = block.transpose(1, 2, 0)
            tiles.append(pad.tobytes())
    bits = arr.dtype.itemsize * 8
    tags = [
        (256, 3, 1, (w,)), (257, 3, 1, (h,)), (258, 3, spp, (bits,) * spp),
        (259, 3, 1, (1,)), (262, 3, 1, (1,)), (277, 3, 1, (spp,)),
        (284, 3, 1, (1,)),
        (322, 3, 1, (tw,)), (323, 3, 1, (tl,)),
        (324, 4, len(tiles), None), (325, 4, len(tiles), tuple(len(t) for t in tiles)),
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    heap = bytearray()
    heap_base = ifd_off + ifd_size
    oversize = sum(
        ((tiff._TYPES[t][1] * c + 1) & ~1)
        for _, t, c, _v in tags
        if tiff._TYPES[t][1] * c > 4
    )
    data_base = heap_base + oversize
    offs, pos = [], data_base
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    ifd = bytearray(struct.pack("<H", len(tags)))
    for tag, typ, cnt, vals in tags:
        if vals is None:
            vals = tuple(offs)
        fmt, size = tiff._TYPES[typ]
        packed = struct.pack(f"<{cnt}{fmt}", *vals)
        if len(packed) <= 4:
            ifd += struct.pack("<HHI", tag, typ, cnt) + packed.ljust(4, b"\x00")
        else:
            ifd += struct.pack("<HHII", tag, typ, cnt, heap_base + len(heap))
            heap += packed
            if len(packed) & 1:
                heap += b"\x00"
    ifd += struct.pack("<I", 0)
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + bytes(ifd)
        + bytes(heap)
        + b"".join(tiles)
    )


class TestLayouts:
    def test_tiled_decode(self):
        arr = _rng(13).integers(0, 65535, (3, 50, 70)).astype(np.uint16)
        buf = _minimal_tiled_tiff(arr, tw=32, tl=16)
        np.testing.assert_array_equal(tiff.decode(buf).array, arr)

    def test_planar_decode(self):
        # planar config 2: one strip sequence per plane
        arr = _rng(17).integers(0, 255, (2, 12, 9)).astype(np.uint8)
        strips = [zlib.compress(arr[p].tobytes()) for p in range(2)]
        tags = [
            (256, 3, 1, (9,)), (257, 3, 1, (12,)), (258, 3, 2, (8, 8)),
            (259, 3, 1, (8,)), (262, 3, 1, (1,)),
            (273, 4, 2, None), (277, 3, 1, (2,)), (278, 3, 1, (12,)),
            (279, 4, 2, tuple(len(s) for s in strips)), (284, 3, 1, (2,)),
        ]
        ifd_off = 8
        ifd_size = 2 + 12 * len(tags) + 4
        heap = bytearray()
        heap_base = ifd_off + ifd_size
        oversize = sum(
            ((tiff._TYPES[t][1] * c + 1) & ~1)
            for _, t, c, _v in tags
            if tiff._TYPES[t][1] * c > 4
        )
        data_base = heap_base + oversize
        offs, pos = [], data_base
        for s in strips:
            offs.append(pos)
            pos += len(s)
        ifd = bytearray(struct.pack("<H", len(tags)))
        for tag, typ, cnt, vals in tags:
            if vals is None:
                vals = tuple(offs)
            fmt, _ = tiff._TYPES[typ]
            packed = struct.pack(f"<{cnt}{fmt}", *vals)
            if len(packed) <= 4:
                ifd += struct.pack("<HHI", tag, typ, cnt) + packed.ljust(4, b"\x00")
            else:
                ifd += struct.pack("<HHII", tag, typ, cnt, heap_base + len(heap))
                heap += packed
                if len(packed) & 1:
                    heap += b"\x00"
        ifd += struct.pack("<I", 0)
        buf = (
            struct.pack("<2sHI", b"II", 42, ifd_off)
            + bytes(ifd)
            + bytes(heap)
            + b"".join(strips)
        )
        np.testing.assert_array_equal(tiff.decode(buf).array, arr)


class TestRefusals:
    def test_not_a_tiff(self):
        with pytest.raises(ValueError, match="byte-order"):
            tiff.decode(b"PK\x03\x04----------")

    def test_bigtiff(self):
        with pytest.raises(NotImplementedError, match="BigTIFF"):
            tiff.decode(struct.pack("<2sHI", b"II", 43, 8) + b"\x00" * 16)

    def test_lzw(self):
        arr = np.zeros((1, 4, 4), dtype=np.uint8)
        buf = bytearray(tiff.encode(arr, compression="none"))
        # patch compression tag value 1 → 5 (LZW); tags are in the IFD
        idx = buf.find(struct.pack("<HHI", 259, 3, 1))
        buf[idx + 8 : idx + 10] = struct.pack("<H", 5)
        with pytest.raises(NotImplementedError, match="compression 5"):
            tiff.decode(bytes(buf))

    def test_float_predictor(self):
        arr = np.zeros((1, 4, 4), dtype=np.uint8)
        buf = bytearray(tiff.encode(arr, predictor=2))
        idx = buf.find(struct.pack("<HHI", 317, 3, 1))
        buf[idx + 8 : idx + 10] = struct.pack("<H", 3)
        with pytest.raises(NotImplementedError, match="predictor 3"):
            tiff.decode(bytes(buf))

    def test_encode_dtype(self):
        with pytest.raises(NotImplementedError, match="dtype"):
            tiff.encode(np.zeros((1, 2, 2), dtype=np.float32))


@pytest.mark.skipif(not os.path.isdir(S2_DIR), reason="reference fixtures absent")
class TestReferenceScenes:
    def test_all_scenes_decode(self):
        paths = sorted(glob.glob(f"{S2_DIR}/*.tif"))
        assert len(paths) == 5
        means = {}
        for p in paths:
            g = tiff.decode(open(p, "rb").read())
            assert g.array.shape == (3, 229, 229)
            assert g.array.dtype == np.uint16
            assert g.transform == (499980.0, 480.0, 0.0, 5400000.0, 0.0, -480.0)
            assert g.epsg == 32633
            assert g.nodata == 0.0
            means[os.path.basename(p).split("_")[2][:8]] = round(
                float(g.array.mean()), 1
            )
        # whole-array means pin every decoded sample (any strip/
        # predictor/IFD bug moves them)
        assert means == {
            "20220601": 749.6,
            "20220604": 906.0,
            "20220611": 640.5,
            "20220606": 1120.3,
            "20220609": 8597.7,
        }
