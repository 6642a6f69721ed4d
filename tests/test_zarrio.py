"""zarr-v2/blosc/LZ4 reader: synthetic container fixtures + the
reference's committed golden store.

The golden coordinate arrays are the independent anchor: X/Y must
equal the pixel centers of geodetic z5 tile (row 7, col 34) computed
from first principles, and ``time`` the configured day offsets — if
the LZ4 block decode, the blosc stream split, or the byte unshuffle
were wrong in any way, float64 coordinates would be garbage, not
off-by-ulps.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

from mapchete_xarray_spark import zarrio

GOLDEN = "/root/reference/tests/testdata/s2_stack.zarr"


class TestLz4:
    def test_literals_only(self):
        # one sequence: 5 literals, no match (last sequence rule)
        src = bytes([0x50]) + b"hello"
        assert zarrio.lz4_decompress(src, 5) == b"hello"

    def test_match_copy(self):
        # 4 literals "abcd", then match len 8 at offset 4 → "abcdabcdabcd"
        src = bytes([0x44]) + b"abcd" + struct.pack("<H", 4) + bytes([0x00])
        assert zarrio.lz4_decompress(src, 12) == b"abcd" * 3

    def test_overlapping_rle(self):
        # 1 literal "x", match len 19 at offset 1 → 20 x's (RLE semantics)
        src = bytes([0x1F]) + b"x" + struct.pack("<H", 1) + bytes([0x00])
        assert zarrio.lz4_decompress(src, 20) == b"x" * 20

    def test_extended_lengths(self):
        # literal run 15+240=255 then done
        src = bytes([0xF0, 240]) + b"a" * 255
        assert zarrio.lz4_decompress(src, 255) == b"a" * 255

    def test_zero_offset_rejected(self):
        src = bytes([0x04]) + struct.pack("<H", 0) + bytes([0x00])
        with pytest.raises(ValueError, match="zero match offset"):
            zarrio.lz4_decompress(src, 10)

    def test_size_mismatch_rejected(self):
        with pytest.raises(ValueError, match="decoded"):
            zarrio.lz4_decompress(bytes([0x30]) + b"abc", 7)


def _blosc_container(payload: bytes, *, flags: int, typesize: int,
                     blocksize: int, blocks: list[bytes]) -> bytes:
    head = bytes([2, 1, flags, typesize]) + struct.pack(
        "<III", len(payload), blocksize, 0
    )
    table_off = 16 + 4 * len(blocks)
    offs, body = [], bytearray()
    for b in blocks:
        offs.append(table_off + len(body))
        body += b
    return head + struct.pack(f"<{len(blocks)}I", *offs) + bytes(body)


class TestBlosc:
    def test_memcpy_flag(self):
        payload = bytes(range(64))
        src = bytes([2, 1, 0x2, 1]) + struct.pack("<III", 64, 64, 80) + payload
        assert zarrio.blosc_decompress(src) == payload

    def test_zlib_inner(self):
        payload = b"spark" * 100
        comp = zlib.compress(payload)
        blk = struct.pack("<I", len(comp)) + comp
        src = _blosc_container(
            payload, flags=3 << 5, typesize=1, blocksize=len(payload), blocks=[blk]
        )
        assert zarrio.blosc_decompress(src) == payload

    def test_uncompressible_stream_stored_raw(self):
        payload = bytes(np.random.default_rng(3).integers(0, 256, 96, dtype=np.uint8))
        blk = struct.pack("<I", len(payload)) + payload  # csize == neblock → raw
        src = _blosc_container(
            payload, flags=3 << 5, typesize=1, blocksize=len(payload), blocks=[blk]
        )
        assert zarrio.blosc_decompress(src) == payload

    def test_zstd_refused(self):
        src = bytes([2, 1, 4 << 5, 1]) + struct.pack("<III", 8, 8, 0) + b"\x00" * 12
        with pytest.raises(NotImplementedError, match="zstd"):
            zarrio.blosc_decompress(src)

    def test_bitshuffle_refused(self):
        src = bytes([2, 1, 0x4, 1]) + struct.pack("<III", 8, 8, 0) + b"\x00" * 12
        with pytest.raises(NotImplementedError, match="bit-shuffle"):
            zarrio.blosc_decompress(src)


@pytest.mark.skipif(not os.path.isdir(GOLDEN), reason="golden zarr absent")
class TestGoldenStore:
    def test_coordinate_arrays_exact(self):
        res = 5.625 / 256
        x = zarrio.read_zarray(f"{GOLDEN}/X")
        y = zarrio.read_zarray(f"{GOLDEN}/Y")
        np.testing.assert_array_equal(x, 11.25 + (np.arange(256) + 0.5) * res)
        np.testing.assert_array_equal(y, 50.625 - (np.arange(256) + 0.5) * res)

    def test_time_axis(self):
        t = zarrio.read_zarray(f"{GOLDEN}/time")
        np.testing.assert_array_equal(t, [0, 3, 5, 8, 10])

    def test_band_shapes_and_masks(self):
        g = zarrio.read_group(GOLDEN)
        assert sorted(g) == ["Band1", "Band2", "Band3", "X", "Y", "time"]
        for b in ("Band1", "Band2", "Band3"):
            assert g[b].shape == (5, 256, 256)
            assert g[b].dtype == np.uint16
            # every timestamp has data; the scene footprint covers a
            # few percent of the 5.625° tile
            nz = (g[b] != 0).reshape(5, -1).mean(axis=1)
            assert (nz > 0.015).all() and (nz < 0.06).all()
