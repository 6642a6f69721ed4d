"""Netpbm codec (netpbm.py, round 8): ASCII/binary variants, maxval
scaling, external CPython fixtures — including a cross-FORMAT
identity: python.ppm and python.bmp were serialized from the same
source image by different external encoders, and the two independent
decoders (netpbm.py, bmp.py) must produce byte-identical RGB."""

import os
import zlib

import numpy as np
import pandas as pd
import pytest

from mapchete_xarray_spark import netpbm

DATA = os.path.join(os.path.dirname(__file__), "data")
RNG = np.random.default_rng(23)


class TestSpec:
    def test_ascii_variants_with_comments(self):
        g = netpbm.decode(b"P2\n# c\n3 2\n15\n0 7 15\n15 7 0\n")
        assert tuple(g[0]) != ()
        np.testing.assert_array_equal(
            g[:, :, 0], [[0, 119, 255], [255, 119, 0]]
        )
        assert (g[:, :, 0] == g[:, :, 1]).all()
        p1 = netpbm.decode(b"P1\n5 1\n10110\n")
        assert list(p1[0, :, 0]) == [0, 255, 0, 0, 255]  # 1 = black
        assert tuple(netpbm.decode(b"P3\n1 1\n255\n1 2 3\n")[0, 0]) == (1, 2, 3)

    def test_p4_bit_packing(self):
        # 10 pixels -> 2 bytes MSB-first; 1 = black
        data = b"P4\n10 1\n" + bytes([0b10110010, 0b11000000])
        out = netpbm.decode(data)
        np.testing.assert_array_equal(
            out[0, :, 0],
            [0, 255, 0, 0, 255, 255, 0, 255, 0, 0],
        )

    def test_16bit_maxval_big_endian(self):
        data = b"P5\n2 1\n65535\n" + (0).to_bytes(2, "big") + (65535).to_bytes(2, "big")
        out = netpbm.decode(data)
        assert list(out[0, :, 0]) == [0, 255]

    def test_maxval_scaling_rounds(self):
        assert netpbm.decode(b"P2\n1 1\n3\n2\n")[0, 0, 0] == round(2 * 255 / 3)

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError, match="magic"):
            netpbm.decode(b"P9\n1 1\n255\n\x00")

    def test_sample_above_maxval_rejected(self):
        with pytest.raises(ValueError, match="maxval"):
            netpbm.decode(b"P2\n1 1\n10\n11\n")


class TestRoundTrip:
    def test_p6_roundtrip(self):
        for h, w in [(1, 1), (9, 13), (16, 16)]:
            img = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
            np.testing.assert_array_equal(netpbm.decode(netpbm.encode(img)), img)

    def test_codec_dispatch(self):
        from mapchete_xarray_spark import codecs

        img = RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        payload = codecs.encode_image(img, "ppm")
        np.testing.assert_array_equal(
            codecs.decode_image(payload, 8, 8, "ppm"), img
        )


class TestExternalFixtures:
    def test_goldens(self):
        for ext, crc in (
            ("pbm", 4085543933), ("pgm", 1033576394), ("ppm", 1186727254)
        ):
            rgb = netpbm.decode(open(f"{DATA}/python_16x16.{ext}", "rb").read())
            assert rgb.shape == (16, 16, 3)
            assert zlib.crc32(rgb.tobytes()) == crc, ext

    def test_cross_format_identity_with_bmp(self):
        """python.ppm and python.bmp carry the SAME source pixels,
        serialized by different external encoders; the two
        independent decoders must agree byte-for-byte."""
        from mapchete_xarray_spark import bmp

        ppm = netpbm.decode(open(f"{DATA}/python_16x16.ppm", "rb").read())
        bmp_rgb = bmp.decode(open(f"{DATA}/python_16x16.bmp", "rb").read())
        np.testing.assert_array_equal(ppm, bmp_rgb)


@pytest.mark.spark
class TestSparkPaths:
    def test_decode_external_ppm(self, spark):
        imgs = [RNG.integers(0, 256, (12, 10, 3), dtype=np.uint8) for _ in range(3)]
        pdf = pd.DataFrame(
            {
                "image_id": [f"n{i}" for i in range(3)],
                "bytes": [netpbm.encode(a) for a in imgs],
            }
        )
        from mapchete_xarray_spark.operators.multimodal import decode_external

        out = decode_external(spark.createDataFrame(pdf), "ppm").toPandas()
        assert set(out.fmt) == {"raw"}
        for i, a in enumerate(imgs):
            r = out[out.image_id == f"n{i}"].iloc[0]
            got = np.frombuffer(r["bytes"], np.uint8).reshape(r.h, r.w, 3)
            np.testing.assert_array_equal(got, a)


class TestAdviceR8:
    def test_p1_mid_raster_comment_with_digits(self):
        """Plain-PBM allows comments anywhere; a mid-raster '#' span
        containing digits must not corrupt pixels (ADVICE r8)."""
        import numpy as np

        from mapchete_xarray_spark import netpbm

        with_comment = netpbm.decode(
            b"P1\n4 2\n# comment 1 0 1\n0 1 1 0\n1 0 0 1\n"
        )
        plain = netpbm.decode(b"P1\n4 2\n0 1 1 0\n1 0 0 1\n")
        np.testing.assert_array_equal(with_comment, plain)
        # 1 = black
        assert list(plain[0, :, 0]) == [255, 0, 0, 255]
