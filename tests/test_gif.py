"""GIF codec (gif.py, round 8): LZW round-trips, interlace,
animation compositing (disposal 0/2/3 + transparency), the external
CPython-committed fixture cross-checked pixel-exactly against the
JVM's independent ImageIO decoder, and the Spark decode_external
path.

tests/data/python_16x16.gif is CPython's own committed test asset
(Lib/test/imghdrdata/python.gif, PSF-licensed)."""

import os
import zlib

import numpy as np
import pandas as pd
import pytest

from mapchete_xarray_spark import gif

DATA = os.path.join(os.path.dirname(__file__), "data")
RNG = np.random.default_rng(31)


def _palettized(h, w, ncol, seed=0):
    rng = np.random.default_rng(seed)
    base = np.unique(rng.integers(0, 256, (ncol * 2, 3), dtype=np.uint8), axis=0)
    base = base[:ncol]
    return base[rng.integers(0, len(base), (h, w))]


class TestRoundTrip:
    def test_plain_and_interlaced(self):
        img = _palettized(13, 17, 40)
        np.testing.assert_array_equal(gif.decode(gif.encode(img)), img)
        np.testing.assert_array_equal(
            gif.decode(gif.encode(img, interlace=True)), img
        )

    def test_palette_sizes(self):
        for ncol in (2, 3, 4, 16, 130, 256):
            img = _palettized(9, 11, ncol, seed=ncol)
            np.testing.assert_array_equal(
                gif.decode(gif.encode(img)), img, err_msg=f"ncol={ncol}"
            )

    def test_lzw_table_fill_and_clear(self):
        # enough high-entropy palettized data to fill the 4096-entry
        # dictionary and force the encoder's mid-stream clear
        img = _palettized(120, 120, 200, seed=7)
        data = gif.encode(img)
        np.testing.assert_array_equal(gif.decode(data), img)

    def test_compression_bites_on_flat_content(self):
        img = np.zeros((64, 64, 3), np.uint8)
        assert len(gif.encode(img)) < 200

    def test_too_many_colors_refused(self):
        img = RNG.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="quantize"):
            gif.encode(img)

    def test_not_gif_rejected(self):
        with pytest.raises(ValueError, match="signature"):
            gif.decode(b"\x89PNG" + b"\x00" * 20)


class TestAnimation:
    def test_disposal_keep_background_previous(self):
        f0 = np.zeros((4, 4, 3), np.uint8); f0[:, :] = (200, 0, 0)
        f1 = f0.copy(); f1[1, 1] = (0, 99, 0)
        f2 = f0.copy(); f2[2, 2] = (0, 0, 99)
        data = gif.encode_animation(
            [(f0, 5), (f1, 7), (f2, 3)], disposals=[0, 3, 0]
        )
        info = gif.gif_info(data)
        assert info["n_frames"] == 3 and info["durations_ms"] == [50, 70, 30]
        out = {i: (t, rgb) for i, t, rgb in gif.gif_frames(data)}
        np.testing.assert_array_equal(out[0][1], f0)
        np.testing.assert_array_equal(out[1][1], f1)
        assert out[1][0] == 50 and out[2][0] == 120
        # frame 1 had disposal 3 (restore previous): its green pixel
        # must NOT leak into frame 2
        np.testing.assert_array_equal(out[2][1], f2)

    def test_transparency_keeps_canvas(self):
        f0 = np.zeros((3, 3, 3), np.uint8); f0[:, :] = (10, 20, 30)
        # frame 1 paints color index of (0,0,0)... use a distinct color
        f1 = np.zeros((3, 3, 3), np.uint8); f1[:, :] = (200, 200, 200)
        data = gif.encode_animation([(f0, 1), (f1, 1)])
        # find f1's palette index of (200,200,200) and mark it
        # transparent via the encoder option
        allpx = np.concatenate([f0.reshape(-1, 3), f1.reshape(-1, 3)])
        colors = np.unique(allpx, axis=0)
        t_idx = int(np.where((colors == (200, 200, 200)).all(axis=1))[0][0])
        data = gif.encode_animation(
            [(f0, 1), (f1, 1)], transparents=[None, t_idx]
        )
        out = {i: rgb for i, _, rgb in gif.gif_frames(data)}
        # every f1 pixel is transparent -> canvas keeps frame 0
        np.testing.assert_array_equal(out[1], f0)

    def test_index_selection(self):
        f0 = np.zeros((2, 2, 3), np.uint8)
        f1 = np.full((2, 2, 3), 9, np.uint8)
        data = gif.encode_animation([(f0, 1), (f1, 1)])
        assert [i for i, _, _ in gif.gif_frames(data, [1])] == [1]
        with pytest.raises(ValueError, match="out of range"):
            list(gif.gif_frames(data, [9]))


class TestExternalFixture:
    """CPython's committed python.gif — produced by an external
    encoder; pinned by golden and cross-checked against the JVM."""

    def test_golden(self):
        rgb = gif.decode(open(f"{DATA}/python_16x16.gif", "rb").read())
        assert rgb.shape == (16, 16, 3)
        assert zlib.crc32(rgb.tobytes()) == 2040878644
        assert len(np.unique(rgb.reshape(-1, 3), axis=0)) > 10

    def test_info(self):
        info = gif.gif_info(open(f"{DATA}/python_16x16.gif", "rb").read())
        assert info["canvas_w"] == 16 and info["canvas_h"] == 16
        assert info["n_frames"] == 1


@pytest.mark.spark
class TestSparkPaths:
    def test_cross_decoder_vs_jvm_imageio(self, spark):
        """The JVM's ImageIO (Spark image datasource) is a fully
        independent GIF implementation; GIF is lossless-palettized,
        so non-transparent pixels must match EXACTLY."""
        row = (
            spark.read.format("image")
            .load(f"file://{DATA}/python_16x16.gif")
            .select("image.*")
            .collect()[0]
        )
        assert (row.height, row.width) == (16, 16)
        jvm = np.frombuffer(bytes(row.data), np.uint8).reshape(
            row.height, row.width, row.nChannels
        )
        ours = gif.decode(open(f"{DATA}/python_16x16.gif", "rb").read())
        if row.nChannels == 4:  # BGRA: compare where opaque
            opaque = jvm[:, :, 3] > 0
            np.testing.assert_array_equal(
                jvm[:, :, 2::-1][opaque], ours[opaque]
            )
            assert opaque.mean() > 0.5
        else:  # BGR
            np.testing.assert_array_equal(jvm[:, :, ::-1], ours)

    def test_decode_external_gif(self, spark):
        imgs = [_palettized(12, 10, 30, seed=i) for i in range(3)]
        pdf = pd.DataFrame(
            {
                "image_id": [f"g{i}" for i in range(3)],
                "bytes": [gif.encode(a) for a in imgs],
            }
        )
        from mapchete_xarray_spark.operators.multimodal import decode_external

        out = decode_external(spark.createDataFrame(pdf), "gif").toPandas()
        assert set(out.fmt) == {"raw"}
        for i, a in enumerate(imgs):
            r = out[out.image_id == f"g{i}"].iloc[0]
            got = np.frombuffer(r["bytes"], np.uint8).reshape(r.h, r.w, 3)
            np.testing.assert_array_equal(got, a)

    def test_animated_gif_frame_sampling(self, spark):
        from mapchete_xarray_spark.operators.multimodal import sample_video_frames

        frames = [np.full((4, 4, 3), v, np.uint8) for v in (10, 60, 110, 160)]
        data = gif.encode_animation([(f, 4) for f in frames])
        pdf = pd.DataFrame({"video_id": ["g0"], "bytes": [data]})
        out = sample_video_frames(
            spark.createDataFrame(pdf), n_frames=2
        ).toPandas().sort_values("frame_idx")
        assert list(out.frame_idx) == [0, 3]
        assert list(out.t_sec) == [0.0, 0.12]
        for _, r in out.iterrows():
            got = np.frombuffer(r["frame_bytes"], np.uint8).reshape(r.h, r.w, 3)
            np.testing.assert_array_equal(got, frames[int(r.frame_idx)])
