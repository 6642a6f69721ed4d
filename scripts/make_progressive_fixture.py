#!/usr/bin/env python
"""Regenerate tests/data/kitten_progressive.jpg.

Re-encodes the committed baseline kitten photo progressively using the
JVM's ImageIO JPEG writer (via the PySpark gateway) — an encoder
sharing no code with jpeg.py, so the committed fixture is an
independent SOF2 bitstream (full scan script: interleaved DC first +
refinement, per-component spectral-selection AC scans with successive
approximation).  tests/test_jpeg.py::TestProgressive* pins decode
quality against both the baseline twin and the JVM's own decode.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "tests/data/kitten_300x296.jpg"
DST = "tests/data/kitten_progressive.jpg"


def main() -> None:
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[1]").getOrCreate()
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(SRC))
    w = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    param = w.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.9)
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(
        jvm.java.io.File(DST)
    )
    w.setOutput(ios)
    w.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.close()
    spark.stop()
    print(f"wrote {DST} ({os.path.getsize(DST)} bytes)")


if __name__ == "__main__":
    main()
