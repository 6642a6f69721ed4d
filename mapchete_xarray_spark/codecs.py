"""Image payload codecs — numpy-only (no Pillow/GDAL in sandbox).

The input table carries pixels as opaque ``bytes:binary`` plus typed
metadata ``(w, h, fmt)`` (``BASELINE.json`` input_hint).  Two codecs:

- ``raw``: lossless — C-order uint8 ``tobytes()`` of an (h, w, 3) array.
- ``q8``:  lossy — 5-bit quantize/dequantize then raw; exercises the
  PSNR >= 40 dB verification path of the north rule.  (Real JPEG/WebP
  decode would slot in here behind the same interface; those libs are
  not in the container, so the lossy path is this deterministic
  quantizer — clearly a stand-in, but the Spark-side plumbing (binary
  column, Arrow batches, per-batch decode) is real.)

All functions operate on whole numpy arrays and are called from Arrow
batch UDFs only — never per row from Python.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_image", "decode_image", "psnr", "CHANNELS"]

CHANNELS = 3
_Q8_LEVELS = 31  # 5-bit: quantization step 255/31 ≈ 8.23 → PSNR ≈ 40.6 dB


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """arr: (h, w, 3) uint8 → payload bytes."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != CHANNELS:
        raise ValueError(f"expected (h,w,{CHANNELS}) uint8, got {arr.shape} {arr.dtype}")
    if fmt == "raw":
        return arr.tobytes(order="C")
    if fmt == "q8":
        q = np.rint(arr.astype(np.float64) * _Q8_LEVELS / 255.0)
        deq = np.rint(q * 255.0 / _Q8_LEVELS).astype(np.uint8)
        return deq.tobytes(order="C")
    raise ValueError(f"unknown fmt: {fmt}")


def decode_image(payload: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """payload → (h, w, 3) uint8.  ``q8`` payloads are stored
    dequantized, so decode is a reshape for both codecs."""
    if fmt not in ("raw", "q8"):
        raise ValueError(f"unknown fmt: {fmt}")
    arr = np.frombuffer(payload, dtype=np.uint8)
    expected = h * w * CHANNELS
    if arr.size != expected:
        raise ValueError(f"payload size {arr.size} != h*w*3 = {expected}")
    return arr.reshape(h, w, CHANNELS)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))
