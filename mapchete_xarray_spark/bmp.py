"""BMP (Windows DIB) — a REAL bitstream codec in pure stdlib + numpy
(round 8, the last trivial wild-corpus raster format): BITMAPINFO /
V4 / V5 headers, bottom-up and top-down rows with 4-byte padding,
palettized 1/4/8 bpp, 16/24/32 bpp, BI_RGB and BI_BITFIELDS with
arbitrary channel masks, and RLE8/RLE4 compression (run, literal,
delta and end-of-line/bitmap escapes).

The encoder writes 24 bpp BI_RGB bottom-up (round-trips and
fixtures).  External interop evidence: CPython's committed
python.bmp (32 bpp BITFIELDS, V5 header) decodes pixel-exactly
against the JVM's independent ImageIO decoder (tests/test_bmp.py).

Reference parity note: the reference repo contains no codec code;
this is a from-spec implementation of the public Windows BMP format.
"""

from __future__ import annotations

import struct

import numpy as np


def _mask_extract(px: np.ndarray, mask: int) -> np.ndarray:
    """(h, w) uint32 & mask → (h, w) uint8 scaled to 0..255."""
    if mask == 0:
        return np.zeros(px.shape, np.uint8)
    shift = (mask & -mask).bit_length() - 1
    top = mask >> shift
    vals = (px >> shift) & top
    return ((vals * 255 + top // 2) // top).astype(np.uint8)


def _rle_decode(data: bytes, w: int, h: int, *, four_bit: bool) -> np.ndarray:
    """RLE8/RLE4 → (h, w) palette indices, rows in file (bottom-up)
    order."""
    out = np.zeros((h, w), np.uint8)
    x = y = pos = 0
    while pos + 1 < len(data):
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:  # encoded run
            if four_bit:
                pair = [(v >> 4) & 0xF, v & 0xF]
                run = [pair[k & 1] for k in range(n)]
            else:
                run = [v] * n
            out[y, x : x + n] = run[: max(0, min(n, w - x))]
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            if pos + 1 >= len(data):
                raise ValueError("BMP RLE delta truncated")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            # untrusted input: a crafted delta may move the cursor off
            # the bitmap — fail with the codec's ValueError convention
            # instead of an uncontrolled numpy IndexError at the next
            # row write (ADVICE r8)
            if x >= w or y >= h:
                raise ValueError("BMP RLE cursor out of bounds")
        else:  # absolute (literal) mode, word-aligned
            if four_bit:
                nbytes = (v + 1) // 2
                lit = []
                for k in range(v):
                    byte = data[pos + k // 2]
                    lit.append((byte >> 4) & 0xF if k % 2 == 0 else byte & 0xF)
            else:
                nbytes = v
                lit = list(data[pos : pos + v])
            out[y, x : x + v] = lit[: max(0, min(v, w - x))]
            x += v
            pos += nbytes + (nbytes & 1)  # pad to word boundary
    return out


def decode(data: bytes) -> np.ndarray:
    """BMP file → (h, w, 3) uint8 RGB."""
    data = bytes(data)
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    hsz, w, h_signed, planes, bpp, comp = struct.unpack_from("<IiihhI", data, 14)
    if hsz < 40:
        raise NotImplementedError(f"BMP core-header size {hsz} not supported")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError(f"BMP invalid dimensions {w}x{h_signed}")
    (colors_used,) = struct.unpack_from("<I", data, 14 + 32)
    dib = data[14 : 14 + hsz]

    if comp == 3:  # BI_BITFIELDS
        if bpp not in (16, 32):
            raise ValueError(f"BMP BITFIELDS with bpp={bpp} invalid")
        if hsz >= 52:  # V2+/V4/V5: masks live in the header
            rm, gm, bm = struct.unpack_from("<III", dib, 40)
        else:  # 40-byte header: three masks follow it
            rm, gm, bm = struct.unpack_from("<III", data, 14 + 40)
    elif comp in (0, 1, 2):
        rm = gm = bm = 0
        if comp == 1 and bpp != 8:
            raise ValueError("BMP RLE8 requires bpp=8")
        if comp == 2 and bpp != 4:
            raise ValueError("BMP RLE4 requires bpp=4")
    else:
        raise NotImplementedError(f"BMP compression {comp} not supported")

    palette = None
    if bpp <= 8:
        n = colors_used or (1 << bpp)
        pal_off = 14 + hsz + (12 if (comp == 3 and hsz < 52) else 0)
        raw = np.frombuffer(data, np.uint8, count=4 * n, offset=pal_off)
        palette = raw.reshape(n, 4)[:, 2::-1]  # BGRx → RGB

    if comp in (1, 2):
        idx = _rle_decode(data[pix_off:], w, h, four_bit=(comp == 2))
        if not top_down:
            idx = idx[::-1]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP pixel index beyond palette")
        return np.ascontiguousarray(palette[idx])

    row_bytes = (w * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3
    need = stride * h
    rows = np.frombuffer(
        data, np.uint8, count=need, offset=pix_off
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(px[:, :, ::-1])  # BGR → RGB
    if bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)
        if comp == 3:
            u32 = (
                px[:, :, 0].astype(np.uint32)
                | (px[:, :, 1].astype(np.uint32) << 8)
                | (px[:, :, 2].astype(np.uint32) << 16)
                | (px[:, :, 3].astype(np.uint32) << 24)
            )
            return np.stack(
                [_mask_extract(u32, m) for m in (rm, gm, bm)], axis=-1
            )
        return np.ascontiguousarray(px[:, :, 2::-1])  # BGRX → RGB
    if bpp == 16:
        u16 = rows[:, : w * 2].reshape(h, w, 2)
        u32 = u16[:, :, 0].astype(np.uint32) | (
            u16[:, :, 1].astype(np.uint32) << 8
        )
        if comp != 3:  # default 5-5-5
            rm, gm, bm = 0x7C00, 0x03E0, 0x001F
        return np.stack(
            [_mask_extract(u32, m) for m in (rm, gm, bm)], axis=-1
        )
    if bpp in (1, 4, 8):
        if bpp == 8:
            idx = rows[:, :w]
        else:
            per = 8 // bpp
            mask = (1 << bpp) - 1
            shifts = (np.arange(per)[::-1] * bpp)[None, None, :]  # MSB first
            expanded = (
                (rows[:, : (w + per - 1) // per, None] >> shifts) & mask
            ).reshape(h, -1)[:, :w]
            idx = expanded
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP pixel index beyond palette")
        return np.ascontiguousarray(palette[idx.astype(np.int64)])
    raise NotImplementedError(f"BMP bpp={bpp} not supported")


def encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24 bpp BI_RGB bottom-up BMP."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 14 + 40)
    dib = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + dib + pix
