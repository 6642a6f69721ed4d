"""Netpbm (PBM/PGM/PPM, P1-P6) — the ASCII and binary portable
anymap family in pure numpy (round 8).  Handles comments, arbitrary
whitespace, maxval scaling (1..65535; 16-bit samples are big-endian
per the spec), P4's MSB-first bit packing, and the PBM convention
that 1 = black.  Encoder writes P6 maxval 255.

External interop evidence: CPython's committed python.pbm/pgm/ppm
fixtures decode to the same logo silhouette (tests/test_netpbm.py).
Reference parity note: the reference repo contains no codec code;
this is a from-spec implementation of the public Netpbm formats.
"""

from __future__ import annotations

import numpy as np


def _tokens(data: bytes, pos: int, n: int):
    """Yield n whitespace-separated ASCII tokens, skipping comments;
    returns (values, new_pos)."""
    vals = []
    while len(vals) < n:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos] == 0x23:  # '#'
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("netpbm header truncated")
        vals.append(int(data[start:pos]))
    return vals, pos


def decode(data: bytes) -> np.ndarray:
    """PBM/PGM/PPM → (h, w, 3) uint8 RGB (gray broadcast, maxval
    scaled, PBM 1=black rendered as 0)."""
    data = bytes(data)
    magic = data[:2]
    if magic[:1] != b"P" or magic[1:2] not in b"123456":
        raise ValueError("not a netpbm file (bad magic)")
    kind = int(magic[1:2])
    pos = 2
    (w, h), pos = _tokens(data, pos, 2)
    if kind in (1, 4):
        maxval = 1
    else:
        (maxval,), pos = _tokens(data, pos, 1)
    if not 1 <= maxval <= 65535:
        raise ValueError(f"netpbm maxval {maxval} invalid")
    ch = 3 if kind in (3, 6) else 1
    n = w * h * ch
    if kind in (1, 2, 3):  # ASCII
        if kind == 1:
            # P1 digits may run together without whitespace; strip
            # '#'-to-newline comment spans FIRST — the plain-PBM spec
            # allows comments anywhere, and a mid-raster comment
            # containing digits would otherwise corrupt pixels
            # silently (ADVICE r8)
            body = bytearray()
            p = pos
            while p < len(data):
                if data[p] == 0x23:  # '#'
                    while p < len(data) and data[p] != 0x0A:
                        p += 1
                else:
                    body.append(data[p])
                    p += 1
            bits = [c - 0x30 for c in body if c in (0x30, 0x31)]
            if len(bits) < n:
                raise ValueError("netpbm P1 data truncated")
            arr = np.array(bits[:n], np.int64)
        else:
            vals, _ = _tokens(data, pos, n)
            arr = np.array(vals, np.int64)
    else:  # binary: exactly ONE whitespace byte after the header
        pos += 1
        if kind == 4:
            row_bytes = (w + 7) // 8
            raw = np.frombuffer(data, np.uint8, count=row_bytes * h, offset=pos)
            rows = raw.reshape(h, row_bytes)
            shifts = (np.arange(8)[::-1])[None, None, :]
            arr = ((rows[:, :, None] >> shifts) & 1).reshape(h, -1)[:, :w]
            arr = arr.astype(np.int64).reshape(-1)
        elif maxval < 256:
            arr = np.frombuffer(data, np.uint8, count=n, offset=pos).astype(np.int64)
        else:
            arr = np.frombuffer(data, ">u2", count=n, offset=pos).astype(np.int64)
    if int(arr.max(initial=0)) > maxval:
        raise ValueError("netpbm sample exceeds maxval")
    if kind in (1, 4):
        px = np.where(arr == 1, 0, 255)  # 1 = black
    else:
        px = (arr * 255 + maxval // 2) // maxval
    px = px.astype(np.uint8).reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


def encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → P6 maxval 255."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes(order="C")
