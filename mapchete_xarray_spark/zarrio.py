"""Pure stdlib+numpy zarr-v2 chunk reader (blosc/LZ4 container).

The reference's committed golden output (``tests/testdata/
s2_stack.zarr`` — written by its xarray/zarr sink, consumed by
``read_zarr.py`` and the plugin's own InputData path) stores chunks in
the blosc v1 container with LZ4 block streams and byte-shuffle.  None
of those codecs ship in this sandbox, so this module implements the
three public formats from their specs:

* LZ4 block format (token / literals / 16-bit offset / match run) —
  https://github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md
* blosc v1 container (16-byte header, per-block int32 offset table,
  per-block optional typesize-way stream split, per-block byte
  shuffle) — c-blosc README_HEADER.rst
* zarr v2 directory layout (``.zarray`` JSON + ``<i>.<j>...`` chunk
  files, C-order, missing chunk == fill_value)

Scope is the read side only, enough to cross-check our Spark ingest
against the reference's committed golden values: compressors blosc
(cnames lz4/lz4hc/zlib) and zlib, byte-shuffle, C order, no filters.
Everything else refuses loudly with the feature name.

Decode cost note: LZ4 literal runs are copied with buffer slicing and
matches degrade to per-byte only when overlapping (RLE-style runs);
golden-size chunks (≤640 KiB) decode in milliseconds, and this path
is test/oracle-side, never in a distributed hot loop.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import numpy as np

__all__ = ["lz4_decompress", "blosc_decompress", "read_zarray", "read_group"]


def lz4_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one LZ4 *block* (not frame) stream of known output size."""
    out = bytearray()
    pos, n = 0, len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if lit:
            out += src[pos : pos + lit]
            pos += lit
        if pos >= n:
            break  # last sequence carries literals only
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero match offset")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("corrupt LZ4 block: offset before start")
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            # overlapping match: byte-at-a-time semantics == periodic
            # repetition of the last `offset` bytes (offset 1 = RLE) —
            # tile the period instead of a per-byte Python loop
            period = bytes(out[start : start + offset])
            out += (period * (mlen // offset + 1))[:mlen]
    if len(out) != dst_size:
        raise ValueError(f"LZ4 block decoded {len(out)} bytes, wanted {dst_size}")
    return bytes(out)


def _unshuffle(block: bytes, typesize: int) -> bytes:
    a = np.frombuffer(block, dtype=np.uint8)
    return (
        a.reshape(typesize, len(block) // typesize).T.reshape(-1).tobytes()
    )


def blosc_decompress(src: bytes) -> bytes:
    """Decode a blosc v1 container → raw bytes."""
    if len(src) < 16:
        raise ValueError("blosc buffer shorter than its 16-byte header")
    version, versionlz, flags, typesize = src[0], src[1], src[2], src[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", src, 4)
    if version < 1 or version > 2:
        raise NotImplementedError(f"blosc header version {version}")
    if flags & 0x4:
        raise NotImplementedError("blosc bit-shuffle (flag 0x4)")
    shuffle = bool(flags & 0x1)
    compcode = flags >> 5
    if flags & 0x2:  # pure memcpy: data follows the header verbatim
        return src[16 : 16 + nbytes]
    if compcode == 1:
        decomp = lz4_decompress
    elif compcode == 3:
        decomp = lambda b, sz: zlib.decompress(b)  # noqa: E731
    else:
        names = {0: "blosclz", 2: "snappy", 4: "zstd"}
        raise NotImplementedError(
            f"blosc inner compressor {names.get(compcode, compcode)} "
            "(lz4/lz4hc and zlib are implemented)"
        )
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack_from(f"<{nblocks}I", src, 16)
    # c-blosc 1.x splits each block into `typesize` independent streams
    # for blosclz/lz4 with byte-shuffle and small typesize (shuffle.c
    # `split_block`); lz4hc/zlib/zstd never split.
    split = shuffle and compcode == 1 and 2 <= typesize <= 16
    out = bytearray()
    for bi in range(nblocks):
        bsize = min(blocksize, nbytes - bi * blocksize)
        nstreams = typesize if (split and bsize % typesize == 0) else 1
        neblock = bsize // nstreams
        pos = bstarts[bi]
        block = bytearray()
        for _ in range(nstreams):
            (csize,) = struct.unpack_from("<I", src, pos)
            pos += 4
            stream = src[pos : pos + csize]
            pos += csize
            block += stream if csize == neblock else decomp(stream, neblock)
        if len(block) != bsize:
            raise ValueError(f"blosc block {bi}: got {len(block)}, want {bsize}")
        if shuffle and typesize > 1 and bsize % typesize == 0:
            block = _unshuffle(bytes(block), typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(f"blosc: decoded {len(out)} bytes, header says {nbytes}")
    return bytes(out)


def _decode_chunk(raw: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid == "blosc":
        return blosc_decompress(raw)
    if cid == "zlib":
        return zlib.decompress(raw)
    raise NotImplementedError(f"zarr compressor {cid!r} (blosc/zlib/none)")


def read_zarray(path: str) -> np.ndarray:
    """Read a full zarr-v2 array directory into one numpy array."""
    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 2:
        raise NotImplementedError(f"zarr_format {meta.get('zarr_format')}")
    if meta.get("filters"):
        raise NotImplementedError("zarr filters")
    if meta.get("order", "C") != "C":
        raise NotImplementedError("Fortran-order zarr chunks")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dt = np.dtype(meta["dtype"])
    fill = meta.get("fill_value")
    if fill == "NaN":
        fill = np.nan
    out = np.full(shape, 0 if fill is None else fill, dtype=dt)
    grid_shape = tuple(
        (s + c - 1) // c for s, c in zip(shape, chunks)
    ) or (1,)
    for idx in np.ndindex(*grid_shape):
        name = ".".join(map(str, idx)) if shape else "0"
        cpath = os.path.join(path, name)
        if not os.path.exists(cpath):
            continue
        with open(cpath, "rb") as f:
            raw = f.read()
        data = _decode_chunk(raw, meta.get("compressor"))
        arr = np.frombuffer(data, dtype=dt).reshape(chunks)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        trim = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        out[sel] = arr[trim]
    return out


def read_group(path: str) -> dict[str, np.ndarray]:
    """Read every array in a (non-nested) zarr-v2 group directory."""
    out = {}
    for name in sorted(os.listdir(path)):
        sub = os.path.join(path, name)
        if os.path.isdir(sub) and os.path.exists(os.path.join(sub, ".zarray")):
            out[name] = read_zarray(sub)
    return out
