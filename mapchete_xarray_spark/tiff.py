"""Pure numpy + stdlib GeoTIFF baseline codec (TIFF 6.0 + GeoTIFF 1.1).

The reference's committed input fixtures are real deflate-compressed
GeoTIFFs (``tests/testdata/s2_samples/*.tif``, written by
``create_s2_samples.py:96-124`` via rasterio and consumed by
``s2_stack.mapchete`` + ``generate_s2_stack.py:11-17``).  This module
makes that dataflow runnable here without rasterio/GDAL: a from-spec
TIFF 6.0 reader (Adobe deflate + uncompressed, strips AND tiles, both
byte orders, chunky and planar layout, horizontal-differencing
predictor, uint8/16/32) plus the GeoTIFF georeferencing tags
(ModelPixelScale/ModelTiepoint/ModelTransformation, GeoKeyDirectory,
GDAL_NODATA) — and a matching minimal writer so tests can hand-
assemble fixtures and round-trip them.

Decode is vectorized per strip/tile (``zlib.decompress`` →
``np.frombuffer`` → reshape; predictor 2 is a modular
``np.add.accumulate`` along the row axis) — no per-pixel Python.

Unsupported TIFF features refuse loudly with the feature name (the
jpeg.py discipline): BigTIFF, LZW/PackBits/JPEG-in-TIFF compression,
floating-point predictor 3, tiled+planar combination, bilevel/palette
expansion.  Only IFD #0 is decoded (additional IFDs are overview
levels; callers wanting them can walk ``ifd_offsets``).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

__all__ = ["decode", "encode", "GeoTiff"]

# TIFF type code → struct fmt char / byte size
_TYPES = {
    1: ("B", 1),   # BYTE
    2: ("s", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    5: ("II", 8),  # RATIONAL (two LONGs)
    6: ("b", 1),   # SBYTE
    8: ("h", 2),   # SSHORT
    9: ("i", 4),   # SLONG
    10: ("ii", 8), # SRATIONAL
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
}

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE = 33550
_TAG_TIEPOINT = 33922
_TAG_TRANSFORM = 34264
_TAG_GEO_KEYS = 34735
_TAG_GEO_DOUBLES = 34736
_TAG_GEO_ASCII = 34737
_TAG_GDAL_NODATA = 42113

# GeoKey ids we surface by name
_GK_MODEL_TYPE = 1024
_GK_RASTER_TYPE = 1025
_GK_GEOGRAPHIC_CS = 2048
_GK_PROJECTED_CS = 3072


@dataclass
class GeoTiff:
    """Decoded raster + georeferencing.

    ``array`` is (bands, h, w) in the file's native dtype;
    ``transform`` is the GDAL-ordered affine
    (x0, px_w, rot, y0, rot, -px_h) mapping pixel (col, row) edges:
    x = x0 + col*px_w, y = y0 - row*px_h for north-up rasters."""

    array: np.ndarray
    transform: tuple[float, float, float, float, float, float] | None = None
    epsg: int | None = None
    nodata: float | None = None
    geo_keys: dict[int, int | float | str] = field(default_factory=dict)
    ifd_offsets: list[int] = field(default_factory=list)

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        """(minx, miny, maxx, maxy) in CRS units (north-up only)."""
        if self.transform is None:
            raise ValueError("GeoTIFF carries no georeferencing tags")
        x0, pw, rx, y0, ry, ph = self.transform
        if rx != 0.0 or ry != 0.0:
            raise NotImplementedError("rotated geotransform bounds")
        _, h, w = self.array.shape
        return (x0, y0 + ph * h, x0 + pw * w, y0)


def _read_ifd(buf: bytes, bo: str, off: int) -> tuple[dict, int]:
    (n,) = struct.unpack_from(bo + "H", buf, off)
    entries: dict[int, tuple] = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, off + 2 + 12 * i)
        if typ not in _TYPES:
            continue  # unknown type: TIFF spec says skip the entry
        fmt, size = _TYPES[typ]
        nbytes = size * cnt
        vo = off + 10 + 12 * i
        if nbytes > 4:
            (vo,) = struct.unpack_from(bo + "I", buf, off + 10 + 12 * i)
        raw = buf[vo : vo + nbytes]
        if typ == 2:
            entries[tag] = raw.split(b"\x00")[0].decode("ascii", "replace")
        elif typ in (5, 10):
            pairs = struct.unpack(bo + f"{2 * cnt}{fmt[0]}", raw)
            entries[tag] = tuple(
                pairs[j] / pairs[j + 1] if pairs[j + 1] else 0.0
                for j in range(0, 2 * cnt, 2)
            )
        else:
            entries[tag] = struct.unpack(bo + f"{cnt}{fmt}", raw)
    (nxt,) = struct.unpack_from(bo + "I", buf, off + 2 + 12 * n)
    return entries, nxt


def _one(entries: dict, tag: int, default=None):
    v = entries.get(tag)
    if v is None:
        return default
    return v[0] if isinstance(v, tuple) else v


def _decompress(chunk: bytes, compression: int) -> bytes:
    if compression == 1:
        return chunk
    if compression in (8, 32946):  # Adobe deflate / legacy deflate
        return zlib.decompress(chunk)
    raise NotImplementedError(
        f"TIFF compression {compression} (only 1=none and 8/32946="
        "deflate are implemented; LZW/PackBits/JPEG-in-TIFF need a "
        "dedicated decoder)"
    )


def _undo_predictor(arr: np.ndarray, predictor: int) -> np.ndarray:
    """arr is (rows, cols, spp); predictor 2 = horizontal differencing
    per sample: cumulative sum along cols with native wraparound."""
    if predictor == 1:
        return arr
    if predictor == 2:
        native = arr.astype(arr.dtype.newbyteorder("="), copy=False)
        return np.add.accumulate(native, axis=1, dtype=native.dtype)
    raise NotImplementedError(
        f"TIFF predictor {predictor} (1=none and 2=horizontal are "
        "implemented; 3=floating-point is not)"
    )


def _parse_geo_keys(entries: dict) -> dict[int, int | float | str]:
    raw = entries.get(_TAG_GEO_KEYS)
    if not raw:
        return {}
    doubles = entries.get(_TAG_GEO_DOUBLES, ())
    ascii_par = entries.get(_TAG_GEO_ASCII, "")
    keys: dict[int, int | float | str] = {}
    n_keys = raw[3]
    for i in range(1, n_keys + 1):
        kid, loc, cnt, val = raw[4 * i : 4 * i + 4]
        if loc == 0:
            keys[kid] = val
        elif loc == _TAG_GEO_DOUBLES:
            keys[kid] = doubles[val] if cnt == 1 else tuple(doubles[val : val + cnt])
        elif loc == _TAG_GEO_ASCII:
            keys[kid] = ascii_par[val : val + cnt].rstrip("|")
    return keys


def decode(buf: bytes) -> GeoTiff:
    """Decode IFD #0 of a (Geo)TIFF byte string → :class:`GeoTiff`."""
    buf = bytes(buf)
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    if magic == 43:
        raise NotImplementedError("BigTIFF (magic 43) is not implemented")
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic}")
    (off,) = struct.unpack_from(bo + "I", buf, 4)
    entries, nxt = _read_ifd(buf, bo, off)
    ifds = [off]
    while nxt:
        ifds.append(nxt)
        nxt = _read_ifd(buf, bo, nxt)[1]

    w = int(_one(entries, _TAG_WIDTH))
    h = int(_one(entries, _TAG_LENGTH))
    spp = int(_one(entries, _TAG_SPP, 1))
    bits = entries.get(_TAG_BITS, (8,) * spp)
    if len(set(bits)) != 1:
        raise NotImplementedError(f"mixed BitsPerSample {bits}")
    fmt_codes = entries.get(_TAG_SAMPLE_FORMAT, (1,) * spp)
    if set(fmt_codes) - {1}:
        raise NotImplementedError(
            f"SampleFormat {fmt_codes} (only 1=unsigned is implemented)"
        )
    if bits[0] not in (8, 16, 32):
        raise NotImplementedError(f"BitsPerSample {bits[0]} (8/16/32 only)")
    dt = np.dtype(f"{bo}u{bits[0] // 8}")
    compression = int(_one(entries, _TAG_COMPRESSION, 1))
    predictor = int(_one(entries, _TAG_PREDICTOR, 1))
    planar = int(_one(entries, _TAG_PLANAR, 1))

    tiled = _TAG_TILE_OFFSETS in entries
    if tiled and planar != 1:
        raise NotImplementedError("tiled + planar TIFF layout")
    out = np.zeros((spp, h, w), dtype=dt.newbyteorder("="))

    if tiled:
        tw = int(_one(entries, _TAG_TILE_WIDTH))
        tl = int(_one(entries, _TAG_TILE_LENGTH))
        offs = entries[_TAG_TILE_OFFSETS]
        cnts = entries[_TAG_TILE_COUNTS]
        tiles_across = (w + tw - 1) // tw
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            data = _decompress(buf[o : o + c], compression)
            arr = np.frombuffer(data, dtype=dt, count=tl * tw * spp)
            arr = _undo_predictor(arr.reshape(tl, tw, spp), predictor)
            ty, tx = divmod(idx, tiles_across)
            r0, c0 = ty * tl, tx * tw
            rs, cs = min(tl, h - r0), min(tw, w - c0)
            out[:, r0 : r0 + rs, c0 : c0 + cs] = (
                arr[:rs, :cs].transpose(2, 0, 1)
            )
    else:
        rps = int(_one(entries, _TAG_ROWS_PER_STRIP, h))
        offs = entries[_TAG_STRIP_OFFSETS]
        cnts = entries[_TAG_STRIP_COUNTS]
        strips_per_image = (h + rps - 1) // rps
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            data = _decompress(buf[o : o + c], compression)
            if planar == 1:
                r0 = idx * rps
                rows = min(rps, h - r0)
                arr = np.frombuffer(data, dtype=dt, count=rows * w * spp)
                arr = _undo_predictor(arr.reshape(rows, w, spp), predictor)
                out[:, r0 : r0 + rows] = arr.transpose(2, 0, 1)
            else:  # planar 2: strips cycle plane-major
                plane, strip_in_plane = divmod(idx, strips_per_image)
                r0 = strip_in_plane * rps
                rows = min(rps, h - r0)
                arr = np.frombuffer(data, dtype=dt, count=rows * w)
                arr = _undo_predictor(arr.reshape(rows, w, 1), predictor)
                out[plane, r0 : r0 + rows] = arr[:, :, 0]

    transform = None
    if _TAG_TRANSFORM in entries:
        m = entries[_TAG_TRANSFORM]
        transform = (m[3], m[0], m[1], m[7], m[4], m[5])
    elif _TAG_PIXEL_SCALE in entries and _TAG_TIEPOINT in entries:
        sx, sy = entries[_TAG_PIXEL_SCALE][:2]
        tp = entries[_TAG_TIEPOINT]
        # tiepoint: raster (i, j, k) → model (x, y, z)
        x0 = tp[3] - tp[0] * sx
        y0 = tp[4] + tp[1] * sy
        transform = (x0, sx, 0.0, y0, 0.0, -sy)

    geo_keys = _parse_geo_keys(entries)
    epsg = None
    model = geo_keys.get(_GK_MODEL_TYPE)
    if model == 1:
        epsg = geo_keys.get(_GK_PROJECTED_CS)
    elif model == 2:
        epsg = geo_keys.get(_GK_GEOGRAPHIC_CS)
    if isinstance(epsg, int) and epsg in (0, 32767):
        epsg = None

    nodata = None
    nd = entries.get(_TAG_GDAL_NODATA)
    if nd is not None:
        try:
            nodata = float(str(nd).strip())
        except ValueError:
            nodata = None

    return GeoTiff(
        array=out,
        transform=transform,
        epsg=int(epsg) if epsg is not None else None,
        nodata=nodata,
        geo_keys=geo_keys,
        ifd_offsets=ifds,
    )


def encode(
    array: np.ndarray,
    transform: tuple[float, float, float, float, float, float] | None = None,
    epsg: int | None = None,
    nodata: float | None = None,
    compression: str = "deflate",
    rows_per_strip: int = 64,
    big_endian: bool = False,
    predictor: int = 1,
) -> bytes:
    """Minimal chunky-strip GeoTIFF writer for fixtures/round-trips.

    ``array``: (bands, h, w) uint8/16/32; ``transform``: GDAL-order
    affine (north-up only).  Deflate or none; optional predictor 2."""
    if array.ndim == 2:
        array = array[None]
    spp, h, w = array.shape
    if array.dtype not in (np.uint8, np.uint16, np.uint32):
        raise NotImplementedError(f"encode dtype {array.dtype}")
    bo = ">" if big_endian else "<"
    dt = array.dtype.newbyteorder(bo)
    comp_code = {"deflate": 8, "none": 1}[compression]
    chunky = np.ascontiguousarray(array.transpose(1, 2, 0)).astype(dt)

    strips = []
    for r0 in range(0, h, rows_per_strip):
        block = chunky[r0 : r0 + rows_per_strip]
        if predictor == 2:
            d = np.array(block)
            d[:, 1:] = block[:, 1:] - block[:, :-1]
            block = d
        raw = block.tobytes()
        strips.append(zlib.compress(raw, 6) if comp_code == 8 else raw)

    bits = array.dtype.itemsize * 8
    tags: list[tuple[int, int, int, object]] = [
        (_TAG_WIDTH, 3, 1, (w,)),
        (_TAG_LENGTH, 3, 1, (h,)),
        (_TAG_BITS, 3, spp, (bits,) * spp),
        (_TAG_COMPRESSION, 3, 1, (comp_code,)),
        (_TAG_PHOTOMETRIC, 3, 1, (1,)),
        (_TAG_STRIP_OFFSETS, 4, len(strips), "STRIP_OFFSETS"),
        (_TAG_SPP, 3, 1, (spp,)),
        (_TAG_ROWS_PER_STRIP, 3, 1, (rows_per_strip,)),
        (_TAG_STRIP_COUNTS, 4, len(strips), tuple(len(s) for s in strips)),
        (_TAG_PLANAR, 3, 1, (1,)),
    ]
    if predictor != 1:
        tags.append((_TAG_PREDICTOR, 3, 1, (predictor,)))
    tags.append((_TAG_SAMPLE_FORMAT, 3, spp, (1,) * spp))
    if transform is not None:
        x0, pw, rx, y0, ry, ph = transform
        if rx != 0.0 or ry != 0.0:
            raise NotImplementedError("rotated geotransform encode")
        tags.append((_TAG_PIXEL_SCALE, 12, 3, (pw, -ph, 0.0)))
        tags.append((_TAG_TIEPOINT, 12, 6, (0.0, 0.0, 0.0, x0, y0, 0.0)))
    if epsg is not None:
        model = 2 if 4000 <= epsg < 5000 else 1
        cs_key = _GK_GEOGRAPHIC_CS if model == 2 else _GK_PROJECTED_CS
        gk = (1, 1, 0, 3,
              _GK_MODEL_TYPE, 0, 1, model,
              _GK_RASTER_TYPE, 0, 1, 1,
              cs_key, 0, 1, epsg)
        tags.append((_TAG_GEO_KEYS, 3, len(gk), gk))
    if nodata is not None:
        s = (f"{nodata:g}" + "\x00").encode("ascii")
        tags.append((_TAG_GDAL_NODATA, 2, len(s), s))
    tags.sort(key=lambda t: t[0])

    # layout: header(8) | IFD | out-of-line tag values | strips
    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    heap = bytearray()
    heap_base = ifd_off + ifd_size

    def _pack_values(typ: int, cnt: int, vals) -> bytes:
        fmt, size = _TYPES[typ]
        if typ == 2:
            return bytes(vals)
        return struct.pack(bo + f"{cnt}{fmt}", *vals)

    # strip data goes after all out-of-line values; compute its base
    # in two passes (first sizes, then offsets)
    oversize = 0
    for tag, typ, cnt, vals in tags:
        nbytes = _TYPES[typ][1] * cnt
        if nbytes > 4:
            oversize += nbytes + (nbytes & 1)
    data_base = heap_base + oversize
    strip_offsets, pos = [], data_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    ifd = bytearray(struct.pack(bo + "H", len(tags)))
    for tag, typ, cnt, vals in tags:
        if vals == "STRIP_OFFSETS":
            vals = tuple(strip_offsets)
        packed = _pack_values(typ, cnt, vals)
        if len(packed) <= 4:
            ifd += struct.pack(bo + "HHI", tag, typ, cnt) + packed.ljust(4, b"\x00")
        else:
            ifd += struct.pack(bo + "HHII", tag, typ, cnt, heap_base + len(heap))
            heap += packed
            if len(packed) & 1:
                heap += b"\x00"
    ifd += struct.pack(bo + "I", 0)  # no next IFD

    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, ifd_off)
    return header + bytes(ifd) + bytes(heap) + b"".join(strips)
