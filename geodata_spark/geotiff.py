"""Pure-Python baseline GeoTIFF reader + fixture writer.

Implements the published TIFF 6.0 baseline layout plus the GeoTIFF
tags (a stable public format: ``II``/``MM`` byte order, classic magic
42 and BigTIFF magic 43, IFD tag directory, strip or tile payloads).
This makes the S7 GeoTIFF on-ramp (reference ``mask.py:936-965``) a
REAL in-image scan path instead of a rasterio-gated one — no raster
library exists in this image, and the baseline subset is a few
hundred lines of stdlib + numpy.

Supported: single-sample band 1 (SamplesPerPixel ≥ 1 reads sample 0,
contiguous planar config), strip and tile organization, compressions
none(1) / LZW(5) / Deflate(8, 32946) / PackBits(32773), horizontal
predictor(2) for integer samples, all integer widths 8/16/32 signed
and unsigned plus float32/float64 (SampleFormat), both byte orders,
classic and BigTIFF, GDAL_NODATA, and the geotransform from
ModelPixelScale + ModelTiepoint or a 4×4 ModelTransformation.
Not supported (raises ``UnsupportedTiff`` so callers can fall back to
rasterio where installed): planar config 2, predictor 3 (float
differencing), JPEG/CCITT compressions, multi-IFD band selection.

The writer exists so tests can synthesize byte-valid fixtures without
any external library; it round-trips through the reader bit-exactly
(including an LZW encoder that is the spec dual of the decoder — the
9→12-bit "early change" widening is pinned by a hand-packed
known-answer test in tests/test_geotiff_format.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class UnsupportedTiff(Exception):
    """File is valid TIFF but uses a feature outside the baseline
    subset implemented here (caller may fall back to rasterio)."""


# tag ids (TIFF 6.0 + GeoTIFF + GDAL)
T_WIDTH, T_LENGTH, T_BITS, T_COMPRESSION = 256, 257, 258, 259
T_PHOTOMETRIC, T_STRIP_OFFSETS, T_SAMPLES_PER_PIXEL = 262, 273, 277
T_ROWS_PER_STRIP, T_STRIP_COUNTS, T_PLANAR = 278, 279, 284
T_PREDICTOR, T_TILE_WIDTH, T_TILE_LENGTH = 317, 322, 323
T_TILE_OFFSETS, T_TILE_COUNTS, T_SAMPLE_FORMAT = 324, 325, 339
T_PIXEL_SCALE, T_TIEPOINT, T_TRANSFORM = 33550, 33922, 34264
T_GEO_KEYS, T_GDAL_NODATA = 34735, 42113

# field types: id -> (struct letter, byte size)
_FIELD = {
    1: ("B", 1), 2: ("s", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
    6: ("b", 1), 7: ("s", 1), 8: ("h", 2), 9: ("i", 4), 10: ("ii", 8),
    11: ("f", 4), 12: ("d", 8), 16: ("Q", 8), 17: ("q", 8),
}


# ---------------------------------------------------------------------------
# compressions
# ---------------------------------------------------------------------------

def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:                      # literal run of h+1 bytes
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:                    # repeat next byte 257-h times
            out += data[i:i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: replicate runs ≥ 3, literals otherwise."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 128 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += run
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


_LZW_CLEAR, _LZW_EOI = 256, 257


def lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 9→12-bit codes with
    the spec's "early change" (width bumps when the table reaches
    2**width − 1 entries, one entry before it mathematically must)."""
    out = bytearray()
    table: list[bytes] = []
    nbits = 9
    acc = acc_bits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        acc_bits += 8
        while acc_bits >= nbits:
            code = (acc >> (acc_bits - nbits)) & ((1 << nbits) - 1)
            acc_bits -= nbits
            if code == _LZW_EOI:
                return bytes(out)
            if code == _LZW_CLEAR:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                nbits = 9
                prev = None
                continue
            if prev is None:
                if code >= 256:
                    raise UnsupportedTiff("LZW stream did not start with CLEAR")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise UnsupportedTiff(f"corrupt LZW code {code}")
            out += entry
            prev = entry
            if len(table) >= (1 << nbits) - 1 and nbits < 12:
                nbits += 1
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """Dual of :func:`lzw_decode` (CLEAR reissued at table size 4094,
    matching the 12-bit cap under early change)."""
    out = bytearray()
    acc = acc_bits = 0

    def emit(code: int, nbits: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << nbits) | code
        acc_bits += nbits
        while acc_bits >= 8:
            out.append((acc >> (acc_bits - 8)) & 0xFF)
            acc_bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, nbits = 258, 9
    emit(_LZW_CLEAR, nbits)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w], nbits)
        table[w + c] = next_code
        next_code += 1
        # early change: widen after ADDING entry number 2**nbits - 1
        # (one entry before a wider code could actually be emitted);
        # the decoder mirrors this on its table length, which lags the
        # encoder's by exactly one entry at read time
        if next_code - 1 == (1 << nbits) - 1 and nbits < 12:
            nbits += 1
        if next_code >= 4094:
            emit(_LZW_CLEAR, nbits)
            table = {bytes([i]): i for i in range(256)}
            next_code, nbits = 258, 9
        w = c
    if w:
        emit(table[w], nbits)
    emit(_LZW_EOI, nbits)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def _decompress(data: bytes, compression: int) -> bytes:
    if compression == 1:
        return data
    if compression in (8, 32946):
        return zlib.decompress(data)
    if compression == 5:
        return lzw_decode(data)
    if compression == 32773:
        return packbits_decode(data)
    raise UnsupportedTiff(f"compression {compression} not in baseline subset")


def _compress(data: bytes, compression: int) -> bytes:
    if compression == 1:
        return data
    if compression in (8, 32946):
        return zlib.compress(data)
    if compression == 5:
        return lzw_encode(data)
    if compression == 32773:
        return packbits_encode(data)
    raise ValueError(f"writer does not support compression {compression}")


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _dtype_for(fmt: int, bits: int, bo: str) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None:
        raise UnsupportedTiff(f"SampleFormat {fmt}")
    if kind == "f" and bits not in (32, 64):
        raise UnsupportedTiff(f"float{bits}")
    if kind != "f" and bits not in (8, 16, 32):
        raise UnsupportedTiff(f"{kind}{bits}")
    return np.dtype(f"{bo}{kind}{bits // 8}")


def _read_ifd(buf: bytes, bo: str, big: bool, off: int) -> dict[int, tuple]:
    """One IFD → {tag: (type, values tuple | bytes)}."""
    tags: dict[int, tuple] = {}
    if big:
        (count,) = struct.unpack_from(bo + "Q", buf, off)
        pos, esz, osz, ofmt = off + 8, 20, 8, "Q"
    else:
        (count,) = struct.unpack_from(bo + "H", buf, off)
        pos, esz, osz, ofmt = off + 2, 12, 4, "I"
    for _ in range(count):
        tag, ftype = struct.unpack_from(bo + "HH", buf, pos)
        (n,) = struct.unpack_from(bo + ofmt, buf, pos + 4)
        if ftype not in _FIELD:
            pos += esz
            continue
        letter, size = _FIELD[ftype]
        nbytes = n * 8 if letter in ("II", "ii") else n * size
        voff = pos + esz - osz
        if nbytes > osz:
            (voff,) = struct.unpack_from(bo + ofmt, buf, voff)
        if letter == "s":
            vals: tuple = (buf[voff:voff + n],)
        elif letter in ("II", "ii"):
            flat = struct.unpack_from(bo + letter[0] * (2 * n), buf, voff)
            vals = tuple(flat[i] / flat[i + 1] for i in range(0, 2 * n, 2))
        else:
            vals = struct.unpack_from(bo + letter * n, buf, voff)
        tags[tag] = (ftype, vals)
        pos += esz
    return tags


def read_tiff(path: str) -> dict:
    """Parse band 1 of a (Geo)TIFF → dict with ``array`` (2-D numpy,
    native byte order, rows top-down as stored), ``transform``
    ``(x0, sx, y0, sy)`` with (x0, y0) the OUTER top-left corner and
    sy > 0 meaning north-up rows, ``nodata`` (float or None), and
    ``geokeys`` ({key: value} from the GeoKey directory)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise UnsupportedTiff("not a TIFF (no II/MM byte-order mark)")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    if magic == 42:
        big = False
        (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    elif magic == 43:
        big = True
        offsize, zero = struct.unpack_from(bo + "HH", buf, 4)
        if offsize != 8 or zero != 0:
            raise UnsupportedTiff("malformed BigTIFF header")
        (ifd_off,) = struct.unpack_from(bo + "Q", buf, 8)
    else:
        raise UnsupportedTiff(f"TIFF magic {magic}")
    tags = _read_ifd(buf, bo, big, ifd_off)

    def one(tag: int, default=None):
        if tag not in tags:
            if default is None:
                raise UnsupportedTiff(f"required tag {tag} missing")
            return default
        return tags[tag][1][0]

    width, height = one(T_WIDTH), one(T_LENGTH)
    spp = one(T_SAMPLES_PER_PIXEL, 1)
    bits = one(T_BITS, 8)
    fmt = one(T_SAMPLE_FORMAT, 1)
    compression = one(T_COMPRESSION, 1)
    if one(T_PLANAR, 1) != 1:
        raise UnsupportedTiff("planar configuration 2")
    predictor = one(T_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise UnsupportedTiff(f"predictor {predictor}")
    dt = _dtype_for(fmt, bits, bo)
    if predictor == 2 and dt.kind == "f":
        raise UnsupportedTiff("horizontal predictor on float samples")

    def undiff(block: np.ndarray) -> np.ndarray:
        # horizontal differencing accumulates per row per sample,
        # wrapping at the sample width (dtype-preserving cumsum)
        return np.cumsum(block, axis=1, dtype=block.dtype)

    full = np.zeros((height, width, spp), dtype=dt.newbyteorder("="))
    if T_TILE_OFFSETS in tags:
        tw, tl = one(T_TILE_WIDTH), one(T_TILE_LENGTH)
        offs = tags[T_TILE_OFFSETS][1]
        cnts = tags[T_TILE_COUNTS][1]
        per_row = (width + tw - 1) // tw
        for i, (o, c) in enumerate(zip(offs, cnts)):
            raw = _decompress(buf[o:o + c], compression)
            tile = np.frombuffer(raw, dtype=dt, count=tl * tw * spp)
            tile = tile.reshape(tl, tw, spp)
            if predictor == 2:
                tile = undiff(tile)
            ty, tx = (i // per_row) * tl, (i % per_row) * tw
            ny = min(tl, height - ty)
            nx = min(tw, width - tx)
            full[ty:ty + ny, tx:tx + nx] = tile[:ny, :nx]
    else:
        rps = one(T_ROWS_PER_STRIP, height)
        offs = tags[T_STRIP_OFFSETS][1]
        cnts = tags[T_STRIP_COUNTS][1]
        for i, (o, c) in enumerate(zip(offs, cnts)):
            y0 = i * rps
            ny = min(rps, height - y0)
            raw = _decompress(buf[o:o + c], compression)
            strip = np.frombuffer(raw, dtype=dt, count=ny * width * spp)
            strip = strip.reshape(ny, width, spp)
            if predictor == 2:
                strip = undiff(strip)
            full[y0:y0 + ny] = strip

    nodata = None
    if T_GDAL_NODATA in tags:
        txt = tags[T_GDAL_NODATA][1][0].split(b"\x00", 1)[0].strip()
        if txt:
            nodata = float(txt)

    transform = None
    if T_TRANSFORM in tags:
        m = tags[T_TRANSFORM][1]
        if m[1] != 0 or m[4] != 0:
            raise UnsupportedTiff("rotated ModelTransformation")
        transform = (m[3], m[0], m[7], -m[5])
    elif T_PIXEL_SCALE in tags and T_TIEPOINT in tags:
        sx, sy = tags[T_PIXEL_SCALE][1][:2]
        tp = tags[T_TIEPOINT][1]
        i, j, x, y = tp[0], tp[1], tp[3], tp[4]
        transform = (x - i * sx, sx, y + j * sy, sy)

    geokeys: dict[int, int] = {}
    if T_GEO_KEYS in tags:
        g = tags[T_GEO_KEYS][1]
        for i in range(4, len(g), 4):
            kid, loc, cnt, val = g[i:i + 4]
            if loc == 0:
                geokeys[kid] = val

    return {
        "array": full[:, :, 0],
        "width": width,
        "height": height,
        "transform": transform,
        "nodata": nodata,
        "geokeys": geokeys,
    }


# ---------------------------------------------------------------------------
# writer (test fixtures + S10 raster sink format)
# ---------------------------------------------------------------------------

_NP_FMT = {"u": 1, "i": 2, "f": 3}


def write_geotiff(
    path: str,
    array: np.ndarray,
    x0: float,
    y0: float,
    sx: float,
    sy: float,
    *,
    compression: int = 8,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    tile: tuple[int, int] | None = None,
    nodata: float | None = None,
    big: bool = False,
    byteorder: str = "<",
    epsg: int = 4326,
    transform_tag: bool = False,
) -> None:
    """Write a single-band north-up GeoTIFF: ``array`` rows top-down,
    (x0, y0) the OUTER top-left corner, pixel size (sx, sy > 0)."""
    arr = np.ascontiguousarray(array)
    if arr.ndim != 2:
        raise ValueError("single-band 2-D array expected")
    if predictor == 2 and arr.dtype.kind == "f":
        raise ValueError("predictor 2 is for integer samples")
    bo = byteorder
    dt = arr.dtype.newbyteorder(bo)
    height, width = arr.shape

    def payload(block: np.ndarray) -> bytes:
        if predictor == 2:
            block = np.concatenate(
                [block[:, :1], np.diff(block.astype(dt.base), axis=1)], axis=1
            ).astype(dt.base)
        return _compress(block.astype(dt).tobytes(), compression)

    chunks: list[bytes] = []
    if tile is not None:
        tl, tw = tile
        for ty in range(0, height, tl):
            for tx in range(0, width, tw):
                blk = np.zeros((tl, tw), dtype=arr.dtype)
                sub = arr[ty:ty + tl, tx:tx + tw]
                blk[: sub.shape[0], : sub.shape[1]] = sub
                chunks.append(payload(blk))
    else:
        rps = rows_per_strip or height
        for y in range(0, height, rps):
            chunks.append(payload(arr[y:y + rps]))

    ofmt = "Q" if big else "I"
    osz = 8 if big else 4
    esz = 20 if big else 12
    hdr_len = 16 if big else 8

    entries: list[tuple[int, int, int, bytes | list[int]]] = []

    def tag(tid: int, ftype: int, values, raw: bytes | None = None) -> None:
        if raw is None:
            letter = _FIELD[ftype][0]
            if letter in ("II", "ii"):
                raise ValueError("rationals unused by this writer")
            raw = struct.pack(bo + letter * len(values), *values)
            n = len(values)
        else:
            n = len(raw)
        entries.append((tid, ftype, n, raw))

    tag(T_WIDTH, 3, (width,))
    tag(T_LENGTH, 3, (height,))
    tag(T_BITS, 3, (arr.dtype.itemsize * 8,))
    tag(T_COMPRESSION, 3, (compression,))
    tag(T_PHOTOMETRIC, 3, (1,))
    tag(T_SAMPLES_PER_PIXEL, 3, (1,))
    tag(T_SAMPLE_FORMAT, 3, (_NP_FMT[arr.dtype.kind],))
    if predictor != 1:
        tag(T_PREDICTOR, 3, (predictor,))
    if tile is not None:
        tag(T_TILE_WIDTH, 3, (tile[1],))
        tag(T_TILE_LENGTH, 3, (tile[0],))
        off_tag, cnt_tag = T_TILE_OFFSETS, T_TILE_COUNTS
    else:
        tag(T_ROWS_PER_STRIP, 3, (rows_per_strip or height,))
        off_tag, cnt_tag = T_STRIP_OFFSETS, T_STRIP_COUNTS
    if transform_tag:
        # equivalent 4x4 row-major affine instead of scale+tiepoint
        tag(T_TRANSFORM, 12, (sx, 0.0, 0.0, x0,
                              0.0, -sy, 0.0, y0,
                              0.0, 0.0, 0.0, 0.0,
                              0.0, 0.0, 0.0, 1.0))
    else:
        tag(T_PIXEL_SCALE, 12, (sx, sy, 0.0))
        tag(T_TIEPOINT, 12, (0.0, 0.0, 0.0, x0, y0, 0.0))
    # GeoKey directory v1.1: geographic model, explicit geodetic CRS
    tag(T_GEO_KEYS, 3, (1, 1, 0, 2, 1024, 0, 1, 2, 2048, 0, 1, epsg))
    if nodata is not None:
        txt = (repr(float(nodata)) + "\x00").encode()
        tag(T_GDAL_NODATA, 2, None, raw=txt)
    tag(off_tag, 16 if big else 4, [0] * len(chunks))   # patched below
    tag(cnt_tag, 16 if big else 4, [len(c) for c in chunks])
    entries.sort(key=lambda e: e[0])

    ifd_off = hdr_len
    dir_len = (8 + esz * len(entries) + 8) if big else (2 + esz * len(entries) + 4)
    ext_off = ifd_off + dir_len
    ext = bytearray()
    dir_body = bytearray()
    data_off_pos: dict[int, int] = {}
    for tid, ftype, n, raw in entries:
        ent = struct.pack(bo + "HH" + ofmt, tid, ftype, n)
        if len(raw) <= osz:
            ent += raw.ljust(osz, b"\x00")
        else:
            if len(ext) % 2:
                ext += b"\x00"
            ent += struct.pack(bo + ofmt, ext_off + len(ext))
            if tid == off_tag:
                data_off_pos[tid] = ext_off + len(ext)
            ext += raw
        dir_body += ent

    # assemble: header, IFD, external values, then chunk payloads
    out = bytearray()
    if big:
        out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HHHQ", 43, 8, 0, ifd_off)
        out += struct.pack(bo + "Q", len(entries)) + dir_body + struct.pack(bo + "Q", 0)
    else:
        out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, ifd_off)
        out += struct.pack(bo + "H", len(entries)) + dir_body + struct.pack(bo + "I", 0)
    out += ext
    if len(out) % 2:
        out += b"\x00"
    offs = []
    for c in chunks:
        offs.append(len(out))
        out += c
        if len(out) % 2:
            out += b"\x00"

    # patch the offsets array now that payload positions are known
    letter = "Q" if big else "I"
    packed = struct.pack(bo + letter * len(offs), *offs)
    if len(packed) <= osz:
        # inline in the directory entry: find the entry and rewrite
        base = (16 + 8) if big else (8 + 2)
        for i, (tid, _f, _n, _raw) in enumerate(entries):
            if tid == off_tag:
                pos = base + i * esz + (12 if big else 8)
                out[pos:pos + len(packed)] = packed
                break
    else:
        pos = data_off_pos[off_tag]
        out[pos:pos + len(packed)] = packed

    with open(path, "wb") as f:
        f.write(bytes(out))
