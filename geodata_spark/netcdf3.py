"""Pure-Python classic NetCDF (CDF-1/CDF-2) reader + fixture writer.

Implements the published classic file format (the NetCDF "classic
format spec", a stable public binary layout: magic ``CDF\\x01`` /
``CDF\\x02``, big-endian XDR-style header, fixed vars at absolute
offsets, record vars interleaved per record).  This makes the S1/S2
NetCDF on-ramp (reference ``datasets/era5.py:392-453``) a REAL
in-image scan path instead of an xarray-gated one: no third-party
NetCDF library exists in this image, and the classic subset is ~200
lines of numpy.

Scope: the classic subset only — NetCDF-4/HDF5 files (magic
``\\x89HDF``) still route to the xarray gate in
:func:`sources.read_netcdf`.  Supported here: dims (incl. one record
dim), global/variable attributes, all six classic types, CDF-2 64-bit
offsets.  Not supported (raises): NC_STREAMING record counts.

The writer exists so tests can synthesize byte-valid fixtures without
any external library; it round-trips through the reader bit-exactly.
"""

from __future__ import annotations

import struct

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_DTYPES = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_NCTYPE = {
    np.dtype("i1"): NC_BYTE,
    np.dtype("i2"): NC_SHORT,
    np.dtype("i4"): NC_INT,
    np.dtype("f4"): NC_FLOAT,
    np.dtype("f8"): NC_DOUBLE,
}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def i8(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += _pad4(n)
        return s

    def values(self, nc_type: int, n: int):
        dt = _DTYPES[nc_type]
        nbytes = dt.itemsize * n
        raw = self.buf[self.pos : self.pos + nbytes]
        self.pos += _pad4(nbytes)
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        return np.frombuffer(raw, dtype=dt).copy()

    def att_list(self) -> dict:
        tag, count = self.i4(), self.i4()
        if tag == 0 and count == 0:
            return {}
        assert tag == NC_ATTRIBUTE, f"bad attribute tag {tag}"
        out = {}
        for _ in range(count):
            nm = self.name()
            t = self.i4()
            n = self.i4()
            v = self.values(t, n)
            if not isinstance(v, str) and len(v) == 1:
                v = v[0]
            out[nm] = v
        return out


def read_nc3(path: str):
    """Parse a classic NetCDF file.

    Returns ``(dims, gatts, variables)`` where ``dims`` is
    ``{name: size}`` (record dim resolved to numrecs), ``gatts`` the
    global attributes, and ``variables`` maps each name to a dict with
    ``dims`` (tuple of dim names), ``data`` (native-endian ndarray),
    and ``atts``.
    """
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError(f"{path}: not a classic NetCDF file (magic {buf[:4]!r})")
    version = buf[3]
    r = _Reader(buf)
    r.pos = 4
    numrecs = r.i4()
    if numrecs == -1:  # NC_STREAMING
        raise ValueError(f"{path}: streaming record count not supported")

    # dimensions
    tag, ndims = r.i4(), r.i4()
    dim_names: list[str] = []
    dim_sizes: list[int] = []
    rec_dim = -1
    if ndims:
        assert tag == NC_DIMENSION, f"bad dim tag {tag}"
    for d in range(ndims):
        nm = r.name()
        sz = r.i4()
        if sz == 0:
            rec_dim = d
            sz = numrecs
        dim_names.append(nm)
        dim_sizes.append(sz)

    gatts = r.att_list()

    # variables (header pass)
    tag, nvars = r.i4(), r.i4()
    if nvars:
        assert tag == NC_VARIABLE, f"bad var tag {tag}"
    headers = []
    rec_size = 0  # bytes per record across all record variables
    for _ in range(nvars):
        nm = r.name()
        nd = r.i4()
        dimids = [r.i4() for _ in range(nd)]
        atts = r.att_list()
        nc_type = r.i4()
        vsize = r.i4()
        begin = r.i8() if version == 2 else r.i4()
        is_rec = bool(dimids) and dimids[0] == rec_dim
        if is_rec:
            rec_size += vsize
        headers.append((nm, dimids, atts, nc_type, vsize, begin, is_rec))

    variables = {}
    for nm, dimids, atts, nc_type, vsize, begin, is_rec in headers:
        dt = _DTYPES[nc_type]
        shape = tuple(dim_sizes[d] for d in dimids)
        if is_rec:
            # one record's worth of this var, strided by the total
            # record size (vsize already includes per-record padding)
            per_rec = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
            arr = np.empty((numrecs, per_rec), dtype=dt)
            for rec in range(numrecs):
                off = begin + rec * rec_size
                arr[rec] = np.frombuffer(
                    buf, dtype=dt, count=per_rec, offset=off
                )
            data = arr.reshape((numrecs,) + shape[1:])
        else:
            count = int(np.prod(shape, dtype=np.int64)) if shape else 1
            data = np.frombuffer(buf, dtype=dt, count=count, offset=begin).reshape(shape)
        if nc_type == NC_CHAR:
            out = data
        else:
            out = data.astype(dt.newbyteorder("="))
        variables[nm] = {
            "dims": tuple(dim_names[d] for d in dimids),
            "data": out,
            "atts": atts,
        }

    dims = dict(zip(dim_names, dim_sizes))
    return dims, gatts, variables


class _Writer:
    def __init__(self):
        self.parts: list[bytes] = []

    def i4(self, v: int):
        self.parts.append(struct.pack(">i", v))

    def name(self, s: str):
        b = s.encode("utf-8")
        self.i4(len(b))
        self.parts.append(b + b"\x00" * (_pad4(len(b)) - len(b)))

    def values(self, arr: np.ndarray):
        raw = arr.tobytes()
        self.parts.append(raw + b"\x00" * (_pad4(len(raw)) - len(raw)))

    def att_list(self, atts: dict):
        if not atts:
            self.i4(0)
            self.i4(0)
            return
        self.i4(NC_ATTRIBUTE)
        self.i4(len(atts))
        for k, v in atts.items():
            self.name(k)
            if isinstance(v, str):
                b = v.encode("utf-8")
                self.i4(NC_CHAR)
                self.i4(len(b))
                self.parts.append(b + b"\x00" * (_pad4(len(b)) - len(b)))
            else:
                a = np.atleast_1d(np.asarray(v))
                t = _NCTYPE[a.dtype.newbyteorder("=")]
                self.i4(t)
                self.i4(len(a))
                self.values(a.astype(_DTYPES[t]))

    def bytes(self) -> bytes:
        return b"".join(self.parts)


def write_nc3(
    path: str,
    dims: dict[str, int | None],
    variables: dict[str, tuple[tuple[str, ...], np.ndarray, dict]],
    gatts: dict | None = None,
) -> None:
    """Write a classic (CDF-1) NetCDF file.

    ``dims`` maps name → size (``None`` marks THE record dimension);
    ``variables`` maps name → (dim names, array, attributes).  Record
    variables must list the record dim first; their arrays carry the
    actual record count as their leading axis.
    """
    dim_names = list(dims)
    dim_index = {n: i for i, n in enumerate(dim_names)}
    rec_name = next((n for n, s in dims.items() if s is None), None)
    numrecs = 0
    if rec_name is not None:
        for vd, arr, _ in variables.values():
            if vd and vd[0] == rec_name:
                numrecs = max(numrecs, arr.shape[0])

    # canonical var encoding: big-endian payloads
    enc = {}
    for nm, (vd, arr, atts) in variables.items():
        a = np.asarray(arr)
        t = _NCTYPE[a.dtype.newbyteorder("=")]
        enc[nm] = (vd, a.astype(_DTYPES[t]), atts, t)

    def vsize_of(nm) -> int:
        vd, a, _, t = enc[nm]
        per = a.size if not (vd and vd[0] == rec_name) else a[0].size if a.ndim else 1
        return _pad4(per * _DTYPES[t].itemsize)

    # header with placeholder offsets → fixed length, then fill
    def emit(offsets: dict[str, int]) -> bytes:
        w = _Writer()
        w.parts.append(b"CDF\x01")
        w.i4(numrecs)
        w.i4(NC_DIMENSION if dims else 0)
        w.i4(len(dims))
        for n in dim_names:
            w.name(n)
            w.i4(0 if dims[n] is None else int(dims[n]))
        w.att_list(gatts or {})
        w.i4(NC_VARIABLE if variables else 0)
        w.i4(len(variables))
        for nm, (vd, a, atts, t) in enc.items():
            w.name(nm)
            w.i4(len(vd))
            for d in vd:
                w.i4(dim_index[d])
            w.att_list(atts)
            w.i4(t)
            w.i4(vsize_of(nm))
            w.i4(offsets.get(nm, 0))
        return w.bytes()

    header_len = len(emit({}))
    fixed = [nm for nm, (vd, _, _, _) in enc.items() if not (vd and vd[0] == rec_name)]
    recs = [nm for nm in enc if nm not in fixed]
    offsets = {}
    pos = header_len
    for nm in fixed:
        offsets[nm] = pos
        pos += vsize_of(nm)
    rec_start = pos
    rec_size = sum(vsize_of(nm) for nm in recs)
    run = rec_start
    for nm in recs:
        offsets[nm] = run
        run += vsize_of(nm)

    body = bytearray(rec_start - header_len + rec_size * numrecs)
    for nm in fixed:
        raw = enc[nm][1].tobytes()
        off = offsets[nm] - header_len
        body[off : off + len(raw)] = raw
    for nm in recs:
        vd, a, _, t = enc[nm]
        flat = a.reshape(numrecs, -1)  # slice, not scalar: a[rec] on a
        # 1-D array yields a numpy SCALAR, which silently drops the
        # big-endian byte order on .tobytes()
        for rec in range(numrecs):
            raw = flat[rec].tobytes()
            off = offsets[nm] - header_len + rec * rec_size
            body[off : off + len(raw)] = raw

    with open(path, "wb") as f:
        f.write(emit(offsets))
        f.write(bytes(body))


_CF_UNITS = {"seconds": "s", "minutes": "m", "hours": "h", "days": "D"}


def decode_cf_time(values: np.ndarray, units: str) -> np.ndarray:
    """CF time decode: ``"<unit> since <epoch>"`` → datetime64[ns]."""
    parts = units.split(" since ")
    if len(parts) != 2 or parts[0].strip() not in _CF_UNITS:
        raise ValueError(f"unsupported CF time units: {units!r}")
    unit = _CF_UNITS[parts[0].strip()]
    epoch = np.datetime64(parts[1].strip().replace(" ", "T"), "ns")
    step = np.timedelta64(1, unit).astype("timedelta64[ns]")
    return epoch + (np.asarray(values).astype(np.int64) * step)
