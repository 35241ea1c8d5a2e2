"""Aperture-7 hexagonal cell index (H3-style), Arrow-vectorized.

The north_star asks for H3 (res 5-9) cell encoding next to S2.  The
engine ships the full published H3 *pipeline* from scratch in numpy —
lat/lon → icosahedron face via max-dot-product → gnomonic projection
→ hex IJK rounding → aperture-7 digit extraction with Class II/III
alternation (the algorithm documented at h3geo.org/docs/core-library;
reference analog: the grid discretization in cutout.py:340-344) — as
:func:`hex7_token_np` / :func:`hex7_token_udf`, plus canonical-H3
twins (:func:`h3_token_udf`) gated on the ``h3`` wheel.

Why two paths instead of one canonical encoder:

* Canonical H3 tokens require Uber's base-cell numbering — the
  ``baseCellData`` (122 rows) and ``faceIjkBaseCells`` (20x3x3x3)
  convention tables plus the Dymaxion icosahedron orientation.  Those
  are published *data*, not derivable math; this image has neither
  the ``h3`` wheel nor network access, so vendoring them blind would
  be unverifiable (and near-copying a table we cannot even test
  against).  The gate mirrors the rasterio/xarray treatment
  (sources.py): canonical tokens light up when the wheel is present,
  and tests pin the documented token fixtures behind the gate.
* The from-scratch ``hex7`` scheme is the same math on a canonical
  golden-ratio icosahedron with a derived face numbering.  It is a
  genuine hexagonal index — uniform 6-neighbor distance, ~7x children
  per parent, Class III lattice rotation asin(sqrt(3/28)) — which the
  engine's own aperture-4 square ``grid`` scheme is not.  Everything
  is pinned by construction-derived fixtures (face centers → all-zero
  digits, unit lattice offsets → known digit sequences) exactly like
  the hand-derived S2 spec pins in cells.py.

Caveats (documented, not hidden): cells straddling an icosahedron
edge are split between the two faces (no base-cell overage
machinery), and vertex cells are split five ways instead of forming
pentagons.  For bucketing/dedup/rollup workloads — the engine's use
of cell ids — a deterministic split cell is harmless; for contiguity-
critical uses, install the ``h3`` wheel and use the canonical UDFs.

Hierarchy contract (same as canonical H3): encode at the FINEST res
you need, then coarsen with :func:`hex7_parent_np` — that truncation
is exact and transitive by construction.  Encoding the same point
directly at two resolutions does NOT guarantee the coarse cell is the
truncated fine cell: the aperture-7 subdivision "flower" (center
child + 6 petals, assigned by the published lround arithmetic of
``_upAp7``) is not the Voronoi of parent centers, so direct-encode
vs truncate agree on only ~2/3 of the plane — measured 0.64 here,
and inherent to canonical H3's identical arithmetic, which is why
H3's own docs recommend fine-encode-then-``cellToParent`` for
consistent multi-resolution bucketing.

Token layout (64-bit, rendered as 16 hex chars):
  bits 63-61  zero
  bits 60-57  res (0-15)
  bits 56-52  face (0-19)
  bits 51-46  res-0 IJK, 2 bits each (normalized, components 0-2)
  bit  45     zero (pad)
  bits 44-0   digits for res 1..15, 3 bits each MSB-first (digit for
              res r at bits 45-3r .. 47-3r); digits past ``res`` hold
              7 — the same convention that gives canonical H3 tokens
              their trailing f's.

Scale shape: encoding is a stateless map over (lat, lon) — one
Arrow-batched pandas UDF, no shuffle, no state; at 100 TB it
pipelines inside the scan stage like the S2/grid encoders.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Canonical icosahedron (golden-ratio construction, public geometry)
# ---------------------------------------------------------------------------

_PHI = (1.0 + np.sqrt(5.0)) / 2.0


def _build_icosahedron() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vertices, face centers and per-face tangent frames.

    Deterministic: vertices from the (0, ±1, ±phi) cyclic family,
    faces discovered by edge length, both sorted lexicographically so
    the face numbering is reproducible from the construction alone.
    """
    raw = []
    for a in (-1.0, 1.0):
        for b in (-_PHI, _PHI):
            raw += [(0.0, a, b), (a, b, 0.0), (b, 0.0, a)]
    verts = np.array(sorted(raw))
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)

    # faces: vertex triples at minimal pairwise distance (edge length)
    d = np.linalg.norm(verts[:, None, :] - verts[None, :, :], axis=2)
    edge = np.min(d[d > 1e-9])
    adj = np.abs(d - edge) < 1e-9
    faces = []
    for a in range(12):
        for b in range(a + 1, 12):
            if not adj[a, b]:
                continue
            for c in range(b + 1, 12):
                if adj[a, c] and adj[b, c]:
                    faces.append((a, b, c))
    assert len(faces) == 20
    centers = verts[np.array(faces)].mean(axis=1)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    order = np.lexsort((centers[:, 2], centers[:, 1], centers[:, 0]))
    faces_arr = np.array(faces)[order]
    centers = centers[order]

    # tangent frame per face: i-axis toward the face's first vertex
    v0 = verts[faces_arr[:, 0]]
    e1 = v0 - centers * np.sum(v0 * centers, axis=1, keepdims=True)
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = np.cross(centers, e1)
    return verts, centers, e1, e2


_VERTS, _FACE_CENTER, _FACE_E1, _FACE_E2 = _build_icosahedron()

_SQRT7 = np.sqrt(7.0)
_AP7_ROT = np.arcsin(np.sqrt(3.0 / 28.0))  # Class III lattice rotation
_SIN60 = np.sqrt(3.0) / 2.0


def _res0_unit() -> float:
    """Gnomonic length of one res-0 lattice step: half the face-center→
    face-vertex gnomonic distance (the same relation that yields H3's
    published RES0_U_GNOMONIC ≈ 0.381966 on its icosahedron — here it
    is derived from the constructed geometry, not pasted)."""
    d = _VERTS @ _FACE_CENTER[0]
    cosang = np.max(d[d < 1.0 - 1e-12])  # nearest vertices of face 0
    return float(np.tan(np.arccos(np.clip(cosang, -1.0, 1.0)))) / 2.0


_RES0_U = _res0_unit()


# ---------------------------------------------------------------------------
# lat/lon → face + gnomonic hex2d → IJK
# ---------------------------------------------------------------------------

def _to_xyz(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    phi = np.radians(lat)
    lam = np.radians(lon)
    c = np.cos(phi)
    return np.stack([c * np.cos(lam), c * np.sin(lam), np.sin(phi)], axis=1)


def _geo_to_face_xy(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Nearest face + gnomonic tangent-plane coordinates (radians scale)."""
    p = _to_xyz(np.asarray(lat, np.float64), np.asarray(lon, np.float64))
    dots = p @ _FACE_CENTER.T                       # (N, 20)
    face = np.argmax(dots, axis=1)
    c = _FACE_CENTER[face]
    denom = np.sum(p * c, axis=1)
    # gnomonic projection onto the tangent plane at the face center
    t = p / denom[:, None]
    x = np.sum((t - c) * _FACE_E1[face], axis=1)
    y = np.sum((t - c) * _FACE_E2[face], axis=1)
    return face.astype(np.int64), x, y


def _lround(x: np.ndarray) -> np.ndarray:
    """C lround: round half away from zero (np.round is half-to-even)."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def _hex2d_to_ijk(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Nearest hex-lattice center in normalized IJK coords.

    Lattice convention (matches the published H3 _ijkToHex2d): axial
    (i, j) center sits at 2D (i - j/2, j*sin60).  Rounding is the
    classic cube-coordinate round (equivalent to H3's case analysis).
    """
    aj = y / _SIN60
    ai = x + aj / 2.0
    # cube coords (q, r, s), q + r + s = 0
    q, r = ai, aj
    s = -q - r
    rq, rr, rs = np.round(q), np.round(r), np.round(s)
    dq, dr, ds = np.abs(rq - q), np.abs(rr - r), np.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    rq = np.where(fix_q, -rr - rs, rq)
    rr = np.where(fix_r, -rq - rs, rr)
    i = rq.astype(np.int64)
    j = rr.astype(np.int64)
    k = np.zeros_like(i)
    return _ijk_normalize(i, j, k)


def _ijk_normalize(i: np.ndarray, j: np.ndarray, k: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Translate along (1,1,1) — the hex-coord null direction — so all
    components are non-negative and at least one is zero."""
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


# aperture-7 transforms (published H3 integer/rounded forms)

def _up_ap7(i, j, k):
    """Coarsen one res, Class III (counter-clockwise sublattice)."""
    ii = i - k
    jj = j - k
    ni = _lround((3 * ii - jj) / 7.0)
    nj = _lround((ii + 2 * jj) / 7.0)
    return _ijk_normalize(ni, nj, np.zeros_like(ni))


def _up_ap7r(i, j, k):
    """Coarsen one res, Class II (clockwise sublattice)."""
    ii = i - k
    jj = j - k
    ni = _lround((2 * ii + jj) / 7.0)
    nj = _lround((3 * jj - ii) / 7.0)
    return _ijk_normalize(ni, nj, np.zeros_like(ni))


def _down_ap7(i, j, k):
    """Exact inverse scale-down of _up_ap7 (integer matrix)."""
    ni = 3 * i + 1 * j + 0 * k
    nj = 0 * i + 3 * j + 1 * k
    nk = 1 * i + 0 * j + 3 * k
    return _ijk_normalize(ni, nj, nk)


def _down_ap7r(i, j, k):
    """Exact inverse scale-down of _up_ap7r (integer matrix)."""
    ni = 3 * i + 0 * j + 1 * k
    nj = 1 * i + 3 * j + 0 * k
    nk = 0 * i + 1 * j + 3 * k
    return _ijk_normalize(ni, nj, nk)


# digit encoding: unit IJK → 0..6 (H3's CENTER/K/J/JK/I/IK/IJ order)
_DIGIT = np.zeros((3, 3, 3), dtype=np.int64)
for _u, _dig in [((0, 0, 0), 0), ((0, 0, 1), 1), ((0, 1, 0), 2),
                 ((0, 1, 1), 3), ((1, 0, 0), 4), ((1, 0, 1), 5),
                 ((1, 1, 0), 6)]:
    _DIGIT[_u] = _dig


def _is_class_iii(res: int) -> bool:
    return res % 2 == 1


def hex7_id_np(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """Vectorized (lat, lon) degrees → 64-bit hex7 cell id at ``res``."""
    if not 0 <= res <= 15:
        raise ValueError(f"res must be 0..15, got {res}")
    face, x, y = _geo_to_face_xy(lat, lon)
    r = np.hypot(x, y)
    theta = np.arctan2(y, x)
    # Class III final lattice is rotated by asin(sqrt(3/28))
    if _is_class_iii(res):
        theta = theta - _AP7_ROT
    scale = (_SQRT7 ** res) / _RES0_U
    gx = r * scale * np.cos(theta)
    gy = r * scale * np.sin(theta)
    i, j, k = _hex2d_to_ijk(gx, gy)

    digits = np.full((len(i), 15), 7, dtype=np.int64)
    for rr in range(res, 0, -1):
        li, lj, lk = i, j, k
        if _is_class_iii(rr):
            i, j, k = _up_ap7(i, j, k)
            ci, cj, ck = _down_ap7(i, j, k)
        else:
            i, j, k = _up_ap7r(i, j, k)
            ci, cj, ck = _down_ap7r(i, j, k)
        di, dj, dk = _ijk_normalize(li - ci, lj - cj, lk - ck)
        # diff must be a unit ijk vector; clip guards float pathologies
        di, dj, dk = np.clip(di, 0, 2), np.clip(dj, 0, 2), np.clip(dk, 0, 2)
        digits[:, rr - 1] = _DIGIT[di, dj, dk]

    # res-0 ijk components are small on the owning face; clip to the
    # 2-bit field (faraway garbage can only arise from NaN input)
    i0, j0, k0 = np.clip(i, 0, 3), np.clip(j, 0, 3), np.clip(k, 0, 3)
    out = (
        (np.int64(res) << np.int64(57))
        | (face << np.int64(52))
        | (i0 << np.int64(50)) | (j0 << np.int64(48)) | (k0 << np.int64(46))
    )
    for rr in range(1, 16):
        out = out | (digits[:, rr - 1] << np.int64(45 - 3 * rr))
    return out


def hex7_token_np(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """hex7 ids rendered as 16-char hex tokens."""
    ids = hex7_id_np(lat, lon, res)
    out = np.empty(len(ids), dtype=object)
    for n, c in enumerate(ids):
        out[n] = format(int(c) & 0xFFFFFFFFFFFFFFFF, "016x")
    return out


def hex7_parent_np(cell: np.ndarray, res: int, parent_res: int) -> np.ndarray:
    """Parent id by digit truncation (set digits past parent_res to 7)."""
    cell = np.asarray(cell, dtype=np.int64)
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    out = cell & ~(np.int64(0xF) << np.int64(57))
    out = out | (np.int64(parent_res) << np.int64(57))
    for rr in range(parent_res + 1, 16):
        out = out | (np.int64(7) << np.int64(45 - 3 * rr))
    return out


def hex7_id_udf(res: int):
    """Arrow-vectorized pandas UDF: (lat, lon) → hex7 id (LONG —
    prefer over the string token for joins/rollups)."""

    @F.pandas_udf(T.LongType())
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            hex7_id_np(lat.to_numpy(np.float64), lon.to_numpy(np.float64), res),
            index=lat.index,
        )

    return _enc


def hex7_token_udf(res: int):
    """Arrow-vectorized pandas UDF: (lat, lon) → hex7 token (STRING)."""

    @F.pandas_udf(T.StringType())
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            hex7_token_np(lat.to_numpy(np.float64), lon.to_numpy(np.float64), res),
            index=lat.index,
        )

    return _enc


# ---------------------------------------------------------------------------
# canonical H3 (gated on the h3 wheel, like rasterio/xarray in sources.py)
# ---------------------------------------------------------------------------

def _h3_mod():
    try:
        import h3  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - exercised via gate test
        raise NotImplementedError(
            "canonical H3 tokens need the `h3` wheel (not in this image; "
            "no network to fetch Uber's base-cell convention tables). "
            "Install h3 to activate; hex7_token_udf is the from-scratch "
            "aperture-7 index with the same plumbing."
        ) from e
    return h3


def h3_token_udf(res: int):
    """Canonical H3 tokens via the ``h3`` wheel (vectorized per Arrow
    batch).  Raises NotImplementedError when the wheel is absent."""
    _h3_mod()  # fail fast at definition site, not inside executors

    @F.pandas_udf(T.StringType())
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        h3 = _h3_mod()
        fn = getattr(h3, "latlng_to_cell", None) or getattr(h3, "geo_to_h3")
        return pd.Series(
            [fn(la, lo, res) for la, lo in zip(lat, lon)], index=lat.index
        )

    return _enc


def with_hex_columns(df, lat_col: str = "lat", lon_col: str = "lon",
                     resolutions: tuple[int, ...] = (5, 6, 7, 8, 9)):
    """Attach ``hex7_r{res}`` id columns for each requested res."""
    for r in resolutions:
        df = df.withColumn(
            f"hex7_r{r}", hex7_id_udf(r)(F.col(lat_col), F.col(lon_col))
        )
    return df
