"""Pure-numpy computational geometry kernel.

The reference delegates geometry to rasterio/shapely
(``rasterio.features.geometry_mask`` — ``src/geodata/mask.py:593-599``;
``rasterio.mask.mask`` per-zone clip — ``mask.py:679-684``).  Neither
library is a dependency here: the engine needs only three primitives,
all implemented vectorized in numpy so they run inside Arrow-batched
pandas UDFs:

- even-odd **point-in-polygon** (PIP) for boundary-cell membership;
- **Sutherland-Hodgman** clipping of a polygon to an axis-aligned cell
  rectangle (exact counterpart of geometry_mask's boundary handling);
- a driver-side **cover planner** that classifies every grid cell in a
  polygon's bbox as full / boundary / outside — the discrete analog of
  rasterizing a shape layer (``mask.py:503-605``), and the pruning
  step that turns the spatial join into an equi-join on cell id.

Polygons are (N,2) float arrays of (lon, lat) = (x, y) vertices,
implicitly closed.  Multi-polygons are lists of rings (holes are not
needed by the reference's test surface; the cover planner composes
even-odd over rings if given).
"""

from __future__ import annotations

import numpy as np

from geodata_spark import cells


# ---------------------------------------------------------------------------
# point in polygon — vectorized even-odd ray cast
# ---------------------------------------------------------------------------

def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Even-odd PIP for arrays of points against one polygon.

    ``poly`` is (N,2) of (x, y).  Points exactly on an edge are
    implementation-defined (the engine guarantees query points are
    grid-cell centers, which by construction never lie on zone
    boundaries — see synth.py grid geometry).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    poly = np.asarray(poly, dtype=np.float64)
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    inside = np.zeros(px.shape, dtype=bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        for k in range(len(poly)):
            cond = (y1[k] > py) != (y2[k] > py)
            if not cond.any():
                continue
            xs = (x2[k] - x1[k]) * (py - y1[k]) / (y2[k] - y1[k]) + x1[k]
            inside ^= cond & (px < xs)
    return inside


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd composition over multiple rings (multipolygon / holes)."""
    inside = np.zeros(np.asarray(px).shape, dtype=bool)
    for ring in rings:
        inside ^= points_in_polygon(px, py, ring)
    return inside


# ---------------------------------------------------------------------------
# Sutherland-Hodgman clip to an axis-aligned rectangle
# ---------------------------------------------------------------------------

def clip_to_rect(poly: np.ndarray, xmin: float, xmax: float, ymin: float, ymax: float) -> np.ndarray:
    """Clip polygon to [xmin,xmax]×[ymin,ymax]; returns (M,2) (maybe empty).

    Classic Sutherland-Hodgman against the four half-planes of the
    rect.  Correct for convex and (area-wise) concave subjects; exactly
    the computation geometry_mask performs implicitly per boundary
    pixel in the reference (``mask.py:593-599``).
    """
    out = np.asarray(poly, dtype=np.float64)

    def _clip(pts: np.ndarray, axis: int, bound: float, keep_ge: bool) -> np.ndarray:
        if len(pts) == 0:
            return pts
        res: list[tuple[float, float]] = []
        n = len(pts)
        for a in range(n):
            cur, nxt = pts[a], pts[(a + 1) % n]
            cin = cur[axis] >= bound if keep_ge else cur[axis] <= bound
            nin = nxt[axis] >= bound if keep_ge else nxt[axis] <= bound
            if cin:
                res.append(tuple(cur))
            if cin != nin:
                t = (bound - cur[axis]) / (nxt[axis] - cur[axis])
                res.append(tuple(cur + t * (nxt - cur)))
        return np.array(res, dtype=np.float64) if res else np.empty((0, 2))

    out = _clip(out, 0, xmin, True)
    out = _clip(out, 0, xmax, False)
    out = _clip(out, 1, ymin, True)
    out = _clip(out, 1, ymax, False)
    return out


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace area (planar, degrees²) — sign-insensitive."""
    if len(poly) < 3:
        return 0.0
    x, y = poly[:, 0], poly[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) / 2.0


# ---------------------------------------------------------------------------
# cover planner — polygon → {full, boundary} cell sets at a resolution
# ---------------------------------------------------------------------------

def _segment_hits_rects(
    x0: float, y0: float, x1: float, y1: float,
    lo0: np.ndarray, lo1: np.ndarray, la0: np.ndarray, la1: np.ndarray,
) -> np.ndarray:
    """Vectorized Liang-Barsky: segment vs each [lo0,lo1]×[la0,la1] rect."""
    t0 = np.zeros(len(lo0))
    t1 = np.ones(len(lo0))
    ok = np.ones(len(lo0), dtype=bool)
    for d, p, lo, hi in ((x1 - x0, x0, lo0, lo1), (y1 - y0, y0, la0, la1)):
        if d == 0.0:
            ok &= (p >= lo) & (p <= hi)
        else:
            ta = (lo - p) / d
            tb = (hi - p) / d
            t0 = np.maximum(t0, np.minimum(ta, tb))
            t1 = np.minimum(t1, np.maximum(ta, tb))
    return ok & (t0 <= t1)


def polygon_cover(rings: list[np.ndarray], res: int, eps: float = 1e-9
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Classify grid cells of the rings' bbox: (full_ids, boundary_ids).

    full      — clip area equals cell area (cell entirely inside)
    boundary  — 0 < clip area < cell area (needs exact PIP per point)

    Runs on the driver; zones are small (the reference's zone sets are
    province lists — ``mask.py:644-648``), so the output is broadcast.
    For multi-ring input the areas compose by even-odd (XOR) — adequate
    for disjoint multipolygons; overlapping rings are treated as union
    boundaries conservatively (classified boundary, exact PIP decides).

    Plan-time cost: a cell needs the per-cell Sutherland-Hodgman clip
    only if some ring edge intersects its (eps-inflated) rectangle — a
    vectorized Liang-Barsky test finds those; every other cell is
    provably uniform, so one vectorized center PIP classifies it
    full/outside.  O(cells·edges) numpy instead of O(cells) Python
    clips: ~50× on a res-9 province cover.
    """
    allv = np.vstack(rings)
    lat_min, lat_max = allv[:, 1].min(), allv[:, 1].max()
    lon_min, lon_max = allv[:, 0].min(), allv[:, 0].max()
    ids = cells.cells_in_bbox(lat_min, lat_max, lon_min, lon_max, res)
    if len(ids) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    la0, la1, lo0, lo1 = cells.cell_bounds_np(ids)
    cell_area = (la1[0] - la0[0]) * (lo1[0] - lo0[0])

    # edge-adjacency prefilter (inflated rects: borderline grazes fall
    # through to the exact clip below rather than being missed)
    near = np.zeros(len(ids), dtype=bool)
    for ring in rings:
        closed = np.vstack([np.asarray(ring, dtype=np.float64), ring[:1]])
        for k in range(len(closed) - 1):
            (x0, y0), (x1, y1) = closed[k], closed[k + 1]
            near |= _segment_hits_rects(
                x0, y0, x1, y1, lo0 - eps, lo1 + eps, la0 - eps, la1 + eps
            )

    # uniform cells: no edge touches them → center PIP decides in bulk
    far = ~near
    cxf, cyf = (lo0[far] + lo1[far]) / 2.0, (la0[far] + la1[far]) / 2.0
    full = list(ids[far][points_in_rings(cxf, cyf, rings)])

    boundary = []
    for cid, a0, a1, o0, o1 in zip(
        ids[near], la0[near], la1[near], lo0[near], lo1[near]
    ):
        covered = 0.0
        for ring in rings:
            covered += polygon_area(clip_to_rect(ring, o0, o1, a0, a1))
        if covered <= eps:
            continue
        if len(rings) == 1 and covered >= cell_area - eps:
            full.append(cid)
        elif len(rings) > 1:
            # conservative for multi-ring: prove fullness via corner+center PIP
            cx = np.array([o0 + eps, o1 - eps, o0 + eps, o1 - eps, (o0 + o1) / 2])
            cy = np.array([a0 + eps, a0 + eps, a1 - eps, a1 - eps, (a0 + a1) / 2])
            if covered >= cell_area - eps and points_in_rings(cx, cy, rings).all():
                full.append(cid)
            else:
                boundary.append(cid)
        else:
            boundary.append(cid)
    return (
        np.sort(np.array(full, dtype=np.int64)),
        np.sort(np.array(boundary, dtype=np.int64)),
    )
