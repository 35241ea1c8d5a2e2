"""Zone fixtures — vector polygons for masking / zonal aggregation.

Mirrors the reference's zone sets (Chinese provinces in
``docs/source/mask/mask_on_cutout.ipynb``; generic shape dicts in
``src/geodata/mask.py:503-705``) with deterministic synthetic polygons
over the same China window: two rectangles, one triangle (non-axis
edge exercises exact PIP), one concave L-shape (exercises even-odd ray
casting), and one multipolygon.

Each zone also carries an ANSI-SQL membership predicate over
``(lat, lon)`` columns — the DuckDB oracle's ground truth.  Predicates
and polygons agree exactly because grid-cell centers never lie within
1e-2 degrees of any zone edge (synth.py grid geometry: lat centers at
x.25/x.75, lon centers at .3125 + k·.625, zone edges on integers or the
slope-1 diagonal ``lat = lon - 87``).

Vertices are (lon, lat) == (x, y).
"""

from __future__ import annotations

import numpy as np

#: zone_id -> list of rings, each (N,2) array of (lon, lat)
ZONES: dict[str, list[np.ndarray]] = {
    "north_rect": [np.array([(73.0, 36.0), (105.0, 36.0), (105.0, 54.0), (73.0, 54.0)])],
    "south_rect": [np.array([(73.0, 18.0), (105.0, 18.0), (105.0, 36.0), (73.0, 36.0)])],
    "east_tri": [np.array([(105.0, 18.0), (136.0, 18.0), (136.0, 49.0)])],
    "coast_l": [
        np.array(
            [
                (105.0, 36.0),
                (136.0, 36.0),
                (136.0, 45.0),
                (120.0, 45.0),
                (120.0, 54.0),
                (105.0, 54.0),
            ]
        )
    ],
    "islands": [  # multipolygon: two disjoint squares
        np.array([(110.0, 20.0), (113.0, 20.0), (113.0, 23.0), (110.0, 23.0)]),
        np.array([(126.0, 26.0), (129.0, 26.0), (129.0, 29.0), (126.0, 29.0)]),
    ],
}

#: zone_id -> SQL membership predicate over columns lat, lon (cell centers)
ZONE_SQL: dict[str, str] = {
    "north_rect": "(lon < 105 AND lat > 36)",
    "south_rect": "(lon < 105 AND lat < 36)",
    # `<=`: a point exactly on the slope-1 diagonal is INSIDE under
    # even-odd ray casting (the right vertical edge provides the single
    # crossing); res-9 cell centers can land exactly on this edge.
    "east_tri": "(lon > 105 AND lat <= lon - 87.0)",
    "coast_l": "(lon > 105 AND ((lat > 36 AND lat < 45) OR (lat > 45 AND lon < 120)))",
    "islands": (
        "((lon > 110 AND lon < 113 AND lat > 20 AND lat < 23)"
        " OR (lon > 126 AND lon < 129 AND lat > 26 AND lat < 29))"
    ),
}

# NOTE: east_tri overlaps coast_l south of the diagonal — deliberate:
# zones may overlap (per-zone shape masks are independent in the
# reference, mask.py:607-705), so membership is a UNION, not a CASE.


def zone_membership_sql(src: str, zone_ids: list[str] | None = None) -> str:
    """UNION ALL block assigning each row of ``src`` to every matching zone.

    ``src`` must expose lat/lon columns; output adds ``zone_id``.
    """
    zids = zone_ids or list(ZONES)
    parts = [
        f"SELECT s.*, '{z}' AS zone_id FROM {src} s WHERE {ZONE_SQL[z]}" for z in zids
    ]
    return " UNION ALL ".join(parts)


def zones_wkb_rows() -> list[tuple[str, bytes, str]]:
    """(zone_id, wkb, src_crs) rows — WKB encoded without external deps.

    Minimal little-endian WKB writer (Polygon / MultiPolygon) so the
    zones table round-trips through a binary column like the
    reference's GeoDataFrame inputs (``mask.py:644-648``).
    """
    import struct

    def ring_bytes(ring: np.ndarray) -> bytes:
        pts = np.vstack([ring, ring[:1]])  # close
        out = struct.pack("<I", len(pts))
        for x, y in pts:
            out += struct.pack("<dd", float(x), float(y))
        return out

    def polygon_wkb(ring: np.ndarray) -> bytes:
        return struct.pack("<BI", 1, 3) + struct.pack("<I", 1) + ring_bytes(ring)

    rows = []
    for zid, rings in ZONES.items():
        if len(rings) == 1:
            wkb = polygon_wkb(rings[0])
        else:
            wkb = struct.pack("<BI", 1, 6) + struct.pack("<I", len(rings))
            for ring in rings:
                wkb += polygon_wkb(ring)
        rows.append((zid, wkb, "EPSG:4326"))
    return rows


def parse_wkb(wkb: bytes) -> list[np.ndarray]:
    """Decode the WKB produced by :func:`zones_wkb_rows` back to rings."""
    import struct

    def read_polygon(buf: bytes, off: int) -> tuple[np.ndarray, int]:
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        assert nrings >= 1
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        pts = np.frombuffer(buf, dtype="<f8", count=2 * npts, offset=off).reshape(-1, 2)
        off += 16 * npts
        return pts[:-1].copy(), off  # drop closing vertex

    byte_order, geom_type = struct.unpack_from("<BI", wkb, 0)
    assert byte_order == 1
    if geom_type == 3:
        ring, _ = read_polygon(wkb, 5)
        return [ring]
    if geom_type == 6:
        (npoly,) = struct.unpack_from("<I", wkb, 5)
        off = 9
        rings = []
        for _ in range(npoly):
            bo, gt = struct.unpack_from("<BI", wkb, off)
            assert bo == 1 and gt == 3
            ring, off = read_polygon(wkb, off + 5)
            rings.append(ring)
        return rings
    raise ValueError(f"unsupported WKB geometry type {geom_type}")
