"""Spatial join operators: span parsing, zone cover join, PIP.

The engine's counterpart of the reference's rasterize/clip pipeline:

- ``add_shape_layer`` (polygon rasterization / PIP join,
  ``src/geodata/mask.py:503-605``)  →  :func:`join_zones`
- ``extract_shapes`` (per-zone clip / semi-join, ``mask.py:607-705``)
  →  :func:`extract_zone_cells`
- ``cutout.mask(dataset)`` grid-aligned overlay (``cutout.py:440-500``)
  →  broadcast equi-join on cell id

Plan shape (scale rationale): the polygon set is tiny (province-scale
zone lists), the point/span table is the 10^12-row side.  The polygons
are therefore compiled **on the driver** into a cover table
(zone_id, cell_r{res}, boundary) via the Sutherland-Hodgman planner
(geometry.polygon_cover) and **broadcast**; membership becomes a
broadcast hash equi-join on the cell id, fully JVM-side.  Only rows in
*boundary* cells (a thin O(perimeter) sliver) cross into Python for the
exact vectorized PIP test — the Arrow-batched analog of the
reference's per-boundary-pixel geometry_mask test (``mask.py:593-599``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geodata_spark import cells, geometry
from geodata_spark.zones import ZONES

GEO_REF_RE = r"^(?:geo|tile):([0-9.+-]+),([0-9.+-]+)@h([0-9]+)#[a-z0-9=&_]*val=([0-9.]+)$"


def explode_spans(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → one row per span, order preserved.

    ``posexplode`` keeps the array position so span-sequence equality
    (the per-row invariant vs the reference) remains checkable after
    any shuffle.
    """
    return docs.select(
        "doc_id",
        F.posexplode("spans").alias("span_idx", "span"),
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def parse_geo_spans(docs: DataFrame, kinds: tuple[str, ...] = ("geo",)) -> DataFrame:
    """Explode + parse geo-referenced media_refs into typed columns.

    All parsing is JVM-side — no Python.  Fields are cut with
    ``substring_index`` chains (plain byte scans) rather than a regex
    ``split``: split pays a regex engine pass plus an 8-element array
    allocation per evaluation, and the optimizer DUPLICATES parse
    expressions (the pushed ``isnotnull(join-key)`` filter and the
    projection each carry their own copy — plan-visible as split()
    appearing in both Filter and Project), so the per-evaluation cost
    is paid up to 6x per row.  Independent per-field byte scans make
    every copy cheap; measured 1.36x on the scan+parse stage and 1.2x
    on the whole flagship (r8).  Format (both `geo:` and `tile:`)::

        geo:{lat},{lon}@h{hour}#var={name}&val={val}
        lat  = between first ':' and first ','
        lon  = between first ',' and first '@'
        hour = between '@h' and first '#'
        val  = after the last '='

    Output: (doc_id, span_idx, kind, offset, lat, lon, hour, ts, val).
    Malformed refs are guarded by the ``kind`` filter (structurally
    valid by construction of the corpus); ``GEO_REF_RE`` remains the
    validation pattern for audit paths.
    """
    spans = explode_spans(docs).filter(F.col("kind").isin(*kinds))
    m = F.col("media_ref")
    # two select passes, not six withColumns: every withColumn copies +
    # re-analyzes the whole plan on the driver, which dominated cold
    # query latency
    parsed = spans.select(
        "doc_id",
        "span_idx",
        "kind",
        "offset",
        F.substring_index(F.substring_index(m, ",", 1), ":", -1)
        .cast("double").alias("lat"),
        F.substring_index(F.substring_index(m, "@", 1), ",", -1)
        .cast("double").alias("lon"),
        F.substring_index(F.substring_index(m, "#", 1), "@h", -1)
        .cast("long").alias("hour"),
        F.substring_index(m, "=", -1).cast("double").alias("val"),
    )
    return parsed.select(
        "doc_id", "span_idx", "kind", "offset", "lat", "lon", "hour", "val",
        F.expr(
            "timestamp'2011-01-01 00:00:00' + make_interval(0,0,0,0, CAST(hour AS INT))"
        ).alias("ts"),
    )


_COVER_CACHE: dict[tuple, list] = {}
_COVER_DF_CACHE: dict[tuple, "DataFrame"] = {}


def _zones_key(zones: dict[str, list[np.ndarray]]) -> str:
    """Content hash of a zone catalog (cache key for cover artifacts)."""
    import hashlib

    h = hashlib.sha256()
    for zid in sorted(zones):
        h.update(zid.encode())
        for ring in zones[zid]:
            h.update(np.ascontiguousarray(ring, dtype=np.float64).tobytes())
    return h.hexdigest()


def _cover_rows(zones: dict[str, list[np.ndarray]], res: int, grain: str = "grid") -> list:
    """Memoized cover planning: the cover of a zone set at a resolution
    is a deterministic plan artifact (like a prepared statement) —
    real deployments build it once per zone catalog and reuse it across
    every query, so repeated plan builds must not re-run the planner.
    ``grain="hex"`` plans the cover on the aperture-7 hexagonal index
    (hexgrid.hex7_polyfill — same full/boundary contract)."""
    key = (_zones_key(zones), res, grain)
    rows = _COVER_CACHE.get(key)
    if rows is None:
        if grain == "hex":
            from geodata_spark import hexgrid as HG

            cover_fn = lambda rings: HG.hex7_polyfill(rings, res)  # noqa: E731
        else:
            cover_fn = lambda rings: geometry.polygon_cover(rings, res)  # noqa: E731
        rows = []
        for zid, rings in zones.items():
            full, boundary = cover_fn(rings)
            rows.extend((zid, int(c), False) for c in full)
            rows.extend((zid, int(c), True) for c in boundary)
        _COVER_CACHE[key] = rows
    return rows


def zone_cover_df(
    spark: SparkSession,
    zones: dict[str, list[np.ndarray]] | None = None,
    res: int = 9,
    grain: str = "grid",
) -> DataFrame:
    """(zone_id, cell_r{res}, boundary) cover table, built on the driver.

    Zones are small; the output is meant to sit on the broadcast side
    of the membership join.  ``boundary=false`` rows prove membership
    by cell containment alone; ``boundary=true`` rows require the exact
    PIP test.  ``grain="hex"`` emits ``cell_hex{res}`` hexagonal cells
    (hexgrid.hex7_polyfill) with the identical contract.
    """
    zones = zones or ZONES
    rows = _cover_rows(zones, res, grain)
    cell_col = f"cell_hex{res}" if grain == "hex" else f"cell_r{res}"
    schema = T.StructType(
        [
            T.StructField("zone_id", T.StringType(), False),
            T.StructField(cell_col, T.LongType(), False),
            T.StructField("boundary", T.BooleanType(), False),
        ]
    )
    # Arrow path: a cover can be O(10^4) rows; per-tuple Python
    # serialization in createDataFrame dominated plan-build latency.
    # The RESULTING DataFrame (a LocalRelation over the static zone
    # catalog — a plan artifact, not query data) is also memoized per
    # session: the pandas→Arrow→JVM conversion of a 366k-row hex cover
    # costs ~0.5 s per query BUILD, paid on every plan construction
    # without this (the cover rows above were already memoized; the
    # conversion was not).
    ckey = (_zones_key(zones), res, grain)
    hit = _COVER_DF_CACHE.get(ckey)
    if hit is not None and hit.sparkSession is spark:
        return hit
    pdf = pd.DataFrame(rows, columns=["zone_id", cell_col, "boundary"])
    df = spark.createDataFrame(pdf, schema)
    _COVER_DF_CACHE[ckey] = df
    return df


def pip_udf(spark: SparkSession, zones: dict[str, list[np.ndarray]] | None = None):
    """Arrow-vectorized PIP: (zone_id, lat, lon) → bool.

    The polygon set is broadcast once (pickled rings), not re-captured
    per task via closure.  Batches are grouped by zone inside the UDF
    so each polygon's ray cast runs over a contiguous numpy slab.
    """
    from geodata_spark.deploy import ensure_py_files

    ensure_py_files(spark)
    zones = zones or ZONES
    bc = spark.sparkContext.broadcast({z: [r.copy() for r in rs] for z, rs in zones.items()})

    @F.pandas_udf(T.BooleanType())
    def _pip(zone_id: pd.Series, lat: pd.Series, lon: pd.Series) -> pd.Series:
        out = np.zeros(len(zone_id), dtype=bool)
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        zs = zone_id.to_numpy()
        for z in pd.unique(zs):
            m = zs == z
            out[m] = geometry.points_in_rings(lo[m], la[m], bc.value[z])
        return pd.Series(out, index=zone_id.index)

    return _pip


def pip_ring_sql(lat: str, lon: str, ring: np.ndarray) -> str:
    """Even-odd ray cast for ONE fixed ring, as SQL text.

    For each non-horizontal edge, an indicator of a rightward-ray
    crossing; inside = (Σ indicators) mod 2 == 1.  Arithmetic is the
    exact same IEEE op sequence as :func:`geometry.points_in_polygon`,
    so the two paths agree on every input including on-edge points.
    Polygons are static plan constants → the whole test stays inside
    whole-stage codegen (no Python, no broadcast-pickle).

    SQL text, not Column algebra: building this expression op-by-op
    costs ~2 py4j round trips per operator (~0.65 s of driver latency
    per plan build for the zone fixtures); one ``F.expr`` parse is a
    single round trip.
    """
    ring = np.asarray(ring, dtype=np.float64)
    terms: list[str] = []
    n = len(ring)
    for k in range(n):
        x1, y1 = float(ring[k][0]), float(ring[k][1])
        x2, y2 = float(ring[(k + 1) % n][0]), float(ring[(k + 1) % n][1])
        if y1 == y2:
            continue  # horizontal edge never toggles
        cond = (
            f"(({y1!r} > {lat}) <> ({y2!r} > {lat})) AND "
            f"({lon} < ({(x2 - x1)!r} * ({lat} - {y1!r}) / {(y2 - y1)!r} + {x1!r}))"
        )
        terms.append(f"(CASE WHEN {cond} THEN 1 ELSE 0 END)")
    if not terms:
        return "false"
    return f"((({' + '.join(terms)}) % 2) = 1)"


def pip_zone_sql(
    lat: str, lon: str, zone_col: str, zones: dict[str, list[np.ndarray]]
) -> str:
    """Dispatch :func:`pip_ring_sql` on a zone_id column (CASE chain).

    Even-odd composition over rings (XOR = ``<>``) for multipolygons.
    """
    branches = []
    for zid, rings in zones.items():
        inside = None
        for ring in rings:
            r = pip_ring_sql(lat, lon, ring)
            inside = r if inside is None else f"({inside} <> {r})"
        # SQL-escape the zone id literal: a quote in a caller-supplied
        # id must not break (or reshape) the generated expression
        zid_sql = str(zid).replace("'", "''")
        branches.append(f"WHEN {zone_col} = '{zid_sql}' THEN {inside}")
    assert branches
    return f"(CASE {' '.join(branches)} ELSE false END)"


def pip_zone_expr(
    lat: str, lon: str, zone_col: str, zones: dict[str, list[np.ndarray]]
) -> Column:
    """Catalyst Column form of :func:`pip_zone_sql` (args are SQL
    snippets, usually column names)."""
    return F.expr(pip_zone_sql(lat, lon, zone_col, zones))


def _total_vertices(zones: dict[str, list[np.ndarray]]) -> int:
    return sum(len(r) for rs in zones.values() for r in rs)


def join_zones(
    points: DataFrame,
    spark: SparkSession,
    zones: dict[str, list[np.ndarray]] | None = None,
    res: int = 9,
    lat_col: str = "lat",
    lon_col: str = "lon",
    strategy: str = "auto",
    grain: str = "grid",
    hex_encode: str = "row",
) -> DataFrame:
    """Attach ``zone_id`` to every point row (inner join semantics).

    A point matching k zones yields k rows (zones may overlap, matching
    the reference's independent per-zone shape masks).  Points in no
    zone are dropped — the analog of nodata outside the mask.

    strategy:
      ``expr`` — compile the boundary-cell PIP into Catalyst (default
        when total polygon vertices ≤ 2048): ONE scan, zero Python,
        whole-stage codegen end to end.  The CASE short-circuits, so
        interior rows never evaluate a single edge test.
      ``udf``  — Arrow-vectorized PIP for big polygon sets; the plan
        splits interior (pure JVM) from the O(perimeter) boundary
        sliver, which alone crosses into Python.  Costs a second scan
        of the input (two union branches) — prefer ``expr`` whenever
        the polygon budget allows.

    ``grain="hex"`` keys the membership join on the aperture-7
    hexagonal index instead of the square grid: identical output rows
    (the cover's full/boundary contract is grain-independent — full
    cells prove membership, boundary cells fall through to the same
    exact PIP), different physical key.  The point-side encode is one
    Arrow UDF in the scan stage; the cover still broadcasts.
    """
    zones = zones or ZONES
    if strategy == "auto":
        strategy = "expr" if _total_vertices(zones) <= 2048 else "udf"
    cover = zone_cover_df(spark, zones, res, grain=grain)
    if grain == "hex":
        from geodata_spark import hexgrid as HG

        cell_col = f"cell_hex{res}"
        # Both modes now encode in ONE pass over the input with the
        # per-batch coordinate dedup inside hex7_id_udf (raster-sourced
        # corpora repeat a small lattice, so the trig + digit walk runs
        # once per unique coordinate per batch).  The round-7 "dim"
        # mode (distinct → encode → broadcast join back) moved fewer
        # rows through Python but RE-EXECUTED the entire upstream plan
        # for its distinct branch — a second full synth+parse pass
        # when the input is an inline generator rather than a cheap
        # parquet rescan (measured +8s of the hex flagship's 19s at 2M
        # docs, r8).  One pass + batch dedup keeps the Python work per
        # unique coordinate without ever paying a second scan; the
        # parameter is kept for API compatibility and both values are
        # row-for-row identical (pinned by the zonal_wavg_hex oracle).
        pts = points.withColumn(
            cell_col, HG.hex7_id_udf(res)(F.col(lat_col), F.col(lon_col))
        )
    else:
        cell_col = f"cell_r{res}"
        pts = points.withColumn(cell_col, cells.cell_expr(F.col(lat_col), F.col(lon_col), res))
    joined = pts.join(F.broadcast(cover), cell_col)

    if strategy == "expr":
        keep = F.expr(
            f"CASE WHEN NOT boundary THEN true "
            f"ELSE {pip_zone_sql(lat_col, lon_col, 'zone_id', zones)} END"
        )
        return joined.filter(keep).drop("boundary")

    pip = pip_udf(spark, zones)
    # Split interior/boundary BEFORE the UDF: a disjunction like
    # (~boundary) | pip(...) would evaluate the Python UDF for every
    # row (ExtractPythonUDFs hoists the UDF above the whole filter);
    # the union keeps the hot interior path 100% JVM-side and sends
    # only the boundary sliver to Python.
    interior = joined.filter(~F.col("boundary"))
    boundary = joined.filter(F.col("boundary")).filter(
        pip(F.col("zone_id"), F.col(lat_col), F.col(lon_col))
    )
    return interior.unionByName(boundary).drop("boundary")


def extract_zone_cells(
    spark: SparkSession,
    zones: dict[str, list[np.ndarray]] | None = None,
    res: int = 9,
    strategy: str = "auto",
) -> DataFrame:
    """Per-zone cell table — the discrete ``extract_shapes`` semi-join.

    Returns (zone_id, cell_r{res}, interior) where interior cells are
    wholly inside the zone.  Boundary cells are resolved by testing the
    cell *center*, matching rasterio's all_touched=False default in the
    reference's clip (``mask.py:682``).

    Uses the same strategy switch as :func:`join_zones`: zone sets up
    to 2048 total vertices compile the center PIP into Catalyst (zero
    Python anywhere in the plan); bigger sets fall back to the
    Arrow-vectorized UDF.  The cover table is small, so this is about
    plan consistency, not wall time.
    """
    zones = zones or ZONES
    if strategy == "auto":
        strategy = "expr" if _total_vertices(zones) <= 2048 else "udf"
    cover = zone_cover_df(spark, zones, res)
    cell_col = f"cell_r{res}"
    _, _, _, clat, clon = cells.decode_expr(F.col(cell_col))
    withc = cover.withColumn("_clat", clat).withColumn("_clon", clon)
    if strategy == "expr":
        keep = F.expr(
            f"CASE WHEN NOT boundary THEN true "
            f"ELSE {pip_zone_sql('_clat', '_clon', 'zone_id', zones)} END"
        )
    else:
        pip = pip_udf(spark, zones)
        keep = (~F.col("boundary")) | pip(
            F.col("zone_id"), F.col("_clat"), F.col("_clon")
        )
    return (
        withc.filter(keep)
        .select("zone_id", cell_col, (~F.col("boundary")).alias("interior"))
    )
