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

    All parsing is JVM-side (``regexp_extract`` + casts) — no Python.
    Output: (doc_id, span_idx, kind, offset, lat, lon, hour, ts, val).
    """
    spans = explode_spans(docs).filter(F.col("kind").isin(*kinds))
    m = F.col("media_ref")
    return (
        spans.withColumn("lat", F.regexp_extract(m, GEO_REF_RE, 1).cast("double"))
        .withColumn("lon", F.regexp_extract(m, GEO_REF_RE, 2).cast("double"))
        .withColumn("hour", F.regexp_extract(m, GEO_REF_RE, 3).cast("long"))
        .withColumn("val", F.regexp_extract(m, GEO_REF_RE, 4).cast("double"))
        .withColumn(
            "ts",
            F.expr(
                "timestamp'2011-01-01 00:00:00' + make_interval(0,0,0,0, CAST(hour AS INT))"
            ),
        )
        .drop("text", "media_ref")
    )


def zone_cover_df(
    spark: SparkSession,
    zones: dict[str, list[np.ndarray]] | None = None,
    res: int = 9,
) -> DataFrame:
    """(zone_id, cell_r{res}, boundary) cover table, built on the driver.

    Zones are small; the output is meant to sit on the broadcast side
    of the membership join.  ``boundary=false`` rows prove membership
    by cell containment alone; ``boundary=true`` rows require the exact
    PIP test.
    """
    zones = zones or ZONES
    rows = []
    for zid, rings in zones.items():
        full, boundary = geometry.polygon_cover(rings, res)
        rows.extend((zid, int(c), False) for c in full)
        rows.extend((zid, int(c), True) for c in boundary)
    schema = T.StructType(
        [
            T.StructField("zone_id", T.StringType(), False),
            T.StructField(f"cell_r{res}", T.LongType(), False),
            T.StructField("boundary", T.BooleanType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


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


def join_zones(
    points: DataFrame,
    spark: SparkSession,
    zones: dict[str, list[np.ndarray]] | None = None,
    res: int = 9,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Attach ``zone_id`` to every point row (inner join semantics).

    A point matching k zones yields k rows (zones may overlap, matching
    the reference's independent per-zone shape masks).  Points in no
    zone are dropped — the analog of nodata outside the mask.
    """
    zones = zones or ZONES
    cell_col = f"cell_r{res}"
    cover = zone_cover_df(spark, zones, res)
    pts = points.withColumn(cell_col, cells.cell_expr(F.col(lat_col), F.col(lon_col), res))
    joined = pts.join(F.broadcast(cover), cell_col)
    pip = pip_udf(spark, zones)
    return joined.filter(
        (~F.col("boundary")) | pip(F.col("zone_id"), F.col(lat_col), F.col(lon_col))
    ).drop("boundary")


def extract_zone_cells(
    spark: SparkSession,
    zones: dict[str, list[np.ndarray]] | None = None,
    res: int = 9,
) -> DataFrame:
    """Per-zone cell table — the discrete ``extract_shapes`` semi-join.

    Returns (zone_id, cell_r{res}, interior) where interior cells are
    wholly inside the zone.  Boundary cells are resolved by testing the
    cell *center*, matching rasterio's all_touched=False default in the
    reference's clip (``mask.py:682``).
    """
    zones = zones or ZONES
    cover = zone_cover_df(spark, zones, res)
    cell_col = f"cell_r{res}"
    _, _, _, clat, clon = cells.decode_expr(F.col(cell_col))
    withc = cover.withColumn("_clat", clat).withColumn("_clon", clon)
    pip = pip_udf(spark, zones)
    return (
        withc.filter((~F.col("boundary")) | pip(F.col("zone_id"), F.col("_clat"), F.col("_clon")))
        .select("zone_id", cell_col, (~F.col("boundary")).alias("interior"))
    )
