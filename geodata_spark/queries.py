"""Oracle-paired query registry (the driver contract surface).

Every entry couples a Spark DataFrame program with an ANSI-SQL twin
that DuckDB executes over the same inputs.  The synthetic corpus is
derived from pure integer arithmetic (synth.py) so both sides agree
bit-for-bit — including float aggregates, which are dyadic-exact and
therefore order-independent.

Registry grows with operator coverage; keys are stable names recorded
in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geodata_spark import cells, spatial, zonal
from geodata_spark.synth import (
    N_DOCS_MULTIPLIER,
    documents_sql_cte,
    synth_documents,
)
from geodata_spark.zones import ZONES, zone_membership_sql

_CORPUS_CTE = documents_sql_cte(N_DOCS_MULTIPLIER)


def corpus_size(spark: SparkSession, sf_dir: str) -> int:
    """Corpus size scales with the driver's documents table row count."""
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count() * N_DOCS_MULTIPLIER
    )


def corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_documents(spark, corpus_size(spark, sf_dir))


# ---------------------------------------------------------------------------
# flagship: zonal daily weighted mean (A1 over J6 over the corpus)
# ---------------------------------------------------------------------------

def q_zonal_daily_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → explode/parse geo spans → zone join → salted zonal mean."""
    docs = corpus(spark, sf_dir)
    pts = spatial.parse_geo_spans(docs)
    zoned = spatial.join_zones(pts, spark, ZONES, res=9)
    weighted = zoned.withColumn("w", zonal.oracle_area_weight_expr(F.col("lat"))).withColumn(
        "day_idx", (F.col("hour") / F.lit(24)).cast("int")
    )
    out = zonal.zonal_weighted_mean(
        weighted, "val", "w", ["zone_id", "day_idx"], salt_buckets=8, out_col="wavg"
    )
    return out.select(
        "zone_id",
        "day_idx",
        "wavg",
        "weight_sum",
        F.col("n_points").cast("long").alias("n_points"),
    )


_ZONAL_SQL = f"""
WITH {_CORPUS_CTE},
geo AS (SELECT lat, lon, hour, val FROM spansx WHERE kind = 'geo'),
zoned AS ({zone_membership_sql('geo')})
SELECT zone_id,
       CAST(hour // 24 AS INT) AS day_idx,
       sum(val * {zonal.ORACLE_AREA_WEIGHT_SQL}) / sum({zonal.ORACLE_AREA_WEIGHT_SQL}) AS wavg,
       sum({zonal.ORACLE_AREA_WEIGHT_SQL}) AS weight_sum,
       count(*) AS n_points
FROM zoned
GROUP BY zone_id, day_idx
"""


# ---------------------------------------------------------------------------
# span-sequence integrity (the per-row invariant vs the reference)
# ---------------------------------------------------------------------------

def q_span_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered span signature per document, surviving explode+shuffle.

    Signature = kinds joined in offset order + offset checksum; proves
    (kind, text, media_ref, order) survive the engine's explode path.
    """
    docs = corpus(spark, sf_dir)
    spans = spatial.explode_spans(docs).repartition(16, "doc_id")  # force a shuffle
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("offset"), F.col("kind")))
                    ),
                    lambda s: s["kind"],
                ),
                "|",
            ).alias("kind_seq"),
            F.sum(F.col("offset").cast("long") * (F.col("span_idx").cast("long") + 1)).alias(
                "offset_sig"
            ),
            F.sum(F.length("media_ref").cast("long")).alias("ref_len_sum"),
            F.sum(F.length("text").cast("long")).alias("text_len_sum"),
        )
    )


_SPAN_SEQ_SQL = f"""
WITH {_CORPUS_CTE}
SELECT doc_id,
       count(*) AS n_spans,
       string_agg(kind, '|' ORDER BY "offset") AS kind_seq,
       CAST(sum(CAST("offset" AS BIGINT) * (j + 1)) AS BIGINT) AS offset_sig,
       CAST(sum(length(media_ref)) AS BIGINT) AS ref_len_sum,
       CAST(sum(length(text)) AS BIGINT) AS text_len_sum
FROM spansx
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# cell-id encode histogram (res 5..9 hierarchy arithmetic)
# ---------------------------------------------------------------------------

def q_cell_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo spans per res-5/7/9 cell — validates encode + parent algebra."""
    docs = corpus(spark, sf_dir)
    pts = spatial.parse_geo_spans(docs, kinds=("geo", "raster_tile"))
    enc = (
        pts.withColumn("cell_r9", cells.cell_expr(F.col("lat"), F.col("lon"), 9))
        .withColumn("cell_r7", cells.parent_expr(F.col("cell_r9"), 2))
        .withColumn("cell_r5", cells.parent_expr(F.col("cell_r9"), 4))
    )
    return enc.groupBy("cell_r5", "cell_r7", "cell_r9").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("val").alias("val_sum"),
    )


_CELL_HIST_SQL = f"""
WITH {_CORPUS_CTE}
SELECT {cells.cell_sql('lat', 'lon', 5)} AS cell_r5,
       {cells.cell_sql('lat', 'lon', 7)} AS cell_r7,
       {cells.cell_sql('lat', 'lon', 9)} AS cell_r9,
       count(*) AS n,
       sum(val) AS val_sum
FROM spansx
WHERE kind IN ('geo', 'raster_tile')
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# zone cell cover (extract_shapes semi-join vs SQL center predicates)
# ---------------------------------------------------------------------------

def q_zone_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every res-9 cell belonging to each zone — validates the whole
    cover planner + Sutherland-Hodgman + PIP stack against pure SQL
    inequalities on cell centers."""
    out = spatial.extract_zone_cells(spark, ZONES, res=9)
    base = F.lit(9 * (2**54))
    return out.groupBy("zone_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(F.col("cell_r9") - base).alias("cell_off_sum"),
        F.min("cell_r9").alias("cell_min"),
        F.max("cell_r9").alias("cell_max"),
    )


_Y_SHIFT = 2**27
_RES_SHIFT = 2**54
_ZONE_COVER_SQL = f"""
WITH centers AS (
  SELECT CAST(y.range AS BIGINT) AS yi, CAST(x.range AS BIGINT) AS xi,
         -90 + 0.25 * y.range + 0.125 AS lat,
         -180 + 0.25 * x.range + 0.125 AS lon
  FROM range(432, 576) y, range(1012, 1264) x
),
cells9 AS (
  SELECT 9 * {_RES_SHIFT} + yi * {_Y_SHIFT} + xi AS cell_r9, lat, lon FROM centers
),
zoned AS ({zone_membership_sql('cells9')})
SELECT zone_id,
       count(*) AS n_cells,
       CAST(sum(cell_r9 - 9 * {_RES_SHIFT}) AS BIGINT) AS cell_off_sum,
       min(cell_r9) AS cell_min,
       max(cell_r9) AS cell_max
FROM zoned
GROUP BY zone_id
"""


# ---------------------------------------------------------------------------
# mask algebra (M3): filter_raster → merge(and) + merge(sum) → threshold
# ---------------------------------------------------------------------------

MODIS_AVAIL = list(range(1, 11))  # suitability classes, notebook-style
# dyadic weights (k/32, summing to 1): merge sums stay order-independent
# and bit-exact vs the oracle; mirrors the notebook's .15/.1/.3/.45 mix
MERGE_WEIGHTS = {
    "elevation": 5 / 32,
    "slope": 3 / 32,
    "modis": 10 / 32,
    "protected": 14 / 32,
}
SUITABLE_THRESHOLD = 25 / 32


def _filtered_mask_layers(spark: SparkSession):
    from geodata_spark import masks
    from geodata_spark.synth import synth_mask_layers

    raw = synth_mask_layers(spark)
    elev = masks.filter_raster(raw.filter(F.col("layer") == "elevation"), max_bound=3000, binarize=True)
    slope = masks.filter_raster(raw.filter(F.col("layer") == "slope"), max_bound=20, binarize=True)
    modis = masks.filter_raster(raw.filter(F.col("layer") == "modis"), values=MODIS_AVAIL, binarize=True)
    prot = masks.filter_raster(raw.filter(F.col("layer") == "protected"), values=[0.0], binarize=True)
    return elev.unionByName(slope).unionByName(modis).unionByName(prot)


def q_mask_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter_raster per layer → AND merge + weighted-sum merge + ≥0.8
    binarize, per cell (mask_creation_workflow.ipynb pipeline)."""
    from geodata_spark import masks

    stacked = _filtered_mask_layers(spark)
    m_and = masks.merge_layers_and(stacked, n_layers=4).withColumnRenamed("value", "and_value")
    m_sum = masks.merge_layers_sum(stacked, MERGE_WEIGHTS).withColumnRenamed("value", "sum_value")
    out = m_and.join(m_sum, "cell")
    return out.select(
        "cell",
        "and_value",
        "sum_value",
        F.when(F.col("sum_value") >= SUITABLE_THRESHOLD, 1.0).otherwise(0.0).alias("suitable"),
    )


def _mask_filter_sql() -> str:
    from geodata_spark import masks as _m

    elev = _m.filter_raster_sql(max_bound=3000, binarize=True)
    slope = _m.filter_raster_sql(max_bound=20, binarize=True)
    modis = _m.filter_raster_sql(values=MODIS_AVAIL, binarize=True)
    prot = _m.filter_raster_sql(values=[0.0], binarize=True)
    return f"""
filtered AS (
  SELECT layer, cell, lat, lon,
         CASE layer
           WHEN 'elevation' THEN {elev}
           WHEN 'slope' THEN {slope}
           WHEN 'modis' THEN {modis}
           WHEN 'protected' THEN {prot}
         END AS value
  FROM maskl
)"""


from geodata_spark.synth import mask_layers_sql_cte  # noqa: E402

_W_SQL = " + ".join(
    f"sum(CASE WHEN layer = '{n}' THEN value ELSE 0 END) * {w!r}"
    for n, w in MERGE_WEIGHTS.items()
)
_MASK_MERGE_SQL = f"""
WITH {mask_layers_sql_cte()},
{_mask_filter_sql()},
agg AS (
  SELECT cell,
         CASE WHEN sum(CASE WHEN value <> 0 THEN 1 ELSE 0 END) = 4
                   AND count(*) = 4 THEN 1.0 ELSE 0.0 END AS and_value,
         {_W_SQL} AS sum_value
  FROM filtered
  GROUP BY cell
)
SELECT cell, and_value, sum_value,
       CASE WHEN sum_value >= {SUITABLE_THRESHOLD!r} THEN 1.0 ELSE 0.0 END AS suitable
FROM agg
"""


def q_mask_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """crop-to-zero then trim_raster: nonzero bounding box semantics."""
    from geodata_spark import masks
    from geodata_spark.synth import synth_mask_layers

    elev = synth_mask_layers(spark).filter(F.col("layer") == "elevation")
    # zero out everything outside an interior window, then trim
    windowed = elev.withColumn(
        "value",
        F.when(
            F.col("lat").between(25.0, 40.0) & F.col("lon").between(90.0, 120.0),
            F.col("value"),
        ).otherwise(F.lit(0.0)),
    )
    trimmed = masks.trim_raster(windowed)
    return trimmed.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.min("lat").alias("lat_min"),
        F.max("lat").alias("lat_max"),
        F.min("lon").alias("lon_min"),
        F.max("lon").alias("lon_max"),
        F.sum("value").alias("value_sum"),
    )


_MASK_TRIM_SQL = f"""
WITH {mask_layers_sql_cte()},
windowed AS (
  SELECT lat, lon,
         CASE WHEN lat BETWEEN 25.0 AND 40.0 AND lon BETWEEN 90.0 AND 120.0
              THEN value ELSE 0.0 END AS value
  FROM maskl WHERE layer = 'elevation'
),
nz AS (
  SELECT min(lat) AS lat0, max(lat) AS lat1, min(lon) AS lon0, max(lon) AS lon1
  FROM windowed WHERE value <> 0
)
SELECT count(*) AS n_cells,
       min(lat) AS lat_min, max(lat) AS lat_max,
       min(lon) AS lon_min, max(lon) AS lon_max,
       sum(value) AS value_sum
FROM windowed, nz
WHERE lat BETWEEN nz.lat0 AND nz.lat1 AND lon BETWEEN nz.lon0 AND nz.lon1
"""


def q_filter_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component area filter (A6) — iterative; rows-only check
    (no closed-form SQL oracle; validated against a numpy flood fill in
    pytest)."""
    from geodata_spark import masks

    stacked = _filtered_mask_layers(spark)
    m_and = masks.merge_layers_and(stacked, n_layers=4)
    idx = (
        _filtered_mask_layers(spark)
        .filter(F.col("layer") == "elevation")
        .select("cell", "y_idx", "x_idx")
    )
    withidx = m_and.join(idx, "cell")
    # the linear-congruential synth yields only 1- and 2-cell regions;
    # threshold 2 keeps the 2-cell pairs (a non-trivial filter result)
    out = masks.filter_area(withidx.select("cell", "y_idx", "x_idx", "value"), min_cells=2)
    return out.agg(
        F.sum(F.when(F.col("value") != 0, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "zonal_daily_wavg": q_zonal_daily_wavg,
    "span_sequence": q_span_sequence,
    "cell_hist": q_cell_hist,
    "zone_cover": q_zone_cover,
    "mask_merge": q_mask_merge,
    "mask_trim": q_mask_trim,
    "filter_area_cc": q_filter_area,
}

ORACLES = {
    "zonal_daily_wavg": _ZONAL_SQL,
    "span_sequence": _SPAN_SEQ_SQL,
    "cell_hist": _CELL_HIST_SQL,
    "zone_cover": _ZONE_COVER_SQL,
    "mask_merge": _MASK_MERGE_SQL,
    "mask_trim": _MASK_TRIM_SQL,
    # filter_area_cc: iterative — rows-only check by design
}
