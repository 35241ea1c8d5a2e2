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
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "zonal_daily_wavg": q_zonal_daily_wavg,
    "span_sequence": q_span_sequence,
    "cell_hist": q_cell_hist,
    "zone_cover": q_zone_cover,
}

ORACLES = {
    "zonal_daily_wavg": _ZONAL_SQL,
    "span_sequence": _SPAN_SEQ_SQL,
    "cell_hist": _CELL_HIST_SQL,
    "zone_cover": _ZONE_COVER_SQL,
}
