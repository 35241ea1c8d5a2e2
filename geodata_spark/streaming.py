"""Streaming ingest — incremental document arrival as a stream.

The reference is pure batch; its incremental unit is the (year,month)
file (``src/geodata/cutout.py:544-564``), and its resume logic is
hash-based skipping (``model/_base.py:266-314``) — reimplemented batch-
style in lineage.py.  This module adds the Structured Streaming
analog for engines that ingest documents continuously:

- :func:`streaming_zonal_daily` — the flagship zonal aggregation as a
  windowed streaming query with a watermark for late spans;
- :func:`streaming_span_counts` — per-kind tumbling-window counts.

Both run on any streaming source with the documents schema; tests
drive them with a file source + ``processAllAvailable`` (one JVM,
deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geodata_spark import spatial, zonal
from geodata_spark.zones import ZONES

DOCS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def read_documents_stream(spark: SparkSession, path: str,
                          max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_span_counts(docs_stream: DataFrame, watermark: str = "2 hours",
                          window: str = "1 day") -> DataFrame:
    """Tumbling-window span counts per kind with late-data handling."""
    spans = spatial.parse_geo_spans(docs_stream, kinds=("geo", "raster_tile"))
    return (
        spans.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "kind")
        .agg(F.count(F.lit(1)).alias("n_spans"), F.sum("val").alias("val_sum"))
        .select(F.col("w.start").alias("window_start"), "kind", "n_spans", "val_sum")
    )


def streaming_zonal_daily(docs_stream: DataFrame, spark: SparkSession,
                          watermark: str = "2 hours") -> DataFrame:
    """The flagship zonal daily weighted mean as a streaming query.

    Same operators as the batch path (explode → parse → broadcast zone
    cover join → windowed weighted aggregation); the PIP stays the
    Catalyst expression strategy, so the streaming plan is stateful
    only at the final windowed aggregation.
    """
    pts = spatial.parse_geo_spans(docs_stream)
    zoned = spatial.join_zones(pts, spark, ZONES, res=9, strategy="expr")
    weighted = zoned.withColumn("w", zonal.oracle_area_weight_expr(F.col("lat")))
    return (
        weighted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("win"), "zone_id")
        .agg(
            F.sum(F.col("val") * F.col("w")).alias("vw_sum"),
            F.sum("w").alias("weight_sum"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .select(
            F.col("win.start").alias("day"),
            "zone_id",
            (F.col("vw_sum") / F.col("weight_sum")).alias("wavg"),
            "weight_sum",
            "n_points",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query to completion against a memory sink."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
