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


def streaming_dedup_first_seen(docs_stream: DataFrame, prefix_len: int = 2) -> DataFrame:
    """Streaming exact dedup — custom stateful operator via
    ``applyInPandasWithState``.

    Emits only the FIRST document seen for each content fingerprint,
    across micro-batches: the streaming twin of
    :func:`geodata_spark.pipeline.dedup.exact_dedup`'s survivor pick,
    with arrival order replacing min-id.  No built-in streaming op
    expresses this (``dropDuplicates`` on a stream cannot bound state
    by key group or evolve to approximate state).

    State sharding: documents group by a fingerprint *prefix*
    (16^prefix_len groups), so state spreads across executors instead
    of concentrating per key; each group's state is the fingerprint
    set already emitted.  At production scale the state value becomes
    a bloom filter / TTLed set — the grouping and transition logic
    stay identical; the exact set keeps tests deterministic.

    Input schema: (doc_id, text).  Output: (fp_prefix, doc_id,
    fingerprint), append mode.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from geodata_spark.pipeline.text import normalize_sql

    with_fp = docs_stream.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(f"md5({normalize_sql('text', 'spark')})").alias("fingerprint"),
    ).withColumn("fp_prefix", F.substring("fingerprint", 1, prefix_len))

    def dedup(key, pdf_iter, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        rows = []
        for pdf in pdf_iter:
            for doc_id, fp in zip(pdf["doc_id"], pdf["fingerprint"]):
                if fp not in seen:
                    seen.add(fp)
                    rows.append((key[0], doc_id, fp))
        state.update((sorted(seen),))
        yield pd.DataFrame(rows, columns=["fp_prefix", "doc_id", "fingerprint"])

    return with_fp.groupBy("fp_prefix").applyInPandasWithState(
        dedup,
        "fp_prefix string, doc_id string, fingerprint string",
        "seen array<string>",
        "append",
        GroupStateTimeout.NoTimeout,
    )
