from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geodata_spark import streaming as ST
from geodata_spark.synth import synth_documents


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "docs")
    synth_documents(spark, 2000).repartition(8).write.parquet(p)
    return p


def test_streaming_zonal_matches_batch(spark, docs_path):
    stream = ST.read_documents_stream(spark, docs_path, max_files_per_trigger=2)
    q = ST.run_to_memory(
        ST.streaming_zonal_daily(stream, spark), "zonal_stream", output_mode="complete"
    )
    try:
        got = spark.sql("SELECT * FROM zonal_stream").toPandas()
    finally:
        q.stop()

    # batch twin on the same files
    from geodata_spark import spatial, zonal
    from geodata_spark.zones import ZONES

    docs = spark.read.parquet(docs_path)
    pts = spatial.parse_geo_spans(docs)
    zoned = spatial.join_zones(pts, spark, ZONES, res=9)
    w = zoned.withColumn("w", zonal.oracle_area_weight_expr(F.col("lat")))
    want = (
        w.groupBy(F.window("ts", "1 day").alias("win"), "zone_id")
        .agg(
            (F.sum(F.col("val") * F.col("w")) / F.sum("w")).alias("wavg"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .select(F.col("win.start").alias("day"), "zone_id", "wavg", "n_points")
        .toPandas()
    )
    m = got.merge(want, on=["day", "zone_id"], suffixes=("_s", "_b"))
    assert len(m) == len(want) == len(got)
    assert (m.n_points_s == m.n_points_b).all()
    assert (abs(m.wavg_s - m.wavg_b) < 1e-12).all()


def test_streaming_span_counts_append_with_watermark(spark, docs_path):
    stream = ST.read_documents_stream(spark, docs_path)
    q = ST.run_to_memory(
        ST.streaming_span_counts(stream), "span_counts", output_mode="complete"
    )
    try:
        got = spark.sql("SELECT * FROM span_counts").toPandas()
    finally:
        q.stop()
    assert set(got.kind) == {"geo", "raster_tile"}
    assert got.n_spans.sum() > 0
