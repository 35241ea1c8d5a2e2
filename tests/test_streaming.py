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


def test_streaming_stateful_dedup_across_microbatches(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: a fingerprint emitted in
    micro-batch 1 must be suppressed when re-arriving in micro-batch 2
    (state survives batches); each fingerprint emits exactly once."""
    import os
    import time

    src = str(tmp_path / "dedup_src")
    os.makedirs(src)
    batch1 = spark.createDataFrame(
        [(i, f"text body {i}") for i in range(20)], "doc_id long, text string"
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    q_dir = str(tmp_path / "unused")
    del q_dir

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = ST.streaming_dedup_first_seen(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    first = {r.fingerprint for r in spark.sql("SELECT * FROM dedup_stream").collect()}
    assert len(first) == 20  # all unique in batch 1

    # batch 2: 10 duplicates of batch 1 (different doc ids) + 5 new docs
    time.sleep(1.05)  # file source orders by mod time
    batch2 = spark.createDataFrame(
        [(100 + i, f"text body {i}") for i in range(10)]
        + [(200 + i, f"fresh text {i}") for i in range(5)],
        "doc_id long, text string",
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM dedup_stream").collect()
    fps = [r.fingerprint for r in rows]
    assert len(fps) == len(set(fps))  # never re-emitted
    assert len(fps) == 25  # 20 + 5 new, 10 dupes suppressed
    # the duplicate fingerprints kept their batch-1 doc ids (< 100)
    emitted_ids = {int(r.doc_id) for r in rows}
    assert all(i < 100 or i >= 200 for i in emitted_ids)


def _run_dedup_once(spark, tmp_path, rows, name, **kwargs):
    import os

    src = str(tmp_path / f"{name}_src")
    os.makedirs(src)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 10)
        .parquet(src)
    )
    out = ST.streaming_dedup_first_seen(stream, **kwargs)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_streaming_dedup_same_batch_survivor_is_min_id(spark, tmp_path):
    """Duplicates arriving in the SAME micro-batch must resolve to the
    min doc_id (the batch twin's survivor rule), not pandas iterator
    order — deterministic across runs and task retries."""
    rows = [(7, "dup text"), (3, "dup text"), (9, "dup text"), (1, "solo")]
    got = _run_dedup_once(spark, tmp_path, rows, "dedup_minid")
    by_fp = {r.fingerprint: int(r.doc_id) for r in got}
    assert len(got) == 2 == len(by_fp)
    assert 3 in by_fp.values()  # min of {7,3,9} survives
    assert 7 not in by_fp.values() and 9 not in by_fp.values()
    # NUMERIC min, not lexicographic-on-string: {9, 10} must keep 9
    # ("10" < "9" as strings — the batch twin mins the native type)
    rows2 = [(10, "other dup"), (9, "other dup")]
    got2 = _run_dedup_once(spark, tmp_path, rows2, "dedup_numeric_min")
    assert [int(r.doc_id) for r in got2] == [9]


def test_streaming_dedup_bloom_state_bounded(spark, tmp_path):
    """Bloom state mode: same first-seen semantics on a no-collision
    workload, with state capped at bloom_bits/8 bytes per shard."""
    # survivor per fingerprint is the NUMERIC min of the int ids —
    # streaming_dedup_first_seen keeps the native dtype, matching the
    # batch twin's native-type min (pinned by the sibling test above)
    rows = [(100 + i, f"bloom body {i}") for i in range(30)] + [
        (500 + i, f"bloom body {i}") for i in range(10)
    ]
    got = _run_dedup_once(
        spark, tmp_path, rows, "dedup_bloom",
        state_mode="bloom", bloom_bits=1 << 16,
    )
    ids = sorted(int(r.doc_id) for r in got)
    assert ids == list(range(100, 130))  # 30 distinct, dupes suppressed, min ids win


def test_streaming_checkpoint_kill_resume_exactly_once(spark, tmp_path):
    """Durability across restart (r5 advice #7): a checkpointed file-
    source → file-sink query is killed at an arbitrary point, more
    input arrives, and a NEW query object resuming from the SAME
    checkpoint must deliver exactly-once output — the full batch
    ground truth, no duplicates from re-processing, no gaps.  The
    streaming analog of lineage.py's kill/resume test: source progress
    lives in the checkpoint WAL, sink atomicity in _spark_metadata."""
    import time

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def q_start():
        stream = ST.read_documents_stream(spark, src, max_files_per_trigger=1)
        parsed = (
            ST.spatial.parse_geo_spans(stream)
            .select("doc_id", "span_idx", "lat", "lon", "hour", "val")
        )
        return (
            parsed.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # batch A: 6 input files
    synth_documents(spark, 1200).repartition(6).write.mode("append").parquet(src)
    q = q_start()
    time.sleep(3)      # arbitrary kill point: some triggers done, maybe mid-flight
    q.stop()

    # batch B arrives while the query is down
    synth_documents(spark, 1200).selectExpr(
        "concat('b_', doc_id) AS doc_id", "spans"
    ).repartition(6).write.mode("append").parquet(src)

    q2 = q_start()     # resume from the SAME checkpoint
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(out)          # reads via _spark_metadata log
    want = (
        ST.spatial.parse_geo_spans(spark.read.parquet(src))
        .select("doc_id", "span_idx", "lat", "lon", "hour", "val")
    )
    assert got.count() == want.count()      # no dupes, no gaps
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """Watermark semantics for real: a row whose event time is older
    than (max event time - watermark delay) arrives in a LATER
    micro-batch and must be excluded from the finalized window, while
    an in-time row of the same batch is counted.  Complete-mode tests
    can't see this (complete never drops); this drives append mode
    across three batches with controlled event times."""
    import os
    import time

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def write_doc(doc_id, hours):
        rows = [
            (
                doc_id,
                [
                    ("geo", "t", f"geo:20.25,75.3125@h{h}#var=wnd100m&val=1.0", i)
                    for i, h in enumerate(hours)
                ],
            )
        ]
        spark.createDataFrame(rows, ST.DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # batch 1: three day-0 spans + a day-4 span that advances the
    # max event time to h100 -> watermark becomes h98 after the batch
    write_doc("a", [1, 1, 1, 100])
    stream = ST.read_documents_stream(spark, src, max_files_per_trigger=1)
    out = ST.streaming_span_counts(stream, watermark="2 hours", window="1 day")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_counts")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .start()
    )
    q.processAllAvailable()

    # batch 2: h2 is five days older than the h98 watermark -> must be
    # dropped; h101 is in time and extends day 4
    time.sleep(1.05)  # file source orders by mod time
    write_doc("b", [2, 101])
    q.processAllAvailable()

    # batch 3: advance the watermark far past every open window so all
    # finalized windows flush to the append sink
    time.sleep(1.05)
    write_doc("c", [300])
    q.processAllAvailable()
    q.stop()

    got = {
        r.window_start.isoformat(): r.n_spans
        for r in spark.sql(
            "SELECT * FROM late_counts WHERE kind = 'geo'"
        ).collect()
    }
    # day 0 closed with ONLY batch 1's three spans: the late h2 span
    # (which complete mode would count as a fourth) never landed
    assert got["2011-01-01T00:00:00"] == 3, got
    # the same batch's in-time span did land: day 4 = h100 + h101
    assert got["2011-01-05T00:00:00"] == 2, got


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """The built-in session_window groupBy runs unchanged as a
    streaming stateful aggregation; driven to completion it must equal
    the batch result bit-for-bit (same mergeable-state operator the
    events_sessions_swin registry query uses)."""
    import os

    import pyspark.sql.functions as F

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    rows = [
        (u, f"2020-01-01 {h:02d}:{m:02d}:00")
        for u in range(4)
        for h, m in [(0, 0), (0, 20), (0, 40), (2, 0), (2, 10), (5, u * 10)]
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    # one file -> one micro-batch: nothing is late relative to the
    # watermark (late-drop behavior is pinned by the dedicated test)
    ev.coalesce(1).write.mode("append").parquet(src)

    def sessions(df):
        return df.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        ).agg(F.count(F.lit(1)).alias("n"))

    want = sorted(
        (r.user_id, r.sw.start, r.sw.end, r.n)
        for r in sessions(spark.read.parquet(src)).collect()
    )

    stream = (
        spark.readStream.schema("user_id int, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessions(stream.withWatermark("ts", "1 hour"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_stream")
        .start()
    )
    q.processAllAvailable()
    got = sorted(
        (r.user_id, r.sw.start, r.sw.end, r.n)
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    )
    q.stop()
    assert got == want and len(want) == 12  # 3 sessions x 4 users


def test_streaming_upsert_kill_resume_converges(spark, tmp_path):
    """foreachBatch + merge_upsert: a checkpointed CDC stream killed
    mid-flight and resumed must converge to latest-per-key — batch
    replay is absorbed by the idempotent recency merge."""
    import os
    import time

    src = str(tmp_path / "cdc_src")
    tgt = str(tmp_path / "cdc_tbl")
    ckpt = str(tmp_path / "cdc_ckpt")
    os.makedirs(src)
    cols = "day long, k long, seq long, v string"

    def write_batch(rows):
        spark.createDataFrame(rows, cols).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)  # file source orders by mod time

    def start():
        stream = (
            spark.readStream.schema(cols)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return ST.streaming_upsert(stream, tgt, ["k"], "day", "seq", ckpt)

    write_batch([(d, k, 0, f"v0-{d}-{k}") for d in (1, 2) for k in range(4)])
    write_batch([(1, 0, 1, "v1-1-0"), (1, 9, 1, "v1-1-9")])
    q = start()
    q.processAllAvailable()
    q.stop()

    # two more batches land while the query is down; the second
    # re-delivers an already-applied update (at-least-once delivery)
    write_batch([(2, 1, 2, "v2-2-1"), (3, 0, 2, "v2-3-0")])
    write_batch([(1, 0, 1, "v1-1-0"), (2, 3, 3, "v3-2-3")])
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = {(r.day, r.k): (r.seq, r.v) for r in spark.read.parquet(tgt).collect()}
    want = {(d, k): (0, f"v0-{d}-{k}") for d in (1, 2) for k in range(4)}
    want.update({
        (1, 0): (1, "v1-1-0"), (1, 9): (1, "v1-1-9"),
        (2, 1): (2, "v2-2-1"), (3, 0): (2, "v2-3-0"), (2, 3): (3, "v3-2-3"),
    })
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream inner join with a time-interval
    condition (purchase within 1 h after the click, same user): the
    stateful two-sided join — watermarks bound both buffers — must
    produce exactly the batch join's pairs."""
    import pyspark.sql.functions as F

    c_src, p_src = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks = spark.createDataFrame(
        [(u, f"2020-01-01 {h:02d}:00:00") for u in (1, 2) for h in (0, 3, 6)],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("c_ts"))
    purch = spark.createDataFrame(
        [(1, "2020-01-01 00:30:00"), (1, "2020-01-01 04:30:00"),
         (2, "2020-01-01 03:59:00"), (2, "2020-01-01 06:00:00"),
         (3, "2020-01-01 00:10:00")],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("p_ts"))
    clicks.coalesce(1).write.parquet(c_src)
    purch.coalesce(1).write.parquet(p_src)

    def funnel(c, p):
        return c.join(
            p,
            (c.user_id == p.user_id)
            & (p.p_ts >= c.c_ts)
            & (p.p_ts < c.c_ts + F.expr("INTERVAL 1 HOUR")),
        ).select(c.user_id, "c_ts", "p_ts")

    want = sorted(map(tuple, funnel(clicks, purch).collect()))
    # expected: u1 00:00->00:30, u2 03:00->03:59, u2 06:00->06:00
    assert len(want) == 3

    cs = (
        spark.readStream.schema("user_id int, c_ts timestamp").parquet(c_src)
        .withWatermark("c_ts", "2 hours")
    )
    ps = (
        spark.readStream.schema("user_id int, p_ts timestamp").parquet(p_src)
        .withWatermark("p_ts", "2 hours")
    )
    q = (
        funnel(cs, ps)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    got = sorted(map(tuple, spark.sql("SELECT * FROM funnel_stream").collect()))
    q.stop()
    assert got == want


def test_streaming_continuous_rollup_corrects_late_rows(spark, tmp_path):
    """The hypertable/continuous-aggregate pattern: an UPDATE-mode
    windowed agg merged into a parquet rollup via the idempotent
    keyed upsert.  A late-but-inside-watermark row RE-EMITS its bucket
    and the merge REPLACES the stale row (self-correction — what
    append mode cannot do); a beyond-watermark straggler is dropped
    (pinned as the documented divergence from batch recompute)."""
    import datetime as dt
    import os
    import time

    src = str(tmp_path / "cr_src")
    tgt = str(tmp_path / "cr_rollup")
    os.makedirs(src)
    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)

    def write_chunk(rows):
        spark.createDataFrame(
            rows, "ts timestamp, kind string, val double"
        ).coalesce(1).write.mode("append").parquet(src)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # chunk 1: bucket 10:00 (3 rows) + bucket 11:00 (1 row); max
    # event time 11:30 -> watermark 09:30 after the batch
    write_chunk([(at(5), "geo", 1.0), (at(20), "geo", 2.0),
                 (at(40), "geo", 4.0), (at(90), "geo", 8.0)])
    stream = (
        spark.readStream.schema("ts timestamp, kind string, val double")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = ST.streaming_continuous_rollup(
        stream, tgt, str(tmp_path / "cr_ckpt"),
        window_len="1 hour", watermark="2 hours",
    )
    q.processAllAvailable()
    first = {r.bucket: (r.n_rows, r.val_sum)
             for r in spark.read.parquet(tgt).collect()}
    assert first[t0] == (3, 7.0)

    # chunk 2: a LATE row for bucket 10:00 (10:50 > the 09:30
    # watermark -> admitted, bucket re-emitted) + a row at 14:30 that
    # advances the watermark to 12:30
    time.sleep(1.05)
    write_chunk([(at(50), "geo", 16.0), (at(270), "geo", 32.0)])
    q.processAllAvailable()
    mid = {r.bucket: (r.n_rows, r.val_sum)
           for r in spark.read.parquet(tgt).collect()}
    assert mid[t0] == (4, 23.0)  # the stale (3, 7.0) row was REPLACED

    # chunk 3: a beyond-watermark straggler for bucket 10:00 (10:55 is
    # far older than the 12:30 watermark; its window state is evicted)
    time.sleep(1.05)
    write_chunk([(at(55), "geo", 64.0)])
    q.processAllAvailable()
    q.stop()

    final = {r.bucket: (r.n_rows, r.val_sum)
             for r in spark.read.parquet(tgt).collect()}
    assert final[t0] == (4, 23.0)  # straggler dropped, no corruption
    assert final[at(60)] == (1, 8.0)
    assert final[at(240)] == (1, 32.0)
    # one row per (bucket, kind): the merge never duplicates
    all_rows = spark.read.parquet(tgt).collect()
    assert len(all_rows) == len({(r.bucket, r.kind) for r in all_rows})
    # documented divergence: a full batch recompute WOULD count the
    # straggler — the watermark trade is visible, not silent
    batch = spark.read.parquet(src).groupBy(
        F.window("ts", "1 hour").alias("w"), "kind").count().collect()
    b10 = [r for r in batch if r.w.start == t0][0]
    assert b10["count"] == 5
