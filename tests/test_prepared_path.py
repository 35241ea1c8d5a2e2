from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def small_corpus_cache(spark, tmp_path_factory, monkeypatch_session=None):
    import bench

    cache = str(tmp_path_factory.mktemp("prep") )
    old = bench.CACHE
    bench.CACHE = cache
    yield bench
    bench.CACHE = old


def test_prepared_equals_raw(spark, small_corpus_cache):
    """The ingest-prepared table answers the flagship identically to the
    raw parse-in-query path (same rows, same bit-exact aggregates)."""
    bench = small_corpus_cache
    n = 30_000
    raw = bench.flagship(spark, n).toPandas()
    prep = bench.flagship_prepared(spark, n).toPandas()
    cols = ["zone_id", "day_idx"]
    m = raw.merge(prep, on=cols, suffixes=("_r", "_p"))
    assert len(m) == len(raw) == len(prep)
    assert (m.n_points_r == m.n_points_p).all()
    assert (m.wavg_r.values == m.wavg_p.values).all()  # dyadic-exact
    assert (m.weight_sum_r.values == m.weight_sum_p.values).all()


def test_prepared_table_layout(spark, small_corpus_cache):
    """Prepared table is range-partitioned by cell id: each file holds a
    disjoint cell range (enables file pruning on spatial predicates)."""
    bench = small_corpus_cache
    path = bench.ensure_prepared(spark, 30_000)
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    ranges = (
        df.groupBy("_file")
        .agg(F.min("cell_r9").alias("lo"), F.max("cell_r9").alias("hi"))
        .toPandas()
        .sort_values("lo")
        .reset_index(drop=True)
    )
    assert len(ranges) > 1
    # disjoint, ordered ranges across files
    overlaps = (ranges.hi.values[:-1] > ranges.lo.values[1:]).sum()
    assert overlaps == 0, f"{overlaps} overlapping file ranges"
    # pruning: a tight cell predicate should scan fewer files
    lo = int(ranges.lo.iloc[0])
    pruned = spark.read.parquet(path).filter(F.col("cell_r9") <= lo)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "cell_r9" in plan  # pushed filter visible in the scan
