from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE, compare_spark_duck

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"zone_id", "day_idx", "wavg"} <= cols


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_ORACLE)
    if sql is None:
        assert sdf.count() >= 0
        return
    compare_spark_duck(sdf, duck, sql)
