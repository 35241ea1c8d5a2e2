"""Relational join surface over the TPC-H tables: plan shapes + semantics.

Value correctness is oracle-checked by the driver (queries tpch_*);
these tests pin the *plans* — broadcast where a dim is small, shuffle
join where both sides are big, pushdown of the date filters — because
those are the properties that survive a 100× scale-up.
"""

import pytest
from pyspark.sql import functions as F

from geodata_spark import tpch

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_revenue_nation_broadcasts_dims(spark):
    out = tpch.revenue_by_nation(spark, SF_DIR)
    plan = _plan(out)
    assert plan.count("BroadcastHashJoin") >= 2, "customer+nation must broadcast"
    assert "SortMergeJoin" not in plan, "fact table must not shuffle for dim joins"


def test_bigjoin_shuffles_when_not_broadcastable(spark):
    # at test scale AQE would legitimately broadcast the small side; force
    # the at-scale statistics (broadcast off) and require a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        out = tpch.lineitem_order_revenue(spark, SF_DIR)
        plan = _plan(out)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert out.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_pricing_summary_pushes_date_filter(spark):
    out = tpch.pricing_summary(spark, SF_DIR)
    plan = _plan(out)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200], (
        "shipdate predicate must reach the parquet scan"
    )


def test_anti_join_semantics(spark):
    out = tpch.customers_without_recent_orders(spark, SF_DIR).collect()
    custkeys = {r["c_custkey"] for r in out}
    recent = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
        .collect()
    )
    assert custkeys.isdisjoint({r["o_custkey"] for r in recent})
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert 0 < len(custkeys) < n_cust


def test_outer_join_keeps_zero_order_customers(spark):
    rows = tpch.customer_order_stats(spark, SF_DIR).collect()
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert len(rows) == n_cust, "left outer must keep every customer"
    zero = [r for r in rows if r["n_orders"] == 0]
    assert zero and all(r["spend_c"] == 0 for r in zero)


@pytest.mark.parametrize("col", ["sum_disc_c4", "sum_charge_c6", "revenue_c4"])
def test_big_money_sums_are_exact_digit_strings(spark, col):
    """Product-of-cents sums accumulate in DECIMAL(38,0) (int64 would
    overflow near sf 15 under ANSI; double rounds above 2^53) and
    publish the exact integer digits as strings — every value must be
    a pure digit string, non-empty, with no sign/point/exponent."""
    if col == "revenue_c4":
        df = tpch.lineitem_order_revenue(spark, SF_DIR)
    else:
        df = tpch.pricing_summary(spark, SF_DIR)
    vals = [r[col] for r in df.select(col).collect()]
    assert vals and all(isinstance(v, str) and v.isdigit() for v in vals)


def test_base_money_sum_is_integral_int64(spark):
    row = tpch.pricing_summary(spark, SF_DIR).agg(F.sum("sum_base_c").alias("s")).first()
    assert row["s"] == int(row["s"])


def test_approx_count_distinct_bounded_error(spark):
    """The 100 TB distinct-count path: HLL++ (bounded sketch state,
    mergeable map-side) must land within its configured relative
    standard deviation of the exact distinct count — the same
    exact-oracle / sketch-production split doc_quantiles documents for
    percentiles.  (The sketch column stays OUT of driver queries:
    HLL++ estimates are not cross-engine-reproducible.)"""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert len(got) == 5
    for r in got:
        assert abs(r.approx - r.exact) <= max(3, 0.06 * r.exact), r


def test_big_orders_having_before_join(spark):
    """Q18 shape: every returned order's recomputed line-quantity sum
    exceeds the threshold, and the plan aggregates lineitem BEFORE the
    orders join (the big-big pair is never materialized)."""
    from geodata_spark.tpch import big_orders

    df = big_orders(spark, SF_DIR, min_qty=300.0)
    rows = df.collect()
    assert rows and all(r.total_qty > 300.0 for r in rows)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    want = {
        r.l_orderkey: r.s
        for r in li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s")).filter("s > 300").collect()
    }
    assert {r.o_orderkey for r in rows} == set(want)
    for r in rows:
        assert r.total_qty == want[r.o_orderkey]
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the quantity aggregate sits BELOW both joins in the plan tree
    assert plan.index("Aggregate") > plan.index("Join")  # joins above agg
