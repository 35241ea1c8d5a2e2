"""Skew-resilient ranking operators.

Window functions are the one relational primitive with NO map-side
partial aggregation: ``row_number() OVER (PARTITION BY key)`` ships
EVERY row of a key to one task and sorts there.  A hot key (the dense
coastal/urban cells of the north rule's corpus) therefore turns a
per-cell top-k into a single-task sort of most of the data — the
straggler the salted two-phase aggregation already prevents on the
sum/avg path (zonal.py).

Two operators, two different truths about the optimizer:

- :func:`topk_per_group` — top-k ranking.  **Spark ≥ 3.5 already
  handles the common case natively**: InferWindowGroupLimit inserts a
  ``WindowGroupLimit Partial`` below the exchange for
  ``row_number()/rank() ... <= k`` filters (measured in this repo's
  skew bench: plain ≡ two-phase wall time on a 60%-hot-cell corpus,
  and the Partial node is visible in the plan).  The explicit
  two-phase path here is for the shapes the rule does NOT cover —
  rank computed without an immediate limit filter, rank feeding
  further windows, or engines/configs without the rule — and as the
  documented fallback; when the rule fires, prefer the plain window
  and let Catalyst do it.

- :func:`grouped_prefix_sum` — per-key running sum, the window the
  optimizer canNOT rescue: a cumulative sum has no limit to push
  down, so ``sum() OVER (PARTITION BY key ORDER BY t)`` ships and
  sorts the hot key's entire history on ONE task.  The two-phase
  decomposition (local running sums within monotone order-range bins
  + tiny per-bin base offsets — the same scheme as the corpus-wide
  prefix sum in pipeline/packing.py, generalized per key) is exact
  for dyadic/integer values and turns the single-task sort into one
  task per (key, bin).

Reference analog: the reference keeps per-cell best-layer selections
(mask.py merge paths) and cumulative spin-up sums; at its single-node
scale a hot cell is just a slow loop iteration — on a 1000-executor
shuffle it is THE straggler, which is why these operators exist here
and not there.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    k: int,
    salt_buckets: int | None = None,
    salt_cols: list[str] | None = None,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per key group under a deterministic total order.

    ``order_cols`` must define a TOTAL order within every group (add a
    unique tie-break column, e.g. the row id) — otherwise both the
    plain and the salted path are nondeterministic under shuffle.

    ``salt_buckets=S`` enables the two-phase skew path; ``salt_cols``
    is then REQUIRED (the zonal.py round-3 lesson: a silently chosen
    default salt can collapse on constant columns) and must be
    deterministic row columns, so retries re-bucket identically
    (SPARK-23207 class).
    """
    w_final = Window.partitionBy(*keys).orderBy(*order_cols)
    if salt_buckets is None:
        return df.withColumn(rank_col, F.row_number().over(w_final)).filter(
            F.col(rank_col) <= k
        )
    if not salt_cols:
        raise ValueError(
            "topk_per_group: salt_cols is required when salt_buckets is set "
            "(pass deterministic, high-cardinality row columns)"
        )
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    )
    w_local = Window.partitionBy(*keys, "_salt").orderBy(*order_cols)
    # phase 1: the hot key's sort runs S-wide; survivors ≤ S·k per key
    local = (
        salted.withColumn("_lrnk", F.row_number().over(w_local))
        .filter(F.col("_lrnk") <= k)
        .drop("_lrnk", "_salt")
    )
    # phase 2: tiny window over the survivors only
    return local.withColumn(rank_col, F.row_number().over(w_final)).filter(
        F.col(rank_col) <= k
    )


def grouped_prefix_sum(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    val_col: str,
    bin_expr: Column,
    out_col: str = "cumsum",
) -> DataFrame:
    """Per-key running sum of ``val_col`` without a one-task-per-key sort.

    ``order_cols`` must totally order rows within a key;  ``bin_expr``
    must be a deterministic row expression MONOTONE NON-DECREASING in
    the leading order column (e.g. ``F.col("hour") div 24`` bins an
    hour ordering by day).  Then

    - phase 1: running sum within (keys, bin) — the hot key's history
      sorts as one task PER BIN, not one task total;
    - phase 2: per-(key, bin) totals → running base offsets via a tiny
      window over bins (rows = keys × bins, not data rows);
    - cumsum = base + local, joined back on (keys, bin).

    Equality with the serial window is EXACT for integer/dyadic values
    (sums associate); for general floats the two-phase regrouping of
    additions can differ in the last ulp — same caveat as any
    distributed float sum.
    """
    binned = df.withColumn("_bin", bin_expr)
    w_local = (
        Window.partitionBy(*keys, "_bin")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = binned.withColumn("_loc", F.sum(val_col).over(w_local))
    totals = binned.groupBy(*keys, "_bin").agg(F.sum(val_col).alias("_tot"))
    w_base = (
        Window.partitionBy(*keys)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = totals.withColumn(
        "_base", F.sum("_tot").over(w_base) - F.col("_tot")
    ).select(*keys, "_bin", "_base")
    return (
        local.join(bases, [*keys, "_bin"])
        .withColumn(out_col, F.col("_base") + F.col("_loc"))
        .drop("_bin", "_loc", "_base")
    )
