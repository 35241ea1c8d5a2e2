"""Temporal joins — as-of (nearest-prior) matching.

The reference's time handling is positional xarray indexing (a cutout
shares one time axis, so "the value in effect at t" is an array
lookup).  A table of interleaved event streams has no shared axis:
matching every left row to the LATEST right row at-or-before its
timestamp is an ASOF JOIN — the standard temporal primitive of
feature pipelines ("the user's last view before this click", "the
price in effect at order time").

Spark has no native as-of join; a naive range join
(``l.ts >= r.ts``) explodes to O(n·m) pairs per key before taking the
max.  :func:`asof_join` uses the **union trick** instead: tag both
sides, union, ONE window per key ordered by time with right rows
sorting before coincident left rows, and ``last(struct, ignorenulls)``
carries the latest right ROW (atomically — see asof_join) forward
onto every left row.  Cost is
one shuffle of (left + right) and a per-key sort — the same shape as
any windowed query, with zero pair explosion.  DuckDB's native
``ASOF LEFT JOIN`` is the independent oracle (queries.py
``events_asof``).

Skew note: a hot key sorts on one task, like any window.  Pass
``bin_expr`` (a deterministic expression monotone non-decreasing in
the timestamp, e.g. ``F.col("ts") div 3600``) to switch to the
bin-split path — the grouped_prefix_sum scheme applied to as-of:
local carry within (key, bin), then a tiny keys×bins window computes
the latest right row of strictly earlier bins and a coalesce stitches
the two.  Exactly equal to the plain path (pinned by test), with the
hot key sorting one task PER BIN instead of one task total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
    tiebreak_col: str | None = None,
    direction: str = "backward",
    bin_expr: Column | None = None,
) -> DataFrame:
    """Left as-of join: latest right row with ``r.ts <= l.ts`` per key
    (``direction="backward"``, the default), or the EARLIEST right row
    with ``r.ts >= l.ts`` (``direction="forward"`` — the mirror window
    read in descending time; same cost, same row-atomic carry).

    Output = every left row + ``{c}{suffix}`` for each of
    ``right_cols`` and ``{ts_col}{suffix}`` (the matched right
    timestamp), NULL when no right row precedes (left-join
    semantics).  ``tolerance_seconds`` additionally nulls matches
    older than the window.  If multiple right rows share (key, ts),
    pass ``tiebreak_col`` (a unique right column, ANY orderable type
    — compared natively, never cast) to make the pick deterministic —
    the largest tiebreak wins.

    The matched right row is carried as ONE struct, not per-column
    ``last()`` calls: per-column carries would let a NULL in the
    matched row's value column fall through to an OLDER row's value,
    stitching a tuple that never existed (and diverging from the
    DuckDB ASOF oracle).  A struct is non-null whenever the right ROW
    exists, so ``last(struct, ignorenulls)`` is row-atomic.

    ``bin_expr`` (optional) enables the skew-resilient bin-split path:
    it must be a deterministic expression over the union'd columns,
    MONOTONE NON-DECREASING in ``ts_col`` (e.g. ``F.expr("ts div
    3600")``).  Results are exactly those of the plain path; the hot
    key's sort fans out to one task per (key, bin).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # NULL-ts right rows can never be "at or before t" — but they sort
    # FIRST under the ascending window order with a non-null _r struct,
    # so without this filter every left row could "match" them.
    # DuckDB's native ASOF ignores NULL-timestamp rows; mirror that.
    right = right.filter(F.col(ts_col).isNotNull())
    out_cols = list(left.columns)
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{ts_col}{suffix}"]

    r_struct = F.struct(
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
    )
    tie_type = right.schema[tiebreak_col].dataType if tiebreak_col else None
    l_tagged = left.select(
        *out_cols,
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
        (F.lit(None).cast(tie_type) if tie_type else F.lit(0)).alias("_tie"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on + [ts_col]],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in out_cols if c not in on + [ts_col]],
        F.lit(1).alias("_side"),
        r_struct.alias("_r"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("_tie"),
    ).select(*l_tagged.columns)  # align column order for the union

    u = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE coincident left rows (side desc at equal
    # ts → a right row AT t is visible to a left row AT t, inclusive
    # as-of), ties among right rows resolved by _tie so last() is
    # deterministic
    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    if bin_expr is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_order, F.col("_side").desc(), F.col("_tie").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.select(
            *out_cols,
            "_side",
            F.last("_r", ignorenulls=True).over(w).alias("_m"),
        )
        res = (
            filled.filter(F.col("_side") == 0)
            .select(*out_cols, *[F.col(f"_m.{c}").alias(c) for c in carried])
        )
    else:
        # ---- skew (bin-split) path: one sort task per (key, bin) ----
        # bin_expr must be deterministic and MONOTONE NON-DECREASING in
        # ts_col (e.g. ts div 3600) — the grouped_prefix_sum contract.
        ub = u.withColumn("_bin", bin_expr)
        w_loc = (
            Window.partitionBy(*on, "_bin")
            .orderBy(ts_order, F.col("_side").desc(), F.col("_tie").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = ub.select(
            *out_cols,
            "_side",
            "_bin",
            F.last("_r", ignorenulls=True).over(w_loc).alias("_mloc"),
        )
        # per-bin extreme right row, in two levels so equal-ts ties
        # resolve exactly like the plain window (largest _tie wins):
        # level 1 collapses (key, bin, ts) to the max-_tie row; level 2
        # takes the latest (backward) / earliest (forward) ts per bin.
        lvl1 = ub.groupBy(*on, "_bin", ts_col).agg(
            F.max(F.when(F.col("_side") == 1, F.struct("_tie", "_r"))).alias("_m1")
        )
        ext = F.when(F.col("_m1").isNotNull(), F.struct(ts_col, "_m1"))
        lvl2 = lvl1.groupBy(*on, "_bin").agg(
            (F.max(ext) if direction == "backward" else F.min(ext)).alias("_ext")
        )
        # cross-bin carry: latest right row from STRICTLY EARLIER bins
        # (backward; mirror for forward).  Rows = keys x bins, tiny.
        bin_order = F.col("_bin").asc() if direction == "backward" else F.col("_bin").desc()
        w_carry = (
            Window.partitionBy(*on)
            .orderBy(bin_order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = lvl2.select(
            *on,
            "_bin",
            F.last("_ext", ignorenulls=True).over(w_carry)["_m1"]["_r"].alias("_mcarry"),
        )
        res = (
            local.filter(F.col("_side") == 0)
            .join(carry, [*on, "_bin"], "left")
            .withColumn("_m", F.coalesce(F.col("_mloc"), F.col("_mcarry")))
            .select(*out_cols, *[F.col(f"_m.{c}").alias(c) for c in carried])
        )
    if tolerance_seconds is not None:
        matched_ts = F.col(f"{ts_col}{suffix}")
        gap = (
            F.col(ts_col).cast("double") - matched_ts.cast("double")
            if direction == "backward"
            else matched_ts.cast("double") - F.col(ts_col).cast("double")
        )
        fresh = gap <= F.lit(float(tolerance_seconds))
        res = res.select(
            *out_cols,
            *[
                F.when(fresh, F.col(c)).alias(c)
                for c in carried
            ],
        )
    return res


def gapfill_linear(
    df: DataFrame,
    keys: list[str],
    t_col: str,
    val_col: str,
    out_col: str = "filled",
) -> DataFrame:
    """Per-key linear interpolation of NULL gaps in a time series.

    For every row, the nearest non-null neighbours in time bracket the
    gap: ``filled = prev + (next - prev) * (t - t_prev) / (t_next -
    t_prev)``; leading/trailing gaps carry the single available
    neighbour (nearest-carry boundary).  The reference's temporal
    handling interpolates on the dense xarray axis (cutout resampling,
    preparation.py); a relational series needs the windowed form.

    Scale shape: two frames over ONE per-key sort — a backward
    ``last(non-null, ignorenulls)`` and a forward ``first(non-null,
    ignorenulls)`` share the same (keys, t) window partitioning, so
    the plan shuffles once.  Bit-exactness: with dyadic values and
    integer timestamps every step is a single IEEE op (the division's
    operands are exact), so the DuckDB twin matches bit-for-bit — no
    tolerance needed.
    """
    w = Window.partitionBy(*keys).orderBy(t_col)
    carry = F.when(
        F.col(val_col).isNotNull(), F.struct(F.col(t_col).alias("t"), F.col(val_col).alias("v"))
    )
    prev = F.last(carry, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.first(carry, ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    interp = prev["v"] + (nxt["v"] - prev["v"]) * (
        F.col(t_col).cast("double") - prev["t"].cast("double")
    ) / (nxt["t"].cast("double") - prev["t"].cast("double"))
    filled = (
        F.when(F.col(val_col).isNotNull(), F.col(val_col))
        .when(prev.isNotNull() & nxt.isNotNull(), interp)
        .when(prev.isNotNull(), prev["v"])
        .when(nxt.isNotNull(), nxt["v"])
    )
    return df.withColumn(out_col, filled)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    bin_width: int,
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
) -> DataFrame:
    """Inclusive interval-overlap join without a range explosion.

    Spark has no native interval join: the naive ``l.start <= r.end
    AND r.start <= l.end`` theta-join degenerates to a per-key cross
    product.  The binned form replicates every interval onto the
    ``bin_width``-sized time bins it touches (``sequence`` + explode,
    ~len/width + 1 copies), equi-joins on (keys, bin), applies the
    exact overlap predicate, and keeps each matched pair exactly once
    by anchoring it to the single bin containing the overlap's start
    — no distinct pass, no duplicate rows by construction.

    Start/end columns must be NUMERIC (cast timestamps to epoch
    seconds first).  Cost: one equi-shuffle of the replicated rows;
    pick ``bin_width`` near the typical interval length so the
    replication factor stays ~2 and a bin's population stays bounded
    (the 100 TB criterion: candidate pairs ∝ Σ per-bin products, the
    same budget shape as the LSH band joins in pipeline/dedup.py).
    """
    lw = F.floor(F.col(l_start) / bin_width)
    lh = F.floor(F.col(l_end) / bin_width)
    lb = left.withColumn("_bin", F.explode(F.sequence(lw, lh)))
    rw = F.floor(F.col(r_start) / bin_width)
    rh = F.floor(F.col(r_end) / bin_width)
    rb = right.withColumn("_bin", F.explode(F.sequence(rw, rh)))
    l_cols = [c for c in left.columns if c not in on]
    j = lb.alias("l").join(rb.alias("r"), on + ["_bin"])
    overlap = (F.col(f"l.{l_start}") <= F.col(f"r.{r_end}")) & (
        F.col(f"r.{r_start}") <= F.col(f"l.{l_end}")
    )
    anchor = F.floor(
        F.greatest(F.col(f"l.{l_start}"), F.col(f"r.{r_start}")) / bin_width
    )
    out_cols = (
        [F.col(f"l.{c}") for c in on]
        + [F.col(f"l.{c}").alias(c) for c in l_cols]
        + [
            F.col(f"r.{c}").alias(c if c not in l_cols + on else f"{c}_r")
            for c in right.columns
            if c not in on
        ]
    )
    return j.filter(overlap & (F.col("_bin") == anchor)).select(*out_cols)


def cusum_changepoint(
    df: DataFrame,
    keys: list[str],
    t_col: str = "hour",
    y_col: str = "temperature",
) -> DataFrame:
    """Per-group CUSUM change-point detector: the t maximizing
    |Σ_{u≤t} (y_u − ȳ)| — the classic Page/Pettitt-style level-shift
    screen a sensor-QA pass runs per grid cell.

    EXACT oracle with no rounding: the group mean is ONE division of
    an order-independent sum (exact for dyadic inputs — non-dyadic
    inputs would need a rounding step here), deviations are therefore
    identical, and the cumulative sum is an ORDERED prefix — both
    engines add the same numbers in the same order, so even though the
    values are non-dyadic the trajectory is bit-identical (contrast
    unordered aggregates, which need dyadic inputs to be
    order-independent).  Tie on |S| breaks to the earliest t.

    Shapes: one window pass computes mean, prefix sum and the ranking
    (all share the per-group partitioning — a single Exchange), then a
    filter keeps rank 1.  Output: keys + t_star, cusum_abs, n.
    """
    from pyspark.sql.window import Window

    wg = Window.partitionBy(*keys)
    wo = Window.partitionBy(*keys).orderBy(t_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = df.withColumn("_m", F.avg(y_col).over(wg)).withColumn(
        "_s", F.sum(F.col(y_col) - F.col("_m")).over(wo)
    )
    wr = Window.partitionBy(*keys).orderBy(
        F.abs(F.col("_s")).desc(), F.col(t_col).asc()
    )
    return (
        d.withColumn("_n", F.count(F.lit(1)).over(wg))
        .withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") == 1)
        .select(
            *keys,
            F.col(t_col).cast("long").alias("t_star"),
            F.abs(F.col("_s")).alias("cusum_abs"),
            F.col("_n").cast("long").alias("n"),
        )
    )
