"""Distributed raster hydrology: D8 flow direction + watershed labels.

The classic DEM pre-analysis pair (ESRI/GRASS ``flowdirection`` /
``watershed``) re-expressed for a relational engine:

- **D8 flow direction** is a scatter→gather over the 8-neighborhood
  (the focal_mean_3x3 shape): each cell scatters its elevation to its
  neighbors, each center picks the strictly-lower neighbor with the
  steepest descent.  Slope comparison uses drop²/dist² — dist² ∈
  {1, 2}, so the ratio stays DYADIC and the argmax is bit-deterministic
  (no sqrt, no tolerance); ties break on (dy, dx) ascending.  Cells
  with no lower neighbor (pits / plateau minima) are sinks and point
  to themselves.

- **Watershed labeling** follows the resulting FUNCTIONAL graph (one
  outgoing edge per cell) to its sink by pointer DOUBLING: each round
  root ← root(root) via one self-join, halving the remaining path
  length, so convergence is O(log max-path-length) rounds — the
  filter_area discipline (hook + pointer-jump CC, masks.py:188) applied
  to flow trees, with the same fused convergence probe (the round's
  single action materializes the checkpoint AND answers "did any
  pointer move?") and the same hard RuntimeError on non-convergence
  instead of a silent cap.

At 100 TB the per-round cost is one equi-join on the packed cell key
(both sides hash-partitioned the same way) over a table that never
exceeds one row per raster cell; rounds ≤ log2(longest flow path),
i.e. ~40 rounds bounds a 10^12-cell path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Y_STEP = 2**27  # packed key stride (filter_area convention, masks.py:223)


def flow_direction_d8(layer: DataFrame, value_col: str = "value") -> DataFrame:
    """Per-cell D8 downstream pointer.

    Output: (y_idx, x_idx, cell, parent, drop2_over_d2) where ``cell``
    / ``parent`` are packed long keys (y·2²⁷ + x); sinks have
    parent == cell and drop2_over_d2 == 0.
    """
    base = layer.select(
        F.col("y_idx").cast("long").alias("y_idx"),
        F.col("x_idx").cast("long").alias("x_idx"),
        F.col(value_col).cast("double").alias("_z"),
    ).withColumn(
        "cell", F.col("y_idx") * F.lit(Y_STEP) + F.col("x_idx")
    )
    offs = F.array(*[
        F.struct(
            F.lit(dy).alias("dy"), F.lit(dx).alias("dx"),
            F.lit(float(dy * dy + dx * dx)).alias("d2"),
        )
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if not (dy == 0 and dx == 0)
    ])
    # scatter: neighbor elevation arrives at the center it can drain
    scattered = base.withColumn("_o", F.explode(offs)).select(
        (F.col("cell") + F.col("_o.dy") * Y_STEP + F.col("_o.dx")).alias("cell"),
        F.col("_z").alias("_zn"),
        (-F.col("_o.dy")).alias("dy"),   # direction center -> neighbor
        (-F.col("_o.dx")).alias("dx"),
        F.col("_o.d2").alias("d2"),
    )
    cand = base.join(scattered, "cell").filter(F.col("_zn") < F.col("_z"))
    drop = F.col("_z") - F.col("_zn")
    slope2 = (drop * drop) / F.col("d2")   # d2 ∈ {1,2}: stays dyadic
    best = cand.groupBy("cell").agg(
        F.max_by(
            F.struct(
                F.col("dy").alias("dy"), F.col("dx").alias("dx"),
                slope2.alias("s2"),
            ),
            # max slope2; ties -> smallest dy, then smallest dx
            F.struct(slope2.alias("a"), (-F.col("dy")).alias("b"),
                     (-F.col("dx")).alias("c")),
        ).alias("_b")
    )
    return (
        base.join(best, "cell", "left")
        .select(
            "y_idx", "x_idx", "cell",
            F.coalesce(
                F.col("cell") + F.col("_b.dy") * Y_STEP + F.col("_b.dx"),
                F.col("cell"),
            ).alias("parent"),
            F.coalesce(F.col("_b.s2"), F.lit(0.0)).alias("drop2_over_d2"),
        )
    )


def watershed(
    layer: DataFrame, value_col: str = "value", max_iters: int = 64
) -> DataFrame:
    """Basin label per cell: the packed key of the sink its D8 flow
    path reaches, by pointer doubling (O(log path-length) rounds).

    Output: (y_idx, x_idx, cell, basin) — ``basin`` is the sink's
    packed key, so sink rows have basin == cell.
    """
    d8 = flow_direction_d8(layer, value_col).select(
        "y_idx", "x_idx", "cell", F.col("parent").alias("root")
    )
    cur = d8.localCheckpoint(eager=True)
    for _ in range(max_iters):
        hop = cur.select(F.col("cell").alias("_pc"), F.col("root").alias("_pr"))
        nxt = (
            cur.join(hop, cur.root == hop._pc)   # total: roots are live cells
            .select(
                "y_idx", "x_idx", "cell",
                F.col("_pr").alias("root"),
                (F.col("_pr") != F.col("root")).cast("int").alias("_changed"),
            )
        )
        nxt = nxt.localCheckpoint(eager=False)
        # fused probe: this ONE action materializes the checkpoint and
        # answers convergence (filter_area discipline)
        changed = nxt.agg(F.max("_changed")).collect()[0][0]
        cur = nxt.drop("_changed")
        if not changed:
            return cur.withColumnRenamed("root", "basin")
    raise RuntimeError(
        f"watershed: pointer doubling did not converge in {max_iters} rounds"
    )
