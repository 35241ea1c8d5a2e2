"""Spatial statistics over the regular grid: semivariogram, Moran's I.

The classic geostatistics pre-analysis pair a gridded-weather user
runs before kriging / interpolation quality decisions (the reference
exposes the raw grids and leaves this to xarray users; here they are
first-class distributed operators).  Both are built WITHOUT pair
joins: adjacent/lagged pairs come from ``lead`` windows along each
grid axis, so the only shuffles are the two axis-ordered window
exchanges — the same plan shape as masks.slope_finite_diff (central
differences), generalized to lag h.

Exactness: grid values are dyadic (synth.py), so squared differences,
pair products and all their sums are exact in IEEE doubles regardless
of aggregation order; the semivariogram's single final division is
bit-exact cross-engine.  Moran's I divides by the mean first (the one
non-dyadic step), so its final statistic is rounded to 6 dp — the
cell_area mitigation for expression-tree rounding differences.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geodata_spark.synth import DLAT, DLON, LAT0, LON0


def _with_idx(df: DataFrame, lat0: float, dlat: float, lon0: float, dlon: float) -> DataFrame:
    return df.withColumn(
        "y_idx", F.round((F.col("lat") - F.lit(lat0)) / F.lit(dlat)).cast("long")
    ).withColumn(
        "x_idx", F.round((F.col("lon") - F.lit(lon0)) / F.lit(dlon)).cast("long")
    )


def _axis_pairs(
    df: DataFrame,
    value_col: str,
    max_lag: int,
    axis: str,
    time_col: str,
) -> DataFrame:
    """(time, dir, h, v_i, v_j) rows for lags 1..max_lag along one
    axis via ``lead`` windows — no self-join; adjacency is guarded by
    the led index (holes in a sparse raster produce no false pairs,
    the slope_finite_diff discipline)."""
    part, order = (("y_idx", "x_idx") if axis == "x" else ("x_idx", "y_idx"))
    w = Window.partitionBy(time_col, part).orderBy(order)
    # window expressions are not allowed inside a generator: project
    # the guarded leads to columns first (one window pass computes all
    # max_lag of them — same partitioning, same sort), then explode
    led = df.select(
        time_col,
        F.col(value_col).alias("vi"),
        *[
            F.when(
                F.lead(order, h).over(w) - F.col(order) == h,
                F.lead(value_col, h).over(w),
            ).alias(f"_vj{h}")
            for h in range(1, max_lag + 1)
        ],
    )
    pairs = F.array(*[
        F.struct(F.lit(h).alias("h"), F.col(f"_vj{h}").alias("vj"))
        for h in range(1, max_lag + 1)
    ])
    return (
        led.select(
            time_col, F.lit(axis).alias("dir"), "vi", F.explode(pairs).alias("p")
        )
        .select(time_col, "dir", F.col("p.h").alias("h"), "vi", F.col("p.vj").alias("vj"))
        .filter(F.col("vj").isNotNull())
    )


def semivariogram(
    df: DataFrame,
    value_col: str,
    max_lag: int = 6,
    time_col: str = "hour",
    lat0: float = LAT0,
    dlat: float = DLAT,
    lon0: float = LON0,
    dlon: float = DLON,
) -> DataFrame:
    """Empirical directional semivariogram on the regular grid:
    γ(h) = Σ (z(s) − z(s+h))² / (2·N(h)) for integer index lags
    h = 1..max_lag along each axis (Matheron's classical estimator —
    the standard spatial-correlation-range diagnostic before choosing
    an interpolation kernel).

    Dyadic values ⇒ the pair sums are exact and the single division
    is bit-exact cross-engine, no tolerance.  Scale shape: lags come
    from per-axis ``lead`` windows (2 ordered shuffles on
    (time, row/col)), the explode fan-out is the constant max_lag,
    and the final agg output is 2·max_lag rows per time slice.  No
    pair join, no crossJoin, no densification assumption beyond the
    led-index adjacency guard.
    """
    d = _with_idx(df, lat0, dlat, lon0, dlon)
    px = _axis_pairs(d, value_col, max_lag, "x", time_col)
    py = _axis_pairs(d, value_col, max_lag, "y", time_col)
    dd = F.col("vi") - F.col("vj")
    return (
        px.unionByName(py)
        .groupBy(time_col, "dir", "h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            (F.sum(dd * dd) / (2.0 * F.count(F.lit(1)))).alias("gamma"),
        )
    )


def morans_i(
    df: DataFrame,
    value_col: str,
    time_col: str = "hour",
    lat0: float = LAT0,
    dlat: float = DLAT,
    lon0: float = LON0,
    dlon: float = DLON,
) -> DataFrame:
    """Global Moran's I (rook contiguity, binary weights) per time
    slice — the standard global spatial-autocorrelation index
    (Moran 1950; I → +1 smooth fields, ≈ −1/(N−1) under randomness).

    Algebra: with undirected rook pairs P, pair-product sum
    p = Σ x_i x_j, pair-value sum s = Σ (x_i + x_j), mean m, and W =
    2·|P| (each undirected pair counts twice in the directed double
    sum), I = (N/|P|) · (p − m·s + |P|·m²) / (Σx² − N·m²).  All SUMS
    (p, s, Σx, Σx², counts) are exact dyadic reductions — aggregation
    order cannot change them; only the handful of scalar ops AFTER
    aggregation touch non-dyadic values, so the statistic is rounded
    to 6 dp for the oracle (libm-free, but DuckDB may contract
    mul-adds to FMA).

    Scale shape: adjacent pairs via lag-1 ``lead`` windows (2 ordered
    shuffles), one tiny per-time agg, one broadcast-sized join of two
    48-row aggregates.  No N² anything.
    """
    d = _with_idx(df, lat0, dlat, lon0, dlon)
    px = _axis_pairs(d, value_col, 1, "x", time_col)
    py = _axis_pairs(d, value_col, 1, "y", time_col)
    pair = (
        px.unionByName(py)
        .groupBy(time_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("vi") * F.col("vj")).alias("p_sum"),
            F.sum(F.col("vi") + F.col("vj")).alias("s_sum"),
        )
    )
    base = d.groupBy(time_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(value_col).alias("x_sum"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("xx_sum"),
    )
    j = base.join(pair, time_col)
    m = F.col("x_sum") / F.col("n")
    num = F.col("p_sum") - m * F.col("s_sum") + F.col("n_pairs") * m * m
    den = F.col("xx_sum") - F.col("n") * m * m
    return j.select(
        time_col,
        "n",
        "n_pairs",
        F.round((F.col("n") / F.col("n_pairs")) * num / den, 6).alias("morans_i_r6"),
    )


def getis_ord_gstar(
    df: DataFrame,
    value_col: str,
    time_col: str = "hour",
    lat0: float = LAT0,
    dlat: float = DLAT,
    lon0: float = LON0,
    dlon: float = DLON,
) -> DataFrame:
    """Local Getis-Ord Gi* hotspot statistic per cell and time slice
    (Getis & Ord 1992/1995): queen contiguity INCLUDING self (the
    starred variant), binary weights.  Gi* > 0 marks cells whose 3×3
    neighborhood sum is high relative to the global field — the
    standard hot/cold-spot detector run before siting decisions.

    Gi* = (S_i − m·n_i) / (s · sqrt((N·n_i − n_i²) / (N−1))) with
    S_i the neighborhood sum, n_i the realized neighborhood size
    (edges renormalize, like masks.focal_mean_3x3), m and s the
    global mean / population std per time slice.

    Plan: the focal scatter→gather shape — constant 9× scan-side
    explode, ONE map-side-combined agg on (time, ty, tx), a join back
    on the agg's own key to drop phantom edge targets, and a
    broadcast-sized join of the per-time global aggregate.  No pair
    self-join, no window.  All SUMS (S_i, Σx, Σx², counts) are exact
    dyadic reductions; the post-aggregation scalar algebra divides by
    the mean and takes sqrts, so the statistic rounds to 6 dp (the
    morans_i / cell_area mitigation).
    """
    d = _with_idx(df, lat0, dlat, lon0, dlon)
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    scattered = d.select(
        time_col,
        F.col(value_col).alias("v"),
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("y_idx") + F.lit(dy)).alias("ty"),
                    (F.col("x_idx") + F.lit(dx)).alias("tx"),
                )
                for dy, dx in offs
            ])
        ).alias("t"),
    ).select(time_col, "v", F.col("t.ty").alias("ty"), F.col("t.tx").alias("tx"))
    hood = scattered.groupBy(time_col, "ty", "tx").agg(
        F.sum("v").alias("s_i"),
        F.count(F.lit(1)).cast("long").alias("n_i"),
    )
    base = d.groupBy(time_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(value_col).alias("x_sum"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("xx_sum"),
    )
    cells = d.select(time_col, F.col("y_idx").alias("ty"),
                     F.col("x_idx").alias("tx"))
    j = hood.join(cells, [time_col, "ty", "tx"]).join(
        F.broadcast(base), time_col
    )
    m = F.col("x_sum") / F.col("n")
    s = F.sqrt(F.col("xx_sum") / F.col("n") - m * m)
    den = s * F.sqrt(
        (F.col("n") * F.col("n_i") - F.col("n_i") * F.col("n_i"))
        / (F.col("n") - F.lit(1.0))
    )
    # constant field (or n_i = n = 1) makes the denominator 0 — no
    # spatial structure to test, so Gi* is 0 by convention (and ANSI
    # mode would otherwise raise DIVIDE_BY_ZERO)
    gi = F.when(den > 0, F.round((F.col("s_i") - m * F.col("n_i")) / den, 6)) \
        .otherwise(F.lit(0.0))
    return j.select(
        time_col,
        F.col("ty").alias("y_idx"),
        F.col("tx").alias("x_idx"),
        "n_i",
        gi.alias("gi_r6"),
    )


def ordinary_kriging(
    obs: DataFrame,
    targets: DataFrame,
    value_col: str,
    k: int = 8,
    sill: float = 1.0,
    range_deg: float = 1.5,
    nugget: float = 0.0,
    res: int = 5,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Ordinary kriging — the BLUE interpolator the semivariogram
    feeds (Matheron 1963; the reference leaves it to its users'
    geostats stack, here a first-class operator).  Exponential
    covariance C(h) = sill·exp(−h/range) + nugget·1[h=0], FIXED model
    parameters (fit them from :func:`semivariogram` upstream; fixed
    params keep the operator deterministic and the test pinnable).

    Per target: the k nearest observations (knn.knn_join — ring-pruned
    equi-join, no cross join) form the (k+1)×(k+1) ordinary-kriging
    system [[K, 1], [1ᵀ, 0]]·[w, μ] = [c, 1]; prediction = wᵀy and
    kriging variance = sill − wᵀc − μ.  The dense solve is NumPy
    inside ``applyInPandas`` — k+1 ≤ 9 here, model-sized per group;
    grouping is by target key, so the only shuffles are the kNN
    equi-join and the solve's group exchange.  NOT SQL-expressible
    (matrix inverse), so the registry records the weaker rows-only
    oracle; exactness is pinned by the numpy-twin pytest instead.
    """
    import pandas as pd

    from geodata_spark import knn

    nbrs = knn.knn_join(
        targets.select(lat_col, lon_col),
        obs.select(lat_col, lon_col, value_col),
        k=k, res=res, t_lat=lat_col, t_lon=lon_col,
        s_lat=lat_col, s_lon=lon_col,
    )
    schema = (f"{lat_col} double, {lon_col} double, pred_r6 double, "
              "kvar_r6 double, n_used long")
    vcol = f"{value_col}_src"
    slat, slon = f"{lat_col}_src", f"{lon_col}_src"

    def solve(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("knn_rank")
        t_lat = float(pdf[lat_col].iloc[0])
        t_lon = float(pdf[lon_col].iloc[0])
        xs = pdf[slat].to_numpy(dtype=np.float64)
        ys = pdf[slon].to_numpy(dtype=np.float64)
        v = pdf[vcol].to_numpy(dtype=np.float64)
        n = len(pdf)
        d = np.sqrt((xs[:, None] - xs[None, :]) ** 2
                    + (ys[:, None] - ys[None, :]) ** 2)
        K = sill * np.exp(-d / range_deg) + nugget * np.eye(n)
        A = np.ones((n + 1, n + 1))
        A[:n, :n] = K
        A[n, n] = 0.0
        dt = np.sqrt((xs - t_lat) ** 2 + (ys - t_lon) ** 2)
        c = sill * np.exp(-dt / range_deg)
        w = np.linalg.solve(A, np.append(c, 1.0))
        pred = float(w[:n] @ v)
        # C(0) = sill + nugget (the nugget sits on K's diagonal, so it
        # belongs in the variance term too; ADVICE r7 — no call site
        # passes nugget > 0 today, so existing outputs are unchanged)
        kvar = float((sill + nugget) - w[:n] @ c - w[n])
        return pd.DataFrame(
            [[t_lat, t_lon, round(pred, 6), round(kvar, 6), n]],
            columns=[lat_col, lon_col, "pred_r6", "kvar_r6", "n_used"],
        )

    return nbrs.groupBy(lat_col, lon_col).applyInPandas(solve, schema)
