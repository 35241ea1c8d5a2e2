"""Per-cell model fitting — wind profile extrapolation & interpolation.

Counterpart of the reference ``model/`` subsystem: per-cell regression
of wind speed against log-height (``model/wind/extrapolate.py:38-66``,
numba-parallel lstsq) and per-cell spline interpolation over height
(``model/wind/interpolate.py:59-122``, dask map_blocks + scipy splrep),
with checkpointed parameters and lineage (see lineage.py).

Two implementations of the regression:

- :func:`fit_loglinear_expr` — **closed-form normal equations as
  Catalyst aggregations** (α = cov(ln h, v)/var(ln h)).  Pure JVM hash
  aggregation; the preferred path at scale (no Python, no per-group
  pandas materialization).
- :func:`fit_loglinear_pandas` — grouped ``applyInPandas`` with
  ``np.linalg.lstsq`` per cell, mirroring the reference mechanism
  (U4).  Kept for parity and as the template for fits with no closed
  form.

Estimate (F30): v(h) = α·ln((h − disph)/z0*) with z0* = exp(−β/α)
(``model/wind/extrapolate.py:189-192, 227-230``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt_heights(df: DataFrame, pairs: list[tuple[str, str]],
                 keys: list[str]) -> DataFrame:
    """Wide height/speed columns → long (key…, height, speed) rows.

    ``pairs`` items are (height_expr, speed_col); height_expr may be a
    literal (``'100.0'``) or a column name (``'hlml'``).
    """
    stack_args = []
    for h, v in pairs:
        stack_args.append(f"CAST({h} AS DOUBLE)")
        stack_args.append(f"CAST({v} AS DOUBLE)")
    expr = f"stack({len(pairs)}, {', '.join(stack_args)}) AS (height, speed)"
    return df.selectExpr(*keys, expr)


def fit_loglinear_expr(long_df: DataFrame, keys: list[str]) -> DataFrame:
    """v = α·ln(h) + β per key group — closed-form via one hash agg.

    Normal equations over (x=ln h, y=v):
        α = (Σxy − Σx·Σy/n) / (Σx² − (Σx)²/n),  β = ȳ − α·x̄
    plus rms residual.  Matches np.linalg.lstsq to float tolerance.
    """
    x = F.log(F.col("height"))
    y = F.col("speed")
    agg = long_df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    denom = F.col("sxx") - F.col("sx") * F.col("sx") / n
    alpha = F.when(
        denom != 0, (F.col("sxy") - F.col("sx") * F.col("sy") / n) / denom
    ).otherwise(F.lit(0.0))
    beta = F.col("sy") / n - alpha * F.col("sx") / n
    # rms residual: sqrt(max(0, Σ(y−αx−β)²)/n) expanded algebraically
    sse = (
        F.col("syy")
        + alpha * alpha * F.col("sxx")
        + n * beta * beta
        - 2 * alpha * F.col("sxy")
        - 2 * beta * F.col("sy")
        + 2 * alpha * beta * F.col("sx")
    )
    return agg.select(
        *keys,
        alpha.alias("alpha"),
        beta.alias("beta"),
        F.sqrt(F.greatest(sse, F.lit(0.0)) / n).alias("rms"),
        F.col("n"),
    )


def fit_loglinear_pandas(long_df: DataFrame, keys: list[str]) -> DataFrame:
    """Same fit via grouped applyInPandas + np.linalg.lstsq (U4 parity)."""
    schema = ", ".join(f"{k} double" for k in keys) + ", alpha double, beta double, rms double, n long"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.log(pdf["height"].to_numpy(np.float64))
        y = pdf["speed"].to_numpy(np.float64)
        A = np.column_stack([x, np.ones_like(x)])
        (a, b), *_ = np.linalg.lstsq(A, y, rcond=None)
        rms = float(np.sqrt(np.mean((y - a * x - b) ** 2)))
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out.update({"alpha": [a], "beta": [b], "rms": [rms], "n": [len(pdf)]})
        return pd.DataFrame(out)

    return long_df.groupBy(*keys).applyInPandas(fit, schema=schema)


def estimate_loglinear(params: DataFrame, to_height: float,
                       disph_col: str | None = None) -> DataFrame:
    """F30: v(h) = α·ln((h − disph)/exp(−β/α)); disph defaults to 0."""
    h = F.lit(float(to_height)) - (F.col(disph_col) if disph_col else F.lit(0.0))
    v = F.col("alpha") * F.log(h / F.exp(-F.col("beta") / F.col("alpha")))
    return params.withColumn(f"wnd{int(to_height)}m_est", v)


# ---------------------------------------------------------------------------
# natural cubic spline per cell (A8)
# ---------------------------------------------------------------------------

def _natural_cubic_coeffs(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Natural cubic spline second-derivative knots (tridiagonal solve).

    Pure numpy (no scipy in the image); interpolating spline with
    natural boundary (M0 = Mn = 0).  Returns M (second derivatives).
    """
    n = len(x)
    h = np.diff(x)
    rhs = np.zeros(n)
    rhs[1:-1] = 6.0 * ((y[2:] - y[1:-1]) / h[1:] - (y[1:-1] - y[:-2]) / h[:-1])
    diag = np.ones(n)
    diag[1:-1] = 2.0 * (h[:-1] + h[1:])
    lower = np.zeros(n - 1)
    upper = np.zeros(n - 1)
    lower[:-1] = h[:-1]
    upper[1:] = h[1:]
    lower[-1] = 0.0
    upper[0] = 0.0
    # Thomas algorithm
    c = upper.copy()
    d = rhs.copy()
    b = diag.copy()
    for i in range(1, n):
        w = lower[i - 1] / b[i - 1]
        b[i] -= w * c[i - 1] if i - 1 < n - 1 else 0.0
        d[i] -= w * d[i - 1]
    M = np.zeros(n)
    M[-1] = d[-1] / b[-1]
    for i in range(n - 2, -1, -1):
        M[i] = (d[i] - (c[i] * M[i + 1] if i < n - 1 else 0.0)) / b[i]
    return M


def spline_eval_np(x: np.ndarray, y: np.ndarray, M: np.ndarray, t: float) -> float:
    """Evaluate the natural cubic spline at t (clamped to knot range)."""
    t = min(max(t, x[0]), x[-1])
    i = int(np.clip(np.searchsorted(x, t) - 1, 0, len(x) - 2))
    h = x[i + 1] - x[i]
    a, b = (x[i + 1] - t) / h, (t - x[i]) / h
    return float(
        a * y[i]
        + b * y[i + 1]
        + ((a**3 - a) * M[i] + (b**3 - b) * M[i + 1]) * h * h / 6.0
    )


def fit_spline_pandas(long_df: DataFrame, keys: list[str], eval_heights: list[float]) -> DataFrame:
    """Per-cell natural-cubic-spline fit over height + evaluation (A8).

    Grouped applyInPandas; rows sorted by height inside the group
    (the reference sorts before splrep — interpolate.py:165-169).
    Output: keys + wnd{h}m_spl per requested height.
    """
    cols = [f"spl_{int(h)}" for h in eval_heights]
    schema = ", ".join(f"{k} double" for k in keys) + ", " + ", ".join(
        f"{c} double" for c in cols
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("height")
        x = pdf["height"].to_numpy(np.float64)
        y = pdf["speed"].to_numpy(np.float64)
        out = {k: [pdf[k].iloc[0]] for k in keys}
        if len(x) >= 3:
            M = _natural_cubic_coeffs(x, y)
            for h, c in zip(eval_heights, cols):
                out[c] = [spline_eval_np(x, y, M, h)]
        else:
            for h, c in zip(eval_heights, cols):
                out[c] = [float(np.interp(h, x, y))]
        return pd.DataFrame(out)

    return long_df.groupBy(*keys).applyInPandas(fit, schema=schema)


def theil_sen_mk(
    df: DataFrame,
    keys: list[str],
    t_col: str = "hour",
    y_col: str = "temperature",
) -> DataFrame:
    """Per-group Theil–Sen robust slope + Mann–Kendall trend test —
    the standard NONPARAMETRIC trend pair for climate series (robust
    where OLS — model.fit_loglinear's normal equations — is dragged by
    outliers; Sen 1968, Mann 1945).

    Theil–Sen slope = median of all pairwise slopes (y_j−y_i)/(t_j−t_i),
    t_j > t_i.  Mann–Kendall S = Σ sign(y_j − y_i) over the same pairs
    (pure integer), with the standard TIE-CORRECTED variance
    Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18 over the
    y-value tie groups g; z = (S∓1)/√Var, 0 when Var ≤ 0 (all values
    tied).  ``n`` is counted from the input, never inverted from the
    pair count, so duplicate timestamps cannot corrupt the variance
    (same-t pairs are excluded from S and the slope set, the
    conservative convention; for heavy time-duplication resample
    first).

    Exactness: every pairwise slope is ONE IEEE division of dyadic
    values — identical doubles in both engines — and the median of an
    identical multiset interpolates identically (the doc_quantiles
    pinning), so ``slope_ts`` needs NO rounding; S, n and the tie term
    are integers; only z's √ is rounded (6 dp).

    Scale shape: pairs are generated WITHIN each group by a self-join
    on the group keys — O(T²) per group where T is the series length
    (48 here; bounded by the time range, never by table size).  For
    long series at 100 TB, pre-aggregate to a coarser time grain
    first (resample_time) — documented contract, matching standard
    MK practice of annualizing.  The n/tie aggregates are keyed the
    same way and join a group-count-sized table.
    """
    a = df.select(*keys, F.col(t_col).alias("_ti"), F.col(y_col).alias("_yi"))
    b = df.select(*keys, F.col(t_col).alias("_tj"), F.col(y_col).alias("_yj"))
    pairs = a.join(b, keys).filter(F.col("_tj") > F.col("_ti"))
    slope = (F.col("_yj") - F.col("_yi")) / (
        F.col("_tj") - F.col("_ti")
    ).cast("double")
    sgn = F.signum(F.col("_yj") - F.col("_yi")).cast("long")
    pagg = (
        pairs.withColumn("_slope", slope).withColumn("_sgn", sgn)
        .groupBy(*keys)
        .agg(
            F.expr("percentile(_slope, 0.5D)").alias("slope_ts"),
            F.sum("_sgn").cast("long").alias("s_mk"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
    )
    t = F.col("_t")
    ties = (
        df.groupBy(*keys, y_col).agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(*keys)
        .agg(
            F.sum("_t").cast("long").alias("n"),
            F.sum(t * (t - 1) * (2 * t + 5)).cast("long").alias("tie_term"),
        )
    )
    j = pagg.join(ties, keys)
    n = F.col("n")
    var = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("double") / 18.0
    z = (
        F.when((F.col("s_mk") > 0) & (var > 0), (F.col("s_mk") - 1) / F.sqrt(var))
        .when((F.col("s_mk") < 0) & (var > 0), (F.col("s_mk") + 1) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        *keys, "slope_ts", "s_mk", "n_pairs", "n",
        F.round(z, 6).alias("z_mk_r6"),
    )
