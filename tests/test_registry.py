"""Registry hygiene: the driver's correctness sweep snapshots only the
FIRST 50 ``queries.QUERIES`` entries (observed: CORRECTNESS_r03/r04
carry the identical 50 keys while the registry held 65).  These tests
pin the round-5 ordering contract (VERDICT r4 "Next round" #1/#8):

1. every key OUTSIDE the 50-row window is explicitly listed in
   COVERAGE.md's "Pending driver sweep" section, so an unswept query
   can never again go unnoticed for a round;
2. the 15 queries rotated INTO the window this round are inside it;
3. QUERIES and ORACLES stay key-aligned (every query oracle-paired).

No Spark session needed — pure registry introspection.
"""

from __future__ import annotations

import re
from pathlib import Path

from geodata_spark.queries import ORACLES, QUERIES

DRIVER_WINDOW = 50
REPO = Path(__file__).resolve().parents[1]

# round 7 (VERDICT r6 "Next round" #1): the round-6 tail trio takes
# its first driver row.  Displaced to the tail: span_sequence (6 green
# driver rows r1-r6), tpch_bigjoin_revenue (5 green rows, r6 among
# them), cell_autocorr (green r6; cell_acf — in-window — strictly
# generalizes it, covering lag 1 among its 4 lags).
ROTATED_IN_R7 = {
    "seasonal_decompose", "cell_corr", "cell_acf",
}

# round-7 window survivors that must NOT silently fall out: every
# query that earned its only green driver row in r6 keeps its seat
# until it has locked history (two driver rows) or a family survivor.
ROTATED_IN_R6 = {
    "hex_rollup", "hex_knn", "zonal_wavg_hex",
    "tfidf_top_terms", "dedup_clusters", "doc_quantiles",
    "hex_rollup_multi", "zorder_stats",
    "regrid_bilinear", "climatology_anomaly", "geo_radius",
    "events_sessions_swin", "terrain_slope",
    "events_pivot", "rolling_mean", "zone_stats", "table_stats",
    "events_ntile",
    "doc_chunks", "top_bigrams", "cell_mad_outliers",
    "terrain_aspect", "cell_ewma",
    "regrid_conservative", "doc_repetition", "unigram_logprob",
    "geo_radius_gc",
    "semivariogram", "morans_i", "events_funnel", "wind_rose",
    "focal_mean", "gumbel_return", "psi_drift", "mixture_sample",
    "watershed", "boilerplate", "knn_gc",
    "retention_cohorts", "event_lift", "zone_trend", "hillshade",
    "kmeans", "theilsen_mk", "cusum_changepoint", "diurnal_harmonic",
}


def _pending_sweep_names() -> set[str]:
    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"\*\*Pending driver sweep\*\*(.*?)(?:\n#|\Z)", text, re.S)
    assert m, "COVERAGE.md lost its 'Pending driver sweep' section"
    return set(re.findall(r"^- (\w+)", m.group(1), re.M))


def test_unswept_keys_are_documented():
    tail = list(QUERIES)[DRIVER_WINDOW:]
    documented = _pending_sweep_names()
    missing = [k for k in tail if k not in documented]
    assert not missing, (
        f"QUERIES keys outside the driver's {DRIVER_WINDOW}-row sweep window "
        f"are not listed under 'Pending driver sweep' in COVERAGE.md: {missing}"
    )


def test_round7_rotation_inside_window():
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    out = (ROTATED_IN_R7 | ROTATED_IN_R6) - window
    assert not out, f"rotated-in queries fell back out of the window: {sorted(out)}"


def test_documented_pending_keys_exist():
    unknown = _pending_sweep_names() - set(QUERIES)
    assert not unknown, f"COVERAGE.md pending-sweep lists unknown queries: {sorted(unknown)}"


# Queries with intentionally NO SQL oracle (non-SQL-expressible; the
# driver records the weaker rows-only check).  kriging_interp's
# ordinary-kriging solve is a matrix inverse — DuckDB cannot express
# it; exactness is pinned by the numpy-twin pytest in
# tests/test_geostats.py instead (documented in COVERAGE.md).
ROWS_ONLY: set[str] = {"kriging_interp"}


def test_every_query_is_oracle_paired():
    assert set(QUERIES) - ROWS_ONLY == set(ORACLES)
    assert not (set(ORACLES) & ROWS_ONLY), "rows-only query gained an oracle: update ROWS_ONLY"
