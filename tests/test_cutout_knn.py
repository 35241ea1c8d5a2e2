from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from geodata_spark import knn
from geodata_spark.cutout import Cutout, coarsen, resample_time
from geodata_spark.synth import synth_grid_vars


def test_coarsen_mean_blocks(spark):
    df = synth_grid_vars(spark, nhours=2, ny=4, nx=4, variables=("temperature",))
    out = coarsen(df, 2, 2, "mean", value_cols=["temperature"]).toPandas()
    p = df.toPandas()
    p["yb"] = ((p.lat - p.lat.min()) / 0.5 // 2).astype(int)
    p["xb"] = ((p.lon - p.lon.min()) / 0.625 // 2).astype(int)
    want = p.groupby(["hour", "yb", "xb"])["temperature"].mean()
    assert len(out) == 2 * 2 * 2
    got = out.set_index(["hour"]).sort_values(["lat", "lon"])
    assert np.isclose(sorted(out.temperature), sorted(want)).all()


def test_coarsen_hierarchy_and_geometry(spark):
    df = synth_grid_vars(spark, nhours=1, ny=6, nx=6, variables=("temperature",))
    co = Cutout(df)
    c2 = co.coarsen(2, 3)
    assert np.isclose(c2.dlat, 1.0) and np.isclose(c2.dlon, 1.875)
    assert c2.df.count() == 3 * 2  # 6/2 x 6/3


def test_resample_time_daily(spark):
    df = synth_grid_vars(spark, nhours=48, ny=2, nx=2, variables=("temperature",))
    out = resample_time(df, 24, "mean", value_cols=["temperature"]).toPandas()
    assert len(out) == 2 * 4  # 2 days x 4 cells
    p = df.toPandas()
    p["bucket"] = p.hour // 24
    want = p.groupby(["bucket", "lat", "lon"])["temperature"].mean().reset_index()
    m = out.merge(want, on=["bucket", "lat", "lon"], suffixes=("_g", "_w"))
    assert np.allclose(m.temperature_g, m.temperature_w)


def test_grid_area_positive_and_decreasing_with_lat(spark):
    df = synth_grid_vars(spark, nhours=1, ny=6, nx=2, variables=("temperature",))
    co = Cutout(df).with_grid_area()
    p = co.df.select("lat", "area_km2").distinct().toPandas().sort_values("lat")
    assert (p.area_km2 > 0).all()
    assert (np.diff(p.area_km2) < 0).all()  # northern hemisphere: shrinks northward
    # MERRA2-ish 0.5x0.625 cell at ~18N is ~3.6e3 km2
    assert 3000 < p.area_km2.iloc[0] < 4000


def test_grid_cells_box(spark):
    df = synth_grid_vars(spark, nhours=1, ny=2, nx=2, variables=("temperature",))
    cellsdf = Cutout(df).grid_cells().toPandas()
    assert len(cellsdf) == 4
    r = cellsdf.iloc[0]
    assert np.isclose(r.lat_max - r.lat_min, 0.5)
    assert np.isclose(r.lon_max - r.lon_min, 0.625)


def _brute_knn(tp, sp, k):
    out = []
    for _, t in tp.iterrows():
        d2 = (sp.lat - t.lat) ** 2 + (sp.lon - t.lon) ** 2
        order = np.lexsort((sp.lon, sp.lat, d2))
        for rank, idx in enumerate(order[:k], 1):
            out.append((t.lat, t.lon, rank, sp.lat.iloc[idx], sp.lon.iloc[idx], d2.iloc[idx]))
    return set((a, b, r, c, d, round(e, 10)) for a, b, r, c, d, e in out)


def test_knn_join_vs_brute_force(spark):
    src = synth_grid_vars(spark, nhours=1, ny=8, nx=8, variables=("temperature",)).select(
        "lat", "lon", "temperature"
    )
    tgts = spark.createDataFrame(
        [(20.03125 + 1.5 * i, 74.046875 + 1.75 * j) for i in range(3) for j in range(3)],
        ["lat", "lon"],
    )
    out = knn.knn_join(tgts, src, k=4, res=6).toPandas()
    got = set(
        (r.lat, r.lon, r.knn_rank, r.lat_src, r.lon_src, round(r.knn_dist2, 10))
        for _, r in out.iterrows()
    )
    want = _brute_knn(tgts.toPandas(), src.toPandas(), 4)
    assert got == want


def test_nearest_regrid(spark):
    src = synth_grid_vars(spark, nhours=1, ny=8, nx=8, variables=("temperature",)).select(
        "lat", "lon", "temperature"
    )
    tgts = spark.createDataFrame([(20.26, 73.33), (21.9, 75.0)], ["lat", "lon"])
    out = knn.nearest_regrid(tgts, src, ["temperature"], res=6).toPandas()
    assert len(out) == 2
    sp = src.toPandas()
    for _, r in out.iterrows():
        d2 = (sp.lat - r.lat) ** 2 + (sp.lon - r.lon) ** 2
        nearest = sp.iloc[int(np.argmin(d2))]
        assert np.isclose(r.temperature, nearest.temperature)


def test_idw_interpolate_exact_hit_dominates(spark):
    src = synth_grid_vars(spark, nhours=1, ny=4, nx=4, variables=("temperature",)).select(
        "lat", "lon", "temperature"
    )
    sp = src.toPandas()
    # target exactly on a source point -> IDW ~= that point's value
    t0 = sp.iloc[5]
    tgts = spark.createDataFrame([(float(t0.lat), float(t0.lon))], ["lat", "lon"])
    out = knn.idw_interpolate(tgts, src, "temperature", k=4, res=6).toPandas()
    assert np.isclose(out.idw_value.iloc[0], t0.temperature, rtol=1e-6)


def test_radius_join_vs_brute_force(spark):
    """Ring-cell candidate generation must be complete: radius_join
    returns exactly the pairs a cross-join distance filter returns,
    including a radius big enough to need ring > 1 at res 8."""
    src = synth_grid_vars(spark, nhours=1, ny=10, nx=10, variables=("temperature",)).select(
        "lat", "lon", "temperature"
    )
    tgts = spark.createDataFrame(
        [(20.26, 74.33), (21.875, 75.9375), (19.0, 77.0)], ["lat", "lon"]
    )
    for radius, res in ((1.0, 7), (1.75, 8)):  # ring 1 and ring 4
        got = (
            knn.radius_join(tgts, src, radius_deg=radius, res=res)
            .select("lat", "lon", "lat_src", "lon_src")
            .toPandas()
        )
        sp, tp = src.toPandas(), tgts.toPandas()
        want = {
            (t.lat, t.lon, s.lat, s.lon)
            for _, t in tp.iterrows()
            for _, s in sp.iterrows()
            if (t.lat - s.lat) ** 2 + (t.lon - s.lon) ** 2 <= radius * radius
        }
        assert set(map(tuple, got.values)) == want and len(got) == len(want)


def test_bilinear_regrid_matches_numpy(spark):
    """4-corner weighted sum == numpy bilinear on the same grid, and an
    on-grid target returns the grid value exactly."""
    ny, nx = 8, 9
    src = synth_grid_vars(spark, nhours=1, ny=ny, nx=nx, variables=("temperature",)).select(
        "lat", "lon", "temperature"
    )
    sp = src.toPandas().sort_values(["lat", "lon"])
    grid = sp.temperature.to_numpy().reshape(ny, nx)
    lat0, dlat, lon0, dlon = 18.25, 0.5, 73.3125, 0.625
    # fractional cells: dyadic off-grid, on-grid, and edge-clamped
    fracs = [(1.25, 2.5), (3.0, 4.0), (6.75, 7.875), (0.0, 0.25)]
    tgts_xy = [(lat0 + fy * dlat, lon0 + fx * dlon) for fy, fx in fracs]
    tgts = spark.createDataFrame(tgts_xy, ["lat", "lon"])
    out = (
        knn.bilinear_regrid(
            tgts, src, ["temperature"], lat0=lat0, dlat=dlat,
            lon0=lon0, dlon=dlon, ny=ny, nx=nx,
        )
        .toPandas()
        .set_index(["lat", "lon"])
    )
    for (fy, fx), (tlat, tlon) in zip(fracs, tgts_xy):
        i0, j0 = min(int(fy), ny - 2), min(int(fx), nx - 2)
        ty, tx = fy - i0, fx - j0
        want = (
            grid[i0, j0] * (1 - ty) * (1 - tx)
            + grid[i0, j0 + 1] * (1 - ty) * tx
            + grid[i0 + 1, j0] * ty * (1 - tx)
            + grid[i0 + 1, j0 + 1] * ty * tx
        )
        row = out.loc[(tlat, tlon)]
        assert row.temperature_bl == want          # dyadic-exact
        assert row.w_sum == 1.0
    # the on-grid target (ty=tx=0) collapsed to a single corner
    assert out.loc[tgts_xy[1]].n_corners == 1


def test_climatology_anomaly_window(spark):
    """Anomalies sum to zero per (cell, phase) group and clim is the
    exact 2-sample mean with a 48 h / 24 h-period input."""
    from geodata_spark.cutout import climatology_anomaly

    gv = synth_grid_vars(spark, nhours=48, ny=3, nx=3, variables=("temperature",))
    out = climatology_anomaly(gv, "temperature", period_hours=24).toPandas()
    assert len(out) == 48 * 9
    g = out.groupby(["lat", "lon", "phase"])
    assert (g.temperature_anom.sum().abs() < 1e-12).all()
    assert (g.temperature_clim.nunique() == 1).all()
    m = g.temperature.mean()
    c = g.temperature_clim.first()
    assert (m == c).all()                          # n=2 -> exact mean


def test_conservative_regrid_numpy_and_conservation(spark):
    """Non-integer-factor (1.5×, 1.6×) conservative regrid: weights
    from a numpy reconstruction of the overlap algebra match, the
    GLOBAL weighted sum is conserved exactly (the operator's defining
    property), and the plan is join-free (scan-side explode + one
    agg)."""
    import numpy as np

    from geodata_spark.cutout import conservative_regrid

    gv = synth_grid_vars(spark, nhours=1, ny=6, nx=5, variables=("temperature",))
    out = conservative_regrid(
        gv, dt_lat=0.75, dt_lon=1.0, value_cols=["temperature"], unit=0.0625
    )
    # scale shape: no join anywhere, exactly one shuffle (checked
    # pre-execution — the post-AQE string prints the Exchange twice,
    # once per final/initial plan section)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and plan.count("Exchange") == 1
    pdf = out.toPandas().set_index(["jy", "jx"]).sort_index()
    src = gv.toPandas()

    # numpy twin: integer-unit overlap weights (sy=8, ty=12, sx=10, tx=16)
    acc: dict[tuple[int, int], list[float]] = {}
    for r in src.itertuples():
        iy = round((r.lat - 18.25) / 0.5)
        ix = round((r.lon - 73.3125) / 0.625)
        ylo, xlo = iy * 8, ix * 10
        for jy in range(ylo // 12, (ylo + 7) // 12 + 1):
            wy = min(ylo + 8, (jy + 1) * 12) - max(ylo, jy * 12)
            for jx in range(xlo // 16, (xlo + 9) // 16 + 1):
                wx = min(xlo + 10, (jx + 1) * 16) - max(xlo, jx * 16)
                s = acc.setdefault((jy, jx), [0.0, 0.0])
                s[0] += wy * wx
                s[1] += wy * wx * r.temperature
    assert set(pdf.index) == set(acc)
    for (jy, jx), (w, sv) in acc.items():
        row = pdf.loc[(jy, jx)]
        assert row.w_units == w
        assert row.temperature == sv / w          # bit-exact: same single division
    # conservation: total weighted mass is preserved exactly (dyadic)
    assert pdf.w_units.sum() == 6 * 5 * 8 * 10
    assert (pdf.w_units * pdf.temperature).sum() == src.temperature.sum() * 80.0
    # target centers land on the coarse lattice
    assert np.allclose(sorted(pdf.lat.unique()), 18.375 + 0.75 * np.arange(4))


def test_radius_join_gc_vs_brute_force(spark):
    """Haversine radius query equals the brute-force cross-join
    answer — proves the cos(lat)-widened planar prefilter is a true
    superset (a pure-planar prefilter FAILS this at 150 km: an
    east-west hit at lat 24° spans radius/cos(24°) planar degrees)."""
    import math

    from geodata_spark.knn import radius_join_gc
    from geodata_spark.zonal import EARTH_R_KM

    def hav_km(lat1, lon1, lat2, lon2):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dphi, dlam = p2 - p1, math.radians(lon2 - lon1)
        h = math.sin(dphi / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlam / 2) ** 2
        return 2 * EARTH_R_KM * math.asin(math.sqrt(min(1.0, h)))

    tgt = [(24.0, 80.0)]
    # ring of sources straddling the 150 km boundary in all directions,
    # including the due-east points a planar prefilter would prune
    srcs = [
        (24.0 + dlat, 80.0 + dlon)
        for dlat in (-1.5, -1.4, -0.5, 0.0, 0.5, 1.3, 1.5)
        for dlon in (-1.6, -1.45, -0.7, 0.0, 0.7, 1.45, 1.6)
    ]
    t = spark.createDataFrame(tgt, ["lat", "lon"])
    s = spark.createDataFrame(srcs, ["lat", "lon"])
    got = {
        (r.lat_src, r.lon_src): r.dist_km_r6
        for r in radius_join_gc(t, s, radius_km=150.0, res=7, max_abs_lat=26.0).collect()
    }
    want = {
        (la, lo): round(hav_km(24.0, 80.0, la, lo), 6)
        for la, lo in srcs
        if round(hav_km(24.0, 80.0, la, lo), 6) <= 150.0
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6             # same formula, libm ulps only
    # the boundary cases actually exercise both sides of the cut
    assert 0 < len(want) < len(srcs)
    # due-east 1.45-deg hit exists: planar dist 1.45 > angular radius 1.35
    assert (24.0, 81.45) in want


def test_knn_join_gc_vs_brute_force(spark):
    """Geodesic kNN equals brute-force haversine ranking, including
    the case where the planar-degree order and the km order DISAGREE
    (an east-west neighbor is fewer planar degrees but more km than a
    north-south one at mid latitude... the reverse: lon degrees are
    shorter km, so a 1.0-deg-east point is NEARER in km than a
    0.95-deg-north point at lat 40 — planar ranking gets it wrong)."""
    import math

    from geodata_spark.knn import knn_join_gc
    from geodata_spark.zonal import EARTH_R_KM

    def hav(lat1, lon1, lat2, lon2):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        h = (math.sin((p2 - p1) / 2) ** 2
             + math.cos(p1) * math.cos(p2)
             * math.sin(math.radians(lon2 - lon1) / 2) ** 2)
        return 2 * EARTH_R_KM * math.asin(math.sqrt(min(1.0, h)))

    tgt = (40.0, 80.0)
    srcs = [
        (40.95, 80.0),   # 0.95 deg north  ≈ 105.6 km
        (40.0, 81.0),    # 1.00 deg east   ≈  85.2 km (cos 40 ≈ 0.766)
        (40.4, 80.4),
        (41.3, 80.0),
        (40.0, 82.5),    # beyond planar-naive but test radius covers it
    ]
    t = spark.createDataFrame([tgt], ["lat", "lon"])
    s = spark.createDataFrame(srcs, ["lat", "lon"])
    got = [
        (r.nn_rank, r.lat_src, r.lon_src, r.dist_km_r6)
        for r in knn_join_gc(t, s, k=3, max_radius_km=250.0, res=7,
                             max_abs_lat=42.0).collect()
    ]
    got.sort()
    want = sorted(
        (round(hav(*tgt, la, lo), 6), la, lo) for la, lo in srcs
    )[:3]
    assert [(g[1], g[2]) for g in got] == [(w[1], w[2]) for w in want]
    for g, wv in zip(got, want):
        assert abs(g[3] - wv[0]) < 1e-6
    # the planar-vs-geodesic disagreement is actually exercised:
    # the 1.0-deg-east point outranks the 0.95-deg-north point in km
    # although it is MORE planar degrees away
    ranks = {(g[1], g[2]): g[0] for g in got}
    assert ranks[(40.0, 81.0)] < ranks[(40.95, 80.0)]


def test_conservative_regrid_negative_edges_conserve(spark):
    """Regression: a grid origin ABOVE the data's minimum produces
    negative integer edges — floor (not truncate-toward-zero) division
    must still conserve total mass and emit the negative target row."""
    from geodata_spark.cutout import conservative_regrid

    rows = [(0, 18.25 + 0.5 * y, 73.3125 + 0.625 * x, 16.0 + y + x)
            for y in range(-2, 3) for x in range(-2, 3)]
    df = spark.createDataFrame(rows, "hour long, lat double, lon double, v double")
    out = conservative_regrid(
        df, dt_lat=0.75, dt_lon=1.0, value_cols=["v"], unit=0.0625
    ).toPandas()
    assert out.jy.min() < 0 and out.jx.min() < 0
    assert out.w_units.sum() == 25 * 8 * 10              # total mass conserved
    assert (out.w_units * out.v).sum() == sum(r[3] for r in rows) * 80.0
