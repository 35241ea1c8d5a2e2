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
