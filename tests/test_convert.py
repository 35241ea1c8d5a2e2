"""Physics oracle tests: every convert operator vs a straight numpy
port of the reference formulas (same constants, same branch structure).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geodata_spark import convert as C
from geodata_spark import formulas as FM
from geodata_spark.synth import synth_grid_vars


@pytest.fixture(scope="module")
def gv(spark):
    df = synth_grid_vars(spark, nhours=24, ny=6, nx=5)
    return df, df.toPandas().sort_values(["hour", "lat", "lon"]).reset_index(drop=True)


def _sorted_col(df, col):
    return (
        df.toPandas()
        .sort_values(["hour", "lat", "lon"])
        .reset_index(drop=True)[col]
        .to_numpy()
    )


# ---------------------------------------------------------------------------
# numpy twins (ported from /root/reference formulas; cited per function)
# ---------------------------------------------------------------------------

def np_log_ratio(v, to_h, from_h, rough):  # wind.py:36-52
    r = np.where(rough <= 0.0, 0.0002, rough)
    return v * (np.log(to_h / r) / np.log(from_h / r))


def np_log_law(v, to_h, from_h, ustar, disph):  # wind.py:55-69
    return v + ustar / 0.4 * np.log((to_h - disph) / from_h)


def np_solar_position(hour, lat, lon):  # pv/solar_position.py:18-97
    n = 4017.5 + hour / 24.0
    L = 280.460 + 0.9856474 * n
    g = np.deg2rad(357.528 + 0.9856003 * n)
    ell = np.deg2rad(L + 1.915 * np.sin(g) + 0.020 * np.sin(2 * g))
    ep = np.deg2rad(23.439 - 4e-7 * n)
    ra = np.arctan2(np.cos(ep) * np.sin(ell), np.cos(ell))
    lmst = (6.697375 + (hour % 24) + 0.0657098242 * n) * 15.0 + lon
    h = (np.deg2rad(lmst) - ra + np.pi) % (2 * np.pi) - np.pi
    dec = np.arcsin(np.sin(ep) * np.sin(ell))
    latr = np.deg2rad(lat)
    alt = np.arcsin(
        np.clip(np.sin(latr) * np.sin(dec) + np.cos(latr) * np.cos(dec) * np.cos(h), -1, 1)
    )
    az = np.arccos(
        np.clip((np.sin(dec) * np.cos(latr) - np.cos(dec) * np.sin(latr) * np.cos(h)) / np.cos(alt), -1, 1)
    )
    az = np.where(h <= 0, az, 2 * np.pi - az)
    return alt, az, g


def np_pv_simple_bofinger(p, panel, toa_from_var=True):
    """convert_pv with trigon_model=simple over the pandas grid table."""
    hour = p["hour"].to_numpy(float)
    lat = p["lat"].to_numpy(float)
    lon = p["lon"].to_numpy(float)
    alt, az, g = np_solar_position(hour, lat, lon)
    toa = p["influx_toa"].to_numpy(float) if toa_from_var else 1366.1 * (1 + 0.033 * np.cos(g)) * np.sin(alt)
    # orientation latitude_optimal (pv/orientation.py:40-78)
    latr = np.deg2rad(lat)
    slope = np.where(
        latr <= np.deg2rad(25), 0.87 * latr,
        np.where(latr <= np.deg2rad(50), 0.76 * latr + np.deg2rad(0.31), np.deg2rad(40.0)),
    )
    saz = np.deg2rad(180.0)
    cosinc = np.maximum(
        0.0, np.sin(slope) * np.cos(alt) * np.cos(saz - az) + np.cos(slope) * np.sin(alt)
    )
    # irradiation, simple trigon (pv/irradiation.py:164-189)
    direct = np.clip(p["influx_direct"].to_numpy(float), 0.0, toa)
    diffuse = np.clip(p["influx_diffuse"].to_numpy(float), 0.0, toa - direct)
    albedo = p["albedo"].to_numpy(float)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = cosinc / np.sin(alt)
        direct_t = k * direct
        influx = direct + diffuse
        diffuse_t = (1.0 + np.cos(slope)) / 2.0 * diffuse + albedo * influx * ((1.0 - np.cos(slope)) / 2.0)
    total = np.nan_to_num(direct_t) + np.nan_to_num(diffuse_t)
    total = np.where((alt < np.deg2rad(1.0)) | (direct + diffuse <= 0.01), 0.0, total)
    # bofinger panel (solar_panel_model.py:64-89)
    pc = panel
    t_amb = p["temperature"].to_numpy(float)
    frac = (pc["NOCT"] - pc["Tamb"]) / pc["Intc"]
    with np.errstate(divide="ignore", invalid="ignore"):
        eta_ref = pc["A"] + pc["B"] * total + pc["C"] * np.log(total)
        eta = (
            eta_ref
            * (1.0 + pc["D"] * (frac * total + (t_amb - pc["Tstd"])))
            / (1.0 + pc["D"] * frac / pc["ta"] * eta_ref * total)
        )
    capacity = (pc["A"] + pc["B"] * 1000.0 + pc["C"] * np.log(1000.0)) * 1e3
    power = total * eta * (pc["inverter_efficiency"] / capacity)
    power = np.where(total < pc["threshold"], 0.0, power)
    return total, power


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_interp_curve_matches_np(spark):
    t = C.TURBINE_SUZLON_S82
    vs = [0.0, 2.9, 3.0, 3.5, 7.77, 13.99, 14.0, 15.0, 19.999, 20.0, 20.1, 35.0, -1.0]
    df = spark.createDataFrame([(v,) for v in vs], ["v"])
    got = _col = [
        r.p for r in df.select(F.expr(FM.interp_curve("v", t["V"], t["POW"])).alias("p")).collect()
    ]
    want = np.interp(vs, t["V"], t["POW"])
    assert np.allclose(got, want), (got, list(want))


def test_windspd_log_ratio(gv, spark):
    df, p = gv
    out = C.windspd(df, 79.0, extrap="log_ratio", from_height=100)
    got = _sorted_col(out, "windspd")
    want = np_log_ratio(p["wnd100m"].to_numpy(), 79.0, 100.0, p["roughness"].to_numpy())
    assert np.allclose(got, want, rtol=1e-12)


def test_windspd_existing_height_shortcircuit(gv):
    df, p = gv
    out = C.windspd(df, 100.0, available_heights=(100,))
    got = _sorted_col(out, "windspd")
    assert np.allclose(got, p["wnd100m"].to_numpy())


def test_windspd_var_height_log_law(gv):
    df, p = gv
    out = C.windspd(df, 79.0, extrap="log_law", var_height="lml", available_heights=())
    got = _sorted_col(out, "windspd")
    want = np_log_law(
        p["wndlml"].to_numpy(), 79.0, p["hlml"].to_numpy(), p["ustar"].to_numpy(), p["disph"].to_numpy()
    )
    assert np.allclose(got, want, rtol=1e-12)


def test_wind_power_curve(gv):
    df, p = gv
    t = C.TURBINE_SUZLON_S82
    out = C.wind(df, t, extrap="log_ratio", from_height=100)
    got = _sorted_col(out, "wind")
    hub = np_log_ratio(p["wnd100m"].to_numpy(), 79.0, 100.0, p["roughness"].to_numpy())
    want = np.interp(hub, t["V"], np.array(t["POW"]) / t["P"])
    assert np.allclose(got, want, rtol=1e-10)
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_windwpd(gv):
    df, p = gv
    out = C.windwpd(df, 100.0)  # short-circuit to wnd100m
    got = _sorted_col(out, "windwpd")
    want = 0.5 * p["rhoa"].to_numpy() * p["wnd100m"].to_numpy() ** 3
    assert np.allclose(got, want, rtol=1e-12)


def test_temperature_and_pm25(gv):
    df, p = gv
    got = _sorted_col(C.temperature(df), "temperature_c")
    assert np.allclose(got, p["temperature"].to_numpy() - 273.15)
    got = _sorted_col(C.pm25(df), "pm25")
    want = 1e9 * (
        p["dusmass25"] + p["sssmass25"] + p["bcsmass"] + 1.4 * p["ocsmass"] + 1.375 * p["so4smass"]
    ).to_numpy()
    assert np.allclose(got, want, rtol=1e-12)


def test_heat_demand_daily(gv):
    df, p = gv
    out = C.heat_demand(df, threshold=15.0, a=1.0)
    got = (
        out.toPandas().sort_values(["day_idx", "lat", "lon"]).reset_index(drop=True)
    )
    want = (
        p.assign(day_idx=p["hour"] // 24)
        .groupby(["day_idx", "lat", "lon"])["temperature"]
        .mean()
        .reset_index()
    )
    want["hd"] = np.maximum(0.0, (15.0 + 273.15) - want["temperature"])
    merged = got.merge(want, on=["day_idx", "lat", "lon"])
    assert len(merged) == len(got)
    assert np.allclose(merged["heat_demand"], merged["hd"], rtol=1e-12)


def test_solar_position_vs_numpy(gv, spark):
    df, p = gv
    sp = FM.solar_position(influx_toa=None)
    out = df.withColumn("alt", F.expr(sp["altitude"])).withColumn("az", F.expr(sp["azimuth"]))
    alt_got = _sorted_col(out, "alt")
    az_got = _sorted_col(out, "az")
    alt, az, _ = np_solar_position(
        p["hour"].to_numpy(float), p["lat"].to_numpy(float), p["lon"].to_numpy(float)
    )
    assert np.allclose(alt_got, alt, atol=1e-9)
    assert np.allclose(az_got, az, atol=1e-9)


def test_pv_bofinger_vs_numpy(gv):
    df, p = gv
    out = C.pv(df, C.PANEL_KANEKA, orientation="latitude_optimal", trigon_model="simple")
    got = _sorted_col(out, "pv")
    _, want = np_pv_simple_bofinger(p, C.PANEL_KANEKA)
    assert np.allclose(got, want, atol=1e-9)
    assert (got >= 0).all() or np.isfinite(got).all()


def test_pv_huld_sane(gv):
    df, _ = gv
    out = C.pv(df, C.PANEL_HULD_CSI, orientation=(30.0, 180.0))
    got = _sorted_col(out, "pv")
    assert np.isfinite(got).all()
    assert (got >= 0.0).all()
    assert got.max() > 0.0  # some daylight cells produce power


def test_solar_thermal_nonnegative(gv):
    df, _ = gv
    out = C.solar_thermal(df)
    got = _sorted_col(out, "solar_thermal")
    assert np.isfinite(got).all()
    assert (got >= 0.0).all()


def test_windturbine_smooth():
    sm = C.windturbine_smooth(C.TURBINE_SUZLON_S82)
    assert len(sm["V"]) == 72 and len(sm["POW"]) == 72
    assert sm["P"] > 1.0  # near rated power
    assert sm["POW"][0] < 1e-2  # no energy at 0 m/s (no oversmoothing)
    # smoothing preserves the overall scale of the curve
    assert 0.9 < sm["P"] / 1.5 < 1.01


def test_get_var_prunes(gv):
    df, _ = gv
    out = C.get_var(df, "temperature")
    assert set(out.columns) == {"ts", "hour", "lat", "lon", "temperature"}


# ---------------------------------------------------------------------------
# stability-corrected wind chain (F22-F26) and enhanced clearsky (F13)
# ---------------------------------------------------------------------------

def np_L_vph(tlml, rhoa, hflux, eflux, ustar):  # wind.py:156-178
    vonk, grav, CPD, Le, kp, Rd, p0 = 0.4, 9.81, 1004, 2.257e6, 2 / 7, 287, 1e5
    p = rhoa * Rd * tlml
    vph = hflux + 0.61 * CPD / Le * tlml * (p0 / p) ** kp * eflux
    return -(tlml * ustar**3 * CPD * rhoa) / (vonk * grav * vph)


def np_psi_linear(z, L):  # wind.py:73-89 (+ engine's L==0 → neutral guard)
    with np.errstate(divide="ignore"):
        a = np.where(L == 0, 0.0, z / L)
    return np.where(a > 0, -5.2 * a, 0.0)


def np_psi_linearexp(z, L, const=None):  # wind.py:92-153
    A, B, C, D, aconst = 1, 2 / 3, 5, 0.35, 5
    with np.errstate(divide="ignore"):
        a = np.where(L == 0, 0.0, z / L)
    expterm = -A * (a + B * (a - C / D) * np.exp(-D * a) + B * C / D)
    out = np.where(a <= 0, 0.0, np.where(a <= 0.5, -aconst * a, expterm))
    if const is not None:
        plateau = -A * (const + B * (const - C / D) * np.exp(-D * const) + B * C / D)
        out = np.where(a > const, plateau, out)
    return out


@pytest.mark.parametrize(
    "extrap,psi",
    [
        ("log_law_flux_linear", np_psi_linear),
        ("log_law_flux_linearexp", np_psi_linearexp),
        ("log_law_flux_linearexpconst", lambda z, L: np_psi_linearexp(z, L, const=7.0)),
    ],
)
def test_windspd_flux_stability(gv, extrap, psi):
    df, p = gv
    out = C.windspd(df, 79.0, extrap=extrap, var_height="lml", available_heights=())
    got = _sorted_col(out, "windspd")
    L = np_L_vph(
        p["temperature"].to_numpy(), p["rhoa"].to_numpy(),
        p["hflux"].to_numpy(), p["eflux"].to_numpy(), p["ustar"].to_numpy(),
    )
    want = p["wndlml"].to_numpy() + p["ustar"].to_numpy() / 0.4 * (
        np.log((79.0 - p["disph"].to_numpy()) / p["hlml"].to_numpy()) - psi(79.0, L)
    )
    # rtol 1e-7: psi amplifies ulp-level power()/exp() differences
    assert np.allclose(got, want, rtol=1e-7)


def test_winddir_quadrants(spark):
    rows = [(1.0, 1.0), (1.0, -1.0), (-1.0, -1.0), (-1.0, 1.0), (0.0, -1.0)]
    df = spark.createDataFrame(rows, "u double, v double")
    from geodata_spark import formulas as FM2

    got = [r.d for r in df.select(F.expr(FM2.winddir("u", "v")).alias("d")).collect()]
    # reference semantics: degrees(atan(u/v)) + quadrant fixups
    want = []
    for u, v in rows:
        d = np.degrees(np.arctan(u / v))
        if v < 0:
            d += 180
        elif v > 0 and u < 0:
            d += 360
        want.append(d)
    assert np.allclose(got, want)


def test_enhanced_clearsky_vs_numpy(spark):
    """Single-influx cutout + temperature + humidity → enhanced Reindl."""
    from geodata_spark.synth import synth_grid_vars

    df = synth_grid_vars(
        spark, nhours=24, ny=4, nx=4,
        variables=("influx", "temperature", "humidity", "albedo", "influx_toa"),
    )
    out = C.tilted_irradiation(df, orientation=(30.0, 180.0), clearsky_model="enhanced")
    got = _sorted_col(out, "irradiation")
    p = df.toPandas().sort_values(["hour", "lat", "lon"]).reset_index(drop=True)
    alt, az, g = np_solar_position(
        p["hour"].to_numpy(float), p["lat"].to_numpy(float), p["lon"].to_numpy(float)
    )
    toa = p["influx_toa"].to_numpy(float)
    influx = np.clip(p["influx"].to_numpy(float), 0, toa)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = influx / toa
        sinalt = np.sin(alt)
        T = p["temperature"].to_numpy(float)
        rh = p["humidity"].to_numpy(float)
        frac = np.where(
            (k > 0) & (k <= 0.3),
            np.fmin(1.0, 1.000 - 0.232 * k + 0.0239 * sinalt - 0.000682 * T + 0.0195 * rh),
            np.where(
                (k > 0.3) & (k < 0.78),
                np.fmin(0.97, np.fmax(0.1, 1.329 - 1.716 * k + 0.267 * sinalt - 0.00357 * T + 0.106 * rh)),
                np.where(k >= 0.78, np.fmax(0.1, 0.426 * k - 0.256 * sinalt + 0.00349 * T + 0.0734 * rh), 0.0),
            ),
        )
        diffuse = influx * frac
        direct = influx - diffuse
        slope = np.deg2rad(30.0)
        saz = np.deg2rad(180.0)
        cosinc = np.maximum(0.0, np.sin(slope) * np.cos(alt) * np.cos(saz - az) + np.cos(slope) * np.sin(alt))
        kk = cosinc / sinalt
        direct_t = kk * direct
        albedo = p["albedo"].to_numpy(float)
        diffuse_t = (1 + np.cos(slope)) / 2 * diffuse + albedo * influx * ((1 - np.cos(slope)) / 2)
    total = np.nan_to_num(direct_t) + np.nan_to_num(diffuse_t)
    total = np.where((alt < np.deg2rad(1.0)) | (direct + diffuse <= 0.01), 0.0, total)
    assert np.allclose(got, total, atol=1e-8)


def test_albedo_outflux_fallback(spark):
    """No albedo column → albedo = min(1, outflux/influx) (irradiation.py:133-145)."""
    from geodata_spark.synth import synth_grid_vars

    df = synth_grid_vars(
        spark, nhours=6, ny=2, nx=2,
        variables=("influx_direct", "influx_diffuse", "influx_toa", "outflux", "temperature"),
    )
    out = C.tilted_irradiation(df, orientation=(30.0, 180.0))
    got = _sorted_col(out, "irradiation")
    assert np.isfinite(got).all()
    assert (got >= 0).all()


def test_night_rows_toa_zero_ansi_safe(spark):
    """TOA insolation is exactly 0 every night; the Reindl clearness
    division and the outflux albedo fallback must not raise
    DIVIDE_BY_ZERO under Spark ANSI mode, and night irradiation must
    be exactly 0 (suppress guard)."""
    rows = [
        # hour, lat, lon, temperature, humidity, influx, influx_toa, outflux
        (12, 20.0, 75.0, 290.0, 0.5, 0.0, 0.0, 0.0),     # night: toa = 0
        (13, 20.0, 75.0, 290.0, 0.5, 300.0, 0.0, 50.0),  # sensor glitch: influx > toa = 0
        (14, 20.0, 75.0, 290.0, 0.5, 300.0, 800.0, 50.0),
    ]
    df = spark.createDataFrame(
        rows,
        "hour long, lat double, lon double, temperature double, humidity double, "
        "influx double, influx_toa double, outflux double",
    )
    for model in ("simple", "enhanced"):
        out = C.tilted_irradiation(
            df, orientation=(30.0, 180.0), clearsky_model=model, out="irr"
        ).select("hour", "irr").orderBy("hour").collect()
        got = {r["hour"]: r["irr"] for r in out}
        assert got[12] == 0.0 and got[13] == 0.0  # zero influx_c → suppressed
        assert got[14] is not None and got[14] >= 0.0


def test_heat_demand_negative_shift_floors_to_previous_day(spark):
    """Western-timezone hour_shift near the epoch: shifted hours -6..-1
    must land in day -1, not truncate toward day 0 (reference
    shift-then-resample('1D') calendar semantics)."""
    rows = [(h, 20.0, 75.0, 280.0 + h) for h in range(30)]
    df = spark.createDataFrame(
        rows, "hour long, lat double, lon double, temperature double"
    )
    out = C.heat_demand(df, hour_shift=-6).toPandas().sort_values("day_idx")
    # shifted hours -6..23 → day -1 (hours 0..5) and day 0 (hours 6..29)
    assert list(out["day_idx"]) == [-1, 0]
    n_by_day = {
        int(r.day_idx): r.t_daily_k for r in out.itertuples()
    }
    assert n_by_day[-1] == np.mean([280.0 + h for h in range(6)])
    assert n_by_day[0] == np.mean([280.0 + h for h in range(6, 30)])
