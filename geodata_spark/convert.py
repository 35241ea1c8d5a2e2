"""Cutout conversion operators — wind / solar / temperature / air quality.

DataFrame-level counterparts of the reference's ``cutout.pv()``,
``.wind()``, ``.windspd()``, ``.windwpd()``, ``.temperature()``,
``.heat_demand()``, ``.pm25()``, ``.solar_thermal()``
(``src/geodata/convert.py``, dispatched via ``cutout.py:720-905``).

Each operator appends a result column to the long cutout table
``(ts|hour, lat, lon, vars…)`` using the engine-neutral SQL formulas
from :mod:`geodata_spark.formulas` via ``F.expr`` — all JVM-side,
whole-stage codegen; the reference's per-month Python loop becomes
partition-parallel evaluation of one logical plan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geodata_spark import formulas as FM

# ---------------------------------------------------------------------------
# literal configs (from the reference's resource YAMLs — resource.py:35-49)
# ---------------------------------------------------------------------------

#: Suzlon S82 1.5 MW (resources/windturbine/Suzlon_S82_1.5_MW.yaml)
TURBINE_SUZLON_S82 = {
    "V": [0.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0, 12.0, 13.0, 14.0, 20.0, 20.0],
    "POW": [0.0, 0.0, 0.010, 0.095, 0.230, 0.460, 0.725, 0.980, 1.200, 1.380, 1.450, 1.490, 1.500, 1.500, 0.0],
    "hub_height": 79.0,
    "P": 1.5,
}

#: KANEKA hybrid thin-film (resources/solarpanel/KANEKA.yaml) — bofinger model
PANEL_KANEKA = {
    "model": "bofinger",
    "threshold": 1.0,
    "A": 0.0659164166836276,
    "B": -4.44310393547043e-06,
    "C": 0.0122044905275824,
    "D": -0.0035,
    "NOCT": 318.0,
    "Tstd": 298.0,
    "Tamb": 293.0,
    "Intc": 800.0,
    "ta": 0.9,
    "inverter_efficiency": 0.9,
}

#: generic CSi panel for the huld model (coefficient set from the public
#: Huld 2010 paper, as used by gsee)
PANEL_HULD_CSI = {
    "model": "huld",
    "r_irradiance": 1000.0,
    "r_tmod": 25.0,
    "c_temp_amb": 1.0,
    "c_temp_irrad": 0.035,
    "k_1": -0.017162,
    "k_2": -0.040289,
    "k_3": -0.004681,
    "k_4": 0.000148,
    "k_5": 0.000169,
    "k_6": 0.000005,
    "inverter_efficiency": 1.0,
}


def windturbine_smooth(turbine: dict, eta: float = 0.95, delta_v: float = 1.27,
                       sigma: float = 2.29) -> dict:
    """Gaussian-kernel smoothing of a power curve (resource.py:75-142).

    Direct convolution on the regular 0.1 m/s grid (the reference uses
    fftconvolve; the curve is 1001 points, O(n²) is negligible and has
    no scipy dependency).
    """
    v_reg = np.linspace(-50.0, 50.0, 1001)
    p_reg = np.interp(v_reg, turbine["V"], turbine["POW"])
    kern = (1.0 / np.sqrt(2 * np.pi * sigma * sigma)) * np.exp(
        -((v_reg - delta_v) ** 2) / (2 * sigma * sigma)
    )
    conv = 0.1 * np.convolve(p_reg, kern, mode="same")
    v_new = np.linspace(0.0, 35.0, 72)
    p_new = eta * np.interp(v_new, v_reg, conv)
    out = dict(turbine)
    out["V"], out["POW"] = list(v_new), list(p_new)
    out["P"] = float(np.max(p_new))
    return out


# ---------------------------------------------------------------------------
# wind chain
# ---------------------------------------------------------------------------

def extrapolate_wind_speed_sql(
    to_height: float,
    extrap: str = "log_ratio",
    from_height: float | None = None,
    var_height: str | None = None,
    available_heights: tuple[int, ...] = (100,),
) -> str:
    """SQL for hub-height wind speed — wind.py:235-332 dispatcher.

    - existing ``wnd{h}m`` short-circuit: if to_height matches an
      available column the caller should just select it (plan-time
      decision, J11/F27);
    - ``from_height``: extrapolate from ``wnd{h}m`` at a fixed height;
    - ``var_height`` (e.g. ``lml``): variable source height column
      ``h{suffix}`` and speed ``wnd{suffix}``;
    - neither: nearest available height (plan-time argmin, J11).
    """
    if int(to_height) in available_heights:
        return f"wnd{int(to_height)}m"
    if from_height is not None and var_height is not None:
        raise ValueError("pass only one of from_height / var_height")
    if var_height is not None:
        src_v, src_h = f"wnd{var_height}", f"h{var_height}"
    else:
        if from_height is None:
            from_height = min(available_heights, key=lambda h: abs(h - to_height))
        src_v, src_h = f"wnd{int(from_height)}m", repr(float(from_height))
    if extrap == "log_ratio":
        return FM.log_ratio(src_v, repr(float(to_height)), src_h)
    if extrap == "log_law":
        return FM.log_law(src_v, repr(float(to_height)), src_h)
    if extrap == "log_law_flux_linear":
        L = FM.obukhov_length_vph()
        return FM.log_law_flux(src_v, float(to_height), src_h, FM.psi_linear(float(to_height), L))
    if extrap == "log_law_flux_linearexp":
        L = FM.obukhov_length_vph()
        return FM.log_law_flux(src_v, float(to_height), src_h, FM.psi_linearexp(float(to_height), L))
    if extrap == "log_law_flux_linearexpconst":
        L = FM.obukhov_length_vph()
        return FM.log_law_flux(
            src_v, float(to_height), src_h, FM.psi_linearexp(float(to_height), L, const=7.0)
        )
    raise ValueError(f"unknown extrapolation {extrap}")


def windspd(df: DataFrame, hub_height: float, out: str = "windspd", **kw) -> DataFrame:
    """convert_windspd (convert.py:280-302)."""
    return df.withColumn(out, F.expr(extrapolate_wind_speed_sql(hub_height, **kw)))


def wind(df: DataFrame, turbine: dict | str, out: str = "wind", **kw) -> DataFrame:
    """convert_wind (convert.py:255-277): power curve at hub height, per-unit.

    ``turbine`` may be a config name from the bundled resource library
    (resource.py; reference resource.py:35-43) or a curve dict.
    """
    from geodata_spark.resource import get_windturbineconfig

    turbine = get_windturbineconfig(turbine)
    hub = extrapolate_wind_speed_sql(turbine["hub_height"], **kw)
    pow_per_unit = [p / turbine["P"] for p in turbine["POW"]]
    return df.withColumn(out, F.expr(FM.interp_curve(hub, list(turbine["V"]), pow_per_unit)))


def windwpd(df: DataFrame, hub_height: float, out: str = "windwpd", **kw) -> DataFrame:
    """convert_windwpd (convert.py:305-328)."""
    hub = extrapolate_wind_speed_sql(hub_height, **kw)
    return df.withColumn(out, F.expr(FM.wind_power_density(hub)))


# ---------------------------------------------------------------------------
# temperature / heat demand / pm25
# ---------------------------------------------------------------------------

def temperature(df: DataFrame, out: str = "temperature_c") -> DataFrame:
    return df.withColumn(out, F.expr(FM.temperature_c()))


def soil_temperature(df: DataFrame, out: str = "soil_temperature_c") -> DataFrame:
    return df.withColumn(out, F.expr(FM.soil_temperature_c()))


def heat_demand(
    df: DataFrame,
    threshold: float = 15.0,
    a: float = 1.0,
    constant: float = 0.0,
    hour_shift: int = 0,
    out: str = "heat_demand",
) -> DataFrame:
    """convert_heat_demand (convert.py:146-157): daily-mean T → degree-days.

    The reference's timezone ``hour_shift`` becomes a shift of the
    day-bucket key — W1's tumbling window with an offset.  Output is
    one row per (day_idx, lat, lon).
    """
    # floor, not truncate-toward-zero: negative shifted hours (western
    # timezones near the epoch) must land in day -1, matching the
    # reference's shift-then-resample('1D') calendar semantics.
    shifted_day = F.floor((F.col("hour") + F.lit(int(hour_shift))) / F.lit(24)).cast("long")
    daily = (
        df.withColumn("day_idx", shifted_day)
        .groupBy("day_idx", "lat", "lon")
        .agg(F.avg("temperature").alias("t_daily_k"))
    )
    return daily.withColumn(
        out, F.expr(FM.heat_demand("t_daily_k", threshold, a, constant))
    )


def pm25(df: DataFrame, out: str = "pm25") -> DataFrame:
    return df.withColumn(out, F.expr(FM.pm25()))


# ---------------------------------------------------------------------------
# solar chain
# ---------------------------------------------------------------------------

def _with_solar_position(df: DataFrame, use_toa_var: bool) -> DataFrame:
    sp = FM.solar_position(influx_toa="influx_toa" if use_toa_var else None)
    return (
        df.withColumn("sp_alt", F.expr(sp["altitude"]))
        .withColumn("sp_az", F.expr(sp["azimuth"]))
        .withColumn("sp_toa", F.expr(sp["atmospheric_insolation"]))
    )


def _with_orientation(df: DataFrame, orientation) -> DataFrame:
    """orientation: 'latitude_optimal' or (slope_deg, azimuth_deg)."""
    if orientation == "latitude_optimal":
        slope = FM.latitude_optimal_slope()
        azim = "radians(180.0)"
    else:
        slope_deg, az_deg = orientation
        slope, azim = f"radians({slope_deg!r})", f"radians({az_deg!r})"
    return (
        df.withColumn("so_slope", F.expr(slope))
        .withColumn("so_az", F.expr(azim))
        .withColumn(
            "so_cosinc", F.expr(FM.cosincidence("so_slope", "so_az", "sp_alt", "sp_az"))
        )
    )


def tilted_irradiation(
    df: DataFrame,
    orientation="latitude_optimal",
    trigon_model: str = "simple",
    clearsky_model: str = "simple",
    out: str = "irradiation",
) -> DataFrame:
    """TiltedIrradiation orchestration (pv/irradiation.py:154-204).

    Uses (influx_direct, influx_diffuse) when present, else splits a
    single ``influx`` via the Reindl clearsky model.
    """
    use_toa = "influx_toa" in df.columns
    df = _with_solar_position(df, use_toa_var=use_toa)
    df = _with_orientation(df, orientation)
    if "influx_direct" in df.columns and "influx_diffuse" in df.columns:
        direct = FM.clip_influx("influx_direct", "sp_toa")
        diffuse = FM.clip_influx("influx_diffuse", f"(sp_toa - {direct})")
    elif "influx" in df.columns:
        influx = FM.clip_influx("influx", "sp_toa")
        # nullif: TOA insolation is exactly 0 every night; a bare
        # division would abort the job under Spark ANSI mode.  NULL
        # clearness falls through every Reindl CASE branch → fraction
        # 0 → direct = diffuse = 0, identically in both engines.
        k = f"(({influx}) / nullif(sp_toa, 0.0))"
        if clearsky_model is None:
            clearsky_model = (
                "enhanced"
                if "temperature" in df.columns and "humidity" in df.columns
                else "simple"
            )
        if clearsky_model == "enhanced":
            frac = FM.diffuse_fraction_enhanced(
                k, "sin(sp_alt)", "temperature", "humidity"
            )
        else:
            frac = FM.diffuse_fraction_simple(k, "sin(sp_alt)")
        diffuse = f"(({influx}) * {frac})"
        direct = f"(({influx}) - {diffuse})"
    else:
        raise ValueError("need influx or influx_direct/influx_diffuse")
    df = df.withColumn("irr_direct", F.expr(direct)).withColumn("irr_diffuse", F.expr(diffuse))
    # _albedo (pv/irradiation.py:133-145): albedo var, else outflux/influx
    # clipped at 1 (NaN from 0/0 flows into the model's fillna guards,
    # matching the reference)
    if "albedo" in df.columns:
        albedo = "albedo"
    elif "outflux" in df.columns:
        # nullif: zero influx at night → NULL ratio (not an ANSI
        # abort); least() skips NULLs in both engines → albedo 1.0,
        # multiplied into a zero ground term.
        albedo = "least(1.0, outflux / nullif(irr_direct + irr_diffuse, 0.0))"
    else:
        albedo = "0.0"
    if trigon_model == "simple":
        total = FM.tilted_irradiation_simple(
            "irr_direct", "irr_diffuse", "so_cosinc", "sp_alt", "so_slope", albedo
        )
    else:
        total = FM.tilted_irradiation_hay_davies(
            "irr_direct", "irr_diffuse", "sp_toa", "so_cosinc", "sp_alt", "so_slope", albedo
        )
    total = FM.suppress_low_sun(total, "sp_alt", "irr_direct", "irr_diffuse")
    return df.withColumn(out, F.expr(total))


def pv(
    df: DataFrame,
    panel: dict | str = PANEL_KANEKA,
    orientation="latitude_optimal",
    trigon_model: str = "simple",
    clearsky_model: str = "simple",
    out: str = "pv",
) -> DataFrame:
    """convert_pv (convert.py:238-249): position ∘ orientation ∘
    irradiation ∘ panel model.  ``panel`` may be a resource-library
    name (resource.py) or a coefficient dict."""
    from geodata_spark.resource import get_solarpanelconfig

    panel = get_solarpanelconfig(panel)
    df = tilted_irradiation(df, orientation, trigon_model, clearsky_model, out="_irr")
    if panel.get("model", "huld") == "huld":
        expr = FM.power_huld("_irr", "temperature", panel)
    else:
        expr = FM.power_bofinger("_irr", "temperature", panel)
    return df.withColumn(out, F.expr(expr)).drop("_irr")


def solar_thermal(
    df: DataFrame,
    orientation=(45.0, 180.0),
    c0: float = 0.8,
    c1: float = 3.0,
    t_store: float = 80.0,
    trigon_model: str = "simple",
    out: str = "solar_thermal",
) -> DataFrame:
    """convert_solar_thermal (convert.py:216-235)."""
    df = tilted_irradiation(df, orientation, trigon_model, out="_irr")
    return df.withColumn(
        out, F.expr(FM.solar_thermal("_irr", "temperature", c0, c1, t_store))
    ).drop("_irr")


# ---------------------------------------------------------------------------
# P10/P11 — get_var / compute_var
# ---------------------------------------------------------------------------

def get_var(df: DataFrame, var: str) -> DataFrame:
    """convert.py:363-383 — projection; Catalyst prunes the scan."""
    keys = [c for c in ("ts", "hour", "lat", "lon") if c in df.columns]
    return df.select(*keys, var)


def compute_var(df: DataFrame, fn, schema=None) -> DataFrame:
    """convert.py:386-406 — arbitrary user function.

    ``fn`` is either a Column-builder (DataFrame → Column; preferred,
    stays JVM-side) or a pandas-batch function used via mapInPandas
    when ``schema`` is given.
    """
    if schema is None:
        return df.withColumn("computed", fn(df))
    return df.mapInPandas(fn, schema=schema)
