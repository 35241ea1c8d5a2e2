"""Scalar conversion formulas (F1-F30) as engine-neutral SQL text.

The reference implements its conversion library as elementwise numpy
over dense arrays (``src/geodata/convert.py``, ``wind.py``, ``pv/*``).
Here every formula is built once as ANSI-SQL text restricted to the
operator/function subset Spark SQL and DuckDB share (arithmetic, CASE,
ln/exp/sqrt/sin/cos/asin/acos/atan2/floor/greatest/least/isnan/pi) —
the SAME string is parsed by Catalyst via ``F.expr`` (JVM, whole-stage
codegen) and executed verbatim by the DuckDB oracle.  One source of
truth, zero transcription drift; numpy twins in tests double-check the
physics against the reference formulas.

Inputs are SQL sub-expressions (usually column names).  Time enters as
``hour`` = integer hours since 2011-01-01T00Z (the engine's canonical
epoch for the synthetic cutouts); generic timestamps convert with
hour = (epoch seconds)/3600 relative to the epoch.

Reference formula provenance is cited per function.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# temperature / air quality  (convert.py:110-157, 331-357)
# ---------------------------------------------------------------------------


def temperature_c(t: str = "temperature") -> str:
    """K → °C (convert.py:116)."""
    return f"({t} - 273.15)"


def soil_temperature_c(t: str = "soiltemperature") -> str:
    """K → °C with sea-NaN → 0 (convert.py:136)."""
    return f"(CASE WHEN {t} IS NULL OR isnan({t}) THEN 0.0 ELSE {t} - 273.15 END)"


def heat_demand(t_daily_mean_k: str, threshold_c: float = 15.0, a: float = 1.0,
                constant: float = 0.0) -> str:
    """Degree-day heat demand from DAILY-MEAN temperature (convert.py:146-157).

    threshold is given in °C and shifted to K as in the reference.
    """
    thr = threshold_c + 273.15
    return f"({constant!r} + greatest(0.0, {a!r} * ({thr!r} - {t_daily_mean_k})))"


def pm25(dus: str = "dusmass25", ss: str = "sssmass25", bc: str = "bcsmass",
         oc: str = "ocsmass", so4: str = "so4smass") -> str:
    """PM2.5 = Dust2.5 + SS2.5 + BC + 1.4 OC + 1.375 SO4, kg/m³→µg/m³
    (convert.py:331-357)."""
    return f"(1e9 * ({dus} + {ss} + {bc} + 1.4 * {oc} + 1.375 * {so4}))"


# ---------------------------------------------------------------------------
# wind (wind.py)
# ---------------------------------------------------------------------------

VONK = 0.4


def roughness_floor(rough: str = "roughness") -> str:
    """<=0 roughness → 0.0002 (open water), wind.py:290."""
    return f"(CASE WHEN {rough} <= 0.0 THEN 0.0002 ELSE {rough} END)"


def log_ratio(v_from: str, to_height: str, from_height: str,
              rough: str = "roughness") -> str:
    """v·ln(z_to/z0)/ln(z_from/z0) — wind.py:36-52 (Andresen 2015 eq. 2)."""
    z0 = roughness_floor(rough)
    return f"({v_from} * (ln(({to_height}) / {z0}) / ln(({from_height}) / {z0})))"


def log_law(v_from: str, to_height: str, from_height: str,
            ustar: str = "ustar", disph: str = "disph") -> str:
    """v + u*/κ·ln((z_to−d)/z_from) — wind.py:55-69 (Emeis 2013)."""
    return (
        f"({v_from} + {ustar} / {VONK!r} * "
        f"ln((({to_height}) - {disph}) / ({from_height})))"
    )


def obukhov_length_vph(tlml: str = "temperature", rhoa: str = "rhoa",
                       hflux: str = "hflux", eflux: str = "eflux",
                       ustar: str = "ustar") -> str:
    """Obukhov length from virtual potential heat flux — wind.py:156-178."""
    CPD, Le, kp, Rd, p0, grav = 1004, 2.257e6, 2 / 7, 287, 1e5, 9.81
    p = f"({rhoa} * {Rd} * {tlml})"
    vph = (
        f"({hflux} + 0.61 * {CPD} / {Le!r} * {tlml} * "
        f"power({p0!r} / {p}, {kp!r}) * {eflux})"
    )
    # nullif: a (rare but possible) exactly-zero virtual heat flux must
    # yield NULL, not a DIVIDE_BY_ZERO job abort under Spark ANSI mode;
    # downstream psi CASEs treat NULL L as neutral/NULL consistently in
    # both engines.
    return (
        f"(-({tlml} * power({ustar}, 3.0) * {CPD} * {rhoa}) / "
        f"nullif({VONK!r} * {grav!r} * {vph}, 0.0))"
    )


def psi_linear(z: float, L: str) -> str:
    """Linear stability correction — wind.py:73-89 (Businger/Dyer).

    L == 0 (u* = 0, degenerate Obukhov length) → ψ = 0 (neutral); the
    reference lets numpy emit ±inf there, which is physically
    meaningless and forbidden under ANSI division.
    """
    return (
        f"(CASE WHEN ({L}) = 0.0 THEN 0.0 "
        f"WHEN ({z!r} / {L}) > 0 THEN -5.2 * ({z!r} / {L}) ELSE 0.0 END)"
    )


def psi_linearexp(z: float, L: str, const: float | None = None) -> str:
    """Linear-exponential piecewise stability correction — wind.py:92-153.

    With ``const`` set, plateaus above z/L > const (psi_linearexpconst).
    """
    A, B, C, D, aconst = 1, 2 / 3, 5, 0.35, 5
    a = f"({z!r} / {L})"
    exp_term = f"(-{A} * ({a} + {B!r} * ({a} - {C / D!r}) * exp(-{D!r} * {a}) + {B * C / D!r}))"
    branches = [
        f"WHEN ({L}) = 0.0 THEN 0.0",  # degenerate L (u*=0): neutral
        f"WHEN {a} <= 0 THEN 0.0",
        f"WHEN {a} <= 0.5 THEN -{aconst} * {a}",
    ]
    if const is not None:
        plateau = -A * (const + B * (const - C / D) * np.exp(-D * const) + B * C / D)
        branches.append(f"WHEN {a} > {const!r} THEN {plateau!r}")
    return f"(CASE {' '.join(branches)} ELSE {exp_term} END)"


def log_law_flux(v_from: str, to_height: float, from_height: str, psi_sql: str,
                 ustar: str = "ustar", disph: str = "disph") -> str:
    """Log law with stability correction — wind.py:190-213."""
    return (
        f"({v_from} + {ustar} / {VONK!r} * "
        f"(ln(({to_height!r} - {disph}) / ({from_height})) - {psi_sql}))"
    )


def winddir(u: str, v: str) -> str:
    """Wind direction with quadrant fixups — wind.py:181-187."""
    base = f"degrees(atan(({u}) / ({v})))"
    return (
        f"(CASE WHEN ({v}) < 0 THEN {base} + 180 "
        f"WHEN ({v}) > 0 AND ({u}) < 0 THEN {base} + 360 "
        f"ELSE {base} END)"
    )


def wind_power_density(v_hub: str, rhoa: str = "rhoa") -> str:
    """WPD = ½ρv³ — convert.py:305-328."""
    return f"(0.5 * {rhoa} * {v_hub} * {v_hub} * {v_hub})"


def interp_curve(x: str, xs: list[float], ys: list[float]) -> str:
    """np.interp(x, xs, ys) as a CASE chain (power-curve lookup,
    convert.py:255-277).  Clamps to endpoint values outside [xs0, xsN];
    an exact hit on a duplicated x knot (cut-out discontinuity)
    evaluates to the **later** (right-side) y value, matching np.interp.
    """
    assert len(xs) == len(ys) and len(xs) >= 2
    # strict `<` on segment upper bounds reproduces np.interp exactly:
    # an exact interior knot hit x==x_k falls into the NEXT segment
    # [x_k, x_{k+1}) and evaluates to y_k + 0; at a duplicated knot
    # (cut-out discontinuity) it falls through to the later value,
    # matching np.interp's behavior.
    branches = [f"WHEN ({x}) <= {xs[0]!r} THEN CAST({ys[0]!r} AS DOUBLE)"]
    for i in range(len(xs) - 1):
        x0, x1, y0, y1 = xs[i], xs[i + 1], ys[i], ys[i + 1]
        if x1 == x0:
            continue  # zero-length segment (duplicate knot)
        seg = f"{y0!r} + (({x}) - {x0!r}) * {(y1 - y0)!r} / {(x1 - x0)!r}"
        branches.append(f"WHEN ({x}) < {x1!r} THEN ({seg})")
    branches.append(f"ELSE CAST({ys[-1]!r} AS DOUBLE)")
    return f"(CASE {' '.join(branches)} END)"


# ---------------------------------------------------------------------------
# solar position (pv/solar_position.py:18-97, Michalsky 1988 / Sproul 2007)
# ---------------------------------------------------------------------------

#: julian offset of the engine epoch 2011-01-01T00Z minus J2000.0
EPOCH_N0 = 2455562.5 - 2451545.0  # = 4017.5


def solar_position(hour: str = "hour", lat: str = "lat", lon: str = "lon",
                   influx_toa: str | None = "influx_toa") -> dict[str, str]:
    """altitude / azimuth (rad) + TOA insolation, as SQL text.

    Returns dict of named sub-expressions; callers materialize the
    shared ones as columns to keep the expression tree small.
    """
    # CAST: without it Spark types `bigint_hour / 24.0` as DECIMAL
    # division (scale 6) while DuckDB computes full DOUBLE — a 3e-7
    # divergence in n that propagates through every trig term.
    n = f"({EPOCH_N0!r} + CAST({hour} AS DOUBLE) / 24.0)"
    L = f"(280.460 + 0.9856474 * {n})"
    g = f"(radians(357.528 + 0.9856003 * {n}))"
    ell = f"(radians({L} + 1.915 * sin({g}) + 0.020 * sin(2 * {g})))"
    ep = f"(radians(23.439 - 4e-7 * {n}))"
    ra = f"(atan2(cos({ep}) * sin({ell}), cos({ell})))"
    hod = f"(({hour}) % 24)"
    lmst = f"((6.697375 + {hod} + 0.0657098242 * {n}) * 15.0 + {lon})"
    # numpy-style floored modulo into [-pi, pi)
    hraw = f"(radians({lmst}) - {ra} + pi())"
    h = f"({hraw} - floor({hraw} / (2 * pi())) * (2 * pi()) - pi())"
    dec = f"(asin(sin({ep}) * sin({ell})))"
    latr = f"(radians({lat}))"
    sinalt = (
        f"(least(1.0, greatest(-1.0, "
        f"sin({latr}) * sin({dec}) + cos({latr}) * cos({dec}) * cos({h}))))"
    )
    alt = f"(asin({sinalt}))"
    az0 = (
        f"(acos(least(1.0, greatest(-1.0, "
        f"(sin({dec}) * cos({latr}) - cos({dec}) * sin({latr}) * cos({h})) / cos({alt})))))"
    )
    az = f"(CASE WHEN {h} <= 0 THEN {az0} ELSE 2 * pi() - {az0} END)"
    if influx_toa is not None:
        toa = influx_toa
    else:
        toa = f"(1366.1 * (1 + 0.033 * cos({g})) * sin({alt}))"
    return {"altitude": alt, "azimuth": az, "atmospheric_insolation": toa, "g": g}


def latitude_optimal_slope(lat: str = "lat") -> str:
    """Optimal tilt (rad) piecewise in latitude — pv/orientation.py:40-78."""
    latr = f"(radians({lat}))"
    return (
        f"(CASE WHEN {latr} <= radians(25.0) THEN 0.87 * {latr} "
        f"WHEN {latr} <= radians(50.0) THEN 0.76 * {latr} + radians(0.31) "
        f"ELSE radians(40.0) END)"
    )


def cosincidence(slope: str, azimuth: str, alt: str, az: str) -> str:
    """cos(incidence), clamped ≥0 — pv/orientation.py:111-118."""
    raw = (
        f"(sin({slope}) * cos({alt}) * cos(({azimuth}) - ({az})) "
        f"+ cos({slope}) * sin({alt}))"
    )
    return f"(greatest(0.0, {raw}))"


# ---------------------------------------------------------------------------
# irradiation (pv/irradiation.py)
# ---------------------------------------------------------------------------

def diffuse_fraction_simple(k: str, sinalt: str) -> str:
    """Reindl 1990 simple clearsky split — pv/irradiation.py:46-53."""
    b1 = f"least(1.0, 1.020 - 0.254 * {k} + 0.0123 * {sinalt})"
    b2 = f"least(0.97, greatest(0.1, 1.400 - 1.749 * {k} + 0.177 * {sinalt}))"
    b3 = f"greatest(0.1, 0.486 * {k} - 0.182 * {sinalt})"
    return (
        f"(CASE WHEN {k} > 0.0 AND {k} <= 0.3 THEN {b1} "
        f"WHEN {k} > 0.3 AND {k} < 0.78 THEN {b2} "
        f"WHEN {k} >= 0.78 THEN {b3} ELSE 0.0 END)"
    )


def diffuse_fraction_enhanced(k: str, sinalt: str, t_amb_k: str, rh: str) -> str:
    """Reindl 1990 enhanced split (T + relative humidity terms) —
    pv/irradiation.py:54-74.  Temperature enters in the reference's
    native unit (the dataset's Kelvin column is used as-is)."""
    b1 = f"least(1.0, 1.000 - 0.232 * {k} + 0.0239 * {sinalt} - 0.000682 * {t_amb_k} + 0.0195 * {rh})"
    b2 = (
        f"least(0.97, greatest(0.1, "
        f"1.329 - 1.716 * {k} + 0.267 * {sinalt} - 0.00357 * {t_amb_k} + 0.106 * {rh}))"
    )
    b3 = f"greatest(0.1, 0.426 * {k} - 0.256 * {sinalt} + 0.00349 * {t_amb_k} + 0.0734 * {rh})"
    return (
        f"(CASE WHEN {k} > 0.0 AND {k} <= 0.3 THEN {b1} "
        f"WHEN {k} > 0.3 AND {k} < 0.78 THEN {b2} "
        f"WHEN {k} >= 0.78 THEN {b3} ELSE 0.0 END)"
    )


def tilted_irradiation_simple(direct: str, diffuse: str, cosinc: str, alt: str,
                              slope: str, albedo: str) -> str:
    """trigon_model='simple' total tilted — pv/irradiation.py:179-189.

    direct_t = (cosinc/sin(alt))·direct;
    diffuse_t = (1+cos(slope))/2·diffuse + albedo·influx·(1−cos(slope))/2;
    NaNs (sun below horizon → 0/0) → 0 per the reference fillna.

    sin(alt) = 0 exactly (sun precisely on the horizon) divides by
    zero → nullif keeps it NULL in both engines instead of an ANSI
    abort; the low-sun suppression zeroes those rows anyway.
    """
    k = f"(({cosinc}) / nullif(sin({alt}), 0.0))"
    direct_t = f"({k} * ({direct}))"
    influx = f"(({direct}) + ({diffuse}))"
    diffuse_t = (
        f"((1.0 + cos({slope})) / 2.0 * ({diffuse}) "
        f"+ ({albedo}) * {influx} * ((1.0 - cos({slope})) / 2.0))"
    )
    dt0 = f"(CASE WHEN isnan({direct_t}) THEN 0.0 ELSE {direct_t} END)"
    ft0 = f"(CASE WHEN isnan({diffuse_t}) THEN 0.0 ELSE {diffuse_t} END)"
    return f"({dt0} + {ft0})"


def tilted_irradiation_hay_davies(direct: str, diffuse: str, toa: str,
                                  cosinc: str, alt: str, slope: str,
                                  albedo: str) -> str:
    """Hay-Davies anisotropic model — pv/irradiation.py:85-130, 148-151."""
    influx = f"(({direct}) + ({diffuse}))"
    # nullif guards (night rows: influx = toa = 0): NULL flows through
    # identically in Spark (ANSI) and DuckDB, and the low-sun
    # suppression zeroes those rows downstream.
    fraw = f"(sqrt(({direct}) / nullif({influx}, 0.0)))"
    f = f"(CASE WHEN isnan({fraw}) OR {influx} = 0 THEN 0.0 ELSE {fraw} END)"
    A = f"(({direct}) / nullif({toa}, 0.0))"
    rb = f"(({cosinc}) / nullif(sin({alt}), 0.0))"
    s3 = f"power(sin(({slope}) / 2.0), 3.0)"
    dt_raw = (
        f"(((1.0 - {A}) * ((1 + cos({slope})) / 2.0) * (1.0 + {f} * {s3}) "
        f"+ {A} * {rb}) * ({diffuse}))"
    )
    diffuse_t = f"(CASE WHEN isnan({dt_raw}) OR {dt_raw} < 0.0 THEN 0.0 ELSE {dt_raw} END)"
    direct_t = f"({rb} * ({direct}))"
    ground_t = f"({influx} * ({albedo}) * (1.0 - cos({slope})) / 2.0)"
    return f"({direct_t} + {diffuse_t} + {ground_t})"


def suppress_low_sun(total: str, alt: str, direct: str, diffuse: str,
                     altitude_threshold_deg: float = 1.0) -> str:
    """Zero below 1° solar altitude or negligible influx — irradiation.py:197-202."""
    return (
        f"(CASE WHEN ({alt}) < radians({altitude_threshold_deg!r}) "
        f"OR (({direct}) + ({diffuse})) <= 0.01 THEN 0.0 ELSE {total} END)"
    )


def clip_influx(x: str, upper: str) -> str:
    """clip(min=0, max=upper) — irradiation.py:164-173."""
    return f"(least(greatest({x}, 0.0), {upper}))"


# ---------------------------------------------------------------------------
# panel models (pv/solar_panel_model.py)
# ---------------------------------------------------------------------------

def power_huld(irr: str, t_amb_k: str, pc: dict) -> str:
    """Huld 2010 panel efficiency — solar_panel_model.py:30-61."""
    T_ = f"(({pc['c_temp_amb']!r} * {t_amb_k} + {pc['c_temp_irrad']!r} * ({irr})) - {pc['r_tmod']!r})"
    G_ = f"(({irr}) / {pc['r_irradiance']!r})"
    lg = f"(ln({G_}))"
    eff = (
        f"(1 + {pc['k_1']!r} * {lg} + {pc['k_2']!r} * {lg} * {lg} "
        f"+ {T_} * ({pc['k_3']!r} + {pc['k_4']!r} * {lg} + {pc['k_5']!r} * {lg} * {lg}) "
        f"+ {pc['k_6']!r} * {T_} * {T_})"
    )
    inv = pc.get("inverter_efficiency", 1.0)
    return (
        f"(CASE WHEN ({irr}) <= 0.0 THEN 0.0 "
        f"ELSE {G_} * greatest(0.0, {eff}) * {inv!r} END)"
    )


def power_bofinger(irr: str, t_amb_k: str, pc: dict) -> str:
    """Beyer/Bofinger 2004 panel model — solar_panel_model.py:64-89."""
    frac = (pc["NOCT"] - pc["Tamb"]) / pc["Intc"]
    eta_ref = f"({pc['A']!r} + {pc['B']!r} * ({irr}) + {pc['C']!r} * ln({irr}))"
    eta = (
        f"({eta_ref} * (1.0 + {pc['D']!r} * ({frac!r} * ({irr}) + ({t_amb_k} - {pc['Tstd']!r}))) "
        f"/ (1.0 + {pc['D']!r} * {frac!r} / {pc['ta']!r} * {eta_ref} * ({irr})))"
    )
    capacity = (pc["A"] + pc["B"] * 1000.0 + pc["C"] * np.log(1000.0)) * 1e3
    inv = pc.get("inverter_efficiency", 1.0)
    return (
        f"(CASE WHEN ({irr}) < {pc['threshold']!r} THEN 0.0 "
        f"ELSE ({irr}) * {eta} * {inv / capacity!r} END)"
    )


def solar_thermal(irr: str, t_amb_k: str, c0: float = 0.8, c1: float = 3.0,
                  t_store_c: float = 80.0) -> str:
    """Solar thermal collector output — convert.py:216-235."""
    t_store = t_store_c + 273.15
    eta = f"({c0!r} - {c1!r} * (({t_store!r} - {t_amb_k}) / ({irr})))"
    out = f"(({irr}) * {eta})"
    return f"(CASE WHEN ({irr}) <= 0.0 OR NOT ({out} > 0.0) THEN 0.0 ELSE {out} END)"
