"""Deterministic synthetic data — the interleaved document corpus.

The engine's primary input (BASELINE.json ``input_hint``) is an
Iceberg/Parquet table::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

No external data exists in the sandbox, so the corpus is **synthesised
deterministically from pure integer arithmetic** — the same formulas
are emitted both as Spark ``Column`` expressions and as ANSI-SQL text,
which lets the DuckDB oracle reproduce every derived value *bit
exactly*:

- every float is a dyadic rational (k/2^m), so products and sums are
  exact in IEEE-754 and therefore **order-independent** — Spark's
  partial aggregation and DuckDB's single-threaded sum agree to the
  last bit;
- every string is built with C-style ``printf`` formatting of values
  that need no rounding, so ``format_string`` (JVM) and ``printf``
  (DuckDB) agree byte-for-byte.

Geometry mirrors the reference's MERRA2 grid (0.5° lat × 0.625° lon,
lat south→north — ``src/geodata/datasets/merra2.py:592``) inside the
China cutout window of ``docs/source/mask/mask_on_cutout.ipynb``
(xs=slice(73,136), ys=slice(18,54)).  A skew knob concentrates 30% of
documents into 4 "urban" cells (dense-coastal-cell skew, north_rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared integer-arithmetic constants (keep in sync between expr and SQL)
# ---------------------------------------------------------------------------

HA = 2654435761  # Knuth multiplicative constant
HB = 97003
HC = 7919
HD = 12345
HM = 2147483647  # 2^31 - 1

# grid geometry (MERRA2-style, China window)
LAT0 = 18.25     # southernmost cell center
DLAT = 0.5
NY = 72          # lat centers 18.25 .. 53.75
LON0 = 73.3125   # westernmost cell center
DLON = 0.625
NX = 101         # lon centers 73.3125 .. 135.8125
NHOURS = 744     # one month of hourly steps
TS0 = "2011-01-01 00:00:00"

# skew: 30% of docs land in these (lat_idx, lon_idx) "urban" cells
URBAN = [(25, 91), (26, 91), (44, 76), (12, 18)]
SKEW_MOD = 10
SKEW_LT = 3      # i % 10 < 3  → skewed doc

# max spans per doc = 2 + [0,5) = 6
MAX_SPANS = 6

__all__ = [
    "synth_documents",
    "synth_documents_exploded",
    "documents_sql_cte",
    "synth_grid_vars",
    "grid_vars_sql_cte",
    "synth_mask_layers",
    "mask_layers_sql_cte",
    "N_DOCS_MULTIPLIER",
]

# scale coupling: corpus size = rows(driver documents table) × this
N_DOCS_MULTIPLIER = 40


# ---------------------------------------------------------------------------
# hash helpers
# ---------------------------------------------------------------------------

def _h_expr(i: Column, j: Column, k: int) -> Column:
    """H(i,j,k) = (i*HA + j*HB + k*HC + HD) % HM  — Column form.

    All operands stay well inside int64 for i < 3.4e9 documents.
    """
    return (i * F.lit(HA) + j * F.lit(HB) + F.lit(k * HC + HD)) % F.lit(HM)


def _h_sql(i: str, j: str, k: int) -> str:
    return f"(({i}) * {HA} + ({j}) * {HB} + {k * HC + HD}) % {HM}"


# ---------------------------------------------------------------------------
# Spark-side generation
# ---------------------------------------------------------------------------

def _dec4(x: Column) -> Column:
    """Render a dyadic value with ≤4 decimal digits exactly as
    ``%.4f`` would — by integer arithmetic instead of Java's
    ``Formatter`` (which re-parses the format string and walks the
    float formatting path per row; measured 2x on the ref-building
    projection, r8, byte-equal output).

    Precondition: ``x * 10000`` is an exact integer in double (true
    for every synth field — lat/lon/val are dyadic rationals on a
    1/16-or-coarser grid), so ``%.4f`` performs no rounding and equals
    sign + integer part + '.' + zero-padded 4-digit fraction.
    """
    n = (x * F.lit(10000.0)).cast("long")
    a = F.abs(n)
    return F.concat(
        F.when(n < 0, F.lit("-")).otherwise(F.lit("")),
        (a / F.lit(10000)).cast("long").cast("string"),
        F.lit("."),
        F.lpad(F.pmod(a, F.lit(10000)).cast("string"), 4, "0"),
    )


def _span_fields(i: Column, j: Column) -> dict[str, Column]:
    """All derived per-span fields from (doc index i, span index j)."""
    code = _h_expr(i, j, 1) % 8  # 0,1 text | 2,3,4 geo | 5 image | 6,7 raster_tile
    skewed = (i % SKEW_MOD) < F.lit(SKEW_LT)
    u = _h_expr(i, j, 9) % 4

    lat_idx = _h_expr(i, j, 2) % NY
    lon_idx = _h_expr(i, j, 3) % NX
    for uu, (uy, ux) in enumerate(URBAN):
        lat_idx = F.when(skewed & (u == uu), F.lit(uy)).otherwise(lat_idx)
        lon_idx = F.when(skewed & (u == uu), F.lit(ux)).otherwise(lon_idx)

    lat = F.lit(LAT0) + F.lit(DLAT) * lat_idx.cast("double")
    lon = F.lit(LON0) + F.lit(DLON) * lon_idx.cast("double")
    hour = _h_expr(i, j, 4) % NHOURS
    val = (_h_expr(i, j, 5) % 1600).cast("double") / F.lit(16.0)  # [0,100) step 1/16

    is_geo = (code >= 2) & (code <= 4)
    is_image = code == 5
    is_tile = code >= 6

    kind = (
        F.when(is_geo, F.lit("geo"))
        .when(is_image, F.lit("image"))
        .when(is_tile, F.lit("raster_tile"))
        .otherwise(F.lit("text"))
    )
    # refs built by concat of integer-exact pieces, not format_string:
    # Java's Formatter parses the pattern and walks the general float
    # path per row; dec4/cast render the same bytes at half the cost
    # (byte-equality pinned by the parse round-trip tests and every
    # corpus oracle hash)
    geo_ref = F.concat(
        F.lit("geo:"), _dec4(lat), F.lit(","), _dec4(lon),
        F.lit("@h"), hour.cast("string"),
        F.lit("#var=wnd100m&val="), _dec4(val),
    )
    tile_ref = F.concat(
        F.lit("tile:"), _dec4(lat), F.lit(","), _dec4(lon),
        F.lit("@h"), hour.cast("string"),
        F.lit("#res=7&val="), _dec4(val),
    )
    img_ref = F.concat(
        F.lit("img://shard"), (_h_expr(i, j, 6) % 16).cast("string"),
        F.lit("/"), i.cast("string"), F.lit("/"), j.cast("string"),
        F.lit(".bin"),
    )
    media_ref = (
        F.when(is_geo, geo_ref)
        .when(is_tile, tile_ref)
        .when(is_image, img_ref)
        .otherwise(F.lit(""))
    )
    text = F.when(
        code <= 1,
        F.concat(
            F.lit("w"), (_h_expr(i, j, 7) % 1000).cast("string"),
            F.lit(" w"), (_h_expr(i, j, 10) % 1000).cast("string"),
            F.lit(" w"), (_h_expr(i, j, 11) % 1000).cast("string"),
        ),
    ).otherwise(F.lit(""))
    offset = (j * F.lit(16) + _h_expr(i, j, 8) % 16).cast("int")
    return {
        "kind": kind,
        "text": text,
        "media_ref": media_ref,
        "offset": offset,
        # numeric twins (used by exploded form / internal operators)
        "lat": lat,
        "lon": lon,
        "hour": hour,
        "val": val,
        "code": code,
    }


def synth_documents(spark: SparkSession, n_docs: int, num_partitions: int | None = None) -> DataFrame:
    """The interleaved corpus in its contractual nested form.

    Pure Catalyst: ``range`` → ``transform(sequence(...))`` — no Python
    in the generation path, so it scales to any corpus size Spark can
    shuffle (the 10^12-doc target is a bigger ``range`` with the same
    plan).
    """
    df = spark.range(0, n_docs, 1, num_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    nspans = (F.lit(2) + _h_expr(i, F.lit(0), 0) % 5).cast("int")

    def mk_span(j: Column) -> Column:
        f = _span_fields(i, j.cast("long"))
        return F.struct(
            f["kind"].alias("kind"),
            f["text"].alias("text"),
            f["media_ref"].alias("media_ref"),
            f["offset"].alias("offset"),
        )

    return df.select(
        # lpad-concat == "doc%012d" for the corpus contract i < 3.4e9
        # (≤ 10 digits; Spark lpad would truncate only past 12)
        F.concat(F.lit("doc"), F.lpad(i.cast("string"), 12, "0")).alias("doc_id"),
        F.transform(F.sequence(F.lit(0), nspans - F.lit(1)), mk_span).alias("spans"),
    )


def synth_documents_exploded(spark: SparkSession, n_docs: int) -> DataFrame:
    """Exploded per-span form with numeric twin columns.

    Avoids re-parsing media_ref when an operator needs the numerics —
    but the parse path is also provided (``spatial.parse_geo_spans``)
    and tested for byte-exact round-trip.
    """
    df = spark.range(0, n_docs, 1, spark.sparkContext.defaultParallelism)
    i = F.col("id")
    nspans = (F.lit(2) + _h_expr(i, F.lit(0), 0) % 5).cast("int")
    df = df.select(
        i.alias("i"),
        F.explode(F.sequence(F.lit(0), nspans - F.lit(1))).alias("j"),
    )
    f = _span_fields(F.col("i"), F.col("j").cast("long"))
    return df.select(
        F.concat(F.lit("doc"), F.lpad(F.col("i").cast("string"), 12, "0")).alias("doc_id"),
        F.col("i"),
        F.col("j").cast("long").alias("j"),
        f["kind"].alias("kind"),
        f["text"].alias("text"),
        f["media_ref"].alias("media_ref"),
        f["offset"].alias("offset"),
        f["lat"].alias("lat"),
        f["lon"].alias("lon"),
        f["hour"].cast("long").alias("hour"),
        f["val"].alias("val"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle CTE (same arithmetic, ANSI SQL)
# ---------------------------------------------------------------------------

def documents_sql_cte(mult: int = N_DOCS_MULTIPLIER) -> str:
    """SQL CTE text producing the exploded corpus as ``spansx``.

    Corpus size = rows(documents view) × ``mult``; DuckDB's ``range()``
    only accepts constants, so the index set is derived by
    cross-joining the documents view with ``range(mult)``.  Produces
    columns (i, j, doc_id, kind, text, media_ref, offset, lat, lon,
    hour, val).
    """
    h = _h_sql
    urban_lat = " ".join(
        f"WHEN f.u = {uu} THEN {uy}" for uu, (uy, _) in enumerate(URBAN)
    )
    urban_lon = " ".join(
        f"WHEN f.u = {uu} THEN {ux}" for uu, (_, ux) in enumerate(URBAN)
    )
    return f"""
_idx AS (
  SELECT (d.rn - 1) * {mult} + CAST(m.range AS BIGINT) AS i
  FROM (SELECT CAST(row_number() OVER () AS BIGINT) AS rn FROM documents) d,
       range({mult}) m
),
_sp AS (
  SELECT i, CAST(s.range AS BIGINT) AS j
  FROM _idx, range({MAX_SPANS}) s
  WHERE s.range < 2 + ({h('i', '0', 0)}) % 5
),
_fields AS (
  SELECT i, j,
         ({h('i', 'j', 1)}) % 8 AS code,
         (i % {SKEW_MOD}) < {SKEW_LT} AS skewed,
         ({h('i', 'j', 9)}) % 4 AS u,
         ({h('i', 'j', 2)}) % {NY} AS lat_idx0,
         ({h('i', 'j', 3)}) % {NX} AS lon_idx0,
         ({h('i', 'j', 4)}) % {NHOURS} AS hour,
         CAST(({h('i', 'j', 5)}) % 1600 AS DOUBLE) / 16.0 AS val,
         ({h('i', 'j', 6)}) % 16 AS shard,
         ({h('i', 'j', 7)}) % 1000 AS w1,
         ({h('i', 'j', 10)}) % 1000 AS w2,
         ({h('i', 'j', 11)}) % 1000 AS w3,
         CAST(j * 16 + ({h('i', 'j', 8)}) % 16 AS INT) AS "offset"
  FROM _sp
),
_geo AS (
  SELECT f.*,
         CASE WHEN f.skewed THEN (CASE {urban_lat} END) ELSE f.lat_idx0 END AS lat_idx,
         CASE WHEN f.skewed THEN (CASE {urban_lon} END) ELSE f.lon_idx0 END AS lon_idx
  FROM _fields f
),
spansx AS (
  SELECT i, j,
         printf('doc%012d', i) AS doc_id,
         CASE WHEN code BETWEEN 2 AND 4 THEN 'geo'
              WHEN code = 5 THEN 'image'
              WHEN code >= 6 THEN 'raster_tile'
              ELSE 'text' END AS kind,
         CASE WHEN code <= 1 THEN printf('w%d w%d w%d', w1, w2, w3) ELSE '' END AS text,
         CASE WHEN code BETWEEN 2 AND 4 THEN
                printf('geo:%.4f,%.4f@h%d#var=wnd100m&val=%.4f',
                       {LAT0} + {DLAT} * lat_idx, {LON0} + {DLON} * lon_idx, hour, val)
              WHEN code >= 6 THEN
                printf('tile:%.4f,%.4f@h%d#res=7&val=%.4f',
                       {LAT0} + {DLAT} * lat_idx, {LON0} + {DLON} * lon_idx, hour, val)
              WHEN code = 5 THEN printf('img://shard%d/%d/%d.bin', shard, i, j)
              ELSE '' END AS media_ref,
         "offset",
         {LAT0} + {DLAT} * lat_idx AS lat,
         {LON0} + {DLON} * lon_idx AS lon,
         hour,
         val
  FROM _geo
)"""


# ---------------------------------------------------------------------------
# grid_vars — long-format cutout table (engine-internal canonical form)
# ---------------------------------------------------------------------------

GA, GB, GC, GK = 8191, 131071, 524287, 977


def _g_expr(h: Column, y: Column, x: Column, k: int) -> Column:
    return (h * F.lit(GA) + y * F.lit(GB) + x * F.lit(GC) + F.lit(k * HA + GK) % F.lit(HM)) % F.lit(HM)


def _g_sql(h: str, y: str, x: str, k: int) -> str:
    return f"(({h}) * {GA} + ({y}) * {GB} + ({x}) * {GC} + {(k * HA + GK) % HM}) % {HM}"


#: physical variables of the canonical cutout table: name -> (offset, span, frac_div, key)
#: value = offset + (G % span) / frac_div — all dyadic (frac_div = 2^m)
GRID_VARS = {
    "temperature": (250.0, 800, 16.0, 1),    # K, 250..300
    "soiltemperature": (248.0, 900, 16.0, 2),
    "wnd100m": (0.0, 640, 16.0, 3),          # m/s 0..40
    "wndlml": (0.0, 512, 16.0, 4),
    "hlml": (40.0, 640, 16.0, 5),            # m 40..80
    "disph": (0.0, 160, 16.0, 6),            # m 0..10
    "roughness": (0.0, 32, 32.0, 7),         # m 0..1
    "ustar": (0.0, 32, 16.0, 8),             # m/s 0..2
    "rhoa": (1.0, 8, 16.0, 9),               # kg/m3 1..1.5
    "hflux": (-100.0, 4800, 16.0, 10),       # W/m2 -100..200
    "eflux": (-50.0, 2400, 16.0, 11),
    "influx_direct": (0.0, 14336, 16.0, 12), # W/m2 0..896
    "influx_diffuse": (0.0, 4096, 16.0, 13),
    "influx_toa": (0.0, 21504, 16.0, 14),
    "albedo": (0.0, 16, 16.0, 15),           # 0..1 step 1/16
    "pressure": (95000.0, 160000, 16.0, 16),
    "influx": (0.0, 16384, 16.0, 17),
    "ulml": (-20.0, 640, 16.0, 23),          # m/s -20..20 (wind components)
    "vlml": (-20.0, 640, 16.0, 24),
    "humidity": (0.0, 16, 16.0, 25),         # relative humidity 0..1
    "outflux": (0.0, 4096, 16.0, 26),        # upward SW for albedo fallback
    "dusmass25": (0.0, 1024, 16384.0, 18),   # kg/m3-ish small
    "sssmass25": (0.0, 1024, 16384.0, 19),
    "bcsmass": (0.0, 512, 16384.0, 20),
    "ocsmass": (0.0, 512, 16384.0, 21),
    "so4smass": (0.0, 512, 16384.0, 22),
}


def synth_grid_vars(
    spark: SparkSession,
    nhours: int = 48,
    ny: int = NY,
    nx: int = NX,
    variables: tuple[str, ...] | None = None,
) -> DataFrame:
    """Canonical long-format cutout table: one row per (ts, lat, lon).

    Partition-friendly: generated from a single ``range`` (decoded by
    integer division) so Spark parallelises generation without a
    shuffle; real deployments read this table from the catalog
    partitioned by (year, month) instead.
    """
    variables = variables or tuple(GRID_VARS)
    n = nhours * ny * nx
    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    h = (F.col("id") / F.lit(ny * nx)).cast("long")
    rem = F.col("id") - h * F.lit(ny * nx)
    y = (rem / F.lit(nx)).cast("long")
    x = rem - y * F.lit(nx)
    cols = [
        h.alias("hour"),
        F.expr(f"timestamp'{TS0}' + make_interval(0,0,0,0, CAST(id div {ny * nx} AS INT))").alias("ts"),
        (F.lit(LAT0) + F.lit(DLAT) * y.cast("double")).alias("lat"),
        (F.lit(LON0) + F.lit(DLON) * x.cast("double")).alias("lon"),
    ]
    for name in variables:
        off, span, div, key = GRID_VARS[name]
        g = _g_expr(h, y, x, key)
        cols.append((F.lit(off) + (g % span).cast("double") / F.lit(div)).alias(name))
    return df.select(*cols)


def grid_vars_sql_cte(nhours: int = 48, ny: int = NY, nx: int = NX,
                      variables: tuple[str, ...] | None = None) -> str:
    """DuckDB CTE ``gridv`` mirroring :func:`synth_grid_vars` bit-exactly."""
    variables = variables or tuple(GRID_VARS)
    n = nhours * ny * nx
    var_sql = ",\n         ".join(
        f"{GRID_VARS[v][0]!r} + CAST(({_g_sql('h', 'y', 'x', GRID_VARS[v][3])}) % {GRID_VARS[v][1]} AS DOUBLE) / {GRID_VARS[v][2]!r} AS {v}"
        for v in variables
    )
    return f"""
_g0 AS (
  SELECT CAST(r.range AS BIGINT) AS id FROM range({n}) r
),
_g1 AS (
  SELECT id, id // {ny * nx} AS h,
         (id % {ny * nx}) // {nx} AS y,
         id % {nx} AS x
  FROM _g0
),
gridv AS (
  SELECT h AS hour,
         TIMESTAMP '{TS0}' + h * INTERVAL 1 HOUR AS ts,
         {LAT0} + {DLAT} * y AS lat,
         {LON0} + {DLON} * x AS lon,
         {var_sql}
  FROM _g1
)"""


# ---------------------------------------------------------------------------
# mask_layers — raster suitability layers (FIXTURES.md §4)
# ---------------------------------------------------------------------------
# Mirrors the notebook stack (elevation / slope / modis landuse /
# protected, docs/source/mask/mask_creation_workflow.ipynb). All values
# dyadic → merge sums are order-independent and oracle-exact.

MASK_LAYERS = {
    # name: (expr builder params: span, divisor, offset, key)
    "elevation": (8192, 2.0, 0.0, 30),    # 0..4096 m, step 0.5
    "slope": (960, 16.0, 0.0, 31),        # 0..60 deg
    "modis": (17, 1.0, 1.0, 32),          # land-use class 1..17
    "protected": (16, 1.0, 0.0, 33),      # 0..15; ==0 → protected flag below
}


def synth_mask_layers(spark: SparkSession, ny: int = NY, nx: int = NX) -> DataFrame:
    """Long mask-layer table (layer, cell, lat, lon, value), res-9 cells."""
    from geodata_spark import cells as _cells

    n = ny * nx
    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    y = (F.col("id") / F.lit(nx)).cast("long")
    x = F.col("id") - y * F.lit(nx)
    lat = (F.lit(LAT0) + F.lit(DLAT) * y.cast("double")).alias("lat")
    lon = (F.lit(LON0) + F.lit(DLON) * x.cast("double")).alias("lon")
    parts = []
    for name, (span, div, off, key) in MASK_LAYERS.items():
        g = _g_expr(F.lit(0), y, x, key)
        val = (F.lit(off) + (g % span).cast("double") / F.lit(div))
        if name == "protected":
            val = F.when((g % span) == 0, F.lit(1.0)).otherwise(F.lit(0.0))
        parts.append(
            df.select(
                F.lit(name).alias("layer"),
                _cells.cell_expr(lat, lon, 9).alias("cell"),
                y.alias("y_idx"),
                x.alias("x_idx"),
                lat,
                lon,
                val.alias("value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mask_layers_sql_cte(ny: int = NY, nx: int = NX) -> str:
    """DuckDB CTE ``maskl`` mirroring :func:`synth_mask_layers`."""
    from geodata_spark import cells as _cells

    n = ny * nx
    selects = []
    for name, (span, div, off, key) in MASK_LAYERS.items():
        g = _g_sql("0", "y", "x", key)
        if name == "protected":
            val = f"CASE WHEN ({g}) % {span} = 0 THEN 1.0 ELSE 0.0 END"
        else:
            val = f"{off!r} + CAST(({g}) % {span} AS DOUBLE) / {div!r}"
        selects.append(
            f"SELECT '{name}' AS layer, "
            f"{_cells.cell_sql('lat', 'lon', 9)} AS cell, lat, lon, {val} AS value "
            f"FROM _mgrid"
        )
    union = " UNION ALL ".join(selects)
    return f"""
_m0 AS (
  SELECT CAST(r.range AS BIGINT) AS id FROM range({n}) r
),
_mgrid AS (
  SELECT id // {nx} AS y, id % {nx} AS x,
         {LAT0} + {DLAT} * (id // {nx}) AS lat,
         {LON0} + {DLON} * (id % {nx}) AS lon
  FROM _m0
),
maskl AS (
  {union}
)"""


# ---------------------------------------------------------------------------
# embeddings corpus (ANN crossover bench; mirrors testdata embeddings shape)
# ---------------------------------------------------------------------------

EMB_SEED = 7          # cluster-center RNG key
EMB_BLOCK = 4096      # noise block size (partition-independent seeding)


def synth_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    n_clusters: int = 64,
    noise: float = 0.25,
) -> DataFrame:
    """Deterministic clustered embeddings ``(vec_id, embedding, label)``
    — the testdata ``embeddings.parquet`` shape at any scale.

    label = vec_id % n_clusters; embedding = center[label] + noise.
    Noise is **partition-independent**: row ``i``'s noise is row
    ``i % EMB_BLOCK`` of ``RandomState(EMB_SEED*31 + i//EMB_BLOCK)``'s
    block, so any repartitioning of the ``range`` produces bit-identical
    vectors (mapInPandas batches over a ``spark.range`` are contiguous
    id runs, so each batch touches O(batch/BLOCK) blocks, not one RNG
    per row).  Floats are float32 like the driver table.

    Because labels cycle ``i % n_clusters``, ids ``0..n_clusters-1``
    hit every cluster exactly once — so IVF's lowest-id centroid
    sample (similarity.ivf_centroids) lands one centroid per true
    cluster, the configuration the crossover bench measures.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    centers = (
        np.random.RandomState(EMB_SEED)
        .standard_normal((n_clusters, dim))
        .astype(np.float64)
    )

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), dim), dtype=np.float64)
            for blk in np.unique(ids // EMB_BLOCK):
                rs = np.random.RandomState(EMB_SEED * 31 + int(blk))
                block = rs.standard_normal((EMB_BLOCK, dim))
                sel = (ids // EMB_BLOCK) == blk
                out[sel] = block[ids[sel] % EMB_BLOCK]
            labels = (ids % n_clusters).astype(np.int32)
            emb = centers[labels] + noise * out
            emb32 = emb.astype(np.float32)
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": list(emb32),
                "label": labels,
            })

    rng = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema)
