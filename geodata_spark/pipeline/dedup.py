"""Deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding.

Scale shapes:

- **exact** — one hash aggregation on the normalized-text digest.
- **n-gram Jaccard** — shingle-inverted-index self-join (pairs share
  ≥1 shingle → candidate), then set-overlap ratio; never a cross join.
- **MinHash+LSH** — K hash-min signature per doc (all Catalyst:
  ``xxhash64(shingle, seed)`` + ``min`` aggregations), banded into
  b=16 buckets of r=4; candidate pairs only within a bucket.
- **SimHash** — 64-bit sign-aggregate of token hashes (Arrow pandas
  UDF packs bits); near-dups = small Hamming distance.
- **embedding near-dup** — cosine over candidate pairs from
  random-hyperplane buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geodata_spark.pipeline.text import normalize_sql


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Clusters of byte-identical (after normalization) documents.

    Output: (fingerprint, cluster_size, survivor_id) — survivor = min id.
    """
    fp = F.expr(f"md5({normalize_sql(text_col, 'spark')})")
    return (
        docs.withColumn("fingerprint", fp)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.min(id_col).alias("survivor_id"),
        )
    )


# ---------------------------------------------------------------------------
# shingles + Jaccard
# ---------------------------------------------------------------------------

def with_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles, one row per (id, shingle)."""
    norm = F.expr(normalize_sql(text_col, "spark"))
    toks = F.split(norm, " ")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    sh = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.2,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold.

    Inverted-index join: candidates must share a shingle, so the join
    grain is (shingle → doc list), not doc × doc.  Hot shingles
    amplify candidates — production setups drop ultra-frequent
    shingles first (stop-shingle filter), exposed via the
    ``max_shingle_freq`` knob.
    """
    sh = with_shingles(docs, n, id_col, text_col)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(docs: DataFrame, k: int = 64, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """K-permutation MinHash signature per doc — pure Catalyst.

    Permutation j ≈ xxhash64(shingle, seed=j); signature[j] = min.
    One explode + one hash aggregation with K min() columns.
    """
    sh = with_shingles(docs, n, id_col, text_col)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(j))).alias(f"h{j}") for j in range(k)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"h{j}" for j in range(k)]).alias("signature"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 16, rows: int = 4) -> DataFrame:
    """Band the signature; docs sharing any band bucket are candidates."""
    assert bands * rows <= 1024
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("signature").getItem(b * rows + r) for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup(docs: DataFrame, threshold: float = 0.5, k: int = 64,
                  bands: int = 16, rows: int = 4, n: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard ≥ threshold."""
    sigs = minhash_signatures(docs, k, n, id_col, text_col)
    cands = lsh_candidate_pairs(sigs, bands, rows)
    sh = with_shingles(docs, n, id_col, text_col)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cands.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_jaccard_estimate(signatures: DataFrame, k: int = 64) -> DataFrame:
    """Pairwise estimated Jaccard = fraction of matching signature slots
    (diagnostic; O(n²) — use on samples)."""
    a = signatures.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"))
    b = signatures.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    return pairs.select(
        "id_a", "id_b", (matches.cast("double") / F.lit(float(k))).alias("jaccard_est")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def _pack_simhash(hashes: pd.Series) -> pd.Series:
    """token-hash array → 64-bit simhash (sign of per-bit vote sum)."""
    out = np.zeros(len(hashes), dtype=np.int64)
    for i, arr in enumerate(hashes):
        if arr is None or len(arr) == 0:
            continue
        h = np.asarray(arr, dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        word = np.uint64(0)
        for bpos in np.nonzero(votes > 0)[0]:
            word |= np.uint64(1) << np.uint64(bpos)
        out[i] = np.int64(word.astype(np.int64))
    return pd.Series(out)


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document (token grain)."""
    norm = F.expr(normalize_sql(text_col, "spark"))
    toks = F.explode(F.split(norm, " ")).alias("tok")
    tok_hashes = (
        docs.select(F.col(id_col).alias("id"), toks)
        .filter(F.length("tok") > 0)
        .select("id", F.xxhash64("tok").alias("h"))
        .groupBy("id")
        .agg(F.collect_list("h").alias("hs"))
    )
    return tok_hashes.select("id", _pack_simhash("hs").alias("simhash"))


def hamming64(a: F.Column, b: F.Column) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(docs: DataFrame, max_hamming: int = 8,
                          prefix_bits: int = 12, **kw) -> DataFrame:
    """Near-dup pairs by SimHash with prefix-bucket candidate pruning.

    Multi-probe on 4 rotated prefixes so a ≤max_hamming pair is caught
    unless all its differing bits fall in every probed prefix
    (recall knob; exact variant would use all C(64/k) blocks).
    """
    sh = simhash(docs, **kw)
    probes = []
    for p in range(4):
        rot = F.shiftrightunsigned(F.col("simhash"), p * 16)
        probes.append(
            sh.select(
                "id", "simhash",
                F.lit(p).alias("probe"),
                F.pmod(rot, F.lit(1 << prefix_bits)).alias("bucket"),
            )
        )
    banded = probes[0]
    for p in probes[1:]:
        banded = banded.unionByName(p)
    a = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "probe", "bucket")
    b = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "probe", "bucket")
    return (
        a.join(b, ["probe", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
