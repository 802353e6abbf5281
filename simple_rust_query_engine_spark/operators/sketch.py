"""Distinct-count sketching: KMV (k-minimum-values) estimator.

Beyond reference parity (the reference has COUNT/SUM/AVG/MIN/MAX
only).  The scale story for COUNT(DISTINCT) has three tiers:

* exact, skew-safe         — ``skew.two_phase_ndistinct`` (two shuffles)
* approximate, built-in    — ``F.approx_count_distinct`` (HLL++,
                             map-side combinable, one tiny shuffle)
* approximate, explainable — THIS: the textbook KMV estimator built
                             from plain DataFrame ops

KMV: hash every value into [0, M); keep each key's k smallest
distinct hashes; if fewer than k exist the count is exact, else
estimate (k-1) * M / kth_smallest.  Error ~ 1/sqrt(k-2).

Two properties make this one interesting:

* the k-minima computation is SKEW-SAFE by construction here: a
  salted first phase keeps each (key, salt) partition's k smallest
  hashes — a hot key's distinct set spreads over ``n_salt`` reducers
  and at most ``n_salt * k`` rows per key reach the final per-key
  rank (the global k minima are necessarily among the per-salt
  minima), so no reducer ever sorts a hot key's full distinct set;
* with a deterministic hash the whole sketch — including the
  estimate — is bit-reproducible on any engine, so unlike HLL it has
  an EXACT DuckDB oracle twin (``kmv_ndistinct`` is hash-checked like
  every exact operator; ``approx_count_distinct`` can only ever get a
  rows-only check).

The affine hash keeps every intermediate < 2^53 (int64-exact in both
engines); production swaps ``xxhash64`` when no oracle is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 64
KMV_MOD = 16 ** 13  # hash range: 13 md5 hex chars = 2^52 (int64-safe
#                     in both engines, and md5 prefixes are uniform —
#                     an affine re-mix whose product does not wrap the
#                     modulus would compress the range and bias the
#                     estimator upward, measured 5.6× off)


def _kmv_hash(col):
    """Deterministic uniform hash into [0, 2^52): the first 13 hex
    chars of md5, parsed as an integer — identical in Spark
    (``conv``) and DuckDB (``'0x…'::BIGINT``)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "long"
    )


N_SALT = 32


def kmv_ndistinct(
    df: DataFrame, key: str, val: str, k: int = KMV_K, n_salt: int = N_SALT
) -> DataFrame:
    """Per-key approximate COUNT(DISTINCT val) via k minimum values.

    hash (map-side, per row) → distinct (key, hash) → per-(key, salt)
    k minima → per-key k minima → estimate.  The salt phase bounds
    every reducer: a hot key's distinct hashes spread over ``n_salt``
    partitions and only ``n_salt * k`` survivors reach the final
    per-key rank — the global minima are always among the per-salt
    minima, so the result is salt-independent.  ``n_seen`` (minima
    kept) doubles as the exact count whenever the key has < k
    distinct values.
    """
    hashed = (
        # hash per ROW (cheap map-side md5), ONE distinct on the
        # (key, hash) pair — a prior distinct on raw (key, val) would
        # be a second full shuffle for nothing
        df.where(F.col(val).isNotNull())
        .select(key, _kmv_hash(F.col(val)).alias("_h"))
        .distinct()
    )
    w_salt = Window.partitionBy(key, F.pmod(F.col("_h"), F.lit(n_salt))).orderBy(
        "_h"
    )
    pre = hashed.withColumn("_srn", F.row_number().over(w_salt)).filter(
        F.col("_srn") <= k
    )
    w = Window.partitionBy(key).orderBy("_h")
    minima = pre.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    kth = F.max(F.when(F.col("_rn") == k, F.col("_h")))
    est = F.when(
        F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(float(KMV_MOD))) / kth)
    return minima.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_seen"), est.alias("est_ndistinct")
    )


# ------------------------------------------------------------ driver
def q_kmv_ndistinct(t: dict) -> DataFrame:
    """Estimated distinct documents per language — enough cardinality
    (hundreds-thousands per lang) that the sketch path actually runs."""
    return kmv_ndistinct(t["documents"], "lang", "doc_id")


ORACLE: dict[str, str] = {
    "kmv_ndistinct": f"""
        WITH hashed AS (
            SELECT DISTINCT lang,
                   CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 13)) AS BIGINT) AS h
            FROM documents WHERE doc_id IS NOT NULL
        ), ranked AS (
            SELECT lang, h,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn
            FROM hashed
        ), minima AS (
            SELECT * FROM ranked WHERE rn <= {KMV_K}
        )
        SELECT lang, COUNT(*) AS n_seen,
               CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*)::DOUBLE
                    ELSE {KMV_K - 1}::DOUBLE * {KMV_MOD}::DOUBLE
                         / MAX(CASE WHEN rn = {KMV_K} THEN h END)
               END AS est_ndistinct
        FROM minima GROUP BY lang
    """,
}

QUERIES = {
    "kmv_ndistinct": q_kmv_ndistinct,
}
