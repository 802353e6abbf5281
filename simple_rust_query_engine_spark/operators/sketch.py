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

import numpy as np
import pandas as pd
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


def _kmv_minima(
    hashed: DataFrame, group_cols: list, k: int, n_salt: int
) -> DataFrame:
    """Per-group k smallest ``_h`` over a distinct (groups, _h) frame
    — ONE definition of the salted min-k pipeline, shared by the
    whole-corpus sketch and the per-source sketch so the salt
    discipline can never diverge between them.  The salt phase bounds
    every reducer: a hot group's hashes spread over ``n_salt``
    partitions and only ``n_salt · k`` survivors reach the final
    per-group rank — the global minima are always among the per-salt
    minima, so the result is salt-independent.  Rank column ``_rn``."""
    w_salt = Window.partitionBy(
        *group_cols, F.pmod(F.col("_h"), F.lit(n_salt))
    ).orderBy("_h")
    pre = hashed.withColumn("_srn", F.row_number().over(w_salt)).filter(
        F.col("_srn") <= k
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return pre.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )


def _kmv_estimate_aggs(k: int) -> list:
    """THE estimator, one definition for both KMV rows: ``n_seen``
    (minima kept — the exact count whenever a key holds < k distinct
    values) and the textbook (k-1)·M / kth-minimum estimate."""
    kth = F.max(F.when(F.col("_rn") == k, F.col("_h")))
    est = F.when(
        F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(float(KMV_MOD))) / kth)
    return [F.count(F.lit(1)).alias("n_seen"), est.alias("est_ndistinct")]


def kmv_ndistinct(
    df: DataFrame, key: str, val: str, k: int = KMV_K, n_salt: int = N_SALT
) -> DataFrame:
    """Per-key approximate COUNT(DISTINCT val) via k minimum values:
    hash (map-side, per row) → distinct (key, hash) → the shared
    salted min-k pipeline (``_kmv_minima``) → the shared estimator
    (``_kmv_estimate_aggs``)."""
    hashed = (
        # hash per ROW (cheap map-side md5), ONE distinct on the
        # (key, hash) pair — a prior distinct on raw (key, val) would
        # be a second full shuffle for nothing
        df.where(F.col(val).isNotNull())
        .select(key, _kmv_hash(F.col(val)).alias("_h"))
        .distinct()
    )
    minima = _kmv_minima(hashed, [key], k, n_salt)
    return minima.groupBy(key).agg(*_kmv_estimate_aggs(k))


def _kmv_source_sketch(
    df: DataFrame, key: str, val: str, source: str, k: int, n_salt: int
) -> DataFrame:
    """The per-(key, source) k-minimum sets — ≤ k rows per pair,
    through the SAME ``_kmv_minima`` pipeline as the whole-corpus
    sketch (grouped on (key, source) instead of key alone).  Every
    exchange is bounded map-side: the distinct partially aggregates
    before shuffling, and both rank exchanges sit above a Partial
    ``WindowGroupLimit`` (at most k rows per (key, source[, salt])
    group cross the wire) — pinned in
    ``test_plans.test_kmv_merge_exchanges_carry_sketch_rows``."""
    hashed = (
        df.where(F.col(val).isNotNull())
        .select(
            key,
            F.col(source).alias("_src"),
            _kmv_hash(F.col(val)).alias("_h"),
        )
        .distinct()
    )
    return _kmv_minima(hashed, [key, "_src"], k, n_salt)


def kmv_merge_ndistinct(
    df: DataFrame,
    key: str,
    val: str,
    source: str,
    k: int = KMV_K,
    n_salt: int = N_SALT,
) -> DataFrame:
    """The MERGE property of the KMV sketch, exercised end to end —
    the last of the sketch triad to get a merge row (CMS merge landed
    with ``cms_merge_heavy_hitters``; Bloom's build IS a merge, the
    distinct over bit positions being the bitwise OR).

    One complete k-minimum set per (``key``, ``source``) pair, merged
    by UNION-THEN-TAKE-K: the union of the per-source minima
    necessarily contains the global k minima (any hash among the
    global k smallest is also among its own source's k smallest), so
    ranking the deduplicated union per key and keeping k reproduces
    the whole-corpus sketch EXACTLY — set algebra, not approximation
    on approximation.  The estimate is therefore identical to
    ``kmv_ndistinct``'s and the oracle arithmetic carries over
    verbatim; ``n_sources_merged`` rides along to prove the
    per-source split was real (distinct non-NULL sources that
    contributed a sketch, mirroring SQL ``COUNT(DISTINCT)`` — a
    NULL-source sketch is built and merged but not counted, the same
    null semantics as ``cms_merge_heavy_hitters``).

    Scale shape: this is the per-shard/per-day pattern at 100 TB —
    each source's sketch is built where its data lives and at most
    k·sources rows per key ever cross the merge exchange, NEVER the
    underlying values.  The per-source rank is itself salted exactly
    like ``kmv_ndistinct``'s, so a hot (key, source) pair's distinct
    set also never collapses onto one reducer."""
    from ..pipeline.dedup_core import materialize

    # materialized: the sketch feeds BOTH the n_sources aggregate and
    # the merge — without the barrier the whole corpus-scan → distinct
    # → double-rank pipeline executes twice (once per consumer), and
    # at 100 TB the second corpus scan is the entire cost of the row
    sketch = materialize(_kmv_source_sketch(df, key, val, source, k, n_salt))
    # n_sources off the SKETCH table (≤ k·sources rows per key), not
    # the corpus: any source with ≥1 ingested hash keeps ≥1 sketch
    # row, so the distinct-source sets are identical and this costs a
    # sketch-sized aggregate instead of a corpus-sized one
    # the key is renamed on this side: both aggregates descend from
    # the same `hashed` lineage, and a same-name eqNullSafe across a
    # self-lineage join trips Spark's ambiguous-self-join detection
    nsrc = sketch.groupBy(key).agg(
        F.count_distinct("_src").alias("n_sources_merged")
    ).withColumnRenamed(key, "_nsrc_key")
    # THE MERGE: union of the per-source min-sets, deduplicated (the
    # same hash can be a minimum in several sources), global k minima.
    # The final rank is a direct window — the input is already
    # ≤ k·sources rows per key, so re-salting through _kmv_minima
    # would only add an exchange
    merged = sketch.select(key, "_h").distinct()
    w = Window.partitionBy(key).orderBy("_h")
    minima = merged.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    agg = minima.groupBy(key).agg(*_kmv_estimate_aggs(k))
    # null-safe on the key: a NULL key group is legal in both engines'
    # GROUP BY and must not be dropped by the equi-join
    return agg.join(
        nsrc, [F.col(key).eqNullSafe(F.col("_nsrc_key"))]
    ).select(key, "n_seen", "est_ndistinct", "n_sources_merged")




# --------------------------------------------- count-min heavy hitters
#: CMS geometry: D independent affine hash rows over W buckets each —
#: D*W integers of TOTAL state regardless of corpus size, the property
#: that makes the sketch the 100 TB shape for vocabulary-scale
#: counting (the exact alternative shuffles the whole token dict).
#: W=1024 clears the classical e/phi bucket bound (~272 at phi=1/100)
#: with headroom for the deliberately-weak oracle word hash, whose
#: few-thousand-value spread is what actually limits pruning quality
#: here — production swaps xxhash64 and the bound alone sizes W
CMS_W = 1024
CMS_D = 4
CMS_P = 1000003
#: per-depth affine parameters (a*wh + b) % P % W — fixed constants so
#: the sketch is deterministic and the DuckDB twin computes the SAME
#: counters; every intermediate stays far below 2^53
CMS_A = (31, 131, 313, 797)
CMS_B = (7, 77, 777, 7777)
HH_K = 20
#: heavy-hitter threshold: exact-integer ceil(total / HH_PHI_DENOM)
HH_PHI_DENOM = 100


def _cms_bucket_py(whs: "np.ndarray", depth: int, w: int) -> "np.ndarray":
    return ((CMS_A[depth] * whs + CMS_B[depth]) % CMS_P) % w


def cms_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    k: int = HH_K,
    w: int = CMS_W,
    d: int = CMS_D,
    phi_denom: int = HH_PHI_DENOM,
) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005 —
    public): tokens whose frequency reaches total/``phi_denom``, found
    WITHOUT shuffling the token stream.

    Three passes, each the shape that survives 100 TB:

    1. **Sketch** — map-only Arrow pass folds each partition's tokens
       into a local d×w counter array (``np.add.at``); the only
       shuffle is the element-wise merge of d·w counter CELLS (a
       groupBy over at most d·w uniform keys), never of tokens.  The
       merged sketch (d·w ints) is driver-held model state, like the
       IVF centroids.
    2. **Candidates** — the distinct-token dictionary (vocab-sized,
       not corpus-sized) gets its CMS estimate map-only (broadcast
       sketch in the UDF closure, numpy gather); tokens with
       estimate ≥ ceil(total/phi_denom) survive.  CMS never
       underestimates, so this admits every true heavy hitter
       (one-sided error — false candidates only).
    3. **Verify** — exact counts for the candidate set only: a
       broadcast semi-join filters the token stream map-side, so the
       final groupBy shuffles candidate tokens alone.

    Determinism: the word hash is the package-wide affine kernel
    (``text.py_word_hash`` ↔ the oracles' ``_SQL_WH``) and the bucket
    hashes are fixed affine maps, so the ENTIRE sketch — counters,
    estimates, candidate set — is bit-reproducible and the DuckDB
    twin recomputes it exactly: a hash-checked sketch, not a validity
    band.  Production swaps ``xxhash64`` when no oracle is needed.
    Emits (token, exact_count, est_count, overestimate_ok) for the
    top-``k`` by exact count (ties toward the lower token)."""
    tokens = _cms_tokens(docs, text_col)
    cms = _cms_sketch(tokens, w, d)
    return _cms_extract(tokens, cms, k, w, d, phi_denom)


def _cms_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")


def _cms_fold_batches(d: int, w: int, key_col: str | None = None):
    """Arrow kernel folding a batch's tokens into d×w counter cells —
    one local sketch per batch (``key_col=None``) or one per distinct
    ``key_col`` value within the batch (the per-source variant)."""
    from ..pipeline.text import py_word_hash

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        whs = np.array([py_word_hash(x) for x in pdf["w"]], dtype=np.int64)
        flat = np.zeros(d * w, dtype=np.int64)
        for i in range(d):
            np.add.at(flat, i * w + _cms_bucket_py(whs, i, w), 1)
        return pd.DataFrame(
            {"pos": np.arange(d * w, dtype=np.int64), "cnt": flat}
        )

    def batches(it):
        for pdf in it:
            if key_col is None:
                yield fold(pdf)
            else:
                # dropna=False: a NULL key is a legal source value and
                # its tokens must still reach the merged sketch, or the
                # cell-linearity claim (sketch(A∪B)=sketch(A)+sketch(B)
                # over ALL rows) silently breaks for nullable columns
                for key, grp in pdf.groupby(
                    key_col, sort=False, dropna=False
                ):
                    out = fold(grp)
                    out.insert(0, key_col, None if pd.isna(key) else key)
                    yield out

    return batches


def _cms_sketch(tokens: DataFrame, w: int, d: int) -> "np.ndarray":
    """Pass 1 of ``cms_heavy_hitters``: map-only Arrow fold into local
    d×w counter arrays; the only shuffle merges counter CELLS (at most
    d·w uniform keys), never tokens.  The merged sketch (d·w ints) is
    driver-held model state, like the IVF centroids."""
    merged = (
        tokens.mapInPandas(_cms_fold_batches(d, w), "pos long, cnt long")
        .groupBy("pos")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )  # d·w scalars of sketch state — model state, not a data path
    cms = np.zeros(d * w, dtype=np.int64)
    for r in merged:
        cms[r.pos] = r.cnt
    return cms


def _cms_extract(
    tokens: DataFrame,
    cms: "np.ndarray",
    k: int,
    w: int,
    d: int,
    phi_denom: int,
    extra_cols: dict | None = None,
) -> DataFrame:
    """Passes 2+3 of ``cms_heavy_hitters`` (candidates off the
    broadcast sketch, exact verify over candidates only) — shared by
    the single-sketch and merged-sketch entries, so the extraction
    arithmetic can never diverge between them."""
    total = int(cms[:w].sum())  # every depth row sums to the total
    thr = (total + phi_denom - 1) // phi_denom

    from pyspark.sql.functions import pandas_udf

    from ..pipeline.text import py_word_hash

    @pandas_udf("long")
    def est_udf(ws: pd.Series) -> pd.Series:
        whs = np.array([py_word_hash(x) for x in ws], dtype=np.int64)
        est = np.full(len(whs), np.iinfo(np.int64).max)
        for i in range(d):
            est = np.minimum(est, cms[i * w + _cms_bucket_py(whs, i, w)])
        return pd.Series(est)

    # r13 (guide §2.3/§2.4): the exact verify is folded into the
    # distinct pass.  The previous shape ran tokens.distinct() for the
    # candidates, then a SECOND full tokenize pass broadcast-joined
    # against them and re-grouped for the exact counts (plus a
    # materialize barrier because the candidate frame had two
    # consumers).  groupBy(w).count() ships the SAME map-side-combined
    # vocab-sized exchange as distinct() (one row per distinct token
    # per partition, +8 bytes of count) and yields the exact counts
    # for free — one corpus pass instead of two, no join, no barrier.
    # The estimate UDF still runs over distinct tokens only.
    cand = (
        tokens.groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .withColumn("est_count", est_udf("w"))
        .filter(F.col("est_count") >= F.lit(thr))
    )
    out = cand.select(
        F.col("w").alias("token"),
        "exact_count",
        "est_count",
        (F.col("est_count") >= F.col("exact_count")).alias(
            "overestimate_ok"
        ),
    )
    for name, col in (extra_cols or {}).items():
        out = out.withColumn(name, col)
    return out.orderBy(
        F.col("exact_count").desc(), F.col("token").asc()
    ).limit(k)


def cms_merge_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    k: int = HH_K,
    w: int = CMS_W,
    d: int = CMS_D,
    phi_denom: int = HH_PHI_DENOM,
) -> DataFrame:
    """The MERGE property of the sketch, exercised end to end: one
    complete d×w sketch per ``source_col`` value, merged by
    element-wise cell addition, heavy hitters extracted from the
    MERGED sketch — and hash-checked against the whole-corpus oracle,
    because CMS counters are linear: sketch(A ∪ B) = sketch(A) +
    sketch(B) cell for cell.  This is the shape that matters
    operationally at 100 TB: per-shard/per-day sketches are built
    where the data lives and only d·w counter cells per sketch ever
    move — merging NEVER revisits tokens.

    Plan: the Arrow fold keys its counters by source inside each
    batch; one exchange assembles the per-source sketches — at most
    d·w cells per sketch key, where the keys are the source values
    actually present in the token stream (NULL included; a tokenless
    source builds no sketch) — the element-wise merge is the same
    ``SUM(cnt) GROUP BY pos`` collapsed over sources (cells again,
    plan-pinned that no token row crosses either exchange), and the
    merged d·w scalars feed the SAME extraction passes as
    ``cms_heavy_hitters``.  ``n_sources_merged`` rides along so the
    row proves the source split was real — counted over ALL documents
    (distinct non-NULL sources, mirroring the oracle's
    COUNT(DISTINCT)), not over the sketch table's key set."""
    tokens_src = docs.select(
        F.col(source_col).alias("source"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).filter(F.col("w") != "")

    per_source = (
        tokens_src.mapInPandas(
            _cms_fold_batches(d, w, key_col="source"),
            "source string, pos long, cnt long",
        )
        .groupBy("source", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # THE MERGE: element-wise cell sum across the per-source sketches
    merged = (
        per_source.groupBy("pos").agg(F.sum("cnt").alias("cnt")).collect()
    )  # d·w scalars — model state
    # mirror the oracle's COUNT(DISTINCT source) over ALL documents —
    # NOT the sketch table's key set: a source whose rows carry zero
    # non-empty tokens builds no sketch but still counts as merged
    # input, and SQL COUNT(DISTINCT) skips NULLs
    n_sources = (
        docs.filter(F.col(source_col).isNotNull())
        .select(source_col)
        .distinct()
        .count()
    )
    cms = np.zeros(d * w, dtype=np.int64)
    for r in merged:
        cms[r.pos] = r.cnt
    tokens = _cms_tokens(docs, text_col)
    return _cms_extract(
        tokens,
        cms,
        k,
        w,
        d,
        phi_denom,
        extra_cols={"n_sources_merged": F.lit(n_sources).cast("long")},
    )


def q_cms_merge_heavy_hitters(t: dict) -> DataFrame:
    return cms_merge_heavy_hitters(t["documents"])


# ------------------------------------------------------- bloom membership
#: Bloom bit-array size.  Completes the sketch triad — KMV answers
#: "how many distinct?", CMS "how often?", Bloom "have we SEEN it?" —
#: the ingest-time exact-dedup pre-filter: m bits of state stand in
#: for the corpus-sized hash set, with one-sided error (no false
#: negatives — a true duplicate is ALWAYS flagged; false positives
#: cost an exact re-check, never a wrong answer).  Sized so the two
#: test scales exercise both regimes: ~18% fill at sf0.01 (FPs rare)
#: and ~86% at sf0.1 (FPs common, soundness still holds).
BLOOM_M = 8192

#: splitmix64 finalizer increment (Vigna — public domain), used as the
#: per-depth seed offset of the SIZED filter's hash family below
_MIX_INC = 0x9E3779B97F4A7C15
_MIX_M1 = 0xBF58476D1CE4E5B9
_MIX_M2 = 0x94D049BB133111EB
#: practical depth ceiling for sized filters (fp targets to ~1e-7)
_BLOOM_MAX_D = 24


def _bloom_bucket_sized(whs: "np.ndarray", depth: int, m: int) -> "np.ndarray":
    """Bit positions for SIZED filters: the splitmix64 finalizer
    (public domain) with a per-depth seed offset, numpy-vectorized in
    wrapping uint64.  The oracle-parity affine family (_cms_bucket_py)
    CANNOT serve here: its intermediate space is only CMS_P ≈ 1e6, so
    two elements colliding mod P collide at EVERY depth — a structural
    FP floor of n/P that swamps any target below ~n/1e6 (measured
    0.0052 against an 0.001 target at n=4000).  The 64-bit mix has no
    such floor; the fixed-geometry driver row keeps the affine family
    so its hash-checked bits never move."""
    x = whs.astype(np.uint64) + np.uint64((depth + 1) * _MIX_INC % (1 << 64))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(_MIX_M1)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(_MIX_M2)
    x = x ^ (x >> np.uint64(31))
    return (x % np.uint64(m)).astype(np.int64)


def bloom_geometry(n: int, fp_target: float) -> tuple[int, int]:
    """Size a Bloom filter from an element count and a target
    false-positive rate — the standard public formulas
    m = ⌈−n·ln p / ln²2⌉ bits, d = ⌈m/n · ln 2⌉ hash functions.

    The fixed BLOOM_M=8192 geometry proves soundness at any fill (the
    driver row's job: ~86% full at sf0.1, FP-saturated but never a
    false negative); production sizes from the corpus instead, which
    is what this dial does."""
    import math

    if not 0.0 < fp_target < 1.0:
        raise ValueError(f"fp_target must be in (0, 1), got {fp_target}")
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    m = math.ceil(-n * math.log(fp_target) / (math.log(2) ** 2))
    d = max(1, math.ceil(m / n * math.log(2)))
    return m, min(d, _BLOOM_MAX_D)


def _bloom_split(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(existing, arriving-batch) under the package's standing
    new-arrival predicate, with NULL text filtered BEFORE hashing
    (same guard as kmv_ndistinct): a NULL hash reaches the Arrow
    kernel as NaN and astype(int64) silently yields INT64_MIN — a
    garbage bit position the oracle (where NULL arithmetic propagates
    to no-match) never sets.  One definition shared by the batch row
    and the streaming ingest fold, so their populations can never
    drift."""
    from ..pipeline.dedup_sketch import INCR_MOD

    nonnull = docs.where(F.col(text_col).isNotNull())
    return (
        nonnull.filter(F.col("doc_id") % INCR_MOD != 0),
        nonnull.filter(F.col("doc_id") % INCR_MOD == 0),
    )


def _bloom_set_bits_df(hashes: DataFrame, bucket, m: int, d: int) -> DataFrame:
    """(h bigint) frame → DISTINCT set-bit positions.  Map-only Arrow
    pass emits each partition's positions (≤ m rows per task); the
    distinct IS the bitwise-OR merge (≤ m uniform keys — the same
    cell-level mergeability as the CMS rows), which is also what
    makes the filter STREAMABLE: per-batch position sets appended
    batch-keyed OR together by one more distinct on read."""

    def set_bits(it):
        for pdf in it:
            hs = pdf["h"].to_numpy().astype(np.int64)
            if len(hs):
                pos = np.unique(
                    np.concatenate([bucket(hs, i, m) for i in range(d)])
                )
            else:
                pos = np.array([], dtype=np.int64)
            yield pd.DataFrame({"pos": pos})

    return hashes.mapInPandas(set_bits, "pos long").distinct()


def _bloom_member_udf(bitset: "np.ndarray", bucket, m: int, d: int):
    """Probe kernel: all d positions set ⇒ maybe-member.  The m-byte
    bitset ships in the UDF closure (model state, like the CMS
    counter matrix)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def member(hs: pd.Series) -> pd.Series:
        whs = hs.to_numpy().astype(np.int64)
        ok = np.ones(len(whs), dtype=bool)
        for i in range(d):
            ok &= bitset[bucket(whs, i, m)]
        return pd.Series(ok)

    return member


def _bloom_probe_verify(
    existing: DataFrame,
    batch: DataFrame,
    bitset: "np.ndarray",
    bucket,
    m: int,
    d: int,
    text_col: str = "text",
) -> DataFrame:
    """Probe + exact verify against a PREBUILT bitset — the shared
    tail of the batch row and the streaming entry (one definition of
    the probe arithmetic and the soundness columns).  The batch
    projection feeds both the probe and the verify's broadcast hash
    set — barrier it or the batch scan runs twice; the existing
    corpus is semi-joined against the BROADCAST batch hash set, so
    the corpus never shuffles for the ground-truth check."""
    from ..pipeline.dedup_core import materialize

    hcol = _kmv_hash(F.col(text_col))
    member = _bloom_member_udf(bitset, bucket, m, d)
    probed = materialize(batch.select("doc_id", hcol.alias("h")))
    matched = (
        existing.select(hcol.alias("h"))
        .join(F.broadcast(probed.select("h").distinct()), "h", "left_semi")
        .distinct()  # ≤ |batch| matched hash values
        .withColumn("is_dup", F.lit(True))
    )
    return (
        probed.withColumn("maybe_dup", member(F.col("h")))
        .join(F.broadcast(matched), "h", "left")
        .select(
            "doc_id",
            "maybe_dup",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
            (F.col("maybe_dup") | ~F.coalesce("is_dup", F.lit(False))).alias(
                "sound"
            ),
        )
    )


def bloom_dedup_precheck(
    docs: DataFrame,
    m: int = BLOOM_M,
    d: int = CMS_D,
    text_col: str = "text",
    fp_target: float | None = None,
) -> DataFrame:
    """Ingest-time duplicate PRE-CHECK through a Bloom filter (Bloom
    1970 — public): the arriving batch (``doc_id % INCR_MOD == 0``,
    the package's standing new-arrival predicate) is probed against a
    Bloom filter built over the EXISTING corpus's content hashes, then
    exactly verified — emitting per batch doc ``maybe_dup`` (the
    sketch's answer), ``is_dup`` (ground truth) and ``sound``
    (maybe_dup OR NOT is_dup — the no-false-negatives guarantee, True
    by construction and hash-checked).

    Three passes, each the 100 TB shape:

    1. **Build** — map-only Arrow pass emits each partition's SET bit
       positions (≤ m rows per task); the only shuffle is the distinct
       over bit POSITIONS (≤ m uniform keys — the distinct IS the
       bitwise-OR merge, the same cell-level mergeability as the CMS
       row).  The collected bitset is held as m BYTES here (a numpy
       bool array — index-friendly for the probe kernel; production
       packs to m/8 via ``np.packbits`` when closure size matters).
    2. **Probe** — the batch tests its d bit positions against the
       broadcast bitset inside one Arrow UDF, map-only.
    3. **Verify** — exact membership for the batch alone: the
       existing corpus is semi-joined against the BROADCAST batch
       hash set, so the corpus never shuffles and the exact check
       costs one scan regardless of corpus size — the point of the
       pre-filter is that production runs it only on maybe_dup rows.

    Determinism: the content hash is the KMV kernel (md5-prefix
    affine, identical in both engines) and the bit positions reuse
    the CMS affine maps, so the WHOLE filter — bitset, probes, FP set
    — is bit-reproducible and hash-checked against a DuckDB twin that
    recomputes every bit."""
    existing, batch = _bloom_split(docs, text_col)
    hcol = _kmv_hash(F.col(text_col))

    if fp_target is not None:
        # SIZE from the corpus instead of the fixed geometry: one
        # cheap count aggregate (a driver scalar, like the sketch
        # state itself), then the standard formulas.  The driver row
        # keeps the fixed m/d defaults so its hash stays stable; the
        # sized path also switches to the full-width 64-bit hash
        # family — the affine oracle family has an n/CMS_P FP floor
        # (see _bloom_bucket_sized) that would defeat tight targets.
        m, d = bloom_geometry(max(existing.count(), 1), fp_target)
        bucket = _bloom_bucket_sized
    else:
        bucket = _cms_bucket_py

    set_rows = _bloom_set_bits_df(
        existing.select(hcol.alias("h")), bucket, m, d
    ).collect()  # ≤ m scalars of filter state — model state, not data
    bitset = np.zeros(m, dtype=bool)
    bitset[[r.pos for r in set_rows]] = True
    return _bloom_probe_verify(existing, batch, bitset, bucket, m, d, text_col)


def q_bloom_dedup_precheck(t: dict) -> DataFrame:
    return bloom_dedup_precheck(t["documents"])


def q_cms_heavy_hitters(t: dict) -> DataFrame:
    return cms_heavy_hitters(t["documents"])


# ------------------------------------------------------------ driver
def q_kmv_ndistinct(t: dict) -> DataFrame:
    """Estimated distinct documents per language — enough cardinality
    (hundreds-thousands per lang) that the sketch path actually runs."""
    return kmv_ndistinct(t["documents"], "lang", "doc_id")


def q_kmv_merge_ndistinct(t: dict) -> DataFrame:
    """Per-(lang, source) sketches merged per lang — the estimate must
    equal ``kmv_ndistinct``'s exactly (union-then-take-k set algebra)."""
    return kmv_merge_ndistinct(t["documents"], "lang", "doc_id", "source")



def _cms_hh_oracle(with_sources: bool = False) -> str:
    """Whole-corpus CMS twin.  ``with_sources=True`` is the oracle for
    the MERGED-sketch row: counter linearity means the merged sketch
    equals the whole-corpus sketch cell for cell, so the only addition
    is the ``n_sources_merged`` scalar."""
    from ..pipeline.dedup import _SQL_WH

    depth_ctes = ",\n        ".join(
        f"b{i} AS (SELECT (({CMS_A_i} * h + {CMS_B_i}) % {{P}}) % {{W}} AS b, "
        f"SUM(cnt)::BIGINT AS bc FROM wh GROUP BY 1)"
        for i, (CMS_A_i, CMS_B_i) in enumerate(zip(CMS_A, CMS_B))
    ).format(P=CMS_P, W=CMS_W)
    joins = " ".join(
        f"JOIN b{i} ON (({CMS_A[i]} * wh.h + {CMS_B[i]}) % {CMS_P}) % {CMS_W} = b{i}.b"
        for i in range(CMS_D)
    )
    least = ", ".join(f"b{i}.bc" for i in range(CMS_D))
    ns_cte = (
        ",\n        ns AS (SELECT COUNT(DISTINCT source)::BIGINT "
        "AS n_sources_merged FROM documents)"
        if with_sources
        else ""
    )
    ns_col = ",\n               ns.n_sources_merged" if with_sources else ""
    ns_from = ", ns" if with_sources else ""
    return f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        tc AS (
            SELECT w, COUNT(*)::BIGINT AS cnt FROM tok
            WHERE w <> '' GROUP BY w
        ),
        n AS (SELECT COALESCE(SUM(cnt), 0)::BIGINT AS total FROM tc),
        wh AS (SELECT w, cnt, {_SQL_WH} AS h FROM tc),
        {depth_ctes}{ns_cte}
        SELECT wh.w AS token, wh.cnt AS exact_count,
               LEAST({least}) AS est_count,
               (LEAST({least}) >= wh.cnt) AS overestimate_ok{ns_col}
        FROM wh {joins}, n{ns_from}
        WHERE LEAST({least}) >= (n.total + {HH_PHI_DENOM - 1}) // {HH_PHI_DENOM}
        ORDER BY exact_count DESC, token ASC LIMIT {HH_K}
    """


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
    # merged-sketch twin: per-(lang, source) k minima, union-then-
    # take-k — the agg arithmetic is kmv_ndistinct's verbatim, which
    # is the point (the merge is exact set algebra, not a new
    # estimator).  n_sources counts off the sketch CTE like the Spark
    # side; COUNT(DISTINCT) returns BIGINT in DuckDB (no hugeint trap)
    "kmv_merge_ndistinct": f"""
        WITH hashed AS (
            SELECT DISTINCT lang, source,
                   CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 13)) AS BIGINT) AS h
            FROM documents WHERE doc_id IS NOT NULL
        ), per_src AS (
            SELECT lang, source, h,
                   ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY h) AS srn
            FROM hashed
        ), sketch AS (
            SELECT lang, source, h FROM per_src WHERE srn <= {KMV_K}
        ), ns AS (
            SELECT lang, COUNT(DISTINCT source) AS n_sources_merged
            FROM sketch GROUP BY lang
        ), merged AS (
            SELECT DISTINCT lang, h FROM sketch
        ), ranked AS (
            SELECT lang, h,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn
            FROM merged
        ), minima AS (
            SELECT * FROM ranked WHERE rn <= {KMV_K}
        ), agg AS (
            SELECT lang, COUNT(*) AS n_seen,
                   CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*)::DOUBLE
                        ELSE {KMV_K - 1}::DOUBLE * {KMV_MOD}::DOUBLE
                             / MAX(CASE WHEN rn = {KMV_K} THEN h END)
                   END AS est_ndistinct
            FROM minima GROUP BY lang
        )
        SELECT agg.lang, agg.n_seen, agg.est_ndistinct, ns.n_sources_merged
        FROM agg JOIN ns ON agg.lang IS NOT DISTINCT FROM ns.lang
    """,
}

def _bloom_oracle(m: int = BLOOM_M, d: int = CMS_D) -> str:
    """Recompute every bit: ex = existing distinct content hashes,
    bits = the union of their d affine positions (UNION == the
    bitwise-OR merge), maybe_dup = all d of the batch doc's positions
    set, is_dup = exact membership, sound = the one-sided guarantee."""
    from ..pipeline.dedup_sketch import INCR_MOD

    h_sql = "CAST(('0x' || substring(md5(text), 1, 13)) AS BIGINT)"
    bit_union = "\n            UNION ".join(
        f"SELECT DISTINCT (({CMS_A[i]} * h + {CMS_B[i]}) % {CMS_P}) % {m} "
        f"AS pos FROM ex"
        for i in range(d)
    )
    probes = " AND ".join(
        f"EXISTS (SELECT 1 FROM bits WHERE pos = "
        f"(({CMS_A[i]} * b.h + {CMS_B[i]}) % {CMS_P}) % {m})"
        for i in range(d)
    )
    return f"""
        WITH ex AS (
            SELECT DISTINCT {h_sql} AS h FROM documents
            WHERE doc_id % {INCR_MOD} <> 0 AND text IS NOT NULL
        ),
        bits AS (
            {bit_union}
        ),
        b AS (
            SELECT doc_id, {h_sql} AS h FROM documents
            WHERE doc_id % {INCR_MOD} = 0 AND text IS NOT NULL
        ),
        checked AS (
            SELECT b.doc_id,
                   ({probes}) AS maybe_dup,
                   EXISTS (SELECT 1 FROM ex WHERE ex.h = b.h) AS is_dup
            FROM b
        )
        SELECT doc_id, maybe_dup, is_dup,
               (maybe_dup OR NOT is_dup) AS sound
        FROM checked
    """


ORACLE["cms_heavy_hitters"] = _cms_hh_oracle()
ORACLE["cms_merge_heavy_hitters"] = _cms_hh_oracle(with_sources=True)
ORACLE["bloom_dedup_precheck"] = _bloom_oracle()

QUERIES = {
    "kmv_ndistinct": q_kmv_ndistinct,
    "kmv_merge_ndistinct": q_kmv_merge_ndistinct,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "cms_merge_heavy_hitters": q_cms_merge_heavy_hitters,
    "bloom_dedup_precheck": q_bloom_dedup_precheck,
}
