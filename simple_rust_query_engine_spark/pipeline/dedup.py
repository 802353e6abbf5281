"""Deduplication operators for LLM training-data pipelines.

Four families, each idiomatic Spark with a DuckDB oracle twin built
from identical deterministic arithmetic:

exact        hash-groupBy on md5(text) — one shuffle on the digest.
minhash_lsh  shingle→minhash→band→bucket-join.  Signatures are
             map-only Arrow/numpy UDF work (no explode, no shuffle);
             only the band-bucket self-join shuffles, on the band key.
             This is the shape that survives 100 TB: candidate pairs
             ≈ true near-dups, never O(n²).  The band table persists
             BUCKETED on the band key (``build_band_index``): full
             regeneration self-joins with zero Exchange, and ingest
             batches broadcast-probe it (``probe_band_index``;
             streaming twin in ``streaming.dedup``).
simhash      per-bit affine-hash votes over the shingle-hash set
             (map-only numpy UDF); near-dup pairs by hamming distance
             over a self-join blocked on the hash's high 16 bits.
ngram_jaccard EXACT 3-gram Jaccard via the AllPairs/PPJoin prefix
             filter (hash-keyed candidates, string-array verify);
             the pair table materializes once per corpus per session
             (``near_dup_edges``) and feeds the whole family below.
dedup_cc     transitive components over the jaccard edges (endpoint-
             restricted min-label propagation) + greedy
             `dedup_survivors` + quality-aware `keep_best`.
span ops     rolling-window hashes: `dup_spans` (detection),
             `dup_span_frac` (drop rule), `excise_spans` (surgical
             removal), `decontaminate` (train/eval overlap).

Cross-engine determinism: the word hash is an affine combo of
codepoints (see ``text.word_hash``); all arithmetic stays < 2^53 so
Spark longs and DuckDB BIGINTs agree exactly.  Swap ``F.xxhash64``
in production when no oracle twin is required.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import py_word_hash, word_hash

#: durability switch for every hard materialization barrier below.
#: default (False): ``localCheckpoint`` — fastest; partitions are
#: recomputed from scratch if an executor dies.  durable (True, or env
#: SPARK_GRAFT_DURABLE=1): eager RELIABLE ``checkpoint`` — replayable
#: from stable storage after executor loss, the right setting for
#: long cluster jobs where losing an executor mid-join is routine.
DURABLE_MATERIALIZE = os.environ.get("SPARK_GRAFT_DURABLE", "") == "1"


def materialize(df: DataFrame, durable: bool | None = None) -> DataFrame:
    """Hard materialization barrier for a multi-consumer intermediate.

    Catalyst inlines a UDF-bearing subtree into every consumer (the
    static minhash plan showed 8 ArrowEvalPython nodes, zero reuse);
    a barrier computes it once.  Both flavors TRUNCATE LINEAGE, which
    iterative callers (connected components) depend on as hard as
    they depend on the data barrier: a persist-based "barrier" keeps
    the full logical plan, so per-round plans nest and Catalyst
    re-analysis grows exponentially — the 64-chain star-CC test went
    5 s → 15 s → minutes per round under an earlier persist(DISK_ONLY)
    implementation while reading every byte from cache.

    * ``durable=False`` — ``localCheckpoint(eager=True)``: blocks are
      executor-local, lost blocks are lost (recompute = rerun the
      query).  Fine single-node / short jobs.
    * ``durable=True`` — reliable ``checkpoint(eager=True)``: files in
      the checkpoint dir survive executor loss; for 100 TB runs.  On a
      cluster, point ``setCheckpointDir`` at HDFS/S3 BEFORE the first
      barrier — a local path would scatter partition files across
      executor disks where the driver cannot read them back, so an
      unset dir on a non-local master raises immediately rather than
      failing deep in a pipeline.  Locally, a fresh per-process tmp
      dir is installed (mkdtemp — no collision with other users'
      runs) and removed at interpreter exit; superseded checkpoints
      within a run are retired by the context cleaner when
      ``spark.cleaner.referenceTracking.cleanCheckpoints`` is on
      (set by ``get_spark()``; best-effort — it needs the frame
      GC'd, so worst-case live disk in an iterative loop is
      O(rounds), each checkpoint label-table-sized, until exit
      cleanup).
    """
    if durable is None:
        durable = DURABLE_MATERIALIZE
    if durable:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            if not sc.master.startswith("local"):
                raise RuntimeError(
                    "durable materialize on a cluster needs "
                    "sparkContext.setCheckpointDir(<HDFS/S3 path>) before "
                    "the first barrier: a node-local default would write "
                    "checkpoint partitions to executor disks the driver "
                    "cannot read back"
                )
            sc.setCheckpointDir(_fallback_checkpoint_dir())
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


_FALLBACK_CK_DIR: str | None = None


def _fallback_checkpoint_dir() -> str:
    """Per-process local checkpoint dir, removed at interpreter exit.

    A fixed shared path (e.g. /tmp/srqe_checkpoints) would be owned by
    whichever user ran first and break durable mode for everyone else
    on the machine — and reliable-checkpoint files outlive the
    SparkContext, so without the atexit hook every run would leak its
    final checkpoints to disk permanently."""
    global _FALLBACK_CK_DIR
    if _FALLBACK_CK_DIR is None:
        import atexit
        import shutil
        import tempfile

        _FALLBACK_CK_DIR = tempfile.mkdtemp(prefix="srqe_checkpoints_")
        atexit.register(shutil.rmtree, _FALLBACK_CK_DIR, True)
    return _FALLBACK_CK_DIR

MH_K = 16          # minhash functions
MH_BANDS = 4       # LSH bands (rows per band = MH_K // MH_BANDS)
MH_MOD = 1000003   # prime modulus for the affine permutations
SH_BITS = 32       # simhash width (16 bits degenerates on small-vocab
                   # corpora: most pairs land within hamming<=3)
SH_MOD = 1048583   # prime for per-bit mixing
SH_BLOCK = 65536   # pair-search block = high 16 bits of the hash


SHINGLE_N = 3
SH_P = 1000003
SH_M = 1000000007


def _shingle_hashes(text_col):
    """Distinct hashes of word 3-gram shingles: a polynomial combine
    of the per-word hashes, all int64-exact (< 2^53 at every step) so
    the DuckDB twin matches bit-for-bit.  Shingle-level minhash is
    the standard choice: token-*set* minhash degenerates when docs
    share a small vocabulary (every doc contains most words).

    Built with zip_with over shifted slices, NOT element_at(whs, i)
    inside a transform lambda: higher-order functions evaluate their
    *array arguments* once per row, but an array referenced inside
    the lambda *body* is re-evaluated per ELEMENT — O(n²) per doc
    (measured 30×+ slowdown on the driver corpus)."""
    whs = F.transform(F.split(text_col, " "), word_hash)
    k = F.size(whs)
    combine = lambda a, b: (a * F.lit(SH_P) + b) % F.lit(SH_M)
    grams = whs
    for j in range(1, SHINGLE_N):
        # zip_with pads the shorter side with null; null arithmetic
        # poisons the tail elements, sliced off below
        grams = F.zip_with(
            grams, F.slice(whs, j + 1, F.greatest(k - j, F.lit(0))), combine
        )
    grams = F.slice(grams, 1, F.greatest(k - F.lit(SHINGLE_N - 1), F.lit(0)))
    return F.when(k >= SHINGLE_N, F.array_distinct(grams)).otherwise(
        F.array().cast("array<bigint>")
    )


# ------------------------------------------------------------ exact
def q_dedup_exact(t: dict) -> DataFrame:
    """Exact dedup: group by content digest, keep lowest doc_id.
    Scale: shuffle on md5 — uniformly distributed, no skew."""
    return (
        t["documents"]
        .groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------- minhash
def _perm(i: int):
    # closure factory: a bare 1-arg lambda, so F.transform doesn't
    # mistake an extra default param for the index argument
    return lambda x: (F.lit(2 * i + 3) * x + F.lit(7 * i + 1)) % F.lit(MH_MOD)


def _minhash_sig_expr(docs: DataFrame) -> DataFrame:
    """Pure-expression signature variant (no Python anywhere).  Kept
    for reference/fallback: Spark's higher-order array functions are
    CodegenFallback — interpreted, ~4 ms/doc on the driver corpus —
    so the Arrow/numpy UDF below is ~10× faster.  Swap back if Spark
    gains whole-stage codegen for lambda functions."""
    hs = _shingle_hashes(F.col("text"))
    sig = F.array(
        *[F.array_min(F.transform(hs, _perm(i))) for i in range(MH_K)]
    )
    return docs.select("doc_id", sig.alias("sig"))


def _strong_shingle_hashes(words: list) -> "np.ndarray":
    """53-bit blake2b digests of each word-SHINGLE_N-gram string —
    the production shingle id: deterministic everywhere (unlike
    ``hash()``), collision-negligible up to ~10^8 distinct shingles
    (birthday bound in a 2^53 space), and small enough that the
    affine permutations below stay int64-exact (35 · 2^53 < 2^63)."""
    from hashlib import blake2b

    return np.fromiter(
        (
            int.from_bytes(
                blake2b(
                    " ".join(words[i : i + SHINGLE_N]).encode(), digest_size=8
                ).digest(),
                "big",
            )
            >> 11
            for i in range(len(words) - SHINGLE_N + 1)
        ),
        dtype=np.int64,
        count=len(words) - SHINGLE_N + 1,
    )


def minhash_signatures(docs: DataFrame, strong_hash: bool = False) -> DataFrame:
    """doc_id + sig array<long>[MH_K] over word-3-gram shingle hashes.

    Arrow-batched pandas UDF, numpy-vectorized over each doc's shingle
    array: identical integer arithmetic to the DuckDB oracle (every
    intermediate < 2^53, int64-exact in numpy).  Map-only — no explode,
    no shuffle; scales linearly with input splits at 100 TB.

    ``strong_hash=True`` is the production switch: shingle ids become
    53-bit blake2b digests of the shingle STRING instead of the
    oracle-friendly affine word-hash combine (``text.word_hash``,
    which collides heavily on real corpora).  Same plan, same
    permutation pipeline, no oracle twin — flip it when correctness
    is checked by tests rather than the cross-engine hash gate."""
    from pyspark.sql.functions import pandas_udf

    a = np.arange(MH_K, dtype=np.int64) * 2 + 3   # perm multipliers
    b = np.arange(MH_K, dtype=np.int64) * 7 + 1   # perm offsets

    @pandas_udf("array<bigint>")
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            words = text.split(" ")
            if len(words) < SHINGLE_N:
                out.append([None] * MH_K)  # array_min(empty) semantics
                continue
            if strong_hash:
                g = _strong_shingle_hashes(words)
            else:
                wh = np.fromiter(
                    (py_word_hash(w) for w in words),
                    dtype=np.int64,
                    count=len(words),
                )
                g = ((wh[:-2] * SH_P + wh[1:-1]) % SH_M * SH_P + wh[2:]) % SH_M
            g = np.unique(g)
            out.append(((a[:, None] * g[None, :] + b[:, None]) % MH_MOD).min(axis=1))
        return pd.Series(out)

    return docs.select("doc_id", sig_udf(F.col("text")).alias("sig"))


def _checkpointed_sigs(docs: DataFrame, strong_hash: bool = False) -> DataFrame:
    """Materialized signature table shared by the full and incremental
    pair joins.

    localCheckpoint = hard materialization barrier: the signature UDF
    column feeds three consumers (bands + both verify sides) and
    Catalyst re-plans the Arrow UDF evaluation into each one (the
    static plan showed EIGHT ArrowEvalPython nodes, zero reuse).
    Checkpointing computes signatures exactly once and every consumer
    reads the materialized rows.  At cluster scale the same holds
    per-executor; recompute-on-executor-loss is the accepted trade
    (or persist(DISK) for reliability)."""
    return (
        minhash_signatures(docs, strong_hash=strong_hash)
        # docs shorter than SHINGLE_N tokens have all-NULL signatures;
        # the oracle's NULL band never joins (NULL || ... = NULL), but
        # concat_ws SKIPS nulls, which would band every short doc
        # together — drop them up front on both semantics and cost
        .filter(F.element_at("sig", 1).isNotNull())
        .transform(materialize)
    )


def _band_exploded(sigs: DataFrame, with_sig: bool = False) -> DataFrame:
    """(doc_id, band) rows: one banded-signature string per band.
    ``with_sig=True`` carries the full signature along with each band
    row (4× storage of a 16-long array) so a consumer joining on the
    band key can compute pair stats WITHOUT the two doc_id re-joins of
    ``_with_pair_stats`` — the layout the persisted band index uses."""
    rows = MH_K // MH_BANDS
    band_arr = F.array(
        *[
            F.concat_ws(
                ",",
                F.lit(b),
                *[F.element_at("sig", b * rows + j + 1).cast("string") for j in range(rows)],
            )
            for b in range(MH_BANDS)
        ]
    )
    cols = ["doc_id", "sig"] if with_sig else ["doc_id"]
    return sigs.select(*cols, F.explode(band_arr).alias("band"))


def _with_pair_stats(cand: DataFrame, sigs: DataFrame) -> DataFrame:
    """Attach signature-agreement stats to normalized candidate pairs."""
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    n_match = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_match.alias("n_match"),
            (n_match.cast("double") / F.lit(float(MH_K))).alias("est_jaccard"),
        )
    )


def minhash_lsh_pairs(docs: DataFrame, strong_hash: bool = False) -> DataFrame:
    """Candidate near-dup pairs via banded LSH + exact signature
    agreement estimate. Returns (doc_a, doc_b, n_match, est_jaccard).
    ``strong_hash`` switches the whole stack (signatures → bands →
    stats) to production blake2b shingle ids in one flag."""
    sigs = _checkpointed_sigs(docs, strong_hash=strong_hash)
    bands = _band_exploded(sigs)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _with_pair_stats(cand, sigs)


def q_dedup_minhash(t: dict) -> DataFrame:
    return minhash_lsh_pairs(t["documents"])


#: "new arrival" predicate for the incremental demo: every 5th doc
INCR_MOD = 5


def minhash_lsh_pairs_incremental(
    docs: DataFrame, is_new, strong_hash: bool = False
) -> DataFrame:
    """Incremental LSH dedup: candidate pairs where at least one side
    is a NEW document — the shape of continuous ingest at 100 TB.

    A full corpus re-join is O(corpus²) work repeated every batch;
    joining the new batch's bands against the full band index is
    O(new × collisions) and produces exactly the pairs the full join
    would add.  This is the FROM-SCRATCH form (recomputes signatures
    per call — the standalone-query contract); the production path
    persists the band table bucketed on the band key and probes it
    shuffle-free: ``build_band_index`` / ``probe_band_index`` batch,
    ``streaming.dedup.stream_minhash_ingest`` continuous.  Output
    pairs are normalized (doc_a < doc_b) so a pair arriving from
    either orientation dedups to one row."""
    sigs = _checkpointed_sigs(docs, strong_hash=strong_hash)
    bands = _band_exploded(sigs)
    new_bands = bands.filter(is_new(F.col("doc_id")))
    n, a = new_bands.alias("n"), bands.alias("a")
    cand = (
        n.join(a, (F.col("n.band") == F.col("a.band")) & (F.col("n.doc_id") != F.col("a.doc_id")))
        .select(
            F.least(F.col("n.doc_id"), F.col("a.doc_id")).alias("doc_a"),
            F.greatest(F.col("n.doc_id"), F.col("a.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    return _with_pair_stats(cand, sigs)


def q_dedup_minhash_incr(t: dict) -> DataFrame:
    return minhash_lsh_pairs_incremental(
        t["documents"], lambda d: d % INCR_MOD == 0
    )


# ------------------------------------------- persisted band index
#: bucket count for the persisted band index — matches the session's
#: shuffle partitions so a bucketed scan feeds every core
BAND_BUCKETS = 32


def _sig_pair_stats(sig_a, sig_b):
    """(n_match, est_jaccard) columns from two carried signatures —
    symmetric in its arguments, so pair normalization (least/greatest
    on doc ids) never changes the stats."""
    n_match = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v)
    )
    return (
        n_match.alias("n_match"),
        (n_match.cast("double") / F.lit(float(MH_K))).alias("est_jaccard"),
    )


def build_band_index(
    spark,
    docs: DataFrame,
    table: str,
    path: str,
    num_buckets: int = BAND_BUCKETS,
    strong_hash: bool = False,
) -> DataFrame:
    """Persist the LSH band table BUCKETED ON THE BAND KEY — the
    layout contract behind shuffle-free dedup at 100 TB: the band
    shuffle is paid ONCE when the index is laid down, and every
    consumer (full pair regeneration, per-batch ingest probes) reads
    rows already hash-partitioned on the join key, so the band
    self-join plans with ZERO Exchange (pinned in
    ``tests/test_plans.py::test_band_index_self_join_is_shuffle_free``;
    ``bench_bucketed.py`` measured 1.8× steady on the fact↔fact join
    this replaces).

    Each row carries (doc_id, band, sig): the signature rides with
    the band so pair stats come straight off the joined rows — no
    doc_id re-joins.  The pre-write ``repartition(num_buckets, band)``
    aligns task partitions with bucket ids (both are
    ``pmod(murmur3, n)``), so each bucket is one file instead of
    one-per-input-task."""
    bands = _band_exploded(
        _checkpointed_sigs(docs, strong_hash=strong_hash), with_sig=True
    )
    from ..sources.write import write_bucketed

    write_bucketed(
        bands.repartition(num_buckets, F.col("band")),
        table,
        path,
        bucket_by=["band"],
        num_buckets=num_buckets,
    )
    return spark.table(table)


def minhash_pairs_from_index(spark, table: str) -> DataFrame:
    """Full candidate-pair regeneration from the persisted band index:
    both sides of the band self-join scan the same bucketed table, so
    the join needs no Exchange — the only shuffle left is the final
    pair-distinct (candidate-pair-sized, orders of magnitude smaller
    than the band table).  Re-run after a threshold change without
    re-paying signatures OR the band shuffle."""
    idx = spark.table(table)
    a, b = idx.alias("a"), idx.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *_sig_pair_stats(F.col("a.sig"), F.col("b.sig")),
        )
        .distinct()
    )


def probe_band_index(
    spark,
    table: str,
    new_docs: DataFrame | None = None,
    strong_hash: bool = False,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """O(batch) ingest probe: the new batch's bands are computed
    map-only (Arrow signature UDF, no shuffle) and BROADCAST against
    the persisted index — the corpus-sized side is never shuffled and
    never recomputed.  After probing, append the batch's band rows to
    the index (`write_bucketed` mode="append") to complete the ingest
    cycle.  Emits normalized (doc_a < doc_b) pairs with signature
    stats, including batch-internal pairs when the batch collides
    with itself through the index (the driver demo indexes the full
    corpus, so batch×batch pairs surface through the index side).

    Pass ``new_bands`` (a (doc_id, band, sig) frame, e.g. the one just
    appended to the index) to skip recomputing the batch signatures —
    the shape ``streaming.dedup.stream_minhash_ingest`` uses so each
    micro-batch pays the signature UDF exactly once."""
    if new_bands is not None:
        nb = new_bands
    elif new_docs is not None:
        nb = _band_exploded(
            _checkpointed_sigs(new_docs, strong_hash=strong_hash), with_sig=True
        )
    else:
        raise ValueError("probe_band_index: pass new_docs or new_bands")
    idx = spark.table(table)
    i, n = idx.alias("i"), nb.alias("n")
    return (
        i.join(
            F.broadcast(n),
            (F.col("i.band") == F.col("n.band"))
            & (F.col("i.doc_id") != F.col("n.doc_id")),
        )
        .select(
            F.least(F.col("i.doc_id"), F.col("n.doc_id")).alias("doc_a"),
            F.greatest(F.col("i.doc_id"), F.col("n.doc_id")).alias("doc_b"),
            *_sig_pair_stats(F.col("i.sig"), F.col("n.sig")),
        )
        .distinct()
    )


_STATE_TBL_DIR: str | None = None


def _state_table_dir() -> str:
    """Per-process directory for persisted pipeline-state tables (band
    indexes, label state, pair state) — mkdtemp so concurrent runs
    never collide, removed at interpreter exit.  On a cluster this is
    where a durable warehouse path (HDFS/S3) goes instead."""
    global _STATE_TBL_DIR
    if _STATE_TBL_DIR is None:
        import atexit
        import shutil
        import tempfile

        _STATE_TBL_DIR = tempfile.mkdtemp(prefix="srqe_state_")
        atexit.register(shutil.rmtree, _STATE_TBL_DIR, True)
    return _STATE_TBL_DIR


def _state_table(
    spark,
    name: str,
    docs_key: str,
    build_df,
    bucket_by: list[str] | None = None,
    num_buckets: int = BAND_BUCKETS,
) -> str:
    """Build-once persisted STATE table per (session, corpus): the
    incremental-ingest pattern where per-batch queries read state a
    real pipeline holds between batches instead of recomputing it per
    call.  The table name is cached in ``_STATE_CACHE`` anchored on
    the SESSION under a ``state:`` tag, which ``release_barriers``
    deliberately KEEPS — the files are parquet, not checkpoint
    blocks, and surviving the block sweep is the point of persisting
    state.  A reused id() after a session dies cannot resurrect its
    table name (weakref identity check)."""
    import hashlib

    def build() -> str:
        table = f"{name}_" + hashlib.md5(docs_key.encode()).hexdigest()[:12]
        path = os.path.join(_state_table_dir(), table)
        df = build_df()
        if bucket_by:
            from ..sources.write import write_bucketed

            write_bucketed(df, table, path, bucket_by=bucket_by,
                           num_buckets=num_buckets)
        else:
            df.write.mode("overwrite").option("path", path).saveAsTable(table)
            spark.catalog.refreshTable(table)
        return table

    return _session_cached(f"state:{name}:{docs_key}", spark, build)


def _band_index_for(spark, docs: DataFrame, docs_key: str) -> str:
    """Build-once band index per (session, corpus): the layout cost is
    paid on first use, every later probe reads the bucketed files."""
    import hashlib

    def build() -> str:
        table = "band_idx_" + hashlib.md5(docs_key.encode()).hexdigest()[:12]
        build_band_index(spark, docs, table,
                         os.path.join(_state_table_dir(), table))
        return table

    return _session_cached(f"state:band_idx:{docs_key}", spark, build)


def q_dedup_minhash_bucketed(spark, sf_dir: str) -> DataFrame:
    """Driver entry for the bucketed-layout ingest path: the corpus
    band index is persisted bucketed-on-band (built once per session,
    the ingest steady state), and the incremental probe — every 5th
    doc as the arriving batch, same demo predicate as
    ``dedup_minhash_incr`` — reads it WITHOUT shuffling or recomputing
    anything corpus-sized: the batch's band rows are filtered out of
    the index scan and broadcast back against it.  Same output as
    ``dedup_minhash_incr`` (one shared DuckDB oracle definition),
    entirely different cost shape: O(batch × collisions) per call vs
    re-paying signatures + band shuffle."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    table = _band_index_for(spark, docs, os.path.abspath(sf_dir))
    batch_bands = spark.table(table).filter(F.col("doc_id") % INCR_MOD == 0)
    return probe_band_index(spark, table, new_bands=batch_bands)


# ---------------------------------------------------------- simhash
def simhash(docs: DataFrame, strong_hash: bool = False) -> DataFrame:
    """SH_BITS-bit simhash over word-3-gram SHINGLE hashes: per bit
    j, +1/-1 votes of an affine per-bit hash parity, folded over the
    doc's distinct shingles.

    Shingle-level (like minhash above) because token-set simhash
    degenerates on small-vocabulary corpora — every doc contains
    most words, so token-set fingerprints collapse to near-identical
    values and hamming blocking returns ~all pairs.

    Arrow-batched numpy UDF for the same reason as
    ``minhash_signatures``: 32 interpreted higher-order folds per row
    would be ~10× slower.  All arithmetic int64-exact (< 2^53),
    mirrored in the oracle; docs under SHINGLE_N tokens hash to 0 on
    both engines (empty vote never exceeds 0).

    ``strong_hash=True``: production blake2b shingle ids (see
    ``minhash_signatures``) — per-bit mixing stays int64-exact
    (65 · 2^53 < 2^63); no oracle twin on this path."""
    from pyspark.sql.functions import pandas_udf

    mult = np.arange(SH_BITS, dtype=np.int64) * 2 + 3
    add = np.arange(SH_BITS, dtype=np.int64)
    weights = (1 << np.arange(SH_BITS, dtype=np.int64))

    @pandas_udf("long")
    def sh_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            words = text.split(" ")
            if len(words) < SHINGLE_N:
                continue  # empty shingle set → all votes 0 → hash 0
            if strong_hash:
                g = np.unique(_strong_shingle_hashes(words))
            else:
                wh = np.fromiter(
                    (py_word_hash(w) for w in words),
                    dtype=np.int64,
                    count=len(words),
                )
                g = np.unique(
                    ((wh[:-2] * SH_P + wh[1:-1]) % SH_M * SH_P + wh[2:]) % SH_M
                )
            bits = ((g[None, :] * mult[:, None] + add[:, None]) % SH_MOD) % 2
            votes = (2 * bits - 1).sum(axis=1)
            out[i] = int(weights[votes > 0].sum())
        return pd.Series(out)

    return docs.select("doc_id", sh_udf(F.col("text")).alias("simhash"))


def q_simhash(t: dict) -> DataFrame:
    return simhash(t["documents"])


def q_simhash_pairs(t: dict) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= 3, blocked on the high
    16 bits of the hash (cheap band) so the self-join isn't O(n²) on
    big corpora: near-identical docs agree on high bits w.h.p."""
    sh = simhash(t["documents"]).withColumn(
        "block", (F.col("simhash") / F.lit(SH_BLOCK)).cast("long")
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "block"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "block"
    )
    ham = F.expr("bit_count(sh_a ^ sh_b)")
    return (
        a.join(b, ["block"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )


# ----------------------------------------------------- ngram jaccard
def ngram_shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles; empty when the doc is shorter
    than n tokens.  Same zip_with-over-shifted-slices shape as
    ``_shingle_hashes`` — O(n) per doc, array args evaluated once."""
    toks = F.split(text_col, " ")
    k = F.size(toks)
    grams = toks
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, F.greatest(k - j, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.slice(grams, 1, F.greatest(k - F.lit(n - 1), F.lit(0)))
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_shingles_udf(n: int = 3):
    """Arrow twin of ``ngram_shingles`` — identical arrays (first-
    occurrence distinct order, empty under n tokens; pinned by test),
    ~1.5× faster than the interpreted zip_with lambdas at sf0.1 and
    pure per-row Python at any scale."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def shingles(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            w = text.split(" ")
            if len(w) < n:
                out.append([])
                continue
            seen: set = set()
            arr = []
            for i in range(len(w) - n + 1):
                s = " ".join(w[i : i + n])
                if s not in seen:
                    seen.add(s)
                    arr.append(s)
            out.append(arr)
        return pd.Series(out)

    return shingles


JACCARD_T = 0.5


def ngram_jaccard_pairs(d: DataFrame) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5), computed
    with the AllPairs/PPJoin prefix filter so it scales:

    1. candidate generation runs on xxhash64(shingle) longs (hashed
       post-explode, inside whole-stage codegen — hashing inside an
       interpreted ``transform`` lambda measured 4× slower), never on
       30-char strings;
    2. rank each doc's shingles by global document frequency
       (rarest first — a canonical total order);
    3. candidates come from a prefix-to-prefix self-join (prefix =
       first ``|X| - ceil(t·|X|) + 1`` shingles in df order) — the
       high-DF shingles that drive the quadratic blowup of a naive
       self-join never generate candidates.  ``pa < pb`` keeps one
       orientation per unordered pair, halving the enumerated
       matches;
    4. the PPJoin positional filter and the symmetric length filter
       (``t·|B| <= |A| <= |B|/t``) are applied per matched row
       BEFORE the pair-distinct — the pair requirement ``overlap >=
       t/(1+t)(na+nb)`` is constant per pair, so any-row-passes ⟺
       max-over-rows-passes, and filtering first shrinks the
       distinct's shuffle.  All conditions are CONJUNCTIVE
       two-column predicates: a variant with disjunctive conditions
       (shorter-side orientation, a pushdown-guarded PPJoin
       indexing-prefix bound) measured ~2× slower end-to-end;
    5. exact verify via array_intersect on the per-doc string shingle
       arrays — checkpoint stats let Spark auto-broadcast them at
       bench scale; at cluster scale AQE falls back to a shuffled
       join.

    Output is identical to the naive all-pairs join (the DuckDB
    oracle IS the naive string-level join) — only the plan differs.
    A hash collision in candidate generation can only ADD a
    candidate; the string-level verify removes it, so the result is
    collision-proof.
    """
    from pyspark.sql.window import Window

    # hard barrier: the shingle arrays feed three consumers (explode
    # and both verify sides) — materialize once instead of three
    # inlined recomputes (same trick as minhash_lsh_pairs)
    arrs = materialize(
        d.select("doc_id", ngram_shingles_udf()(F.col("text")).alias("shingles"))
    )
    # n_sh rides along with the explode — no per-doc count groupBy
    sh = arrs.select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("s"),
    ).select("doc_id", "n_sh", F.xxhash64("s").alias("shingle"))
    # document frequency via two-phase groupBy + equi-join, NOT
    # COUNT OVER (PARTITION BY shingle): shingle frequency is Zipfian,
    # and a window partitioned on the shingle key puts the hottest
    # shingle's rows in ONE task — a straggler (or OOM) at 100 TB that
    # no runtime facility can split.  The groupBy is skew-immune
    # (map-side partial counts combine the hot key per partition
    # before the merge shuffle), and the re-join is AQE-splittable
    # (skewJoin duplicates the one-row build side across probe
    # splits); locally the tiny count table auto-broadcasts and the
    # exploded side never shuffles at all.  A/B at sf0.1 in one
    # session, barriers cleared between runs: join 3.96/3.00/2.70 s
    # vs window 3.52/2.49 s warm — a wash locally, only the join form
    # survives the 100× skew.
    cnt = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = sh.join(cnt, "shingle")
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("shingle").asc())
    ranked = ranked.withColumn("rn", F.row_number().over(w))
    # NOTE: do NOT localCheckpoint probe — although it feeds both
    # sides of the self-join, Spark's ReusedExchange already shares
    # the shuffle output of the identical rank subtrees; an explicit
    # barrier here breaks that reuse and measured 2-4× SLOWER A/B'd
    # in a fresh session (3.0s vs 6.2-14.8s at sf0.1).
    probe = ranked.filter(
        F.col("rn") <= F.col("n_sh") - F.ceil(F.lit(JACCARD_T) * F.col("n_sh")) + 1
    )
    pa = probe.select(
        F.col("doc_id").alias("pa"), "shingle",
        F.col("rn").alias("rn_a"), F.col("n_sh").alias("na"),
    )
    pb = probe.select(
        F.col("doc_id").alias("pb"), "shingle",
        F.col("rn").alias("rn_b"), F.col("n_sh").alias("nb"),
    )
    # positional filter: at a common shingle (positions rn_a/rn_b) the
    # overlap is bounded by 1 + min(na - rn_a, nb - rn_b); a true pair
    # needs overlap >= t/(1+t)·(na+nb) (ε guards double rounding;
    # recall-safe — verify is exact anyway)
    ubound = F.least(F.col("na") - F.col("rn_a"), F.col("nb") - F.col("rn_b")) + 1
    req = F.lit(JACCARD_T / (1.0 + JACCARD_T)) * (F.col("na") + F.col("nb"))
    # symmetric length filter: J >= t forces t·|B| <= |A| <= |B|/t
    lenf = (F.col("na") >= F.lit(JACCARD_T) * F.col("nb")) & (
        F.col("nb") >= F.lit(JACCARD_T) * F.col("na")
    )
    cand = (
        pa.join(pb, "shingle")
        .filter((F.col("pa") < F.col("pb")) & lenf & (ubound >= req - F.lit(1e-9)))
        .select(F.col("pa").alias("doc_a"), F.col("pb").alias("doc_b"))
        .distinct()
    )
    aa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    bb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common.cast("double") / (F.size("sh_a") + F.size("sh_b") - common)
    return (
        cand.join(aa, "doc_a")
        .join(bb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
    )


#: (tag, id(anchor)) → (weakref(anchor), cached value).  One cache for
#: every piece of session-scoped dedup state (near-dup edge table,
#: component labels, incremental base labels, band-index table names):
#: the whole dedup family derives from shared intermediates a pipeline
#: should pay once per corpus per session.  DataFrame entries are
#: backed by localCheckpoint blocks, so `session.release_barriers`
#: clears this cache along with the blocks (registered below) — a
#: stale hit would raise CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.  The
#: weakref identity check mirrors __spark_entry__._tables (id-reuse
#: hazard); the weakref CALLBACK pops the entry when its anchor dies,
#: so a long-lived session processing many distinct corpora cannot
#: grow the dict unboundedly or pin dead frames' checkpoint blocks.
_STATE_CACHE: dict = {}


def _session_cached(tag: str, anchor, build):
    """Memoize ``build()`` per (tag, live anchor object).  A hit
    requires the stored weakref to resolve to the SAME object — a
    reused ``id()`` after the anchor died fails the identity check,
    evicts the stale entry, and rebuilds."""
    import weakref

    key = (tag, id(anchor))
    hit = _STATE_CACHE.get(key)
    if hit is not None:
        wref, val = hit
        if wref() is anchor:
            return val
        del _STATE_CACHE[key]
    val = build()

    def _evict(_, _key=key):
        # module globals may already be torn down at interpreter exit
        cache = globals().get("_STATE_CACHE")
        if cache is not None:
            cache.pop(_key, None)

    _STATE_CACHE[key] = (weakref.ref(anchor, _evict), val)
    return val


def _same_corpus(a: DataFrame, b: DataFrame) -> bool:
    """Catalyst plan equivalence (``sameResult`` — the relation the
    optimizer's own ReuseExchange trusts): True when two frames are
    guaranteed to produce the same rows, e.g. two independent reads
    of the same parquet path.  Assumes immutable input files within a
    session, the standard parquet contract.  Session identity is part
    of the match: a localCheckpoint-backed cache entry is bound to the
    session whose block manager holds its blocks, so in a multi-session
    process (e.g. a bare `SparkSession.newSession()` driver) a
    plan-equal frame from ANOTHER session must rebuild, not reuse."""
    if a.sparkSession is not b.sparkSession:
        return False
    try:
        return bool(
            a._jdf.queryExecution().analyzed().sameResult(
                b._jdf.queryExecution().analyzed()
            )
        )
    except Exception:
        return False


def near_dup_edges(docs: DataFrame) -> DataFrame:
    """Materialized, session-cached exact-Jaccard near-dup pair table
    (doc_a, doc_b, jaccard) for ``docs`` — the shared input of the
    dedup family.  Tiny (near-dup pairs, not corpus rows), so the
    materialization barrier is cheap insurance even for a single
    consumer.

    Reuse is by object identity first, then by PLAN EQUIVALENCE: a
    fresh read of the same parquet corpus (a different DataFrame
    object with the same logical plan) gets the already-materialized
    pair table instead of re-running the PPJoin machinery — so the
    object-keyed family queries and the persisted-state builders pay
    the edge computation once per session per corpus between barrier
    releases."""
    hit = _STATE_CACHE.get(("edges", id(docs)))
    if hit is not None and hit[0]() is docs:
        return hit[1]
    for key, (wref, val) in list(_STATE_CACHE.items()):
        if key[0] != "edges":
            continue
        anchor = wref()
        if anchor is not None and anchor is not docs and _same_corpus(anchor, docs):
            return val
    return _session_cached(
        "edges", docs, lambda: materialize(ngram_jaccard_pairs(docs))
    )


from ..session import register_barrier_cache as _register_barrier_cache


def _clear_barrier_backed_state() -> None:
    """`release_barriers` hook: drop every checkpoint-BACKED cache
    entry (edge frames, label frames — their blocks are about to be
    unpersisted, a stale hit would raise
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) but KEEP ``state:`` entries
    (band indexes, persisted label/pair state): those are registered
    parquet tables whose files survive the block sweep, and
    rebuilding them per release would re-pay the one-time layout cost
    the persisted-state design exists to amortize."""
    for key in list(_STATE_CACHE):
        if not key[0].startswith("state:"):
            _STATE_CACHE.pop(key, None)


_register_barrier_cache(_clear_barrier_backed_state)


def q_ngram_jaccard(t: dict) -> DataFrame:
    return near_dup_edges(t["documents"])


def _large_star(E: DataFrame) -> DataFrame:
    """Large-star round: every node's LARGER neighbors re-attach to
    the minimum of its closed neighborhood (Kiveris et al. 2014,
    'Connected Components in MapReduce and Beyond' — public).  One
    groupBy + one join, both on the node key."""
    bidir = E.union(
        E.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        bidir.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", "src").alias("m"))
    )
    return (
        bidir.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        # m <= src < dst, so the emitted (dst, m) edge is never a loop
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(E: DataFrame) -> DataFrame:
    """Small-star round: orient every edge large→small; each node and
    its smaller neighbors all re-attach to the neighborhood min."""
    o = (
        E.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
    )
    nbr = o.groupBy("src").agg(F.min("dst").alias("m"))
    return (
        o.join(nbr, "src")
        .select(F.col("dst").alias("v"), "m")
        .union(nbr.select(F.col("src").alias("v"), "m"))
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame, vertices: DataFrame, max_rounds: int = 64
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star CC — O(log n) rounds on ANY
    graph shape, including the chains where min-label propagation
    degenerates to O(diameter) rounds.  Returns (labels, rounds).

    Per round: two groupBy-min + two self-joins, all keyed on node id
    — the same shuffle shape at 100 TB as the propagation loop, just
    fewer rounds on deep graphs.  Convergence = the canonical edge
    set's (count, xxhash sum) fingerprint repeating; at the fixpoint
    the edges form a star forest (v → component min), read off as the
    label map."""
    E = materialize(
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    fp_prev = None
    rounds = 0
    while rounds < max_rounds:
        # durable rounds write reliable checkpoints; superseded ones
        # are retired by the context cleaner as frames are GC'd
        # (cleanCheckpoints=true in get_spark) — best-effort, so live
        # disk is worst-case O(rounds) label-table-sized files until
        # the exit cleanup of the fallback dir
        E = materialize(_small_star(_large_star(E)))
        rounds += 1
        # pmod keeps the hash sum < 2^63 under ANSI overflow checking
        # for any realistic edge count (2^31 · |E|)
        fp = E.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(2**31))).alias("h"),
        ).collect()[0]
        fp = (fp.n, fp.h)
        if fp == fp_prev:
            break
        fp_prev = fp
    star = E.groupBy("src").agg(F.min("dst").alias("label"))
    lab = (
        vertices.join(star, vertices.doc_id == star.src, "left")
        .select(
            "doc_id",
            F.least(
                F.col("doc_id"), F.coalesce("label", F.col("doc_id"))
            ).alias("label"),
        )
    )
    return lab, rounds


def connected_components(
    edges: DataFrame, vertices: DataFrame, algorithm: str = "propagation"
) -> DataFrame:
    """Min-label propagation to fixpoint: every vertex ends with the
    smallest doc_id in its connected component.  The standard Spark
    CC shape (GraphFrames does the same under the hood): per round,
    one join + one aggregation; rounds ≈ graph diameter (near-dup
    components are shallow, so this is the default).  The driver-side
    loop holds only the convergence counter — all data stays
    distributed; localCheckpoint truncates lineage so plans don't
    grow across rounds.

    ``algorithm="star"`` switches to alternating large-star/
    small-star (``connected_components_star``) — O(log n) rounds on
    high-diameter graphs (chains, long paths) where propagation needs
    O(diameter) rounds.  Same labels, different round complexity."""
    if algorithm == "star":
        lab, _ = connected_components_star(edges, vertices)
        return lab
    bidir = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    bidir = materialize(bidir.repartition("dst"))
    # iterate ONLY over edge endpoints: a vertex with no near-dup edge
    # keeps label = doc_id and never enters the loop.  At 100 TB this
    # is the difference between a corpus-sized label table per round
    # and a dup-subgraph-sized one (near-dup docs are a small fraction
    # of a curated corpus); locally it cut dedup_cc's loop from 3.0 s
    # to ~1.5 s at sf0.1.  Round 0 is fused into the initialization:
    # each endpoint starts at min(self, min direct neighbor), which is
    # exactly one propagation round from identity labels.
    lab = materialize(
        bidir.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
        .select(F.col("src").alias("doc_id"), "label")
    )
    # labels only ever decrease, so the label SUM is a convergence
    # fingerprint — one cheap agg per round instead of a change-join
    prev_sum = lab.agg(F.sum("label")).collect()[0][0]
    while True:  # label sum strictly decreases until fixpoint ⇒ terminates
        msgs = (
            bidir.join(lab, bidir.src == lab.doc_id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_min"))
        )
        # durable rounds write reliable checkpoints; superseded label
        # checkpoints are retired by the context cleaner as frames are
        # GC'd (cleanCheckpoints=true in get_spark) — best-effort, so
        # live disk is worst-case O(rounds) until exit cleanup
        lab = materialize(
            lab.join(msgs, lab.doc_id == msgs.dst, "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias(
                    "label"
                ),
            )
        )
        cur_sum = lab.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # (the internal edge-table checkpoint is likewise cleaner-retired
    # once this function returns; the RETURNED labels' files live
    # until the caller's frame is collected)
    # edge-free vertices rejoin with their identity label
    return vertices.join(lab, "doc_id", "left").select(
        "doc_id", F.coalesce("label", F.col("doc_id")).alias("label")
    )


def merge_labels(
    labels: DataFrame, new_edges: DataFrame, vertices: DataFrame
) -> DataFrame:
    """Incremental connected components: fold NEW near-dup edges into
    EXISTING component labels without recomputing CC over the corpus
    — the label-maintenance step of continuous ingest (band-index
    probe emits the new edges; this merges them; ``keep_best``
    re-ranks only the touched components downstream).

    Existing labels are connectivity-equivalent to the old edge set
    as a star forest (doc → label), so CC over (star ∪ new_edges)
    yields exactly the labels a from-scratch CC over (old ∪ new)
    edges would — component minima are doc ids in both, and min-label
    propagation preserves them through the union.  Cost per batch:
    the iterated edge set is |non-trivial labels| + |new edges| — the
    dup subgraph, not the corpus — and the endpoint-restricted loop
    in ``connected_components`` keeps the per-round label table that
    size too."""
    star = labels.filter(F.col("label") != F.col("doc_id")).select(
        F.col("doc_id").alias("doc_a"), F.col("label").alias("doc_b")
    )
    return connected_components(
        star.union(new_edges.select("doc_a", "doc_b")), vertices
    )


def _read_docs(spark, sf_dir: str) -> DataFrame:
    """Session-cached documents frame per (session, corpus dir): one
    stable anchor object so the object-keyed family caches (edge
    table) hit across repeated per-batch query calls."""
    return _session_cached(
        f"docs:{os.path.abspath(sf_dir)}",
        spark,
        lambda: spark.read.parquet(os.path.join(sf_dir, "documents.parquet")),
    )


def _edge_state_for(spark, docs: DataFrame, docs_key: str) -> str:
    """Persisted exact-Jaccard near-dup PAIR state (doc_a, doc_b,
    jaccard) — the accumulated pair table a continuous-ingest pipeline
    holds (each batch's probe appends its pairs).  Tiny (near-dup
    pairs, not corpus rows); plain parquet, no bucketing needed.
    Built FROM the session edge cache (``near_dup_edges`` — plan-
    equivalent frames share one entry), so a session that already ran
    the object-keyed family queries writes the table without
    re-running the PPJoin."""
    return _state_table(
        spark, "edge_state", docs_key, lambda: near_dup_edges(docs)
    )


def _label_state_for(spark, docs: DataFrame, docs_key: str) -> str:
    """Persisted full-corpus component-label state (doc_id, label),
    bucketed on doc_id so per-doc joins against it (keep_best's
    richness join) read pre-partitioned files.  This is the label
    table ``merge_labels`` maintains between batches at 100 TB; built
    once per (session, corpus) from the persisted pair state."""

    def build() -> DataFrame:
        edges = spark.table(_edge_state_for(spark, docs, docs_key))
        return connected_components(
            edges.select("doc_a", "doc_b"), docs.select("doc_id")
        )

    return _state_table(
        spark, "label_state", docs_key, build, bucket_by=["doc_id"]
    )


def _old_label_state_for(spark, docs: DataFrame, docs_key: str) -> str:
    """The incremental demo's BASE label state: component labels as
    they stood BEFORE the arriving batch (every 5th doc, the
    ``INCR_MOD`` demo predicate) — CC over the both-old pair subset,
    plus identity labels for the arriving docs.  A real pipeline
    holds exactly this table between ingest cycles; persisting it
    makes the per-call cost of ``dedup_cc_incr`` the merge, not a
    from-scratch rebuild of state."""

    def build() -> DataFrame:
        pairs = spark.table(_edge_state_for(spark, docs, docs_key))
        is_new = lambda c: c % INCR_MOD == 0  # noqa: E731
        old_edges = pairs.filter(
            ~is_new(F.col("doc_a")) & ~is_new(F.col("doc_b"))
        ).select("doc_a", "doc_b")
        old_docs = docs.filter(~is_new(F.col("doc_id"))).select("doc_id")
        return connected_components(old_edges, old_docs).union(
            docs.filter(is_new(F.col("doc_id"))).select(
                "doc_id", F.col("doc_id").alias("label")
            )
        )

    return _state_table(
        spark, "old_label_state", docs_key, build, bucket_by=["doc_id"]
    )


def q_dedup_cc_incr(spark, sf_dir: str) -> DataFrame:
    """Driver demo of incremental label maintenance: the base label
    state (corpus minus the arriving batch) and the accumulated pair
    state are PERSISTED tables built once per session — exactly the
    state a real ingest pipeline holds between batches — so this
    query's per-call cost is what production pays per batch: filter
    the batch's pairs off the pair state (map-only) and
    ``merge_labels`` them into the base labels (CC over the
    dup-subgraph star forest ∪ new edges, a few shallow rounds).  The
    merged labels must equal from-scratch CC over the full corpus —
    the oracle IS ``dedup_cc``'s recursive-reachability CTE."""
    docs = _read_docs(spark, sf_dir)
    key = os.path.abspath(sf_dir)
    labels0 = spark.table(_old_label_state_for(spark, docs, key))
    pairs = spark.table(_edge_state_for(spark, docs, key))
    new_edges = pairs.filter(
        (F.col("doc_a") % INCR_MOD == 0) | (F.col("doc_b") % INCR_MOD == 0)
    ).select("doc_a", "doc_b")
    return merge_labels(labels0, new_edges, docs.select("doc_id"))


def q_dedup_cc(spark, sf_dir: str) -> DataFrame:
    """Near-dup components: each doc labeled with the smallest doc_id
    reachable through 3-gram-Jaccard>=0.5 edges — the correct
    (transitive) dedup grouping vs q_dedup_survivors' greedy pass.
    Oracle: recursive reachability CTE + MIN over reached set.

    Reads (and on first call per session, BUILDS) the persisted label
    state table: labels are pipeline STATE, maintained incrementally
    by ``merge_labels`` at scale — the bench's cold pass prices the
    build (pair machinery + CC + bucketed layout), the steady pass
    prices what every downstream consumer actually pays: a scan of
    the bucketed state."""
    docs = _read_docs(spark, sf_dir)
    return spark.table(
        _label_state_for(spark, docs, os.path.abspath(sf_dir))
    )


def q_dup_cluster_sizes(spark, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER-SIZE distribution — the corpus-health report a
    dedup run ends with (how much of the corpus is duplicated, and in
    what shape: a few giant boilerplate clusters vs many small ones
    drive very different excision policies).  One row per observed
    component size: how many components have that size and how many
    documents they hold.

    Plan: scan of the persisted bucketed label state (built once per
    session, the same table ``dedup_cc`` serves), then two uniform
    aggregations — groupBy(label) (components are small, so the key is
    near-unique; map-side partials absorb the within-partition
    repeats) and groupBy(cluster_size) (low-cardinality but
    partial-aggregated, so the hot size-1 key combines map-side and
    no reducer sees corpus-scale rows).  No joins, no skew exposure —
    this shape is unchanged at 100 TB."""
    sizes = q_dedup_cc(spark, sf_dir).groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )


def q_cross_source_overlap(t: dict) -> DataFrame:
    """Cross-SOURCE near-dup leakage matrix: for every unordered pair
    of sources, how many near-dup pairs (3-gram Jaccard >= JACCARD_T)
    straddle them, and the worst overlap seen.  This is the audit a
    training-data pipeline runs before mixing corpora — it surfaces
    both inter-source contamination (a "web" crawl that swallowed the
    "books" set) and intra-source boilerplate (the diagonal).

    Plan: the session-cached near-dup edge table (tiny — pairs, not
    corpus rows) is hydrated with each endpoint's source via two
    equi-joins on doc_id (edge side auto-broadcasts locally; at
    cluster scale it's a uniform shuffled join — doc_id is unique on
    the build side, so no skew), then one low-cardinality groupBy
    with map-side partials.  MAX(jaccard) is order-insensitive, so
    the float column stays bit-identical to the oracle's; an AVG here
    would be summation-order-dependent and is deliberately absent."""
    docs = t["documents"]
    edges = near_dup_edges(docs)
    src = docs.select("doc_id", "source")
    e = (
        edges.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        ).join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
    )
    return (
        e.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


def q_dedup_survivors(t: dict) -> DataFrame:
    """Near-dup removal materialized: greedy keep-lowest-id — a doc is
    dropped when it near-duplicates (3-gram Jaccard >= 0.5) any doc
    with a smaller id.  One anti-join against the pair list; see
    q_dedup_cc for the transitive connected-components variant."""
    pairs = near_dup_edges(t["documents"])
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return t["documents"].join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )


#: token width of the exact-substring / decontamination span windows
#: (Lee et al. 2022 use 50-token windows on real text; the driver
#: word-soup docs average ~50 tokens total, so 8 keeps several windows
#: per doc while still being long enough that collisions are planted
#: duplication, not chance)
SPAN_W = 8


def _window_hashes_expr(text_col, width: int = SPAN_W):
    """Pure-expression variant of the rolling window hash.  Kept as
    the no-Python fallback (same trade as ``_minhash_sig_expr``):
    correct and shuffle-free, but higher-order functions are
    CodegenFallback AND CollapseProject inlines the word-hash array
    into every one of the ``width`` slice arguments — ~2×width
    re-evaluations per row.  The Arrow UDF below computes the array
    once per row and is the path the queries use."""
    from .text import _FP_MOD, _FP_MUL

    whs = F.transform(F.split(text_col, " "), word_hash)
    n = F.size(whs)
    h = F.slice(whs, 1, n - (width - 1))
    for j in range(1, width):
        h = F.zip_with(
            h,
            F.slice(whs, j + 1, n - (width - 1)),
            lambda acc, x: (acc * F.lit(_FP_MUL) + x) % F.lit(_FP_MOD),
        )
    return F.when(n >= width, h).otherwise(F.array().cast("array<long>"))


def window_hash_udf(width: int = SPAN_W):
    """Rolling polynomial hash of every ``width``-token window
    (stride 1) — the span fingerprint behind exact-substring dedup
    and benchmark decontamination.  Arrow-batched, numpy-vectorized
    per doc; every intermediate < 2^53 so the fold is int64-exact and
    bit-identical to the DuckDB twin and to ``_window_hashes_expr``.
    Map-only: no explode, no shuffle inside the UDF.  Docs shorter
    than ``width`` tokens yield an empty array."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def wh_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([_py_window_hashes(text, width) for text in texts])

    return wh_udf


def _py_window_hashes(text: str, width: int = SPAN_W) -> "np.ndarray":
    """Single-doc rolling window hash (numpy int64-exact) — the kernel
    behind ``window_hash_udf`` and the streaming decontamination
    probe; one definition so the batch and streaming paths can never
    diverge on span construction."""
    words = text.split(" ")
    n = len(words)
    if n < width:
        return np.array([], dtype=np.int64)
    from .text import _FP_MOD, _FP_MUL

    wh = np.fromiter(
        (py_word_hash(w) for w in words), dtype=np.int64, count=n
    )
    h = wh[: n - width + 1].copy()
    for j in range(1, width):
        h = (h * _FP_MUL + wh[j : j + n - width + 1]) % _FP_MOD
    return h


def q_dup_spans(t: dict) -> DataFrame:
    """Exact duplicated spans ACROSS documents — the train-set half of
    exact-substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): verbatim passages
    repeated in 2+ documents (licenses, boilerplate, templated spam)
    that a whole-document hash can never see.  Emits each offending
    span hash with its document reach, total occurrence count, and
    first carrier.

    Plan: map-only rolling-hash explode (one row per window), then a
    single groupBy on the span hash.  The distinct-doc count expands
    to a two-phase aggregate keyed on (span_hash, doc_id) — both
    uniform high-cardinality keys, so map-side partials absorb
    within-partition repeats and no reducer sees a hot key.  At
    100 TB this is one uniform shuffle of (hash, doc) pairs — the
    suffix-array construction the paper uses is single-machine; this
    is its distributed windowed-hash equivalent."""
    spans = t["documents"].select(
        "doc_id",
        F.explode(window_hash_udf()(F.col("text"))).alias("span_hash"),
    )
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


#: drop threshold for the per-doc duplicated-span fraction filter
DUP_FRAC_T = 0.5


def q_dup_span_frac(t: dict) -> DataFrame:
    """Per-document duplicated-span fraction — the DROP RULE built on
    ``q_dup_spans``: the share of a doc's ``SPAN_W``-token windows
    that occur verbatim elsewhere in the corpus (another doc or
    another position).  Pipelines cut documents above a threshold
    (``drop_doc`` at DUP_FRAC_T = 0.5) instead of surgically excising
    spans —
    cheaper and safer than text surgery at corpus scale.

    Plan: one window count over the span hash (uniform
    high-cardinality key, tiny groups — never a hot reducer), then
    the per-doc aggregate: exactly two shuffles regardless of corpus
    size, no join (a counts-table self-join would shuffle the span
    table a third time).
    """
    from pyspark.sql import Window

    spans = t["documents"].select(
        "doc_id",
        F.explode(window_hash_udf()(F.col("text"))).alias("span_hash"),
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy("span_hash"))
    dup_frac = F.round(
        F.col("n_dup_windows").cast("double") / F.col("n_windows"), 6
    )
    return (
        spans.withColumn("_cnt", cnt)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("_cnt") >= 2, 1).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            dup_frac.alias("dup_frac"),
            (dup_frac > DUP_FRAC_T).alias("drop_doc"),
        )
    )


def q_doc_novelty(t: dict) -> DataFrame:
    """Per-document NOVELTY: the fraction of a doc's ``SPAN_W``-token
    windows whose span text first appears in THIS doc (no earlier
    doc_id carries it).  The corpus-ordering dual of ``dup_span_frac``
    — that query asks "is this span duplicated anywhere", this one
    asks "was it already seen by the time this doc arrived", which is
    the memorization-exposure ordering Lee et al. 2022 (\"Deduplicating
    Training Data Makes Language Models Better\") analyze: low-novelty
    documents late in the stream contribute mostly text the model has
    already trained on.  Docs shorter than ``SPAN_W`` tokens emit no
    windows and no row (same contract as the span family).

    Plan: ONE corpus scan (the rolling-hash UDF is the expensive
    part — a naive spans-vs-firsts self-join would evaluate it
    twice): the explode collapses immediately into per-(span, doc)
    occurrence counts (uniform composite key, map-side combine), and
    everything after runs over that windows-sized table — first
    carrier via groupBy(span_hash).min(doc_id) (NOT min-over-window,
    same skew argument as ``ngram_jaccard_pairs``'s two-phase counts:
    a boilerplate span repeated 10^6 times would pin one window
    task), equi-join back on the uniform span key, one per-doc
    aggregate weighted by the occurrence counts.  Four uniform
    shuffles, none corpus-keyed on a skewable key.

    ``occ`` feeds two consumers (first-carrier aggregate + the probe
    side), and column pruning rewrites the firsts subtree without
    ``n_occ`` — a DIFFERENT aggregate, so ReusedExchange cannot share
    the scan and the span UDF would run twice.  The explicit barrier
    pins the (span, doc, count) table once — smaller than the raw
    span explode (within-doc repeats collapsed); at 100 TB a pipeline
    persists this intermediate to storage instead (same shape the
    ``dup_spans`` family would share)."""
    occ = materialize(
        t["documents"]
        .select(
            "doc_id",
            F.explode(window_hash_udf()(F.col("text"))).alias("span_hash"),
        )
        .groupBy("span_hash", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    firsts = occ.groupBy("span_hash").agg(
        F.min("doc_id").alias("first_doc")
    )
    seen = F.sum(
        F.when(F.col("first_doc") < F.col("doc_id"), F.col("n_occ"))
        .otherwise(F.lit(0))
    )
    frac = F.round(
        F.lit(1.0)
        - F.col("n_seen_before").cast("double") / F.col("n_windows"),
        6,
    )
    return (
        occ.join(firsts, "span_hash")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").alias("n_windows"),
            seen.alias("n_seen_before"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_seen_before",
            frac.alias("novelty_frac"),
        )
    )


def q_excise_spans(t: dict) -> DataFrame:
    """Span-level EXCISION — the surgical variant of exact-substring
    dedup: Lee et al. 2022 REMOVE each duplicated passage from the
    text rather than dropping the whole document (``dup_span_frac``'s
    drop rule).  A token is excised when ANY of the ``SPAN_W``-token
    windows covering it occurs verbatim elsewhere in the corpus;
    emits every document with its cleaned text and removal counts.

    Plan: the same rolling-hash explode + one window count over the
    span hash as ``dup_span_frac`` (uniform high-cardinality key),
    then the duplicated window POSITIONS collapse to one small sorted
    array per affected doc (groupBy doc_id — near-dup positions per
    doc are few), left-joined back to documents on doc_id and applied
    MAP-SIDE: a positional filter over the token array rebuilds the
    text with no further shuffle.  Three uniform shuffles total, and
    the join's right side holds only AFFECTED docs.  The per-token
    coverage test is O(dup positions in that doc) — interpreted
    higher-order function, but over arrays that are empty for clean
    docs and tiny otherwise."""
    from pyspark.sql import Window

    docs = t["documents"]
    spans = docs.select(
        "doc_id",
        F.posexplode(window_hash_udf()(F.col("text"))).alias("pos0", "span_hash"),
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy("span_hash"))
    dup_pos = (
        spans.withColumn("_cnt", cnt)
        .filter(F.col("_cnt") >= 2)
        # 1-based window start, matching the DuckDB oracle's range(1,·)
        .select("doc_id", (F.col("pos0") + 1).alias("j"))
    )
    djs = dup_pos.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("j")).alias("js")
    )
    joined = docs.join(djs, "doc_id", "left").select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.coalesce("js", F.array().cast("array<int>")).alias("js"),
    )
    # token i (1-based) survives unless some duplicated window start j
    # covers it: j <= i < j + SPAN_W
    kept = F.filter(
        "toks",
        lambda tok, i0: F.size(
            F.filter(
                "js",
                lambda j: (j <= i0 + F.lit(1))
                & (i0 + F.lit(1) < j + F.lit(SPAN_W)),
            )
        )
        == 0,
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("text_clean"),
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
    )


#: the held-out benchmark source for the decontamination demo — at
#: real scale this is the eval-suite corpus, inherently tiny
EVAL_SOURCE = "src0"


def q_decontaminate(t: dict) -> DataFrame:
    """Benchmark decontamination: for every training document, the
    fraction of its ``SPAN_W``-token windows that appear verbatim in
    the held-out eval set (``source = 'src0'``) — the n-gram-overlap
    check every serious LLM corpus runs (GPT-3 appendix C; PaLM §6)
    so test questions don't leak into training data.

    Plan: the eval side collapses to a DISTINCT span-hash set and is
    BROADCAST into the train-side probe — eval suites are tiny by
    construction, so the train corpus is never shuffled: one map-only
    explode + broadcast hash probe + per-doc partial-combine agg.
    ``contaminated`` flags any verbatim overlap; ``contam_frac``
    supports thresholded policies.

    The ``spans`` subtree appears under BOTH branches, but this is
    NOT the tokenize-twice trap ``pack.token_budget_mixture``
    materializes against: the complementary source predicates push
    below the UDF into each branch's parquet scan (plan-pinned —
    ``test_decontaminate_eval_set_is_broadcast`` asserts the pushed
    filter), so the eval branch runs the rolling hash over the eval
    docs only and the train branch over the train docs only — every
    document hashed exactly once across the two disjoint scans.  A
    materialization barrier here was tried and is strictly worse: it
    computes the same one-pass total but pays a checkpoint write and
    forfeits the scan pushdown."""
    spans = t["documents"].select(
        "doc_id",
        "source",
        F.explode(window_hash_udf()(F.col("text"))).alias("span_hash"),
    )
    ev = (
        spans.filter(F.col("source") == EVAL_SOURCE)
        .select("span_hash")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        spans.filter(F.col("source") != EVAL_SOURCE)
        .join(F.broadcast(ev), "span_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(
                F.when(F.col("_hit").isNotNull(), 1).otherwise(0)
            ).alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_hits",
            F.round(F.col("n_hits").cast("double") / F.col("n_windows"), 6).alias(
                "contam_frac"
            ),
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def keep_best(docs: DataFrame, labels: DataFrame) -> DataFrame:
    """Quality-aware canonical selection over PRECOMPUTED component
    labels: one representative per near-dup component, chosen by
    CONTENT (highest distinct-token count, tie → lowest doc_id)
    instead of the arbitrary lowest-id rule — real curation keeps the
    richest duplicate (the full article, not the truncated scrape).
    Emits per component: label, keep_id, the keeper's uniq_tokens,
    and the member count.

    Accepting ``labels`` (doc_id, label) decouples the selection from
    label construction: a pipeline that already ran
    ``connected_components`` (or holds labels from a previous ingest
    cycle) pays ONE shuffle on the component label here — row_number
    and the member count share the same window partitioning, so
    ranking costs a single exchange.  Components are near-dup groups,
    inherently small (bounded by the dedup threshold, not corpus
    size), so the label key is uniform at any scale.  The richness
    metric is an integer distinct-count — no float compare at the
    keep/drop boundary.
    """
    from pyspark.sql import Window

    richness = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split(F.col("text"), " "))).alias("uniq_tokens"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("uniq_tokens").desc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("label")
    return (
        labels.join(richness, "doc_id")
        .select(
            "label",
            "doc_id",
            "uniq_tokens",
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(wc).alias("n_members"),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "label",
            F.col("doc_id").alias("keep_id"),
            "uniq_tokens",
            "n_members",
        )
    )


def q_dedup_keep_best(spark, sf_dir: str) -> DataFrame:
    """Driver composition: ``keep_best`` over the PERSISTED label
    state (built once per session by whichever label consumer runs
    first) — per call this pays one doc_id join against the bucketed
    state plus the single label-window exchange, never the CC loop."""
    docs = _read_docs(spark, sf_dir)
    labels = spark.table(
        _label_state_for(spark, docs, os.path.abspath(sf_dir))
    )
    return keep_best(docs, labels)


#: minhash near-dup edge threshold for the stateful pipeline, in
#: agreeing signature rows (integer compare — never a float
#: boundary): est_jaccard >= 0.5, i.e. ceil(MH_K * 0.5).  The SINGLE
#: definition of this expression — DECON_NM (fuzzy decontamination)
#: aliases it; give that dial its own value if the two ever diverge.
MH_DUP_NM = -(-MH_K // 2)


def _mh_old_label_state_for(
    spark, docs: DataFrame, docs_key: str, idx_table: str
) -> str:
    """Base label state for the MINHASH-edged stateful pipeline: CC
    over the both-old candidate pairs read shuffle-free off the
    bucketed band index, plus identity labels for the arriving batch.
    Built once per (session, corpus) — the label table the incremental
    pipeline maintains."""

    def build() -> DataFrame:
        is_new = lambda c: c % INCR_MOD == 0  # noqa: E731
        old_edges = (
            minhash_pairs_from_index(spark, idx_table)
            .filter(
                ~is_new(F.col("doc_a"))
                & ~is_new(F.col("doc_b"))
                & (F.col("n_match") >= MH_DUP_NM)
            )
            .select("doc_a", "doc_b")
        )
        old_docs = docs.filter(~is_new(F.col("doc_id"))).select("doc_id")
        return connected_components(old_edges, old_docs).union(
            docs.filter(is_new(F.col("doc_id"))).select(
                "doc_id", F.col("doc_id").alias("label")
            )
        )

    return _state_table(
        spark, "mh_old_label_state", docs_key, build, bucket_by=["doc_id"]
    )


def commit_label_state(
    spark, labels: DataFrame, table: str, path: str,
    num_buckets: int = BAND_BUCKETS,
) -> None:
    """Overwrite the persisted label state with merged labels — the
    COMMIT step of the ingest cycle.  The merged frame is hard-
    materialized first (``merge_labels`` output already truncates
    lineage at the CC loop, but the final vertex join is lazy): a
    plan still referencing the table being overwritten would read
    files the overwrite is deleting."""
    from ..sources.write import write_bucketed

    write_bucketed(
        materialize(labels), table, path,
        bucket_by=["doc_id"], num_buckets=num_buckets,
    )


def fold_edges_into_labels(
    spark,
    arriving_docs: DataFrame,
    pairs: DataFrame,
    label_table: str,
    label_path: str,
) -> None:
    """Fold one batch's thresholded near-dup edges into the persisted
    label state — the shared merge/commit tail of BOTH ingest loops
    (``ingest_docs_batch`` and
    ``streaming.dedup.stream_minhash_ingest``), kept in one place so
    the replay hardening cannot drift between the copies.

    ``pairs`` is the batch's probe result (``doc_a, doc_b, n_match``);
    rows at >= ``MH_DUP_NM`` agreeing signature rows become edges.
    Arriving docs enter with identity labels via an ANTI-join against
    the state, so an at-least-once replay of a committed batch
    re-merges the same edges into the same labels (idempotent)
    instead of duplicating vertices.  Creates the label table empty
    on first use; commits the merged labels back when done."""
    if not spark.catalog.tableExists(label_table):
        commit_label_state(
            spark,
            spark.createDataFrame([], "doc_id long, label long"),
            label_table,
            label_path,
        )
    state = spark.table(label_table)
    arriving = (
        arriving_docs.select("doc_id")
        .join(state.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("label"))
    )
    labels0 = state.union(arriving)
    new_edges = (
        pairs.filter(F.col("n_match") >= MH_DUP_NM).select("doc_a", "doc_b")
    )
    merged = merge_labels(labels0, new_edges, labels0.select("doc_id"))
    commit_label_state(spark, merged, label_table, label_path)


def ingest_docs_batch(
    spark,
    batch_docs: DataFrame,
    index_table: str,
    index_path: str,
    label_table: str,
    label_path: str,
    release_batch_barriers: bool = True,
) -> DataFrame:
    """ONE full committed ingest cycle — the loop a continuous dedup
    pipeline runs per arriving batch at 100 TB, every corpus-sized
    input persisted state:

    1. band rows for the batch computed map-only (Arrow signature
       UDF over the BATCH only) and APPENDED to the bucketed index;
    2. the index PROBED with those same rows (batch broadcast, corpus
       never shuffled) — because the append precedes the probe, the
       batch sees itself plus everything earlier, so each new pair
       surfaces exactly once across batches;
    3. pairs at >= ``MH_DUP_NM`` agreeing signature rows become edges
       and ``fold_edges_into_labels`` merges them into the label
       state (``merge_labels``: CC over star forest ∪ new edges — the
       dup subgraph; batch docs enter with identity labels via an
       anti-join, so replaying a committed batch is idempotent);
    4. the merged labels are COMMITTED back over the label state.

    Returns the committed label frame.  After any prefix of batches
    the label state equals from-scratch CC over the same-threshold
    LSH edges of the documents seen so far
    (``tests/test_end_to_end_pipeline.py::
    test_committed_ingest_cycle_matches_from_scratch``).

    Once the commit lands, every barrier this cycle materialized
    (batch signatures/bands, the CC loop's internal frames, the
    pre-commit label checkpoint) is consumed — they are unpersisted
    before returning so block-manager state stays bounded over an
    unbounded batch loop (the same sweep, and the same
    exclusive-session assumption, as ``stream_minhash_ingest``; a
    caller running concurrent barrier-creating queries passes
    ``release_batch_barriers=False`` and manages blocks itself)."""
    from ..sources.write import write_bucketed

    def _persistent_rdds(sc) -> dict:
        out = {}
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            t = it.next()
            out[t._1()] = t._2()
        return out

    sc = spark.sparkContext
    live_before = set(_persistent_rdds(sc)) if release_batch_barriers else ()
    bands = materialize(
        _band_exploded(_checkpointed_sigs(batch_docs), with_sig=True)
    )
    write_bucketed(
        bands.repartition(BAND_BUCKETS, F.col("band")),
        index_table, index_path,
        bucket_by=["band"], num_buckets=BAND_BUCKETS, mode="append",
    )
    pairs = probe_band_index(spark, index_table, new_bands=bands)
    fold_edges_into_labels(spark, batch_docs, pairs, label_table, label_path)
    if release_batch_barriers:
        for rid, rdd in _persistent_rdds(sc).items():
            if rid not in live_before:
                rdd.unpersist(False)
    return spark.table(label_table)


def q_pipeline_incr_stateful(spark, sf_dir: str) -> DataFrame:
    """The 100 TB ingest cycle END-TO-END as one per-batch query, every
    corpus-sized input a persisted table laid down once per session:

    1. PROBE — the arriving batch's band rows (every 5th doc, the
       ``INCR_MOD`` demo predicate) broadcast against the bucketed
       band index; the corpus side is never shuffled.  Collisions
       with >= ``MH_DUP_NM`` agreeing signature rows (est Jaccard
       >= 0.5, integer compare) are the batch's near-dup edges.
    2. MERGE — ``merge_labels`` folds those edges into the persisted
       base label state: CC over (star forest ∪ new edges), the dup
       subgraph only.
    3. CANONICALIZE — ``keep_best`` re-ranks ONLY the touched
       components (those containing a batch doc): touched labels are
       a tiny distinct set, broadcast into the member filter, so the
       window runs over touched members, not the corpus.

    Oracle: the from-scratch composition — full-corpus banded-LSH
    pairs at the same threshold, recursive-CTE components, the same
    richness rank — restricted to components containing a batch doc.
    Merged labels equal from-scratch labels (star forest ∪ new edges
    is connectivity-equivalent to old ∪ new edges), so both engines
    rank identical component rosters."""
    docs = _read_docs(spark, sf_dir)
    key = os.path.abspath(sf_dir)
    idx = _band_index_for(spark, docs, key)
    labels0 = spark.table(_mh_old_label_state_for(spark, docs, key, idx))
    batch_bands = spark.table(idx).filter(F.col("doc_id") % INCR_MOD == 0)
    new_edges = (
        probe_band_index(spark, idx, new_bands=batch_bands)
        .filter(F.col("n_match") >= MH_DUP_NM)
        .select("doc_a", "doc_b")
    )
    merged = merge_labels(labels0, new_edges, docs.select("doc_id"))
    touched = (
        merged.filter(F.col("doc_id") % INCR_MOD == 0)
        .select("label")
        .distinct()
    )
    return keep_best(docs, merged.join(F.broadcast(touched), "label"))


#: fuzzy-decontamination flag threshold: currently the same
#: est_jaccard >= 0.5 dial as the dedup edge threshold (one
#: definition of the expression — see MH_DUP_NM)
DECON_NM = MH_DUP_NM


def q_decontaminate_fuzzy(t: dict) -> DataFrame:
    """Document-level FUZZY decontamination: a training document is
    flagged when its minhash-estimated Jaccard against ANY eval-set
    document reaches 0.5 — the near-duplicate leakage (paraphrased
    questions, reformatted answers, partial copies) that the exact
    span probe (``q_decontaminate``) cannot see.  Real pipelines run
    both: exact n-gram overlap for verbatim leakage, fuzzy minhash
    for near-verbatim (e.g. the Llama/GPT-4 contamination appendices
    combine token-overlap with fuzzy matching).

    Emits every train doc with its candidate-eval count, the count
    that clears the threshold, the max estimated Jaccard (NULL when
    LSH surfaces no candidate), and the flag.

    Plan: eval and train signatures come from two disjoint
    source-pushed scans (one Arrow UDF pass over each subset); the
    eval band table is tiny by construction and BROADCAST into the
    train side — the train corpus is never shuffled for the probe;
    candidate pairs (LSH collisions only, never all-pairs) distinct,
    one groupBy on the train doc id, then a broadcast-sized hit
    table left-joins back to the train docs."""
    docs = t["documents"]
    ev_bands = _band_exploded(
        _checkpointed_sigs(docs.filter(F.col("source") == EVAL_SOURCE)),
        with_sig=True,
    )
    tr_bands = _band_exploded(
        _checkpointed_sigs(docs.filter(F.col("source") != EVAL_SOURCE)),
        with_sig=True,
    )
    tr, ev = tr_bands.alias("tr"), ev_bands.alias("ev")
    n_match = F.size(
        F.filter(
            F.zip_with(F.col("tr.sig"), F.col("ev.sig"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    pairs = (
        tr.join(F.broadcast(ev), F.col("tr.band") == F.col("ev.band"))
        .select(
            F.col("tr.doc_id").alias("tid"),
            F.col("ev.doc_id").alias("eid"),
            n_match.alias("nm"),
        )
        .distinct()
    )
    hits = pairs.groupBy("tid").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("nm") >= DECON_NM, 1).otherwise(0)).alias("n_hits"),
        (F.max("nm").cast("double") / F.lit(float(MH_K))).alias("max_est_jaccard"),
    )
    train = docs.filter(F.col("source") != EVAL_SOURCE).select("doc_id")
    return train.join(
        F.broadcast(hits), train.doc_id == hits.tid, "left"
    ).select(
        "doc_id",
        F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        "max_est_jaccard",
        (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
    )


# ------------------------------------------------------------ oracle
_SQL_WH = "(ascii(w)*131 + length(w)*31 + ascii(reverse(w)))::BIGINT"
# ordered (with multiplicity) word hashes → shingle hashes, mirroring
# _shingle_hashes exactly (1-indexed DuckDB lists)
_SQL_WHS_ORDERED = f"list_transform(string_split(text, ' '), w -> {_SQL_WH})"
_SQL_SHINGLE_HS = (
    "list_distinct([((whs[i]*{p} + whs[i+1]) % {m} * {p} + whs[i+2]) % {m} "
    "for i in range(1, len(whs) - 1)])"
).format(p=SH_P, m=SH_M)


def _minhash_sig_sql() -> str:
    cols = ", ".join(
        f"list_min(list_transform(hs, x -> ({2 * i + 3}*x + {7 * i + 1}) % {MH_MOD})) AS s{i}"
        for i in range(MH_K)
    )
    return (
        f"SELECT doc_id, {cols} FROM ("
        f"SELECT doc_id, {_SQL_SHINGLE_HS} AS hs FROM ("
        f"SELECT doc_id, {_SQL_WHS_ORDERED} AS whs FROM documents) w) t"
    )


def _minhash_oracle(cand_where: str = "") -> str:
    """Banded-LSH pair oracle; ``cand_where`` narrows the candidate
    CTE (used by the incremental variant) so full and incremental
    stay one definition apart, never two diverging copies."""
    rows = MH_K // MH_BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, '{b},' || {parts} AS band FROM sig".format(
            b=b,
            parts=" || ',' || ".join(f"s{b * rows + j}::VARCHAR" for j in range(rows)),
        )
        for b in range(MH_BANDS)
    )
    n_match = " + ".join(f"(x.s{i} = y.s{i})::INT" for i in range(MH_K))
    return f"""
        WITH sig AS ({_minhash_sig_sql()}),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.doc_id < b.doc_id
            {cand_where}
        )
        SELECT doc_a, doc_b, ({n_match}) AS n_match,
               ({n_match})::DOUBLE / {MH_K}.0 AS est_jaccard
        FROM cand JOIN sig x ON cand.doc_a = x.doc_id
                  JOIN sig y ON cand.doc_b = y.doc_id
    """


def _minhash_incr_oracle() -> str:
    return _minhash_oracle(
        f"WHERE a.doc_id % {INCR_MOD} = 0 OR b.doc_id % {INCR_MOD} = 0"
    )


def _decontaminate_fuzzy_oracle() -> str:
    """Fuzzy (minhash) train-vs-eval probe: same sig/band CTE family
    as ``_minhash_oracle``, with the band rows carrying ``source`` so
    candidates pair train docs against eval docs only."""
    rows = MH_K // MH_BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, source, '{b},' || {parts} AS band FROM sigsrc".format(
            b=b,
            parts=" || ',' || ".join(f"s{b * rows + j}::VARCHAR" for j in range(rows)),
        )
        for b in range(MH_BANDS)
    )
    n_match = " + ".join(f"(x.s{i} = y.s{i})::INT" for i in range(MH_K))
    return f"""
        WITH sig AS ({_minhash_sig_sql()}),
        sigsrc AS (
            SELECT s.*, d.source FROM sig s JOIN documents d USING (doc_id)
        ),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT t.doc_id AS tid, e.doc_id AS eid
            FROM bands t JOIN bands e ON t.band = e.band
            WHERE t.source <> '{EVAL_SOURCE}' AND e.source = '{EVAL_SOURCE}'
        ),
        scored AS (
            SELECT tid, eid, ({n_match}) AS nm
            FROM cand JOIN sig x ON tid = x.doc_id
                      JOIN sig y ON eid = y.doc_id
        ),
        agg AS (
            SELECT tid, COUNT(*) AS n_candidates,
                   COUNT(*) FILTER (nm >= {DECON_NM}) AS n_hits,
                   MAX(nm)::DOUBLE / {MH_K} AS max_est_jaccard
            FROM scored GROUP BY tid
        )
        SELECT d.doc_id,
               COALESCE(a.n_candidates, 0) AS n_candidates,
               COALESCE(a.n_hits, 0) AS n_hits,
               a.max_est_jaccard,
               COALESCE(a.n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.tid
        WHERE d.source <> '{EVAL_SOURCE}'
    """


def _simhash_expr_sql() -> str:
    terms = []
    for j in range(SH_BITS):
        vote = (
            f"list_sum(list_transform(hs, x -> CASE WHEN "
            f"((x*{2 * j + 3} + {j}) % {SH_MOD}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {2**j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::BIGINT"


#: shingle-hash list per doc (the simhash/minhash input set)
_SQL_SHINGLE_SRC = (
    f"(SELECT doc_id, {_SQL_SHINGLE_HS} AS hs FROM "
    f"(SELECT doc_id, {_SQL_WHS_ORDERED} AS whs FROM documents) w)"
)


def _simhash_oracle() -> str:
    return f"""
        SELECT doc_id, {_simhash_expr_sql()} AS simhash
        FROM {_SQL_SHINGLE_SRC} t
    """


def _simhash_pairs_oracle() -> str:
    return f"""
        WITH sh AS (
            SELECT doc_id, {_simhash_expr_sql()} AS simhash
            FROM {_SQL_SHINGLE_SRC} t
        ), blocked AS (
            SELECT doc_id, simhash, simhash // {SH_BLOCK} AS block FROM sh
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash))::INT AS hamming
        FROM blocked a JOIN blocked b
          ON a.block = b.block AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


#: shared CTE block for the exact n-gram pair oracles — ONE definition
#: of tokenize → distinct shingles → per-doc counts → common-shingle
#: pair counts, reused by ngram_jaccard / dedup_cc / dedup_survivors
#: here and pipeline_clean in clean.py, so a change to shingle
#: construction can never desynchronize one of the four.
SQL_NGRAM_PAIR_CTES = """tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w) - 1)]) AS s
                FROM tok
            ) t
        ),
        cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )"""

#: pair CTEs + the greedy drop set (docs near-duplicating a lower id)
SQL_NGRAM_DROPPED_CTES = f"""{SQL_NGRAM_PAIR_CTES},
        dropped AS (
            SELECT DISTINCT doc_b AS doc_id FROM pairs
            JOIN cnt ca ON doc_a = ca.doc_id
            JOIN cnt cb ON doc_b = cb.doc_id
            WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= {JACCARD_T}
        )"""


def _sql_span_hash(width: int = SPAN_W) -> str:
    """DuckDB rolling-hash fold, mirroring _window_hashes exactly."""
    from .text import _FP_MOD, _FP_MUL

    expr = "whs[i]"
    for j in range(1, width):
        expr = f"(({expr})*{_FP_MUL} + whs[i+{j}]) % {_FP_MOD}"
    return expr


#: spans CTE shared by dup_spans / decontaminate — one definition of
#: tokenize → word-hash → rolling window hash (docs shorter than
#: SPAN_W emit no rows, same as the Spark empty-array guard)
SQL_SPAN_CTES = f"""whdoc AS (
            SELECT doc_id, source, {_SQL_WHS_ORDERED} AS whs FROM documents
        ),
        spans AS (
            SELECT doc_id, source,
                   unnest(list_transform(range(1, len(whs) - {SPAN_W - 2}),
                                         i -> {_sql_span_hash()})) AS span_hash
            FROM whdoc
        )"""


ORACLE: dict[str, str] = {
    "dup_spans": f"""
        WITH {SQL_SPAN_CTES}
        SELECT span_hash,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occurrences,
               MIN(doc_id) AS first_doc
        FROM spans GROUP BY span_hash
        HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    "dup_span_frac": f"""
        WITH {SQL_SPAN_CTES},
        c AS (
            SELECT doc_id, span_hash,
                   COUNT(*) OVER (PARTITION BY span_hash) AS cnt
            FROM spans
        )
        SELECT doc_id,
               COUNT(*) AS n_windows,
               COUNT(*) FILTER (cnt >= 2) AS n_dup_windows,
               ROUND(COUNT(*) FILTER (cnt >= 2)::DOUBLE / COUNT(*), 6)
                   AS dup_frac,
               ROUND(COUNT(*) FILTER (cnt >= 2)::DOUBLE / COUNT(*), 6)
                   > {DUP_FRAC_T} AS drop_doc
        FROM c GROUP BY doc_id
    """,
    # positional span CTE: parallel unnest zips the window-start list
    # with the hash list (same lengths by construction)
    "excise_spans": f"""
        WITH whdoc AS (
            SELECT doc_id, {_SQL_WHS_ORDERED} AS whs,
                   string_split(text, ' ') AS w
            FROM documents
        ),
        spans AS (
            SELECT doc_id,
                   unnest(range(1, len(whs) - {SPAN_W - 2})) AS j,
                   unnest(list_transform(range(1, len(whs) - {SPAN_W - 2}),
                                         i -> {_sql_span_hash()})) AS span_hash
            FROM whdoc
        ),
        dup AS (
            SELECT doc_id, j FROM (
                SELECT doc_id, j,
                       COUNT(*) OVER (PARTITION BY span_hash) AS cnt
                FROM spans
            ) WHERE cnt >= 2
        ),
        ps AS (SELECT doc_id, list_sort(list(j)) AS js FROM dup GROUP BY doc_id)
        SELECT doc_id,
               -- array_to_string([]) is NULL in DuckDB but Spark's
               -- array_join([]) is '' — a fully-excised doc must
               -- agree on the empty string
               COALESCE(array_to_string(kept, ' '), '') AS text_clean,
               len(w)::INT AS n_tokens,
               (len(w) - len(kept))::INT AS n_removed
        FROM (
            SELECT d.doc_id, d.w,
                   [d.w[i] FOR i IN range(1, len(d.w) + 1)
                    IF len(list_filter(COALESCE(p.js, CAST([] AS BIGINT[])),
                                       j -> j <= i AND i < j + {SPAN_W})) = 0]
                       AS kept
            FROM whdoc d LEFT JOIN ps p USING (doc_id)
        ) t
    """,
    "decontaminate": f"""
        WITH {SQL_SPAN_CTES},
        ev AS (SELECT DISTINCT span_hash FROM spans
               WHERE source = '{EVAL_SOURCE}')
        SELECT doc_id,
               COUNT(*) AS n_windows,
               COUNT(*) FILTER (span_hash IN (SELECT span_hash FROM ev))
                   AS n_hits,
               ROUND(COUNT(*) FILTER (span_hash IN
                         (SELECT span_hash FROM ev))::DOUBLE / COUNT(*), 6)
                   AS contam_frac,
               COUNT(*) FILTER (span_hash IN (SELECT span_hash FROM ev)) > 0
                   AS contaminated
        FROM spans WHERE source <> '{EVAL_SOURCE}'
        GROUP BY doc_id
    """,
    "doc_novelty": f"""
        WITH {SQL_SPAN_CTES},
        firsts AS (
            SELECT span_hash, MIN(doc_id) AS first_doc
            FROM spans GROUP BY span_hash
        )
        SELECT doc_id,
               COUNT(*) AS n_windows,
               COUNT(*) FILTER (first_doc < doc_id) AS n_seen_before,
               ROUND(1 - COUNT(*) FILTER (first_doc < doc_id)::DOUBLE
                         / COUNT(*), 6) AS novelty_frac
        FROM spans JOIN firsts USING (span_hash)
        GROUP BY doc_id
    """,
    "cross_source_overlap": f"""
        WITH {SQL_NGRAM_PAIR_CTES},
        ej AS (
            SELECT doc_a, doc_b,
                   common::DOUBLE / (ca.n_sh + cb.n_sh - common) AS jaccard
            FROM pairs
            JOIN cnt ca ON doc_a = ca.doc_id
            JOIN cnt cb ON doc_b = cb.doc_id
            WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common)
                  >= {JACCARD_T}
        )
        SELECT LEAST(da.source, db.source) AS source_a,
               GREATEST(da.source, db.source) AS source_b,
               COUNT(*) AS n_pairs,
               MAX(jaccard) AS max_jaccard
        FROM ej
        JOIN documents da ON ej.doc_a = da.doc_id
        JOIN documents db ON ej.doc_b = db.doc_id
        GROUP BY 1, 2
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "dedup_minhash": _minhash_oracle(),
    "dedup_minhash_incr": _minhash_incr_oracle(),
    # the bucketed-index probe emits the same pair set as the
    # from-scratch incremental join — one oracle definition for both
    "dedup_minhash_bucketed": _minhash_incr_oracle(),
    "decontaminate_fuzzy": _decontaminate_fuzzy_oracle(),
    "simhash": _simhash_oracle(),
    "simhash_pairs": _simhash_pairs_oracle(),
    "ngram_jaccard": f"""
        WITH {SQL_NGRAM_PAIR_CTES}
        SELECT doc_a, doc_b,
               common::DOUBLE / (ca.n_sh + cb.n_sh - common) AS jaccard
        FROM pairs
        JOIN cnt ca ON doc_a = ca.doc_id
        JOIN cnt cb ON doc_b = cb.doc_id
        WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= {JACCARD_T}
    """,
    "dedup_cc": f"""
        WITH RECURSIVE
        {SQL_NGRAM_PAIR_CTES},
        edges AS (
            SELECT doc_a, doc_b FROM pairs
            JOIN cnt ca ON doc_a = ca.doc_id
            JOIN cnt cb ON doc_b = cb.doc_id
            WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= {JACCARD_T}
        ),
        bidir AS (
            SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION SELECT doc_b, doc_a FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM bidir
            UNION
            SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
        ),
        lab AS (SELECT src AS doc_id, MIN(dst) AS mn FROM reach GROUP BY src)
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS label
        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    """,
    "dedup_survivors": f"""
        WITH {SQL_NGRAM_DROPPED_CTES}
        SELECT doc_id, lang, source FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    """,
    # dedup_cc's labels + a per-component rank: keeper = max distinct
    # tokens, ties to the lowest doc_id (same integer metric as the
    # Spark window)
    "dedup_keep_best": f"""
        WITH RECURSIVE
        {SQL_NGRAM_PAIR_CTES},
        edges AS (
            SELECT doc_a, doc_b FROM pairs
            JOIN cnt ca ON doc_a = ca.doc_id
            JOIN cnt cb ON doc_b = cb.doc_id
            WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= {JACCARD_T}
        ),
        bidir AS (
            SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION SELECT doc_b, doc_a FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM bidir
            UNION
            SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
        ),
        lab AS (SELECT src AS doc_id, MIN(dst) AS mn FROM reach GROUP BY src),
        labeled AS (
            SELECT d.doc_id,
                   LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS label,
                   len(list_distinct(string_split(d.text, ' ')))::INT
                       AS uniq_tokens
            FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
        )
        SELECT label, doc_id AS keep_id, uniq_tokens, n_members FROM (
            SELECT label, doc_id, uniq_tokens,
                   ROW_NUMBER() OVER (PARTITION BY label
                                      ORDER BY uniq_tokens DESC, doc_id ASC)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY label) AS n_members
            FROM labeled
        ) WHERE rn = 1
    """,
}

# incremental label maintenance must reproduce from-scratch CC
# exactly — one oracle definition for both
ORACLE["dedup_cc_incr"] = ORACLE["dedup_cc"]

# cluster-size histogram over dedup_cc's labels: component sizes →
# (how many components, how many docs) per size.  SUM over BIGINT is
# HUGEINT in DuckDB — cast back so the schema matches Spark's long.
ORACLE["dup_cluster_sizes"] = f"""
        WITH RECURSIVE
        {SQL_NGRAM_PAIR_CTES},
        edges AS (
            SELECT doc_a, doc_b FROM pairs
            JOIN cnt ca ON doc_a = ca.doc_id
            JOIN cnt cb ON doc_b = cb.doc_id
            WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common)
                  >= {JACCARD_T}
        ),
        bidir AS (
            SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION SELECT doc_b, doc_a FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM bidir
            UNION
            SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
        ),
        lab AS (SELECT src AS doc_id, MIN(dst) AS mn FROM reach GROUP BY src),
        labeled AS (
            SELECT d.doc_id,
                   LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS label
            FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
        ),
        sz AS (
            SELECT label, COUNT(*) AS cluster_size
            FROM labeled GROUP BY label
        )
        SELECT cluster_size,
               COUNT(*) AS n_clusters,
               SUM(cluster_size)::BIGINT AS n_docs
        FROM sz GROUP BY cluster_size
    """


def _mh_cc_lab_ctes() -> str:
    """Shared oracle CTE chain for minhash-edged connected components:
    full-corpus banded-LSH candidate pairs thresholded at
    ``MH_DUP_NM`` agreeing signature rows (same sig/band family as
    ``_minhash_oracle``) → recursive reachability → per-node reached
    minimum (``lab``).  Consumed by the stateful-pipeline and
    streaming-labels oracles."""
    rows = MH_K // MH_BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, '{b},' || {parts} AS band FROM sig".format(
            b=b,
            parts=" || ',' || ".join(f"s{b * rows + j}::VARCHAR" for j in range(rows)),
        )
        for b in range(MH_BANDS)
    )
    n_match = " + ".join(f"(x.s{i} = y.s{i})::INT" for i in range(MH_K))
    return f"""
        sig AS ({_minhash_sig_sql()}),
        bands AS ({band_selects}),
        edges AS (
            SELECT doc_a, doc_b FROM (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.doc_id < b.doc_id
            ) cand JOIN sig x ON cand.doc_a = x.doc_id
                   JOIN sig y ON cand.doc_b = y.doc_id
            WHERE ({n_match}) >= {MH_DUP_NM}
        ),
        bidir AS (
            SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION SELECT doc_b, doc_a FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM bidir
            UNION
            SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
        ),
        lab AS (SELECT src AS doc_id, MIN(dst) AS mn FROM reach GROUP BY src)
    """


def mh_cc_labels_oracle() -> str:
    """From-scratch minhash-edged component labels over the full
    corpus — the oracle of any incremental/streaming label-state
    maintainer (the state must equal this after every batch)."""
    return f"""
        WITH RECURSIVE {_mh_cc_lab_ctes()}
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS label
        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    """


def _pipeline_incr_stateful_oracle() -> str:
    """From-scratch twin of the stateful ingest cycle: the shared
    minhash-CC label CTEs, then the ``dedup_keep_best`` richness rank
    restricted to components containing a batch doc."""
    return f"""
        WITH RECURSIVE {_mh_cc_lab_ctes()},
        labeled AS (
            SELECT d.doc_id,
                   LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS label,
                   len(list_distinct(string_split(d.text, ' ')))::INT
                       AS uniq_tokens
            FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
        ),
        touched AS (
            SELECT label FROM labeled
            GROUP BY label HAVING bool_or(doc_id % {INCR_MOD} = 0)
        )
        SELECT label, doc_id AS keep_id, uniq_tokens, n_members FROM (
            SELECT label, doc_id, uniq_tokens,
                   ROW_NUMBER() OVER (PARTITION BY label
                                      ORDER BY uniq_tokens DESC, doc_id ASC)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY label) AS n_members
            FROM labeled
            WHERE label IN (SELECT label FROM touched)
        ) WHERE rn = 1
    """


ORACLE["pipeline_incr_stateful"] = _pipeline_incr_stateful_oracle()

QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "dedup_minhash_incr": q_dedup_minhash_incr,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "dedup_survivors": q_dedup_survivors,
    "dup_spans": q_dup_spans,
    "dup_span_frac": q_dup_span_frac,
    "doc_novelty": q_doc_novelty,
    "cross_source_overlap": q_cross_source_overlap,
    "excise_spans": q_excise_spans,
    "decontaminate": q_decontaminate,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
}

#: entries that need (spark, sf_dir) directly (persisted-table state)
QUERIES_SPARK = {
    "dedup_minhash_bucketed": q_dedup_minhash_bucketed,
    "dedup_cc": q_dedup_cc,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "dedup_cc_incr": q_dedup_cc_incr,
    "dedup_keep_best": q_dedup_keep_best,
    "pipeline_incr_stateful": q_pipeline_incr_stateful,
}
