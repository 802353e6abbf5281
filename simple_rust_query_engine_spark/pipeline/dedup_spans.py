"""Span-level dedup ops: rolling-window hashes, duplicated-span
detection / drop rule / excision / novelty, and train-eval
decontamination.  Split out of ``dedup.py`` (r8); the ``dedup``
facade re-exports everything.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup_core import materialize
from .text import py_word_hash, word_hash

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
