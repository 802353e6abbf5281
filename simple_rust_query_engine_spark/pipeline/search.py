"""Corpus retrieval operators: BM25 scoring and a skew-safe inverted
index — the lexical-search half of a training-data curation stack
(mining topic-relevant documents, retrieval-augmented dataset audits),
complementing the embedding-based ANN family in
``pipeline.similarity``.

Beyond-parity: the reference (C/Rust single-node engine, see SURVEY
§2) has no text-retrieval surface at all; these are built the
Spark-first way — pure ``pyspark.sql.functions`` expressions, tiny
statistics broadcast, everything heavy keyed on uniformly-distributed
ids.

Scale notes
-----------
* BM25: per-term document frequencies and the corpus length stats are
  KB-sized aggregates (one row per query term / one row total) that
  broadcast into a map-side score computation; the only real shuffles
  are the (doc_id, token) term-frequency groupBy and the final
  per-doc sum — both keyed on doc_id-uniform keys, never on the
  Zipf-skewed token.  Top-k goes through TakeOrdered (no global
  sort).
* Inverted index: the posting-list collect IS the textbook holistic
  hot-key aggregation (the most frequent token appears in nearly
  every document), so it routes through
  ``operators.skew.salted_collect`` — the hot token's collection work
  spreads over n_salt reducers, with the (token, doc_id) distinct
  handled as a uniform pair-shuffle first.  The output row is
  O(posting list) by contract, as an inverted index must be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.skew import salted_collect
from .text import tokens

#: fixed query for the driver/oracle entry (terms from the corpus
#: vocabulary; any term set works — stats are computed per call)
BM25_TERMS = ("spark", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
    text_col: str = "text",
) -> DataFrame:
    """Top-``topk`` documents by BM25 score for ``terms``.

    Formula (the Robertson/Sparck-Jones form used by Lucene):
    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``,
    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.

    Determinism: tf/df/dl are exact integers, N and avgdl exact
    corpus aggregates, and each PER-TERM partial score (the same IEEE
    divisions/ln in either engine) is quantized once to an integer
    micro-unit (``round(x·1e6)`` as BIGINT) so the cross-row sum is
    exact integer arithmetic — a raw float ``SUM`` is
    addition-order-dependent and engines sum in different partial
    orders (same trick as ``text.q_lm_score``).  Ranks tie-break on
    doc_id.
    """
    toks = tokens(F.col(text_col))
    # per-doc length, map-only
    d = docs.select("doc_id", toks.alias("_toks")).select(
        "doc_id", F.size("_toks").alias("dl"), "_toks"
    )
    # exploded term hits, filtered to the query terms BEFORE the
    # shuffle: the groupBy key is (doc_id, token) — doc-uniform,
    # never the bare Zipf token
    hits = (
        d.select("doc_id", "dl", F.explode("_toks").alias("token"))
        .filter(F.col("token").isin(*terms))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # corpus stats: one row (N, avgdl) + one row per query term (df);
    # both broadcast — KB-sized whatever the corpus size
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    df_per_term = (
        d.select("doc_id", F.array_distinct("_toks").alias("_u"))
        .select(F.explode("_u").alias("token"))
        .filter(F.col("token").isin(*terms))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") * F.lit(k1 + 1.0) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        hits.join(F.broadcast(df_per_term), "token")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            F.round((idf * norm) * F.lit(1e6)).cast("long").alias("_s_micro"),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("_s_micro").cast("double") / F.lit(1e6), 6).alias(
                "score"
            )
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(topk)
    )


def inverted_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """token → sorted posting list (comma-joined doc_ids) + document
    frequency.  The (token, doc_id) distinct is a uniform pair
    shuffle; the posting-list collect is salted
    (``operators.skew.salted_collect``) so the corpus's hottest token
    never funnels through one reducer."""
    postings = (
        docs.select(F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"), "doc_id")
        .groupBy("token", "doc_id")
        .agg(F.lit(1))
        .select("token", "doc_id")
    )
    return salted_collect(postings, "token", "doc_id")


#: Reciprocal-rank-fusion constant (Cormack, Clarke & Buettcher 2009,
#: "Reciprocal Rank Fusion outperforms Condorcet" — public; 60 is the
#: paper's constant)
RRF_K = 60
#: DERIVED, not a free constant: the hybrid oracle nests the
#: bm25_search oracle verbatim as its lexical leg, which is only
#: valid while the leg depth equals the BM25 row's top-k.  Deriving
#: (rather than asserting — ADVICE r9: `assert` is stripped under
#: ``python -O`` and a divergence would surface only as an opaque
#: hash mismatch) makes the two constants structurally inseparable.
HYBRID_LEG_K = BM25_TOPK
HYBRID_TOPK = 10


def _rank_by_count(df: DataFrame, score_col: str, rank_name: str) -> DataFrame:
    """Within-leg rank WITHOUT a window: rank(d) = 1 + |rows strictly
    better| (better = higher score, ties toward the lower doc_id).
    The input is a top-k leg (≤ HYBRID_LEG_K rows by construction), so
    this is a broadcast nested-loop over k² pairs — constant cost —
    and it keeps the blanket no-global-window plan invariant
    meaningful (a ROW_NUMBER over an empty partition spec would funnel
    through one task; harmless at k rows, but the sweep couldn't tell
    it from a corpus-sized one)."""
    left = df.select(F.col("doc_id").alias("_id"), F.col(score_col).alias("_s"))
    right = df.select(
        F.col("doc_id").alias("_id2"), F.col(score_col).alias("_s2")
    )
    better = (F.col("_s2") > F.col("_s")) | (
        (F.col("_s2") == F.col("_s")) & (F.col("_id2") < F.col("_id"))
    )
    return (
        left.join(F.broadcast(right), better, "left")
        .groupBy("_id")
        .agg((F.count("_id2") + F.lit(1)).alias(rank_name))
        .select(F.col("_id").alias("doc_id"), rank_name)
    )


def hybrid_search_rrf(
    docs: DataFrame,
    emb: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    query_vec_id: int = 0,
    leg_k: int = HYBRID_LEG_K,
    rrf_k: int = RRF_K,
    topk: int = HYBRID_TOPK,
) -> DataFrame:
    """HYBRID retrieval: the lexical leg (BM25 top-``leg_k``) and the
    dense leg (brute-force cosine top-``leg_k`` for ``query_vec_id``,
    over the embeddings keyed by the same doc_id space) fused by
    Reciprocal Rank Fusion — ``rrf = Σ_legs 1/(rrf_k + rank)`` — the
    standard production shape for retrieval-augmented dataset audits
    and topic mining (lexical recall + semantic recall, no score
    calibration needed because RRF consumes RANKS only).

    Scale shape: each leg is its existing operator unchanged (BM25's
    broadcast-stats map-side score + TakeOrdered; ANN's broadcast
    query + map-only score + TakeOrdered — swap the LSH/IVF variant
    in at 10⁹ vectors, same downstream); everything after the legs
    touches ≤ 2·leg_k rows (rank-by-count broadcast loops, one tiny
    full-outer join, TakeOrdered).  Determinism: ranks are exact
    integers, each leg contribution is the same IEEE division
    1/(rrf_k + rank) in either engine, and the two-term sum is
    order-fixed — bit-identical to the oracle."""
    from .dedup_core import materialize
    from .similarity import ann_brute_topk

    # each leg is consumed TWICE by _rank_by_count (probe + broadcast
    # side of the rank join) — without a barrier Catalyst inlines the
    # whole leg pipeline into both consumers and the full-corpus scan
    # runs twice (measured: 4 embeddings / 6 documents scans, zero
    # ReusedExchange).  The legs are ≤ leg_k rows; the checkpoint is
    # the standard multi-consumer barrier (same contract as the CMS
    # candidate frame)
    lex = _rank_by_count(
        materialize(bm25_scores(docs, terms, topk=leg_k)),
        "score",
        "bm25_rank",
    )
    den = _rank_by_count(
        materialize(
            ann_brute_topk(emb, query_vec_id=query_vec_id, k=leg_k).select(
                F.col("vec_id").alias("doc_id"), "cos_sim"
            )
        ),
        "cos_sim",
        "cos_rank",
    )
    leg = lambda r: F.when(  # noqa: E731 — one-expression contribution
        F.col(r).isNotNull(),
        F.lit(1.0) / (F.lit(rrf_k) + F.col(r)).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        lex.join(den, "doc_id", "full_outer")
        .select(
            "doc_id",
            (leg("bm25_rank") + leg("cos_rank")).alias("rrf_score"),
            "bm25_rank",
            "cos_rank",
        )
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(topk)
    )


def q_hybrid_search_rrf(t: dict) -> DataFrame:
    return hybrid_search_rrf(t["documents"], t["embeddings"])


def q_bm25_search(t: dict) -> DataFrame:
    return bm25_scores(t["documents"])


def q_inverted_index(t: dict) -> DataFrame:
    return inverted_index(t["documents"])


_terms_sql = ", ".join(f"'{x}'" for x in BM25_TERMS)

ORACLE: dict[str, str] = {
    "bm25_search": f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ), lens AS (
            SELECT doc_id, len(t) AS dl FROM d
        ), stats AS (
            SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens
        ), hits AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest(t) AS token FROM d)
            WHERE token IN ({_terms_sql})
            GROUP BY 1, 2
        ), dfs AS (
            SELECT token, COUNT(*) AS df
            FROM (SELECT doc_id, unnest(list_distinct(t)) AS token FROM d)
            WHERE token IN ({_terms_sql})
            GROUP BY 1
        )
        SELECT h.doc_id,
               ROUND(SUM(
                   ROUND(
                       ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                       * h.tf * {BM25_K1 + 1.0}
                       / (h.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * l.dl / s.avgdl))
                       * 1e6
                   )::BIGINT
               )::DOUBLE / 1e6, 6) AS score
        FROM hits h
        JOIN dfs f USING (token)
        JOIN lens l ON h.doc_id = l.doc_id
        CROSS JOIN stats s
        GROUP BY h.doc_id
        ORDER BY score DESC, h.doc_id ASC
        LIMIT {BM25_TOPK}
    """,
    # the NAIVE single-shuffle form — identical result to the salted
    # physical plan, same contract as the skew_safe_collect oracle
    "inverted_index": """
        WITH p AS (
            SELECT DISTINCT token, doc_id
            FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS token,
                         doc_id
                  FROM documents)
        )
        SELECT token,
               array_to_string(list_sort(list(doc_id)), ',') AS doc_ids,
               COUNT(*) AS n_rows
        FROM p GROUP BY token
    """,
}

def _hybrid_rrf_oracle() -> str:
    """Lexical leg = the bm25_search oracle verbatim (one definition,
    the two rows can never desynchronize); dense leg = the ann_brute
    shape at leg_k; ranks via ROW_NUMBER under each leg's total order;
    RRF contributions as explicit DOUBLE divisions (DuckDB's bare
    ``1.0`` literal is DECIMAL — left uncast it would fuse in decimal
    arithmetic and drift from Spark's IEEE doubles), summed in fixed
    lexical-then-dense order to match the Spark expression."""
    from .similarity import _SQL_COS

    # lex leg reuses the bm25 oracle — sound because HYBRID_LEG_K is
    # DERIVED from BM25_TOPK at definition (not merely asserted)
    return f"""
        WITH lex AS (SELECT * FROM ({ORACLE["bm25_search"]})),
        lexr AS (
            SELECT doc_id, ROW_NUMBER() OVER (
                ORDER BY score DESC, doc_id ASC) AS bm25_rank
            FROM lex
        ),
        den AS (
            SELECT b.vec_id AS doc_id, {_SQL_COS} AS cos_sim
            FROM (SELECT embedding AS a_emb FROM embeddings
                  WHERE vec_id = 0) q,
                 (SELECT vec_id, embedding AS b_emb FROM embeddings
                  WHERE vec_id <> 0) b
            ORDER BY cos_sim DESC, vec_id ASC LIMIT {HYBRID_LEG_K}
        ),
        denr AS (
            SELECT doc_id, ROW_NUMBER() OVER (
                ORDER BY cos_sim DESC, doc_id ASC) AS cos_rank
            FROM den
        )
        SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
               (CASE WHEN l.bm25_rank IS NOT NULL
                     THEN 1.0::DOUBLE / ({RRF_K} + l.bm25_rank)::DOUBLE
                     ELSE 0.0::DOUBLE END
                + CASE WHEN d.cos_rank IS NOT NULL
                       THEN 1.0::DOUBLE / ({RRF_K} + d.cos_rank)::DOUBLE
                       ELSE 0.0::DOUBLE END) AS rrf_score,
               l.bm25_rank, d.cos_rank
        FROM lexr l FULL OUTER JOIN denr d ON l.doc_id = d.doc_id
        ORDER BY rrf_score DESC, doc_id ASC LIMIT {HYBRID_TOPK}
    """


ORACLE["hybrid_search_rrf"] = _hybrid_rrf_oracle()

QUERIES = {
    "bm25_search": q_bm25_search,
    "inverted_index": q_inverted_index,
    "hybrid_search_rrf": q_hybrid_search_rrf,
}
