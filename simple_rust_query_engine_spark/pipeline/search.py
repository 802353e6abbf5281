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

QUERIES = {
    "bm25_search": q_bm25_search,
    "inverted_index": q_inverted_index,
}
