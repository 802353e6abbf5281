"""End-to-end corpus cleaning — the training-data prep flow the
individual operators exist for, composed as ONE declarative query:

    quality gate  (length + alpha-ratio thresholds, map-only)
    language gate (stopword-overlap heuristic == 'en', map-only)
    near-dup gate (greedy survivor anti-join against the exact
                   3-gram-Jaccard pair list)

Because every stage is a DataFrame transformation, Catalyst fuses
the two map-only gates into the scan (single whole-stage-codegen
pass over ``documents``) and the only shuffles are the ones the
near-dup pair generation itself needs.  This is the pattern a 100 TB
curation run uses: cheap row-local gates first — shrinking the
corpus before the expensive pairwise stage — then the prefix-filter
join over what remains.

(Here the near-dup pairs are computed over the FULL corpus rather
than the post-gate survivors so the pair list matches
``dedup_survivors``/``ngram_jaccard`` exactly; flip the composition
order in production to cut the pairwise stage's input — semantics
then change from "drop near-dups of any doc" to "near-dups of any
SURVIVING doc", which is usually what you want.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    INCR_MOD,
    SQL_NGRAM_DROPPED_CTES,
    _minhash_incr_oracle,
    minhash_lsh_pairs_incremental,
    q_ngram_jaccard,
)
from .text import _EN_STOP, _ES_STOP, _DE_STOP, _sql_in, tokens

MIN_TOKENS = 5
MIN_ALPHA = 0.5
INCR_EST_T = 0.5  # est_jaccard drop threshold for the incremental path


def q_pipeline_clean(t: dict) -> DataFrame:
    # ONE definition of the quality/language gates (shared with the
    # incremental pipeline via _gates) — a second inlined copy here
    # drifted one threshold tweak away from desynchronizing the two
    gated = _gates(t["documents"]).drop("_h")
    dropped = (
        q_ngram_jaccard(t).select(F.col("doc_b").alias("doc_id")).distinct()
    )
    return gated.join(dropped, "doc_id", "left_anti")


def _gates(d: DataFrame) -> DataFrame:
    """Quality + English gates (map-only), with the content hash
    carried for the exact-dup check."""
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    alpha_ratio = (
        F.length(F.regexp_replace("text", r"[^A-Za-z]", "")).cast("double")
        / F.length("text")
    )

    def stop_hits(stops):
        return F.size(F.filter(toks, lambda w: w.isin(*stops)))

    en, es, de = stop_hits(_EN_STOP), stop_hits(_ES_STOP), stop_hits(_DE_STOP)
    return d.filter(
        (n_tok >= MIN_TOKENS)
        & (alpha_ratio >= MIN_ALPHA)
        & (en >= es) & (en >= de) & (en > 0)
    ).select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        F.md5(F.col("text")).alias("_h"),
    )


def q_pipeline_clean_incr(t: dict) -> DataFrame:
    """Continuous-ingest curation: clean ONLY the arriving batch
    (``doc_id % INCR_MOD == 0``, the same new-arrival predicate as
    ``dedup_minhash_incr``) against the established corpus — the
    per-batch cost shape a 100 TB pipeline actually pays:

    * quality + language gates on the batch (map-only over the batch,
      the corpus is never touched);
    * exact-dup drop: batch docs whose md5 already exists in the
      corpus (broadcast-able distinct-hash anti-join; at scale the
      corpus hash set is a bucketed table the batch probes);
    * near-dup drop via the INCREMENTAL banded-LSH pairs (new×index,
      O(batch × collisions) — never a corpus self-join): a new doc
      drops when est_jaccard >= {T} against any corpus doc or any
      lower-id doc in its own batch (greedy, like dedup_survivors).
    """
    d = t["documents"]
    is_new = F.col("doc_id") % INCR_MOD == 0
    gated = _gates(d.filter(is_new))
    old_hash = (
        d.filter(~is_new).select(F.md5(F.col("text")).alias("_h")).distinct()
    )
    pairs = minhash_lsh_pairs_incremental(
        d, lambda c: c % INCR_MOD == 0
    ).filter(F.col("est_jaccard") >= INCR_EST_T)
    new_b = pairs.filter(F.col("doc_b") % INCR_MOD == 0).select(
        F.col("doc_b").alias("doc_id")
    )
    new_a_old_b = pairs.filter(
        (F.col("doc_a") % INCR_MOD == 0) & (F.col("doc_b") % INCR_MOD != 0)
    ).select(F.col("doc_a").alias("doc_id"))
    dropped = new_b.union(new_a_old_b).distinct()
    return (
        gated.join(old_hash, "_h", "left_anti")
        .join(dropped, "doc_id", "left_anti")
        .drop("_h")
    )


ORACLE: dict[str, str] = {
    "pipeline_clean": f"""
        WITH {SQL_NGRAM_DROPPED_CTES},
        gated AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' '))::INT AS n_tokens,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                       / length(text) AS alpha_ratio,
                   {_sql_in('w', _EN_STOP)}::INT AS en_hits,
                   {_sql_in('w', _ES_STOP)}::INT AS es_hits,
                   {_sql_in('w', _DE_STOP)}::INT AS de_hits
            FROM documents
        )
        SELECT doc_id, lang, n_tokens, alpha_ratio
        FROM gated
        WHERE n_tokens >= {MIN_TOKENS} AND alpha_ratio >= {MIN_ALPHA}
          AND en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0
          AND doc_id NOT IN (SELECT doc_id FROM dropped)
    """,
    "pipeline_clean_incr": f"""
        WITH pairs AS ({_minhash_incr_oracle()}),
        nd AS (
            SELECT doc_b AS doc_id FROM pairs
            WHERE est_jaccard >= {INCR_EST_T} AND doc_b % {INCR_MOD} = 0
            UNION
            SELECT doc_a FROM pairs
            WHERE est_jaccard >= {INCR_EST_T}
              AND doc_a % {INCR_MOD} = 0 AND doc_b % {INCR_MOD} <> 0
        ),
        old_hash AS (
            SELECT DISTINCT md5(text) AS h FROM documents
            WHERE doc_id % {INCR_MOD} <> 0
        ),
        gated AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' '))::INT AS n_tokens,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                       / length(text) AS alpha_ratio,
                   {_sql_in('w', _EN_STOP)}::INT AS en_hits,
                   {_sql_in('w', _ES_STOP)}::INT AS es_hits,
                   {_sql_in('w', _DE_STOP)}::INT AS de_hits,
                   md5(text) AS h
            FROM documents WHERE doc_id % {INCR_MOD} = 0
        )
        SELECT doc_id, lang, n_tokens, alpha_ratio
        FROM gated
        WHERE n_tokens >= {MIN_TOKENS} AND alpha_ratio >= {MIN_ALPHA}
          AND en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0
          AND h NOT IN (SELECT h FROM old_hash)
          AND doc_id NOT IN (SELECT doc_id FROM nd)
    """,
}

QUERIES = {
    "pipeline_clean": q_pipeline_clean,
    "pipeline_clean_incr": q_pipeline_clean_incr,
}
