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

from .dedup import SQL_NGRAM_DROPPED_CTES, q_ngram_jaccard
from .text import _EN_STOP, _ES_STOP, _DE_STOP, _sql_in, tokens

MIN_TOKENS = 5
MIN_ALPHA = 0.5


def q_pipeline_clean(t: dict) -> DataFrame:
    d = t["documents"]
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    alpha_ratio = (
        F.length(F.regexp_replace("text", r"[^A-Za-z]", "")).cast("double")
        / F.length("text")
    )

    def stop_hits(stops):
        return F.size(F.filter(toks, lambda w: w.isin(*stops)))

    en, es, de = stop_hits(_EN_STOP), stop_hits(_ES_STOP), stop_hits(_DE_STOP)
    gated = d.filter(
        (n_tok >= MIN_TOKENS)
        & (alpha_ratio >= MIN_ALPHA)
        & (en >= es) & (en >= de) & (en > 0)
    ).select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
    )
    dropped = (
        q_ngram_jaccard(t).select(F.col("doc_b").alias("doc_id")).distinct()
    )
    return gated.join(dropped, "doc_id", "left_anti")


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
}

QUERIES = {
    "pipeline_clean": q_pipeline_clean,
}
