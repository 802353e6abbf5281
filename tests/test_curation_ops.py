"""Semantic invariants for the round-11 curation additions:
PII redaction, cluster-aware holdout split, per-source TF-IDF.
(Oracle hash parity is covered by test_oracle_parity; these pin the
CLAIMS the oracles cannot see — redaction completeness, leakage
freedom, score consistency.)"""

import re

from pyspark.sql import functions as F

from simple_rust_query_engine_spark.pipeline.dedup import q_split_by_cluster
from simple_rust_query_engine_spark.pipeline.pack import q_train_test_split
from simple_rust_query_engine_spark.pipeline.text import (
    PII_PATTERNS,
    TFIDF_K,
    q_pii_redact,
    tfidf_topterms,
)
from tests.conftest import SF_DIR


# ------------------------------------------------------------- PII
def test_pii_redaction_is_complete(tables):
    # after redaction NO pattern matches anywhere — the property that
    # makes the op a gate rather than a best-effort pass.  Checked in
    # Python's regex engine, a THIRD implementation besides Spark's
    # and DuckDB's, so an engine-specific quirk can't self-certify.
    rows = q_pii_redact(tables).collect()
    assert rows
    for r in rows:
        # the injection plants one of each type
        assert r.n_email >= 1 and r.n_phone >= 1 and r.n_ssn >= 1
        for pat in PII_PATTERNS.values():
            assert not re.search(pat, r.text_redacted), r.text_redacted


def test_pii_redact_plan_is_map_only(tables):
    # scan-speed at 100 TB: no shuffle, no Python, one corpus read
    plan = (
        q_pii_redact(tables)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert plan.count("FileScan parquet") == 1, plan
    assert "EvalPython" not in plan, plan


# ----------------------------------------------------------- split
def test_split_by_cluster_is_leakage_free(spark):
    # every member of a near-dup component lands in ONE split — the
    # property train_test_split lacks by design
    out = q_split_by_cluster(spark, SF_DIR)
    mixed = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert mixed == 0
    # and the corpus genuinely exercises the claim: it has near-dup
    # components with >1 member (ngram_jaccard finds pairs here)
    multi = (
        out.groupBy("cluster_id").count().filter(F.col("count") > 1).count()
    )
    assert multi > 0


def test_split_by_cluster_matches_doc_split_on_singletons(spark, tables):
    # same affine constants ⇒ a doc that is its own component (label
    # == doc_id, the min-reachable-id convention) gets the identical
    # assignment as train_test_split — cluster-awareness only moves
    # docs that actually have near-copies
    by_cluster = q_split_by_cluster(spark, SF_DIR)
    # join against the singleton set instead of a driver-collected
    # literal IN-list — the corpus is MOSTLY singletons, so an isin()
    # would embed thousands of literals into the plan
    singletons = (
        by_cluster.groupBy("cluster_id")
        .count()
        .filter(F.col("count") == 1)
        .select(F.col("cluster_id").alias("doc_id"))
    )
    assert singletons.count() > 0  # the corpus is mostly singletons
    by_doc = q_train_test_split(tables).select(
        "doc_id", F.col("split").alias("doc_split")
    )
    disagree = (
        by_cluster.join(singletons, "doc_id")
        .join(by_doc, "doc_id")
        .filter(F.col("split") != F.col("doc_split"))
        .count()
    )
    assert disagree == 0


def test_split_by_cluster_fraction_near_target(spark):
    out = q_split_by_cluster(spark, SF_DIR)
    n = out.count()
    train = out.filter(F.col("split") == "train").count()
    assert 0.8 <= train / n <= 0.97  # 0.9 target, hash variance


def test_split_by_cluster_is_map_only_over_state(spark):
    # the split costs nothing beyond what dedup already paid: a scan
    # of the persisted bucketed label state + a CASE — no shuffle
    plan = (
        q_split_by_cluster(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# ----------------------------------------------------------- tfidf
def test_tfidf_everywhere_token_scores_zero(tables):
    # +1 smoothing: df_src == n_src ⇒ idf exactly 0, not negative —
    # a token present in every source can never rank as characteristic
    out = tfidf_topterms(tables["documents"], k=10**6)
    n_src = (
        tables["documents"].agg(F.countDistinct("source")).collect()[0][0]
    )
    bad = out.filter(
        (F.col("df_src") == n_src) & (F.col("score_micro") != 0)
    ).count()
    assert bad == 0
    neg = out.filter(F.col("score_micro") < 0).count()
    assert neg == 0


def test_tfidf_rank_contract(tables):
    out = tfidf_topterms(tables["documents"])
    per_src = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    bad = per_src.filter(
        (F.col("n") > TFIDF_K) | (F.col("mx") != F.col("n"))
    ).count()
    assert bad == 0


def test_tfidf_plan_reads_corpus_once(tables):
    # the materialize barrier is the point: tf feeds the tf and
    # df_src legs off ONE corpus scan; the only FileScan left is the
    # n_src leg's column-pruned source-only read (matching the
    # oracle's COUNT(DISTINCT source) FROM documents — NULL-text
    # sources must still count); the final window carries map-side
    # WindowGroupLimit pruning
    df = tfidf_topterms(tables["documents"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan  # tf behind barrier
    assert "ReadSchema: struct<source:string>" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
