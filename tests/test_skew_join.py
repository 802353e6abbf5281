"""AQE skew-join behavior for the LSH band self-join (round-5
follow-up): the dedup story's scale claim is that a hot band (many
near-identical documents hashing into one LSH bucket) is split by
AQE's skew-join handling instead of serializing on one reducer.  Pin
(a) the session configs that make that true, and (b) the actual
split happening on a deliberately skewed corpus.
"""

import pytest
from pyspark.sql import functions as F


def test_aqe_skew_configs_survive_session_construction(spark):
    # the session builder sets these (session.py); a refactor that
    # drops them would silently remove the 100 TB skew story
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == "true"
    )


def test_band_join_splits_hot_band_under_aqe(spark):
    """2000 copies of one document put ~all band rows in one LSH
    bucket; with the skew thresholds scaled to test-size data, the
    executed plan must mark the band self-join skew=true (AQE split
    the hot partition into multiple tasks).  At production thresholds
    (256 MB) the same mechanism engages at cluster scale."""
    from simple_rust_query_engine_spark.pipeline.dedup import (
        _band_exploded,
        _checkpointed_sigs,
    )

    hot_text = " ".join(f"tok{i % 17}" for i in range(24))
    rows = [(i, hot_text) for i in range(2000)]
    # plus a scatter of distinct docs so there are non-hot partitions
    # (the skew factor compares against the median partition)
    rows += [
        (10_000 + j, " ".join(f"uniq{j}_{k}" for k in range(24)))
        for j in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    overrides = {
        # force a shuffled join: broadcast would dodge the skew path
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # scale the skew detector to test-sized partitions: sizes are
        # COMPRESSED shuffle bytes, and 2000 near-identical band rows
        # lz4 down to a few KB — production keeps the 256 MB default
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # keep coalescing from merging everything back into one task
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "512b",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        bands = _band_exploded(_checkpointed_sigs(docs))
        a, b = bands.alias("a"), bands.alias("b")
        cand = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        # aggregate INSIDE the inspected DataFrame and collect through
        # it: .count() would execute a separate QueryExecution and
        # leave this one with isFinalPlan=false
        agg = cand.agg(F.count(F.lit(1)).alias("n"))
        n = agg.collect()[0].n
        # every hot-doc pair appears once per band (distinct() is
        # applied by the real operator; left raw here to keep the
        # join output skewed too)
        assert n >= 4 * (2000 * 1999) // 2
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
