"""Stream-stream interval join — the fourth streaming family member
(windowed aggregation, dedup, stateful sessionization, and now joins).

The reference has no stream processing at all (SURVEY §2.9); this is
the Structured Streaming join pattern a training-data/event pipeline
needs: attribute each ``purchase`` event to the same user's ``click``
events in the preceding ``JOIN_WINDOW_MS`` — an inner stream-stream
join with event-time range conditions and watermarks on BOTH sides,
which is exactly what lets Spark bound the join state on unbounded
input (clicks older than the watermark + window are dropped from
state; without the time bound the state grows forever).

Scale: state is partitioned by the equi key (user_id); each side
keeps only rows inside its watermark horizon.  The batch twin is the
DuckDB oracle — the STREAMING execution itself is held to it, the
same posture as ``events_window_stream``.

Determinism: the range condition compares raw microsecond-precision
timestamps (identical interval arithmetic in Spark and DuckDB);
``gap_ms`` output is integer epoch-millisecond subtraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sink import drain_memory_sink

JOIN_WINDOW_MS = 2 * 3600 * 1000  # purchases look back 2h for clicks

#: the two joined event types (driver `events` carries signup/click/
#: error/view/purchase)
_LEFT_TYPE, _RIGHT_TYPE = "purchase", "click"


def interval_join_batch(events: DataFrame) -> DataFrame:
    """Batch twin: purchases × same-user clicks within the lookback.

    Equi-join on user_id with a residual time-range condition — a
    hash join, never a BNLJ; at 100 TB the user-key shuffle is
    AQE-skew-splittable.  (The symmetric pair variant with bucketed
    time keys is ``operators.temporal.range_join_pairs``.)"""
    from ..session import epoch_ms

    p = events.filter(F.col("event_type") == _LEFT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    c = events.filter(F.col("event_type") == _RIGHT_TYPE).select(
        "event_id", "user_id", "ts"
    )
    # the range condition compares RAW timestamps (microsecond
    # precision), exactly like the streaming query and the oracle — a
    # floored-epoch-ms comparison would admit a click up to 999 µs
    # AFTER its purchase (same millisecond) that both siblings reject;
    # only the emitted gap_ms is floored, matching unix_millis/epoch_ms
    p = p.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        epoch_ms(p, "ts").alias("p_ms"),
    )
    c = c.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        epoch_ms(c, "ts").alias("c_ms"),
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (
                F.col("c_ts")
                >= F.col("p_ts")
                - F.expr(f"INTERVAL {JOIN_WINDOW_MS} MILLISECONDS")
            ),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            (F.col("p_ms") - F.col("c_ms")).alias("gap_ms"),
        )
    )


def stream_interval_join(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "purchase_click_join",
    **source_opts,
):
    """Structured Streaming execution: two watermarked event-time
    streams, inner join on user_id + time range, append sink.

    The click side's watermark must cover the lookback window (Spark
    keeps click state until watermark + window passes); the purchase
    side needs only enough slack for out-of-order arrival.  Returns
    the started StreamingQuery."""
    from ..session import as_event_time
    from .source import file_stream

    src = as_event_time(file_stream(spark, sf_dir, "events", **source_opts), "ts")
    p = (
        src.filter(F.col("event_type") == _LEFT_TYPE)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    c = (
        src.filter(F.col("event_type") == _RIGHT_TYPE)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "3 hours")
    )
    joined = (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (
                F.col("c_ts")
                >= F.col("p_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_MS} MILLISECONDS")
            ),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            (F.unix_millis("p_ts") - F.unix_millis("c_ts")).alias("gap_ms"),
        )
    )
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


_RUN = [0]


def q_events_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the stream-stream interval join executed through
    the streaming engine and returned as the sink table, hash-checked
    against the batch DuckDB oracle — streaming execution held to
    batch semantics, like ``events_window_stream``."""
    _RUN[0] += 1
    name = f"purchase_click_join_{_RUN[0]}"
    q = stream_interval_join(spark, sf_dir, query_name=name)
    q.processAllAvailable()
    q.stop()
    return drain_memory_sink(spark, name)


def q_knn_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC k-NN join: every ARRIVING embedding is scored
    against the HELD index — a batch read of the embeddings table,
    standing in for the persisted index a production pipeline
    maintains — through the SAME broadcast kernel as the batch
    self-join (``pipeline.similarity.knn_score_fn``), so the full
    corpus streamed in must reproduce batch ``knn_join`` exactly (one
    shared oracle definition).

    Map-only per micro-batch: the index ships as broadcast model
    state inside the kernel (same posture as
    ``decontaminate_stream``'s eval-set), so there is ZERO streaming
    state store and no watermark — a stream-static join formulation
    would re-shuffle the static side per batch for strictly worse
    semantics.  At scale the arriving batch pays O(batch × index)
    scoring, the steady-state cost of online retrieval against a
    pinned index snapshot."""
    import os

    from ..pipeline.similarity import KNN_SCHEMA, knn_index, knn_score_fn
    from .source import file_stream

    # each call constructs a fresh read of the same files, so the
    # index cache anchors on (session, corpus path), not the frame
    idx = knn_index(
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")),
        cache_key=os.path.abspath(sf_dir),
    )
    _RUN[0] += 1
    name = f"knn_join_stream_{_RUN[0]}"
    scored = (
        file_stream(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .mapInPandas(knn_score_fn(idx), KNN_SCHEMA)
    )
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return drain_memory_sink(spark, name)


def _knn_stream_oracle() -> str:
    # the streamed corpus scored against the held full-corpus index IS
    # the batch k-NN self-join — one oracle definition for both
    from ..pipeline.similarity import ORACLE as _sim_oracle

    return _sim_oracle["knn_join"]


ORACLE: dict[str, str] = {
    "knn_join_stream": _knn_stream_oracle(),
    "events_stream_join": f"""
        SELECT p.event_id AS purchase_id, c.event_id AS click_id,
               p.user_id,
               epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = '{_LEFT_TYPE}' AND c.event_type = '{_RIGHT_TYPE}'
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL {JOIN_WINDOW_MS} MILLISECONDS
    """,
}

QUERIES_SPARK = {
    "events_stream_join": q_events_stream_join,
    "knn_join_stream": q_knn_join_stream,
}
