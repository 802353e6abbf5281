"""Event analytics: batch windowed aggregation + Structured Streaming.

The reference has NO stream processing (SURVEY §2.9 — its tokio
streams are an execution detail).  This module is beyond-parity: the
same event-time logic in two forms:

* batch (`q_events_window`, `q_events_sessionize`) — oracle-checkable
  SQL over the `events` table;
* streaming (`stream_events_hourly`) — `readStream` + watermark +
  tumbling window + memory sink, exercised in tests with
  `processAllAvailable()` (the documented local smoke pattern).

Scale: event-time windows aggregate with partial/final combine;
watermark bounds state.  Sessionization uses a window function (one
shuffle on user_id) — at 100 TB that is a range-partitioned sort per
user, which Spark spills as needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def q_events_window(t: dict) -> DataFrame:
    """Hourly tumbling window per event_type. Window start exported as
    epoch seconds (BIGINT) — timezone-proof for the oracle hash."""
    e = t["events"]
    return (
        e.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_events_sessionize(t: dict) -> DataFrame:
    """Sessionization: a new session starts when the gap to the
    previous event of the same user exceeds SESSION_GAP_MIN minutes.
    lag + cumulative-sum-over-window — the canonical batch form."""
    from pyspark.sql.window import Window

    e = t["events"]
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = F.when(
        gap_s.isNull() | (gap_s > SESSION_GAP_MIN * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = e.withColumn("is_new", new_session)
    return sessions.groupBy("user_id").agg(
        F.sum("is_new").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def stream_events_hourly(spark: SparkSession, sf_dir: str, query_name: str = "events_hourly"):
    """Structured Streaming twin of q_events_window: parquet source →
    watermark → tumbling window → memory sink. Returns the started
    StreamingQuery; caller runs processAllAvailable() + stop()."""
    batch_df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # file stream sources take a directory; glob down to the events file
    stream = (
        spark.readStream.schema(batch_df.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # driver parquet stores ts as TIMESTAMP(NANOS) → long under
    # nanosAsLong; restore event-time type for the watermark
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


ORACLE: dict[str, str] = {
    "events_window": """
        SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "events_sessionize": f"""
        WITH gaps AS (
            SELECT user_id,
                   CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (
                            PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC)) > {SESSION_GAP_MIN * 60}
                         OR LAG(ts) OVER (
                            PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
        SELECT user_id, SUM(is_new)::BIGINT AS n_sessions,
               COUNT(*) AS n_events
        FROM gaps GROUP BY user_id
    """,
}

QUERIES = {
    "events_window": q_events_window,
    "events_sessionize": q_events_sessionize,
}
