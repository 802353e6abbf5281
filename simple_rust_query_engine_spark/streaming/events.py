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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sink import drain_memory_sink

SESSION_GAP_MIN = 30


def q_events_window(t: dict) -> DataFrame:
    """Hourly tumbling window per event_type. Window start exported as
    epoch seconds (BIGINT) — computed from timezone-independent epoch
    millis (``session.epoch_ms``), never through a session-timezone
    cast, so the result is identical on any SparkSession and matches
    the DuckDB naive-timestamp oracle."""
    from ..session import epoch_ms

    e = t["events"]
    hour_start = (F.floor(epoch_ms(e, "ts") / F.lit(3_600_000)) * 3600).cast("long")
    return (
        e.groupBy(hour_start.alias("hour_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_events_window_sliding(t: dict) -> DataFrame:
    """Hopping (sliding) window: 1-hour windows every 30 minutes —
    each event lands in exactly 2 hops.  Batch form of
    ``F.window(ts, '1 hour', '30 minutes')``, expressed directly from
    timezone-free epoch millis so the hop arithmetic is identical in
    the oracle: hop k covers [k*30min, k*30min + 1h); an event at m
    belongs to hops floor(m/30min)-1 and floor(m/30min)."""
    from ..session import epoch_ms

    e = t["events"]
    half = 1_800_000  # 30 min in ms
    hop0 = F.floor(epoch_ms(e, "ts") / F.lit(half)).cast("long")
    return (
        e.select("event_type", "value", F.explode(F.array(hop0 - 1, hop0)).alias("hop"))
        .groupBy((F.col("hop") * 1800).alias("win_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # rounded like the tumbling twin: raw double sums are not
            # bit-reproducible across partial-aggregation orders
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_events_gapfill(t: dict) -> DataFrame:
    """GAP-FILL + forward fill — the time-series resample operator
    (TimescaleDB ``time_bucket_gapfill`` / QuestDB ``SAMPLE BY ...
    FILL(PREV)``): a dense hourly spine per event_type over the
    observed corpus span, with empty buckets emitted as ``is_gap``
    rows carrying the previous hour's value forward.  Dashboards and
    feature pipelines need the dense grid — a missing bucket is
    indistinguishable from "no data arrived" downstream otherwise.

    Scale shape: the ONLY corpus-sized work is the first hourly
    aggregate (uniform (hour, type) key, partial/final combine),
    materialized once so the spine bounds and the fill both read the
    dimension-sized result instead of re-scanning events.  The spine
    is ``sequence(lo, hi)`` exploded from ONE aggregated row — never
    a driver-side loop — and the spine×types grid is an explicitly
    tiny broadcast nested-loop (hours × event types, thousands of
    rows at any corpus size; the no-CartesianProduct sweep still
    holds).  The forward fill is one window per event_type over the
    dense grid — dimension-sized state, independent of corpus rows.

    Hash parity: the filled value is the ALREADY-ROUNDED hourly sum
    (same 2 dp contract as ``events_window``), carried verbatim by
    ``last(ignorenulls)`` — both engines forward the identical
    double, so the float column stays bit-exact; leading gaps before
    a type's first observation fill with 0.0 in both."""
    from ..pipeline.dedup import materialize
    from ..session import epoch_ms

    e = t["events"]
    hour_start = (F.floor(epoch_ms(e, "ts") / F.lit(3_600_000)) * 3600).cast(
        "long"
    )
    hourly = materialize(
        e.groupBy(hour_start.alias("hour_start"), "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    bounds = hourly.agg(
        F.min("hour_start").alias("lo"), F.max("hour_start").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("hour_start")
    )
    types = hourly.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    filled = grid.join(hourly, ["hour_start", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "hour_start",
        "event_type",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("sum_value").isNull().alias("is_gap"),
        F.coalesce(
            F.last("sum_value", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("sum_value_ff"),
    )


def q_events_sessionize(t: dict) -> DataFrame:
    """Sessionization: a new session starts when the gap to the
    previous event of the same user exceeds SESSION_GAP_MIN minutes.
    lag + cumulative-sum-over-window — the canonical batch form."""
    from pyspark.sql.window import Window

    from ..session import epoch_ms

    e = t["events"].withColumn("_ms", epoch_ms(t["events"], "ts"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # exact millisecond gap (events.ts carries sub-second precision;
    # whole-second truncation would disagree with the oracle on gaps
    # that straddle the threshold by < 1s)
    gap_ms = F.col("_ms") - F.lag("_ms").over(w)
    new_session = F.when(
        gap_ms.isNull() | (gap_ms > SESSION_GAP_MIN * 60_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = e.withColumn("is_new", new_session)
    return sessions.groupBy("user_id").agg(
        F.sum("is_new").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_events_session_window(t: dict) -> DataFrame:
    """Per-user sessions via Spark's BUILT-IN ``session_window`` (the
    declarative twin of the ``applyInPandasWithState`` operator below;
    also valid under ``groupBy`` in streaming).  Semantics: a session
    extends while the next event lands AT OR inside ``last_ts + gap``
    — an event at exactly the gap boundary MERGES (touching windows
    coalesce; verified empirically on Spark 4.1.2), so a new session
    starts only when the raw-microsecond gap strictly exceeds the
    threshold — the ``>`` rule in the oracle.  Emitted as epoch-millis
    bounds: start = first event, end = last event + gap."""
    from ..session import EPOCH_NTZ

    e = t["events"]
    return (
        e.groupBy(
            "user_id",
            F.session_window(F.col("ts"), f"{SESSION_GAP_MIN} minutes"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.expr(
                f"timestampdiff(MILLISECOND, {EPOCH_NTZ}, session_window.start)"
            ).alias("sess_start"),
            F.expr(
                f"timestampdiff(MILLISECOND, {EPOCH_NTZ}, session_window.end)"
            ).alias("sess_end"),
            "n_events",
        )
    )


def _events_stream(spark: SparkSession, sf_dir: str, **source_opts):
    from .source import file_stream

    return file_stream(spark, sf_dir, "events", **source_opts)


def stream_events_hourly(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "events_hourly",
    output_mode: str = "append",
):
    """Structured Streaming twin of q_events_window: parquet source →
    watermark → tumbling window → memory sink. Returns the started
    StreamingQuery; caller runs processAllAvailable() + stop().

    append mode emits only watermark-finalized windows (the unbounded
    -input posture; the trailing window stays open); complete mode
    re-emits everything — used for the oracle-parity entry below."""
    from ..session import as_event_time

    # watermarks reject TIMESTAMP_NTZ — convert ts to an LTZ instant
    # (naive == UTC, timezone-independent) before the streaming window
    src = as_event_time(_events_stream(spark, sf_dir), "ts")
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            # window.start is LTZ; unix_millis reads the instant, so
            # this is timezone-independent (window boundaries are
            # hour-aligned on the instant → millis div 1000 is exact)
            F.expr("unix_millis(window.start) div 1000").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


_STREAM_RUN = [0]


def q_events_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME hourly windowed aggregation, executed through the
    Structured Streaming engine (readStream → window → memory sink,
    availableNow) and returned as the sink table — so the STREAMING
    path itself is held to the exact batch oracle.  Complete mode
    re-emits every window; on unbounded input you would run append
    mode with the watermark finalizing windows incrementally."""
    _STREAM_RUN[0] += 1
    name = f"events_hourly_oracle_{_STREAM_RUN[0]}"
    q = stream_events_hourly(spark, sf_dir, query_name=name, output_mode="complete")
    q.processAllAvailable()
    q.stop()
    return drain_memory_sink(spark, name)


def stream_sessionize_stateful(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "sessions_stateful",
    gap_min: int = SESSION_GAP_MIN,
    **source_opts,
):
    """Custom stateful streaming operator: per-user sessionization via
    ``applyInPandasWithState`` — the arbitrary-state API the reference
    has no counterpart for (its tokio streams are pull-based batch
    plumbing, SURVEY §2.9).

    State per user_id: (last event ts, session count, event count).
    Each micro-batch folds its (sorted) events into the carried state
    and emits the user's updated totals (update semantics — the memory
    sink holds one row per user per batch; readers take the last).
    Scale: state is two longs + a timestamp per user, partitioned by
    the grouping key across executors; an unbounded run would add a
    state timeout to retire idle users."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_min * 60_000

    def update_fn(key, pdfs, state: GroupState):
        last_ts, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        # the iterator yields the group's rows as Arrow chunks in
        # arbitrary order — materialize the whole micro-batch for
        # this user and sort ONCE, or cross-chunk gaps miscount.
        # (Bounded: one user's events per micro-batch; rate-limit
        # the source if a single key can exceed executor memory.)
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])
            # normalize to ns first — Arrow may hand the batch over as
            # datetime64[us], where a bare astype(int64) would be micros.
            # Gap math in EXACT milliseconds, same as the batch twin —
            # whole-second truncation would disagree on gaps straddling
            # the threshold by < 1s (events.ts has sub-second precision)
            ts_ns = batch["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
            for ts in ts_ns // 10**6:  # epoch milliseconds
                ts = int(ts)
                if last_ts is None or ts - last_ts > gap_ms:
                    n_sessions += 1
                last_ts = ts
            n_events += len(batch)
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    out = (
        _events_stream(spark, sf_dir, **source_opts)
        .groupBy("user_id")
        .applyInPandasWithState(
            update_fn,
            outputStructType="user_id long, n_sessions long, n_events long",
            stateStructType="last_ts long, n_sessions long, n_events long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_funnel_stateful(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "funnel_stateful",
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    **source_opts,
):
    """Streaming twin of ``operators.temporal.funnel``: per-user
    ordered-funnel progress via ``applyInPandasWithState``.

    State per user is O(1) — one nullable epoch-ms first-time per
    stage — folded with the same gating recurrence as the batch
    operator: stage k accepts an event only once stage k-1's
    first-time is set.  Each micro-batch sorts its own rows by
    (ts, event_id) before folding, so the emitted funnel equals the
    batch operator whenever events arrive in order across batches
    (and exactly, on any input, under a single availableNow batch —
    the parity test's configuration).  An out-of-order producer needs
    the watermark-buffered variant: hold events in state until the
    watermark passes, then fold — O(buffer) state, same recurrence.
    Emitted in update mode: one row per user per batch; first-times
    only decrease and depth only grows, so min/max over emissions
    recovers the final state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n = len(stages)

    def update_fn(key, pdfs, state: GroupState):
        firsts = list(state.get) if state.exists else [None] * n
        chunks = list(pdfs)
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])
            ts_ms = (
                batch["ts"].to_numpy().astype("datetime64[ns]").astype("int64")
                // 10**6
            )
            for ms, typ in zip(ts_ms, batch["event_type"]):
                ms = int(ms)
                for k, stg in enumerate(stages):
                    if typ == stg and (k == 0 or firsts[k - 1] is not None):
                        if firsts[k] is None or ms < firsts[k]:
                            firsts[k] = ms
        state.update(tuple(firsts))
        depth = sum(1 for f in firsts if f is not None)
        row = {"user_id": [key[0]], "depth": [depth]}
        for stg, f in zip(stages, firsts):
            row[f"t_{stg}_ms"] = [f]
        yield pd.DataFrame(row)

    t_cols = ", ".join(f"t_{s}_ms long" for s in stages)
    out = (
        _events_stream(spark, sf_dir, **source_opts)
        .groupBy("user_id")
        .applyInPandasWithState(
            update_fn,
            outputStructType=f"user_id long, depth int, {t_cols}",
            stateStructType=t_cols,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        out.writeStream.outputMode("update")
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
                   CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER (
                            PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC)) > {SESSION_GAP_MIN * 60_000}
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

ORACLE["events_window_stream"] = ORACLE["events_window"]

# gap-fill: dense hourly spine × observed event types, LEFT JOIN the
# hourly aggregate, forward-fill the already-rounded sum per type.
# LAST_VALUE(... IGNORE NULLS) over ROWS UNBOUNDED PRECEDING is the
# exact dual of Spark's last(col, ignorenulls=True); DuckDB window
# aggregates over DOUBLE return DECIMAL-free doubles, so the carried
# value is the identical bit pattern.
ORACLE["events_gapfill"] = """
    WITH hourly AS (
        SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(hour_start) AS lo, MAX(hour_start) AS hi
               FROM hourly),
    spine AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_start
              FROM bounds),
    grid AS (SELECT s.hour_start, ty.event_type
             FROM spine s
             CROSS JOIN (SELECT DISTINCT event_type FROM hourly) ty),
    filled AS (
        SELECT g.hour_start, g.event_type, h.n_events, h.sum_value
        FROM grid g
        LEFT JOIN hourly h
          ON g.hour_start = h.hour_start AND g.event_type = h.event_type
    )
    SELECT hour_start, event_type,
           COALESCE(n_events, 0)::BIGINT AS n_events,
           sum_value IS NULL AS is_gap,
           COALESCE(LAST_VALUE(sum_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour_start
               ROWS UNBOUNDED PRECEDING), 0.0) AS sum_value_ff
    FROM filled
"""

ORACLE["events_window_sliding"] = """
    WITH hops AS (
        SELECT event_type, value,
               unnest([epoch_ms(ts) // 1800000 - 1,
                       epoch_ms(ts) // 1800000]) AS hop
        FROM events
    )
    SELECT (hop * 1800)::BIGINT AS win_start, event_type,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM hops GROUP BY 1, 2
"""

ORACLE["events_session_window"] = f"""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               -- microsecond precision + STRICT inequality: Spark's
               -- session_window MERGES an event landing exactly at
               -- last_ts + gap (verified on 4.1.2); a floored-ms or
               -- >= rule would split boundary / same-ms-straddling
               -- pairs differently
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                         > {SESSION_GAP_MIN * 60_000_000}
                     OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), segs AS (
        SELECT user_id, ts,
               -- event_id tiebreak: equal-ts rows must land in the
               -- same deterministic segment order as `marked`
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC
                                 ROWS UNBOUNDED PRECEDING) AS seg
        FROM marked
    )
    SELECT user_id,
           epoch_ms(min(ts)) AS sess_start,
           epoch_ms(max(ts)) + {SESSION_GAP_MIN * 60_000} AS sess_end,
           COUNT(*) AS n_events
    FROM segs GROUP BY user_id, seg
"""

QUERIES = {
    "events_window": q_events_window,
    "events_window_sliding": q_events_window_sliding,
    "events_gapfill": q_events_gapfill,
    "events_sessionize": q_events_sessionize,
    "events_session_window": q_events_session_window,
}

#: entries that need (spark, sf_dir) directly (streaming sources)
QUERIES_SPARK = {
    "events_window_stream": q_events_window_stream,
}
