"""Temporal join operators Spark has no built-in for: backward as-of
join and bounded range (interval) self-join.

The reference has no temporal joins at all (its join surface is Inner/
Left equi + keyless nested-loop — ``/root/reference/src/plan/logical/
join.rs:14-17``, ``src/sql/join.rs:43-48``), but any event/feature
pipeline over the driver's ``events`` table needs them, and the naive
SQL forms are exactly the plans that die at 100 TB:

* as-of as a correlated ``MAX(t') WHERE t' <= t`` subquery or an
  inequality join explodes into a per-row scan / BroadcastNestedLoop.
* ``|t_a - t_b| <= w`` range predicates have no equi keys, so Catalyst
  plans a cartesian per user.

Both operators here re-shape the problem into ONE hash shuffle:

* ``merge_asof`` — union the two sides, single window over
  (key, time, side) with ``last(..., ignorenulls=True)``: the classic
  distributed merge-asof.  Work is O(n log n) per key partition
  (sort), no join node at all.
* ``range_join_pairs`` — time-bucket both sides at the window width,
  explode one side to its 3 neighboring buckets, equi-join on
  (key, bucket).  A qualifying pair has bucket distance <= 1, so it
  matches exactly once (the exploded bucket values are distinct) —
  no post-``distinct`` needed.  Shuffle is hash(key, bucket): skewed
  users spread over their time range, and AQE's skew-join splitting
  covers hot (user, hour) cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
):
    """Shared as-of framing: tag sides, NULL the other side's payload,
    union by name.  Returns ``(union_df, right_payload_columns)``;
    ``_side`` is 1 for left rows, 0 for right, ``_t`` the event time
    (right rows with NULL time dropped — they can never be "at or
    before/after" any left time, and the carry scan would otherwise
    hand their payload to whichever left rows they sort next to)."""
    overlap = set(left.columns) & set(right.columns)
    if right_on == left_on:
        # the shared join key is the one legitimately-common column
        overlap -= {left_on}
    # when right_on != left_on, a right column literally named left_on
    # is NOT exempt: withColumnRenamed(right_on, left_on) below would
    # otherwise create two same-named columns and die downstream with
    # an opaque AMBIGUOUS_REFERENCE instead of this error
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")
    l_types, r_types = dict(left.dtypes), dict(right.dtypes)
    r_payload = [c for c in right.columns if c != right_on]

    lt = left.withColumn("_side", F.lit(1)).withColumn("_t", F.col(left_time))
    for c in r_payload:
        lt = lt.withColumn(c, F.lit(None).cast(r_types[c]))
    rt = right.filter(F.col(right_time).isNotNull()).withColumnRenamed(
        right_on, left_on
    )
    rt = rt.withColumn("_side", F.lit(0)).withColumn("_t", F.col(right_time))
    for c in left.columns:
        if c != left_on:
            rt = rt.withColumn(c, F.lit(None).cast(l_types[c]))

    return lt.unionByName(rt.select(*lt.columns)), r_payload


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of LEFT join: each left row picks ONE right row for the same
    key — ``backward`` (default): the greatest ``right_time <=
    left_time``; ``forward``: the smallest ``right_time >=
    left_time``.  Ties on time include the right row (DuckDB ``ASOF``
    with ``>=``/``<=``); left rows with no qualifying right row keep
    NULLs.

    Implementation is union + window, not a join: tag each side, union
    by name with the other side's payload NULLed, then one window
    partitioned by key and ordered by (time, side) — right rows sort
    before left rows at equal time (time order is reversed for
    ``forward``, which turns "first at or after" into the same
    carry-last-non-NULL scan) — carrying the last non-NULL right
    payload forward.  One shuffle, one per-partition sort, zero join
    nodes.  The right side must be unique per (key, time) — ties there
    are ambiguous in any as-of definition; pre-aggregate to enforce.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    u, r_payload = _asof_union(left, right, left_on, right_on, left_time, right_time)
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(left_on)
        .orderBy(t_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the right payload is carried as ONE struct, not per-column:
    # independent last(col, ignorenulls) scans would back-fill a NULL
    # field of the matched right row from an OLDER right row, emitting
    # a torn row that exists on neither side.  The struct is non-NULL
    # for every right row (even all-NULL payloads), so one
    # last(ignorenulls) picks all fields from the same matched row.
    r_struct = F.when(
        F.col("_side") == 0, F.struct(*[F.col(c) for c in r_payload])
    )
    filled = u.select(
        *[c for c in left.columns],
        # a left row with NULL time matches nothing in any as-of
        # definition — mask the carried payload to NULL for it (its
        # sort position among the NULL-ordered rows is arbitrary)
        F.when(
            F.col("_t").isNotNull(),
            F.last(r_struct, ignorenulls=True).over(w),
        ).alias("_r"),
        "_side",
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"_r.{c}").alias(c) for c in r_payload],
        )
    )


def merge_asof_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
) -> DataFrame:
    """Nearest as-of LEFT join: each left row picks the right row (same
    key) with the smallest |time distance|; ties go backward (the
    pandas ``merge_asof(direction='nearest')`` convention).  Adds a
    ``delta_ms`` column (the winning distance; NULL when no match).

    Plan: the same union framing as ``merge_asof``, then BOTH carries
    over epoch-MICROsecond RANGE frames — keying the frame on ``_us``
    makes the side tie-break column unnecessary (every row with the
    same timestamp is in-frame in both directions).  Both directions
    are GROWING frames (unboundedPreceding → currentRow): backward is
    ``last(..., ignorenulls)`` over ``_us`` ascending, forward is the
    same carry over ``_us`` DESCENDING — "first right row at or after
    me" == "last right row at or before me in reverse time".  Spark
    evaluates a growing frame incrementally (O(n) per partition) but
    recomputes a shrinking frame (currentRow → unboundedFollowing)
    from scratch per row — O(n²) per key partition.  At sf0.1 the A/B
    is flat (~0.8 s steady either way; ~100 rows per key, so n² never
    bites), but per-key history grows with corpus size while key
    cardinality saturates — at 100 TB the shrinking frame is the
    difference between a linear scan and a quadratic stall on the
    largest keys.  The two sort orders share one Exchange (same
    partition key; the second Window adds only a re-Sort): one
    shuffle, two per-partition sorts, zero join nodes — still cheaper
    than running the two directional variants and re-joining them on
    row id, which would cost three shuffles.  Microseconds, not
    milliseconds: a floored-ms
    key would call a right row up to 999 µs in the FUTURE a backward
    match, and would make two right rows inside the same millisecond
    (distinct raw times, satisfying the uniqueness contract)
    nondeterministic window peers.  ``delta_ms`` floors the winning
    µs distance, matching DuckDB ``date_diff('millisecond', …)``.
    """
    from ..session import epoch_us

    u, r_payload = _asof_union(left, right, left_on, right_on, left_time, right_time)
    u = u.withColumn("_us", epoch_us(u, "_t"))
    # right payload rides as one struct carrying its own epoch-µs, so
    # the distance comparison and every output field come from the
    # same matched row (see merge_asof's torn-row note)
    r_struct = F.when(
        F.col("_side") == 0,
        F.struct(F.col("_us").alias("_rus"), *[F.col(c) for c in r_payload]),
    )
    w_b = (
        Window.partitionBy(left_on)
        .orderBy("_us")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(left_on)
        .orderBy(F.col("_us").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in left.columns],
        # left rows with NULL time match nothing (mask, as in merge_asof)
        F.when(
            F.col("_t").isNotNull(),
            F.last(r_struct, ignorenulls=True).over(w_b),
        ).alias("_b"),
        F.when(
            F.col("_t").isNotNull(),
            F.last(r_struct, ignorenulls=True).over(w_f),
        ).alias("_f"),
        "_us",
        "_side",
    )
    d_b = F.col("_us") - F.col("_b._rus")
    d_f = F.col("_f._rus") - F.col("_us")
    chosen = (
        F.when(F.col("_b").isNull(), F.col("_f"))
        .when(F.col("_f").isNull(), F.col("_b"))
        .when(d_b <= d_f, F.col("_b"))
        .otherwise(F.col("_f"))
    )
    return (
        filled.filter(F.col("_side") == 1)
        .withColumn("_r", chosen)
        .select(
            *[c for c in left.columns],
            *[F.col(f"_r.{c}").alias(c) for c in r_payload],
            # least() skips NULLs, so this is the winning µs distance
            # whichever side matched (NULL when neither did); floor to
            # ms — distances are non-negative, so truncation == floor
            (F.least(d_b, d_f) / F.lit(1000)).cast("long").alias("delta_ms"),
        )
    )


def range_join_pairs(
    events: DataFrame,
    key: str,
    time: str,
    id_col: str,
    window_ms: int,
) -> DataFrame:
    """All pairs of rows sharing ``key`` whose ``time`` values are
    within ``window_ms`` of each other, normalized ``id_a < id_b``.

    Bucketing turns the inequality into equi keys: a pair within the
    window spans at most adjacent buckets of width ``window_ms``, so
    joining side A exploded to buckets {b-1, b, b+1} against side B's
    single bucket finds every pair exactly once (the three exploded
    values are distinct, so at most one can equal B's bucket).
    """
    from ..session import epoch_ms

    base = events.select(
        F.col(id_col), F.col(key), epoch_ms(events, time).alias("_ms")
    ).withColumn("_bkt", F.floor(F.col("_ms") / F.lit(window_ms)))
    probe = base.withColumn(
        "_bkt",
        F.explode(F.array(F.col("_bkt") - 1, F.col("_bkt"), F.col("_bkt") + 1)),
    )
    a, b = probe.alias("a"), base.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col("a._bkt") == F.col("b._bkt"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(F.abs(F.col("a._ms") - F.col("b._ms")) <= F.lit(window_ms))
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col}_a"),
            F.col(f"b.{id_col}").alias(f"{id_col}_b"),
            F.col(f"a.{key}").alias(key),
            (F.col("b._ms") - F.col("a._ms")).alias("delta_ms"),
        )
    )


def funnel(
    events: DataFrame,
    stages: tuple[str, ...],
    key_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel: per key, the earliest time of each stage such
    that stage *i* happens at-or-after the chosen stage *i-1* time
    (classic view→click→purchase product analytics — no engine in the
    comparison set has it built in).

    A stage-k time depends on the stage-(k-1) choice, so it is NOT a
    plain conditional min; a per-stage self-join chain would cost one
    shuffle per stage.  Instead: ONE shuffle.  A window partitioned by
    key and ordered by (time, ``order_col``) computes the running
    first-time of each stage in sequence — a row qualifies for stage k
    iff stage k-1's running first-time is already non-NULL at that row
    (i.e. some qualifying stage-(k-1) event sorts at-or-before it;
    ties broken deterministically by ``order_col``).  The final
    groupBy is on the window's own partitioning key, so Catalyst
    reuses the exchange: one hash shuffle total, any number of stages.
    ``depth`` = number of stages completed, so funnel drop-off is a
    ``groupBy(depth).count()`` away.

    Stage names must be unique: a repeated label (view→click→view)
    would alias two different funnel positions to the same ``t_{name}``
    output column — rejected up front rather than producing an
    ambiguous schema.
    """
    if len(set(stages)) != len(stages):
        raise ValueError(f"funnel stages must be unique: {stages}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(time_col).asc(), F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events.select(key_col, time_col, order_col, type_col)
    cands = []
    prev_running = None
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev_running is not None:
            cond = cond & prev_running.isNotNull()
        cand = F.when(cond, F.col(time_col))
        col_name = f"_cand_{i}"
        df = df.withColumn(col_name, cand)
        cands.append(col_name)
        prev_running = F.min(col_name).over(w)
    agg = [
        F.min(c).alias(f"t_{stage}") for c, stage in zip(cands, stages)
    ]
    depth = None
    # enumerate, not stages.index(stage): index() is O(n²) in stage
    # count (repeated names themselves are rejected up front)
    for i, stage in reversed(list(enumerate(stages))):
        hit = F.col(f"t_{stage}").isNotNull()
        depth = (
            F.when(hit, F.lit(i + 1))
            if depth is None
            else depth.when(hit, F.lit(i + 1))
        )
    return (
        df.groupBy(key_col)
        .agg(*agg)
        .withColumn("depth", depth.otherwise(F.lit(0)).cast("int"))
    )


# ------------------------------------------------------------ driver
RANGE_WINDOW_MS = 3_600_000  # 1 hour


def q_join_asof(t: dict) -> DataFrame:
    """Each event joined to the customer's latest order at event time.

    The right side is pre-aggregated to one row per (custkey, date) —
    deterministic tie-break by highest orderkey — because as-of is
    ambiguous under right-side time ties."""
    ev = t["events"].select("event_id", "user_id", "ts")
    last_order = t["orders"].groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("last_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("last_totalprice"),
    )
    return merge_asof(ev, last_order, "user_id", "o_custkey", "ts", "o_orderdate")


def q_join_asof_fwd(t: dict) -> DataFrame:
    """Forward as-of: each event joined to the customer's NEXT order
    at or after event time (same deterministic right-side
    pre-aggregation as the backward query)."""
    ev = t["events"].select("event_id", "user_id", "ts")
    next_order = t["orders"].groupBy("o_custkey", "o_orderdate").agg(
        F.min("o_orderkey").alias("next_orderkey"),
        F.min_by("o_totalprice", "o_orderkey").alias("next_totalprice"),
    )
    return merge_asof(
        ev, next_order, "user_id", "o_custkey", "ts", "o_orderdate",
        direction="forward",
    )


def q_join_asof_nearest(t: dict) -> DataFrame:
    """Nearest as-of: each event joined to the customer's CLOSEST
    order in time, either direction, ties backward (same deterministic
    right-side pre-aggregation as the directional queries)."""
    ev = t["events"].select("event_id", "user_id", "ts")
    near_order = t["orders"].groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("near_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("near_totalprice"),
    )
    return merge_asof_nearest(
        ev, near_order, "user_id", "o_custkey", "ts", "o_orderdate"
    )


def q_range_join(t: dict) -> DataFrame:
    """Same-user event pairs within one hour of each other."""
    return range_join_pairs(
        t["events"], "user_id", "ts", "event_id", RANGE_WINDOW_MS
    )


FUNNEL_STAGES = ("view", "click", "purchase")


def q_events_funnel(t: dict) -> DataFrame:
    """Per-user view→click→purchase funnel over the events table."""
    return funnel(t["events"], FUNNEL_STAGES)


DAY_MS = 86_400_000


def retention(
    events: DataFrame, key_col: str = "user_id", time_col: str = "ts"
) -> DataFrame:
    """Cohort retention: users bucketed by their first active day
    (the cohort), counted on each later day offset — the companion
    analysis to the funnel, and the other table every product/corpus
    activity dashboard is built from.

    Three keyed aggregations, no windows: distinct (user, day)
    activity, per-user min day (the cohort), then a count per
    (cohort_day, day_offset).  The activity distinct makes the final
    count a plain COUNT(*) — never COUNT(DISTINCT user) over a
    skewed group.  Every shuffle is on user or cohort keys; hot days
    are absorbed by partial aggregation.  Days are floor(epoch_ms /
    86400000) — timezone-free, so any engine/cluster agrees."""
    from ..session import epoch_ms

    day = F.floor(epoch_ms(events, time_col) / F.lit(DAY_MS)).cast("long")
    user_day = events.select(
        F.col(key_col).alias("k"), day.alias("day")
    ).distinct()
    cohort = user_day.groupBy("k").agg(F.min("day").alias("cohort_day"))
    return (
        user_day.join(cohort, "k")
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def q_events_retention(t: dict) -> DataFrame:
    return retention(t["events"])


ORACLE: dict[str, str] = {
    # DuckDB's native ASOF JOIN is the oracle — the textbook semantics
    # our union+window plan must reproduce
    "join_asof": """
        WITH last_order AS (
            SELECT o_custkey, o_orderdate,
                   max(o_orderkey) AS last_orderkey,
                   arg_max(o_totalprice, o_orderkey) AS last_totalprice
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderdate, o.last_orderkey, o.last_totalprice
        FROM events e ASOF LEFT JOIN last_order o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    "join_asof_fwd": """
        WITH next_order AS (
            SELECT o_custkey, o_orderdate,
                   min(o_orderkey) AS next_orderkey,
                   arg_min(o_totalprice, o_orderkey) AS next_totalprice
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderdate, o.next_orderkey, o.next_totalprice
        FROM events e ASOF LEFT JOIN next_order o
          ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    """,
    # nearest = CASE over the two directional ASOF joins; tie (equal
    # distance) goes backward, matching pandas merge_asof('nearest')
    "join_asof_nearest": """
        WITH near AS (
            SELECT o_custkey, o_orderdate,
                   max(o_orderkey) AS near_orderkey,
                   arg_max(o_totalprice, o_orderkey) AS near_totalprice
            FROM orders GROUP BY 1, 2
        ), b AS (
            SELECT e.event_id, o.o_orderdate AS b_date,
                   o.near_orderkey AS b_key, o.near_totalprice AS b_price
            FROM events e ASOF LEFT JOIN near o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ), f AS (
            SELECT e.event_id, o.o_orderdate AS f_date,
                   o.near_orderkey AS f_key, o.near_totalprice AS f_price
            FROM events e ASOF LEFT JOIN near o
              ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        )
        SELECT e.event_id, e.user_id, e.ts,
               CASE WHEN b_date IS NULL THEN f_date
                    WHEN f_date IS NULL THEN b_date
                    WHEN date_diff('microsecond', b_date, e.ts)
                         <= date_diff('microsecond', e.ts, f_date)
                    THEN b_date ELSE f_date END AS o_orderdate,
               CASE WHEN b_date IS NULL THEN f_key
                    WHEN f_date IS NULL THEN b_key
                    WHEN date_diff('microsecond', b_date, e.ts)
                         <= date_diff('microsecond', e.ts, f_date)
                    THEN b_key ELSE f_key END AS near_orderkey,
               CASE WHEN b_date IS NULL THEN f_price
                    WHEN f_date IS NULL THEN b_price
                    WHEN date_diff('microsecond', b_date, e.ts)
                         <= date_diff('microsecond', e.ts, f_date)
                    THEN b_price ELSE f_price END AS near_totalprice,
               -- distance compared at raw µs precision (mirrors the
               -- Spark _us key); the reported delta floors µs → ms
               (least(date_diff('microsecond', b_date, e.ts),
                      date_diff('microsecond', e.ts, f_date)) // 1000)::BIGINT
                   AS delta_ms
        FROM events e
        JOIN b USING (event_id) JOIN f USING (event_id)
    """,
    # the oracle is the naive inequality join the bucketed plan avoids
    "range_join": f"""
        SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
               a.user_id,
               date_diff('millisecond', a.ts, b.ts) AS delta_ms
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND abs(date_diff('millisecond', a.ts, b.ts)) <= {RANGE_WINDOW_MS}
    """,
    # the oracle mirrors the one-shuffle window construction stage by
    # stage — running first-time of stage k-1 gates stage k candidacy,
    # ties resolved by the same (ts, event_id) total order
    "events_funnel": """
        WITH s1 AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN event_type = 'view' THEN ts END AS c0
            FROM events
        ), s2 AS (
            SELECT *,
                   CASE WHEN event_type = 'click' AND
                        MIN(c0) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                            IS NOT NULL
                        THEN ts END AS c1
            FROM s1
        ), s3 AS (
            SELECT *,
                   CASE WHEN event_type = 'purchase' AND
                        MIN(c1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                            IS NOT NULL
                        THEN ts END AS c2
            FROM s2
        )
        SELECT user_id,
               MIN(c0) AS t_view,
               MIN(c1) AS t_click,
               MIN(c2) AS t_purchase,
               CASE WHEN MIN(c2) IS NOT NULL THEN 3
                    WHEN MIN(c1) IS NOT NULL THEN 2
                    WHEN MIN(c0) IS NOT NULL THEN 1
                    ELSE 0 END AS depth
        FROM s3 GROUP BY user_id
    """,
    "events_retention": f"""
        WITH user_day AS (
            SELECT DISTINCT user_id AS k,
                   epoch_ms(ts) // {DAY_MS} AS day
            FROM events
        ), cohort AS (
            SELECT k, MIN(day) AS cohort_day FROM user_day GROUP BY k
        )
        SELECT cohort_day, day - cohort_day AS day_offset,
               COUNT(*) AS n_active
        FROM user_day JOIN cohort USING (k)
        GROUP BY 1, 2
    """,
}

QUERIES = {
    "join_asof": q_join_asof,
    "join_asof_fwd": q_join_asof_fwd,
    "join_asof_nearest": q_join_asof_nearest,
    "range_join": q_range_join,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
}
