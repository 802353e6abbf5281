"""Semantics tests for the temporal operators: as-of tie/miss/NULL
behavior and range-join bucket-boundary coverage — the cases the
driver corpus (dense events, full match) never exercises."""

from datetime import datetime

from pyspark.sql import functions as F

from simple_rust_query_engine_spark.operators.temporal import (
    merge_asof,
    merge_asof_nearest,
    range_join_pairs,
)
from simple_rust_query_engine_spark.plans.inspect import explain_str


def _ts(s):
    return datetime.fromisoformat(s)


def _sides(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # after both rights
            (2, 10, _ts("2024-01-01 08:00:00")),  # tie with right @08
            (3, 10, _ts("2024-01-01 07:00:00")),  # before all rights
            (4, 99, _ts("2024-01-01 10:00:00")),  # key with no rights
        ],
        "id long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 08:00:00"), "r8"),
            (10, _ts("2024-01-01 09:00:00"), "r9"),
        ],
        "rk long, rt timestamp, payload string",
    )
    return left, right


def test_asof_backward_tie_and_miss_semantics(spark):
    left, right = _sides(spark)
    out = {r.id: r for r in merge_asof(left, right, "k", "rk", "t", "rt").collect()}
    assert len(out) == 4  # LEFT semantics: every left row survives
    assert out[1].payload == "r9"  # latest right <= t
    assert out[2].payload == "r8"  # tie at equal time matches (>=)
    assert out[3].payload is None  # no prior right -> NULLs
    assert out[3].rt is None
    assert out[4].payload is None  # unseen key -> NULLs


def test_asof_nearest_picks_closer_side_ties_backward(spark):
    left, right = _sides(spark)
    # midpoint row: 08:30 is exactly 1800s from r8 (back) and r9
    # (fwd) — the tie must go BACKWARD (pandas 'nearest' convention)
    left = left.union(
        spark.createDataFrame(
            [(5, 10, _ts("2024-01-01 08:30:00"))], left.schema
        )
    )
    out = {
        r.id: r
        for r in merge_asof_nearest(left, right, "k", "rk", "t", "rt").collect()
    }
    assert len(out) == 5
    assert out[1].payload == "r9"  # only backward exists
    assert out[1].delta_ms == 3_600_000
    assert out[2].payload == "r8" and out[2].delta_ms == 0  # exact hit
    assert out[3].payload == "r8"  # only forward exists
    assert out[3].delta_ms == 3_600_000
    assert out[4].payload is None and out[4].delta_ms is None  # no key
    assert out[5].payload == "r8"  # equidistant -> backward
    assert out[5].delta_ms == 1_800_000


def test_asof_rejects_ambiguous_columns(spark):
    left, right = _sides(spark)
    try:
        merge_asof(left, right.withColumnRenamed("payload", "t"), "k", "rk", "t", "rt")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "ambiguous" in str(e)


def test_asof_plan_has_no_join_node(spark):
    # the point of union+window: zero join nodes, one hash exchange of
    # the unioned sides feeding the window sort
    left, right = _sides(spark)
    text = explain_str(merge_asof(left, right, "k", "rk", "t", "rt"))
    assert "Join" not in text, text
    assert "Window" in text


def test_range_join_crosses_bucket_boundary_exactly_once(spark):
    # window 1000ms; events at 900ms and 1100ms sit in DIFFERENT
    # buckets but are 200ms apart -> must pair exactly once; events
    # 0ms and 1500ms are 1500ms apart -> excluded even though their
    # buckets are adjacent
    ev = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 00:00:00.000")),
            (2, 7, _ts("2024-01-01 00:00:00.900")),
            (3, 7, _ts("2024-01-01 00:00:01.100")),
            (4, 7, _ts("2024-01-01 00:00:01.500")),
            (5, 8, _ts("2024-01-01 00:00:00.950")),  # other key
        ],
        "event_id long, user_id long, ts timestamp",
    )
    rows = range_join_pairs(ev, "user_id", "ts", "event_id", 1000).collect()
    pairs = {(r.event_id_a, r.event_id_b): r.delta_ms for r in rows}
    # (1,3) is 1100ms apart -> excluded despite adjacent buckets;
    # (2,3) crosses the bucket-1 boundary -> found exactly once;
    # event 5 shares times but not the key -> never paired
    assert pairs == {(1, 2): 900, (2, 3): 200, (2, 4): 600, (3, 4): 400}


def test_range_join_is_equi_join_not_nested_loop(spark):
    ev = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 00:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    text = explain_str(range_join_pairs(ev, "user_id", "ts", "event_id", 1000))
    assert "NestedLoop" not in text and "Cartesian" not in text, text


def test_asof_forward_tie_and_miss_semantics(spark):
    from simple_rust_query_engine_spark.operators.temporal import merge_asof

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 25, "a"), (1, 30, "b")], "rk long, rt long, v string"
    )
    out = {
        r.t: (r.rt, r.v)
        for r in merge_asof(
            left, right, "k", "rk", "t", "rt", direction="forward"
        ).collect()
    }
    assert out[10] == (25, "a")        # next row strictly after
    assert out[25] == (25, "a")        # tie at equal time includes it
    assert out[40] == (None, None)     # nothing at/after → NULLs


def test_asof_null_payload_field_not_torn(spark):
    # a NULL field in the MATCHED right row must come through as NULL,
    # never back-filled from an older right row (torn-row regression)
    from simple_rust_query_engine_spark.operators.temporal import merge_asof

    left = spark.createDataFrame([(1, 12)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 5, "a", 2), (1, 10, None, 1)], "rk long, rt long, v string, u long"
    )
    row = merge_asof(left, right, "k", "rk", "t", "rt").collect()[0]
    assert (row.rt, row.v, row.u) == (10, None, 1)


def test_asof_null_times_match_nothing(spark):
    from simple_rust_query_engine_spark.operators.temporal import merge_asof

    left = spark.createDataFrame([(1, 10), (1, None)], "k long, t long")
    right = spark.createDataFrame(
        [(1, None, "x"), (1, 5, "y")], "rk long, rt long, v string"
    )
    for direction in ("backward", "forward"):
        out = {r.t: (r.rt, r.v) for r in merge_asof(
            left, right, "k", "rk", "t", "rt", direction=direction
        ).collect()}
        # NULL left time matches nothing; NULL right time is never a match
        assert out[None] == (None, None), (direction, out)
        expected = (5, "y") if direction == "backward" else (None, None)
        assert out[10] == expected, (direction, out)


def test_asof_nearest_submillisecond_determinism(spark):
    # two right rows inside the same millisecond (distinct raw times —
    # allowed by the uniqueness contract): the µs-keyed carry must
    # pick the closer one deterministically; a floored-ms key made
    # them window peers with an arbitrary last() pick
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00.001000"))], "id long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:00:00.001300"), "r300"),
            (10, _ts("2024-01-01 10:00:00.001500"), "r500"),
        ],
        "rk long, rt timestamp, payload string",
    )
    for _ in range(3):  # repeated runs: same pick every time
        rows = merge_asof_nearest(left, right, "k", "rk", "t", "rt").collect()
        assert rows[0].payload == "r300", rows
        assert rows[0].delta_ms == 0  # 300 µs floors to 0 ms


def test_asof_union_rejects_right_column_named_left_on(spark):
    # right_on != left_on AND right carries an unrelated column with
    # the left key's name: must raise the clear ambiguity error, not
    # AMBIGUOUS_REFERENCE from a duplicate-name select downstream
    left = spark.createDataFrame([(1, 1.0)], "k long, t double")
    right = spark.createDataFrame([(1, 2.0, 9)], "rk long, rt double, k long")
    try:
        merge_asof(left, right, "k", "rk", "t", "rt")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "ambiguous" in str(e)


def test_events_gapfill_dense_spine_and_forward_fill(spark):
    # two types over a 4-hour span: the grid must be dense (4 x 2),
    # empty buckets flagged is_gap with the previous hour's rounded
    # sum carried forward, and a type's leading gap (before its first
    # observation) zero-filled
    from simple_rust_query_engine_spark.streaming.events import (
        q_events_gapfill,
    )

    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:10:00"), 1, "A", 1.5, ""),
            (2, _ts("2024-01-01 03:20:00"), 1, "A", 2.5, ""),
            (3, _ts("2024-01-01 01:30:00"), 1, "B", 3.0, ""),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    rows = q_events_gapfill({"events": events}).collect()
    got = {
        (r.event_type, r.hour_start): (r.n_events, r.is_gap, r.sum_value_ff)
        for r in rows
    }
    # hour buckets are epoch-derived; recover the observed base to stay
    # timezone-agnostic in the assertion
    h0 = min(h for (_, h) in got)
    assert len(got) == 8  # dense: 4 hours x 2 types
    assert got[("A", h0)] == (1, False, 1.5)
    assert got[("A", h0 + 3600)] == (0, True, 1.5)
    assert got[("A", h0 + 7200)] == (0, True, 1.5)
    assert got[("A", h0 + 10800)] == (1, False, 2.5)
    assert got[("B", h0)] == (0, True, 0.0)          # leading gap -> 0
    assert got[("B", h0 + 3600)] == (1, False, 3.0)
    assert got[("B", h0 + 7200)] == (0, True, 3.0)
    assert got[("B", h0 + 10800)] == (0, True, 3.0)
