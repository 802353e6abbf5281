"""Golden scenarios ported from the reference's end-to-end tests
(/root/reference/src/execution/dataframe.rs:159-835) — data-level,
order-insensitive assertions on tiny in-memory fixtures (FIXTURES.md
F1-F6), exercising the facade API (SessionContext/EngineDataFrame).

Semantics decisions follow SURVEY §4.3 (Spark/ANSI, documented
divergences from reference bugs).
"""

import pytest
from pyspark.sql import functions as F

from simple_rust_query_engine_spark import EngineDataFrame
from simple_rust_query_engine_spark import functions as ef


@pytest.fixture(scope="module")
def fx(spark):
    """F1/F2/F3/F4/F5/F6 fixtures from FIXTURES.md."""
    mk = lambda rows, schema: EngineDataFrame(spark.createDataFrame(rows, schema))
    simple = mk(
        [("a", 1, 2), ("b", 2, 3), ("c", 3, 4), ("d", 4, 5), ("e", 5, 6), ("f", 6, 7)],
        "c1 string, c2 long, c3 long",
    )
    simple_agg = mk(
        [("a", 1, 2), ("c", 3, 4), ("a", 2, 3), ("d", 4, 5), ("c", 5, 6), ("f", 6, 7), ("b", 7, 8)],
        "c1 string, c2 long, c3 long",
    )
    distinct = mk(
        [("a", 1, 2), ("c", 3, 4), ("a", 1, 2), ("d", 4, 5), ("c", 3, 4), ("f", 6, 7), ("b", 7, 8)],
        "c1 string, c2 long, c3 long",
    )
    join_left = mk(
        [("a", 1, 10), ("b", 2, 20), ("c", 3, 30), ("d", 4, 40), ("e", 5, 50), ("f", 6, 60)],
        "l1 string, l2 long, l3 long",
    )
    join_right = mk(
        [("a", 100, 1000), ("b", 200, 2000), ("c", 300, 3000)],
        "r1 string, r2 long, r3 long",
    )
    nulls = mk(
        [("hello", 1, None), (None, 2, 11), ("world", None, 22)],
        "c1 string, c2 long, c3 long",
    )
    return dict(
        simple=simple, simple_agg=simple_agg, distinct=distinct,
        join_left=join_left, join_right=join_right, nulls=nulls,
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- F1: scan / project / filter / sort / limit (dataframe.rs:216-320)
def test_select_filter(fx):
    out = fx["simple"].select("c1", "c2").filter(F.col("c2") > 3)
    assert rows(out) == [("d", 4), ("e", 5), ("f", 6)]


def test_sort_desc_limit(fx):
    out = fx["simple"].order_by(ef.sort(F.col("c2"), ascending=False)).limit(fetch=2)
    assert rows(out) == [("e", 5, 6), ("f", 6, 7)]


def test_limit_with_skip(fx):
    # reference test dataframe.rs:664-682 (limit with skip)
    out = fx["simple"].order_by(F.col("c2").asc()).limit(skip=2, fetch=2)
    assert rows(out) == [("c", 3, 4), ("d", 4, 5)]


def test_limit_fetch_none_returns_all(fx):
    # SURVEY §4.3.1: reference bug returns 0 rows; we use ANSI (all)
    assert fx["simple"].limit(skip=2).count() == 4


# --- F2: aggregates (dataframe.rs:684-775)
def test_grouped_aggregate_order_by_sum_desc(fx):
    out = (
        fx["simple_agg"]
        .aggregate([F.col("c1")], [ef.sum(F.col("c2")).alias("sum_c2"), ef.avg(F.col("c3")).alias("avg_c3")])
        .order_by(F.col("sum_c2").desc())
    )
    got = [tuple(r) for r in out.collect()]
    assert got == [
        ("c", 8, 5.0),
        ("b", 7, 8.0),
        ("f", 6, 7.0),
        ("d", 4, 5.0),
        ("a", 3, 2.5),
    ]


def test_global_aggregate_all_five_fns(fx):
    out = fx["simple_agg"].aggregate(
        [],
        [
            ef.count(F.col("c2")).alias("cnt"),
            ef.sum(F.col("c2")).alias("s"),
            ef.avg(F.col("c2")).alias("a"),
            ef.min(F.col("c2")).alias("mn"),
            ef.max(F.col("c2")).alias("mx"),
        ],
    )
    assert rows(out) == [(7, 28, 4.0, 1, 7)]


def test_min_max_all_negative(spark):
    # SURVEY §4.3.2: reference seeds global MAX/MIN accumulators with 0
    # (min_max.rs:166-171) → MAX of all-negative input returns 0. ANSI.
    df = EngineDataFrame(spark.createDataFrame([(-5,), (-3,), (-9,)], "x long"))
    out = df.aggregate([], [ef.max(F.col("x")).alias("mx"), ef.min(F.col("x")).alias("mn")])
    assert rows(out) == [(-3, -9)]


def test_agg_nulls(fx):
    # F6 (lib.rs:42-49): COUNT skips nulls; SUM/AVG skip nulls
    out = fx["nulls"].aggregate(
        [],
        [
            ef.count(F.col("c1")).alias("c"),
            ef.sum(F.col("c2")).alias("s"),
            ef.avg(F.col("c3")).alias("a"),
        ],
    )
    assert rows(out) == [(2, 3, 16.5)]


def test_sum_empty_input_is_null(spark):
    # SURVEY §4.3.3: global SUM/AVG over empty input → NULL (ANSI)
    df = EngineDataFrame(spark.createDataFrame([], "x long"))
    out = df.aggregate([], [ef.sum(F.col("x")).alias("s"), ef.avg(F.col("x")).alias("a")])
    assert rows(out) == [(None, None)]


# --- F3: distinct (dataframe.rs:394-408)
def test_distinct(fx):
    assert fx["distinct"].distinct().count() == 5


# --- F4/F5: joins (dataframe.rs:410-662)
def test_inner_join_on_key_pairs(fx):
    # reference join keys are (left, right) name pairs (dataframe.rs:125-145)
    out = fx["join_left"].join(fx["join_right"], on=[("l1", "r1")], how="inner")
    assert out.count() == 3


def test_inner_join_expr(fx):
    l, r = fx["join_left"], fx["join_right"]
    out = l.join(r, on=[l.df["l1"] == r.df["r1"]], how="inner").select("l1", "r2")
    assert rows(out) == [("a", 100), ("b", 200), ("c", 300)]


def test_left_join_null_extension(fx):
    l, r = fx["join_left"], fx["join_right"]
    out = l.join(r, on=[l.df["l1"] == r.df["r1"]], how="left").select("l1", "r2")
    assert rows(out, ) == sorted(
        [("a", 100), ("b", 200), ("c", 300), ("d", None), ("e", None), ("f", None)],
        key=lambda t: (t[0],),
    )


def test_join_with_nonequi_filter(fx):
    # reference JoinFilter path (dataframe.rs:545-570 style)
    l, r = fx["join_left"], fx["join_right"]
    out = l.join(
        r, on=[l.df["l1"] == r.df["r1"]], how="inner", filter=l.df["l2"] > 1
    ).select("l1", "l2", "r2")
    assert rows(out) == [("b", 2, 200), ("c", 3, 300)]


def test_cross_join_keyless_with_filter(fx):
    # keyless join → nested loop (planner.rs:186-194)
    l, r = fx["join_left"], fx["join_right"]
    out = l.join(r, on=None, how="inner", filter=l.df["l2"] > 5).select("l1", "r1")
    assert out.count() == 3  # 1 left row (f,6) × 3 right rows


def test_duplicate_build_keys_fan_out(spark, fx):
    # F5: duplicate join key on one side → 1-to-many fan-out
    dup = EngineDataFrame(
        spark.createDataFrame([("a", 1, 10), ("a", 1, 10), ("b", 2, 20)], "l1 string, l2 long, l3 long")
    )
    out = dup.join(fx["join_right"], on=[dup.df["l1"] == fx["join_right"].df["r1"]], how="inner")
    assert out.count() == 3  # 2 'a' rows match + 1 'b'


# --- SQL path (dataframe.rs:180-213 flagship)
def test_sql_flagship_shape(spark, fx):
    from simple_rust_query_engine_spark import SessionContext

    ctx = SessionContext(spark)
    ctx.register("left_t", fx["join_left"])
    ctx.register("right_t", fx["join_right"])
    out = ctx.sql(
        """
        SELECT l1, SUM(r2) AS sum_r2, AVG(r3) AS avg_r3
        FROM left_t LEFT JOIN right_t ON l1 = r1
        WHERE l3 < 40
        GROUP BY l1
        ORDER BY sum_r2 DESC
        """
    )
    got = [tuple(r) for r in out.collect()]
    assert got == [("c", 300, 3000.0), ("b", 200, 2000.0), ("a", 100, 1000.0)]


def test_zero_column_projection_keeps_row_count(fx):
    # reference ProjectionExec handles zero-column output via an
    # explicit row count (projection.rs:21-132 RecordBatchOptions);
    # Spark's select() with no columns must preserve it too
    out = fx["join_left"].select()
    assert len(out.df.columns) == 0
    assert out.count() == fx["join_left"].count()


def test_reference_type_map_unsigned_widening():
    # SURVEY §1.2: unsigned widening decision, incl. UInt64→Decimal(20,0)
    from pyspark.sql import types as T

    from simple_rust_query_engine_spark.functions import REFERENCE_TYPE_MAP

    assert REFERENCE_TYPE_MAP["UInt8"] == T.ShortType()
    assert REFERENCE_TYPE_MAP["UInt64"] == T.DecimalType(20, 0)
    assert len(REFERENCE_TYPE_MAP) == 13  # all ScalarValue variants


def test_sql_flagship_verbatim_readme(spark, fx):
    # the reference README's query CHARACTER-FOR-CHARACTER
    # (README.md:133-140), incl. the GenericDialect double-quoted
    # generated-column identifier "SUM(r2)" and tables named
    # left/right — expected output is the README's printed table
    from simple_rust_query_engine_spark import SessionContext

    ctx = SessionContext(spark)
    ctx.register("left", fx["join_left"])
    ctx.register("right", fx["join_right"])
    out = ctx.sql(
        'SELECT l1, SUM(r2), AVG(r3) FROM left LEFT JOIN right '
        'ON l1 = r1 WHERE l3 < 40 GROUP BY l1 ORDER BY "SUM(r2)" DESC'
    )
    got = [tuple(r) for r in out.collect()]
    assert got == [("c", 300, 3000.0), ("b", 200, 2000.0), ("a", 100, 1000.0)]


def test_kleene_and_or(spark):
    # SURVEY §4.3.8: three-valued logic (reference and_kleene/or_kleene)
    df = EngineDataFrame(
        spark.createDataFrame([(True,), (False,), (None,)], "b boolean")
    )
    out = df.select(
        (F.col("b") & F.lit(False)).alias("and_f"),
        (F.col("b") | F.lit(True)).alias("or_t"),
    )
    assert rows(out) == [(False, True), (False, True), (False, True)]


def test_facade_string_key_join_coalesces_key(spark):
    # name-based join keeps ONE key column: select/filter on the key
    # after the join must not be ambiguous
    a = EngineDataFrame(spark.createDataFrame([(1, "x"), (2, "y")], "k long, va string"))
    b = EngineDataFrame(spark.createDataFrame([(1, "p")], "k long, vb string"))
    out = a.join(b, on=["k"], how="inner").select("k", "va", "vb")
    rows = out.collect()
    assert [(r.k, r.va, r.vb) for r in rows] == [(1, "x", "p")]


def test_facade_except_is_set_except_all_keeps_multiplicity(spark):
    a = EngineDataFrame(spark.createDataFrame([(1,), (1,), (2,)], "x long"))
    b = EngineDataFrame(spark.createDataFrame([(1,)], "x long"))
    # SQL EXCEPT: set semantics — every matching value removed, dedup
    assert sorted(r.x for r in a.except_(b).collect()) == [2]
    # EXCEPT ALL: one occurrence removed per match
    assert sorted(r.x for r in a.except_all(b).collect()) == [1, 2]
