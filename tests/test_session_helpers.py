"""Session-layer helpers: timestamp canonicalization/epoch math across
every arrival type, and the materialization durability switch."""

from pyspark.sql import functions as F

from simple_rust_query_engine_spark.session import (
    as_event_time,
    epoch_ms,
    restore_nano_ts,
)


def _one_ts_df(spark, sql_type, expr):
    return spark.createDataFrame([(1,)], "id int").select(
        "id", F.expr(expr).cast(sql_type).alias("ts")
    )


KNOWN_MS = 1704067798778  # 2024-01-01 00:09:58.778 UTC (sub-ms dropped)


def test_epoch_ms_agrees_across_timestamp_types(spark):
    # the same instant arriving as NTZ, LTZ, and raw nanos must yield
    # the identical epoch-millis — this is the invariant that makes
    # every query session-independent
    ntz = _one_ts_df(
        spark, "timestamp_ntz", "TIMESTAMP_NTZ '2024-01-01 00:09:58.778549'"
    )
    ltz = spark.createDataFrame([(1,)], "id int").select(
        "id", F.timestamp_micros(F.lit(KNOWN_MS * 1000 + 549)).alias("ts")
    )
    nanos = spark.createDataFrame(
        [(1, KNOWN_MS * 1_000_000 + 549_000)], "id int, ts long"
    )
    for df in (ntz, ltz, nanos):
        assert df.select(epoch_ms(df, "ts").alias("ms")).first().ms == KNOWN_MS


def test_restore_nano_ts_canonicalizes_to_ntz(spark):
    from pyspark.sql import types as T

    nanos = spark.createDataFrame(
        [(1, KNOWN_MS * 1_000_000 + 549_000)], "id int, ts long"
    )
    out = restore_nano_ts(nanos, ("ts",))
    assert isinstance(out.schema["ts"].dataType, T.TimestampNTZType)
    assert str(out.first().ts) == "2024-01-01 00:09:58.778549"

    ltz = spark.createDataFrame([(1,)], "id int").select(
        "id", F.timestamp_micros(F.lit(KNOWN_MS * 1000 + 549)).alias("ts")
    )
    out2 = restore_nano_ts(ltz, ("ts",))
    assert isinstance(out2.schema["ts"].dataType, T.TimestampNTZType)
    assert str(out2.first().ts) == "2024-01-01 00:09:58.778549"


def test_as_event_time_preserves_instant(spark):
    from pyspark.sql import types as T

    ntz = _one_ts_df(
        spark, "timestamp_ntz", "TIMESTAMP_NTZ '2024-01-01 00:09:58.778549'"
    )
    out = as_event_time(ntz, "ts")
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    # round-trip through epoch confirms naive==UTC pinning
    assert out.select(F.unix_millis("ts").alias("ms")).first().ms == KNOWN_MS


def test_materialize_durable_and_local_paths_agree(tables, spark):
    from simple_rust_query_engine_spark.pipeline.dedup import materialize

    src = tables["nation"].select("n_nationkey", "n_name")
    local = materialize(src, durable=False)
    durable = materialize(src, durable=True)
    assert sorted(map(tuple, local.collect())) == sorted(
        map(tuple, durable.collect())
    )
    # durable flavor is a RELIABLE checkpoint: files in the checkpoint
    # dir (replayable after executor loss) and lineage truncated —
    # persist(DISK_ONLY) would keep full lineage and make iterative
    # callers' plans nest per round (see the star-CC regression)
    import glob
    import os
    from urllib.parse import urlparse

    ckdir = spark.sparkContext.getCheckpointDir()
    assert ckdir is not None
    local = urlparse(ckdir).path
    # the checkpoint actually reached stable storage: rdd-* dirs with
    # part files exist (a localCheckpoint regression would leave the
    # dir empty and still pass the plan-shape asserts below)
    parts = glob.glob(os.path.join(local, "rdd-*", "part-*"))
    assert parts, f"no checkpoint part files under {local}"
    plan = durable._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, plan
    assert "Scan parquet" not in plan, plan


def test_epoch_ms_raw_nanos_matches_duckdb_pre_1970(spark):
    import duckdb

    from simple_rust_query_engine_spark.session import epoch_ms

    # DuckDB pipeline: TIMESTAMP_NS→TIMESTAMP FLOORS to µs, then
    # epoch_ms TRUNCATES toward zero — -1 ns therefore lands on 0 ms,
    # and -1_000_001 ns on -1 ms (NOT the pure-floor -2)
    nanos = [-1, -999_999, -1_000_000, -1_000_001, 1, 999_999, 1_000_000]
    df = spark.createDataFrame([(n,) for n in nanos], "ts long")
    got = [
        r.ms
        for r in df.select(epoch_ms(df, "ts").alias("ms"), "ts")
        .orderBy("ts")
        .collect()
    ]
    # ground truth from DuckDB's ACTUAL epoch_ms over the same instant
    want = [
        duckdb.sql(
            f"SELECT epoch_ms(TIMESTAMP '1970-01-01' "
            f"+ INTERVAL ({n // 1000}) MICROSECOND)"
        ).fetchone()[0]
        for n in sorted(nanos)
    ]
    assert got == want, (got, want)


def test_epoch_ms_branches_agree_on_pre_1970_submillisecond(spark):
    # the same sub-ms pre-1970 instant through NTZ, LTZ, and raw-nano
    # physical types must give ONE answer (DuckDB's: truncate toward
    # zero), or parity becomes scan-flavor-dependent
    import datetime as dt

    from simple_rust_query_engine_spark.session import epoch_ms

    inst = dt.datetime(1969, 12, 31, 23, 59, 59, 999500)
    ntz = spark.createDataFrame([(inst,)], "ts timestamp_ntz")
    ltz = spark.createDataFrame([(inst,)], "ts timestamp")
    raw = spark.createDataFrame([(-500_000,)], "ts long")  # -0.5 ms in ns
    vals = {
        kind: df.select(epoch_ms(df, "ts").alias("ms")).collect()[0].ms
        for kind, df in (("ntz", ntz), ("ltz", ltz), ("raw", raw))
    }
    assert vals == {"ntz": 0, "ltz": 0, "raw": 0}, vals


def test_epoch_ms_handles_date_columns(spark):
    # DATE columns (e.g. o_orderdate) must yield midnight epoch-ms,
    # negative pre-1970 — merge_asof_nearest relies on this when both
    # time columns are dates
    import datetime as dt

    from simple_rust_query_engine_spark.session import epoch_ms

    df = spark.createDataFrame(
        [(dt.date(1970, 1, 2),), (dt.date(1969, 12, 31),)], "d date"
    )
    got = sorted(r[0] for r in df.select(epoch_ms(df, "d")).collect())
    assert got == [-86_400_000, 86_400_000]


def test_profile_approx_within_tolerance(tables):
    # the HLL profile must agree with the exact profile on everything
    # that isn't an estimate, and its ndistinct estimates must land
    # within a generous HLL error band (rsd=0.02 → 3σ ≈ 6%, widened
    # to 10% so the pin never flakes on a particular column)
    from simple_rust_query_engine_spark.operators.profile import (
        profile_table,
        profile_table_approx,
    )

    exact = {r.col_name: r for r in profile_table(tables["orders"]).collect()}
    approx = {
        r.col_name: r for r in profile_table_approx(tables["orders"]).collect()
    }
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_nulls, a.min_val, a.max_val, a.min_str, a.max_str) == (
            e.n_nulls, e.min_val, e.max_val, e.min_str, e.max_str
        ), c
        assert abs(a.n_distinct - e.n_distinct) <= max(1, 0.10 * e.n_distinct), (
            c, a.n_distinct, e.n_distinct
        )
