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


def test_materialize_durable_and_local_paths_agree(tables):
    from simple_rust_query_engine_spark.pipeline.dedup import materialize

    src = tables["nation"].select("n_nationkey", "n_name")
    local = materialize(src, durable=False)
    durable = materialize(src, durable=True)
    try:
        assert sorted(map(tuple, local.collect())) == sorted(
            map(tuple, durable.collect())
        )
        # durable flavor actually holds a persisted (disk-replayable)
        # copy — the property that survives executor loss
        assert durable.storageLevel.useDisk
        assert not durable.storageLevel.useMemory
    finally:
        durable.unpersist()


def test_epoch_ms_raw_nanos_floors_pre_1970(spark):
    import duckdb

    from simple_rust_query_engine_spark.session import epoch_ms

    # -1 ns is 1969-12-31 23:59:59.999999999 → epoch_ms must be -1
    # (floor), not 0 (truncation toward zero); DuckDB agrees
    nanos = [-1, -999_999, -1_000_000, -1_000_001, 1, 999_999, 1_000_000]
    df = spark.createDataFrame([(n,) for n in nanos], "ts long")
    got = [
        r.ms
        for r in df.select(epoch_ms(df, "ts").alias("ms"), "ts")
        .orderBy("ts")
        .collect()
    ]
    # DuckDB floor-division reference: epoch_ms of a nano instant is
    # floor(n / 1e6) — build it from integer // which floors in Python
    want = [n // 1_000_000 for n in sorted(nanos)]
    duck_check = [
        duckdb.sql(f"SELECT ({n} - ({n} % 1000000 + 1000000) % 1000000) // 1000000").fetchone()[0]
        for n in sorted(nanos)
    ]
    assert got == want == duck_check, (got, want, duck_check)


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
