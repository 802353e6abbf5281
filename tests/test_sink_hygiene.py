"""Memory-sink catalog hygiene (VERDICT r8 item 2 / ADVICE r8 #1).

Every driver entry that lands results through a memory sink must
drain it via ``streaming/sink.drain_memory_sink`` — read once,
localCheckpoint, drop the temp view — so repeated driver/bench
invocations don't accumulate one full-result in-memory table per
call for the session lifetime.  r8 migrated the in-window entries;
r9 migrated the last two (``dedup_exact_stream``,
``minhash_sig_stream``).  This test pins the invariant for ALL of
them: running a memory-sink entry twice leaves the temp-view catalog
exactly where it started, and both returned frames are readable.
"""

import pytest

from simple_rust_query_engine_spark.streaming.dedup import (
    q_dedup_exact_stream,
    q_minhash_sig_stream,
)

SF = "/root/testdata/sf0.001"


def _temp_views(spark) -> set:
    return {t.name for t in spark.catalog.listTables() if t.isTemporary}


@pytest.mark.parametrize(
    "entry", [q_dedup_exact_stream, q_minhash_sig_stream]
)
def test_memory_sink_entries_drop_their_views(spark, entry):
    before = _temp_views(spark)
    n1 = entry(spark, SF).count()
    n2 = entry(spark, SF).count()
    assert n1 == n2 and n1 > 0
    # no per-invocation sink table may survive the call
    assert _temp_views(spark) == before


def test_all_streaming_driver_entries_are_drained_in_source():
    """Static sweep: no streaming driver entry may return the live
    sink view.  A ``return spark.table(`` in a ``q_*`` entry of a
    streaming module is the leak signature — the drained read goes
    through ``drain_memory_sink`` (memory sinks) or a path-backed
    ``spark.read.parquet`` (foreachBatch entries)."""
    import inspect

    from simple_rust_query_engine_spark.streaming import (
        dedup as sdedup,
        events as sevents,
        join as sjoin,
    )

    for mod in (sdedup, sevents, sjoin):
        for name, fn in mod.QUERIES_SPARK.items():
            src = inspect.getsource(fn)
            assert "return spark.table(" not in src, (
                f"{mod.__name__}.{name} returns a live sink view; "
                "route it through sink.drain_memory_sink"
            )
