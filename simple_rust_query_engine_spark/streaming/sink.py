"""Durable streaming sinks (beyond reference parity — the reference
has no sinks at all, ``/root/reference/src/io/writer/mod.rs:1``, and
no stream processing, SURVEY §2.9).

The memory sinks used by the oracle-checked entries are test
plumbing; a real ingest pipeline lands micro-batches in files with
exactly-once bookkeeping.  Structured Streaming gives that for free
when (a) the sink is a file sink or idempotent ``foreachBatch``, and
(b) ``checkpointLocation`` persists source offsets + sink commit log:
a crashed job resumes from the checkpoint and re-emits no batch.

Scale: each micro-batch writes its partitions in parallel;
``partition_by`` keys the layout for downstream pruning.  Pair with
``sources.write.compact_parquet`` for small-file hygiene — streaming
file sinks are the classic small-file generator.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


def drain_memory_sink(spark, name: str) -> DataFrame:
    """Read a drained memory-sink table ONCE and drop its temp view,
    so repeated driver/bench invocations don't accumulate one
    full-result in-memory table per call for the session lifetime
    (the same per-run catalog hygiene the parquet-backed streaming
    entries apply by dropping their uuid-named tables).

    The returned frame is localCheckpoint-backed — lineage off the
    dropped view is truncated, blocks live until the caller's next
    ``release_barriers`` sweep, and the result must be consumed
    before that sweep (the standing contract for every
    checkpoint-backed frame in this repo)."""
    out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    return out


def stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Optional[Sequence[str]] = None,
    query_name: str = "stream_to_parquet",
    available_now: bool = True,
):
    """Append-mode parquet file sink with exactly-once checkpointing.

    Returns the started StreamingQuery; caller awaits/stops it.
    ``available_now=True`` drains existing input then finishes — the
    batch-backfill mode; ``False`` keeps it running on new files.
    """
    writer = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_foreach_batch(
    df: DataFrame,
    batch_fn,
    checkpoint: str,
    query_name: str = "stream_foreach_batch",
    available_now: bool = True,
):
    """``foreachBatch`` escape hatch: run arbitrary BATCH logic per
    micro-batch (merge/upsert, multi-table writes, JDBC).  The
    checkpoint's commit log makes redelivery at-least-once; pair with
    an idempotent ``batch_fn`` (e.g. overwrite-by-batch_id partition)
    for exactly-once end to end."""
    writer = (
        df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
