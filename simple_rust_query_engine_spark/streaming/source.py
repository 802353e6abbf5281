"""Shared Structured Streaming file-source construction.

One definition of the readStream pattern every streaming entry uses:
schema borrowed from a batch read (file stream sources cannot infer),
directory + ``pathGlobFilter`` (file stream sources take a directory,
not a file), and restoration of TIMESTAMP(NANOS) columns that arrive
as longs under ``nanosAsLong`` — using the same footer-probed column
set and restore helper the batch loader uses, so batch and streaming
reads of a table can never diverge on timestamp handling.  Works on
ANY SparkSession (the nano-read conf is set here, not assumed).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import SparkSession

from ..session import ensure_nano_read, nano_ts_columns, restore_nano_ts


def file_stream(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    *,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Parquet file stream over ``sf_dir`` for ``table``.

    ``glob`` overrides the file pattern (default ``{table}.parquet``)
    — used by the multi-batch state tests, which split a table into
    several chronological files.  ``max_files_per_trigger`` is the
    file source's rate limit: with it set, ``availableNow`` drains the
    backlog in MULTIPLE micro-batches instead of one, which is what
    exercises watermark advancement and state eviction ACROSS
    triggers (and, in production, what bounds per-batch input on a
    backfill).
    """
    ensure_nano_read(spark)
    pattern = glob or f"{table}.parquet"
    # probe with the ACTUAL pattern: probing the default file when a
    # custom glob matches nothing would silently start an empty stream
    matches = sorted(_glob.glob(f"{sf_dir}/{pattern}"))
    if not matches:
        raise FileNotFoundError(f"no files match {sf_dir}/{pattern}")
    probe = matches[0]
    batch_df = spark.read.parquet(probe)
    reader = (
        spark.readStream.schema(batch_df.schema)
        .format("parquet")
        .option("pathGlobFilter", pattern)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(sf_dir)
    return restore_nano_ts(stream, nano_ts_columns(probe))
