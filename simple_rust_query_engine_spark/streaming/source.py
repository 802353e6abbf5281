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

from pyspark.sql import SparkSession

from ..session import ensure_nano_read, nano_ts_columns, restore_nano_ts


def file_stream(spark: SparkSession, sf_dir: str, table: str):
    ensure_nano_read(spark)
    path = f"{sf_dir}/{table}.parquet"
    batch_df = spark.read.parquet(path)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .format("parquet")
        .option("pathGlobFilter", f"{table}.parquet")
        .load(sf_dir)
    )
    return restore_nano_ts(stream, nano_ts_columns(path))
