"""Shared Structured Streaming file-source construction.

One definition of the readStream pattern every streaming entry uses:
schema borrowed from a batch read (file stream sources cannot infer),
directory + ``pathGlobFilter`` (file stream sources take a directory,
not a file), and restoration of TIMESTAMP(NANOS) columns that arrive
as longs under ``nanosAsLong`` — consulting the same per-table column
registry the batch loader uses, so batch and streaming reads of a
table can never diverge on timestamp handling.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..session import _NANO_TS_COLUMNS


def file_stream(spark: SparkSession, sf_dir: str, table: str):
    batch_df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .format("parquet")
        .option("pathGlobFilter", f"{table}.parquet")
        .load(sf_dir)
    )
    dtypes = dict(stream.dtypes)
    for col in _NANO_TS_COLUMNS.get(table, ()):
        if dtypes.get(col) == "bigint":
            # integer division — `/` would round-trip through double
            # and lose precision above 2^53 (epoch nanos ≈ 1.7e18)
            stream = stream.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return stream
