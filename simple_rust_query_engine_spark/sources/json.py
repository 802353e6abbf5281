"""JSON / NDJSON source + sink (beyond reference parity — the
reference reads CSV only, ``/root/reference/src/io/mod.rs:57-59``).

A training-data pipeline's most common interchange format is
newline-delimited JSON (one document object per line).  Spark's JSON
datasource scans it distributed, prunes columns, and infers schema;
as with CSV, at 100 TB you pass an explicit schema (inference reads
the data once more) — ``schema=`` is first-class here for that
reason.

``multiline=True`` handles whole-file JSON arrays (small config-ish
inputs); NDJSON is the scalable default — each line is an independent
record, so splits parallelize per-line.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..session import unwrap_df


def read_json(
    spark: SparkSession,
    path: str,
    schema: Optional[str] = None,
    multiline: bool = False,
    **options,
) -> DataFrame:
    reader = spark.read
    if multiline:
        reader = reader.option("multiLine", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df, path: str, mode: str = "overwrite") -> None:
    """NDJSON sink — one JSON object per line, splittable on read."""
    inner = unwrap_df(df)
    inner.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — columnar like parquet (predicate pushdown, column
    pruning via the same FileSourceScan machinery); included so a user
    with ORC-resident data needs no conversion step."""
    return spark.read.orc(path)


def write_orc(df, path: str, mode: str = "overwrite") -> None:
    inner = unwrap_df(df)
    inner.write.mode(mode).orc(path)
