"""CSV source facade.

Reference: ``CsvDataSource`` / ``CsvReadOptions``
(``/root/reference/src/io/reader/csv/source.rs:15-89``,
``options.rs:6-119``): header default true, delimiter ``,``, quote
``"``, optional user schema, schema inferred from the first 100
records otherwise (``MAX_INFER_RECORDS`` csv/mod.rs:8).

Spark's CSV datasource subsumes all of it (distributed scan, column
pruning, predicate pushdown on file-level stats).  We keep the
reference's defaults.  ``sampling_ratio`` (wired to Spark's
``samplingRatio``) stands in for the 100-record inference cap — at
100 TB you pass an explicit schema anyway (we expose ``schema=``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CsvReadOptions:
    """Mirror of the reference's builder (options.rs:6-119).

    ``sampling_ratio`` bounds the schema-inference pass (the
    reference caps inference at 100 records; Spark's inference scans
    the WHOLE input unless sampled).  Default 1.0 keeps inference
    exact; pass e.g. 0.001 on large inputs — or better, a schema.
    """

    header: bool = True
    delimiter: str = ","
    quote: str = '"'
    schema: Optional[str] = None  # DDL string or StructType
    sampling_ratio: float = 1.0


def read_csv(
    spark: SparkSession,
    path: str,
    options: Optional[CsvReadOptions] = None,
    **kwargs,
) -> DataFrame:
    if options is not None and kwargs:
        raise ValueError(
            "pass either an options object or keyword options, not both: "
            f"got options={options!r} and kwargs={sorted(kwargs)}"
        )
    opts = options if options is not None else CsvReadOptions(**kwargs)
    reader = (
        spark.read.option("header", str(opts.header).lower())
        .option("sep", opts.delimiter)
        .option("quote", opts.quote)
    )
    if opts.schema is not None:
        reader = reader.schema(opts.schema)
    else:
        reader = reader.option("inferSchema", "true").option(
            "samplingRatio", str(opts.sampling_ratio)
        )
    return reader.csv(path)
