"""Sinks (beyond reference parity — it has none, io/writer/mod.rs:1).

At 100 TB, output partitioning is the contract: ``partition_by`` for
downstream pruning, sensible file counts via AQE coalescing instead of
``coalesce(1)`` driver funnels.
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..session import unwrap_df


def write_parquet(
    df,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
) -> None:
    inner = unwrap_df(df)
    writer = inner.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_sorted(
    df,
    path: str,
    sort_cols: Sequence[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Zone-map layout: range-cluster rows across ``num_files`` output
    files by ``sort_cols`` and sort within each file.

    Parquet keeps min/max statistics per row group; a selective filter
    on the sort column then prunes row groups (and with
    ``repartitionByRange``, near-disjoint FILE ranges) at scan time —
    the cheap storage-side half of predicate pushdown.  At 100 TB this
    is the difference between touching one file and touching all of
    them for a time-range query; the write pays one range shuffle.
    The clustering property (near-disjoint per-file min/max spans) is
    pinned by test from the parquet footers themselves."""
    inner = unwrap_df(df)
    clustered = inner.repartitionByRange(num_files, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    clustered.write.mode(mode).parquet(path)


def write_zordered(
    df,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) layout over TWO numeric columns: the 2-D
    generalization of ``write_sorted``'s 1-D zone maps.

    1-D range clustering makes min/max pruning perfect on the sort
    column and useless on every other; interleaving the bits of two
    min-max-quantized keys places rows so each output file covers a
    small RECTANGLE of the (col1, col2) space — a selective filter on
    EITHER column (or a 2-D box) prunes files via the same parquet
    footer statistics.  This is the standard lakehouse OPTIMIZE
    ZORDER technique, built from public primitives: quantize each key
    to ``bits`` bits by min-max scaling, interleave bits into a
    Morton code, ``repartitionByRange`` + sort within files on it.

    Cost/scale: one range shuffle at write time (identical to
    ``write_sorted``); the min/max pre-pass is a broadcast 1-row
    aggregate.  Quantization only positions rows — queries still
    filter on the raw columns, so skew or outliers cost pruning
    efficiency, never correctness."""
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError("write_zordered interleaves exactly 2 columns")
    inner = unwrap_df(df)
    c1, c2 = cols
    stats = inner.agg(
        F.min(c1).alias("mn1"),
        F.max(c1).alias("mx1"),
        F.min(c2).alias("mn2"),
        F.max(c2).alias("mx2"),
    ).collect()[0]
    top = (1 << bits) - 1

    def quant(col, mn, mx):
        span = max(int(mx) - int(mn), 1)
        # normalize in DOUBLE before scaling: (col - mn) * top wraps
        # int64 when the key range exceeds ~2^51 (nano-epoch longs),
        # silently garbling the Morton code.  Double rounding only
        # nudges bucket boundaries, which clustering tolerates.
        frac = (F.col(col).cast("double") - F.lit(float(int(mn)))) / F.lit(
            float(span)
        )
        return F.least(
            F.lit(top),
            F.greatest(F.lit(0).cast("long"), (frac * F.lit(top)).cast("long")),
        )

    q1 = quant(c1, stats.mn1, stats.mx1)
    q2 = quant(c2, stats.mn2, stats.mx2)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(q1, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(q2, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    tagged = inner.withColumn("_z", z)
    (
        tagged.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def write_csv(df, path: str, mode: str = "overwrite", header: bool = True) -> None:
    inner = unwrap_df(df)
    inner.write.mode(mode).option("header", str(header).lower()).csv(path)


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet dataset into ~``target_file_bytes`` files;
    returns the output file count.

    Small-file proliferation is the classic failure mode of
    incremental ingest at scale: thousands of KB-sized files per
    batch turn every downstream scan into open/footer overhead and
    blow up driver split planning.  The fix is a periodic rewrite
    sized by BYTES, not by partition count: total input size /
    target file size.  Sizes come from the Hadoop FileSystem API, so
    any scheme (file:, hdfs:, s3a:) and percent-encoded paths work —
    ``inputFiles()`` returns encoded URIs that ``os.path.getsize``
    would misread.  The rewrite is one round-robin repartition — at
    100 TB run it per partition-directory so each rewrite is
    bounded."""
    import math

    df = spark.read.parquet(path)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def _size(uri: str) -> int:
        p = jvm.org.apache.hadoop.fs.Path(uri)
        return p.getFileSystem(hconf).getFileStatus(p).getLen()

    total = sum(_size(f) for f in df.inputFiles())
    n = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n).write.mode("overwrite").parquet(out_path)
    return len(spark.read.parquet(out_path).inputFiles())


def write_bucketed(
    df,
    table: str,
    path: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table: rows hash-partitioned into
    ``num_buckets`` files by ``bucket_by`` at WRITE time, registered in
    the session catalog (bucketing metadata lives in the catalog, so
    ``saveAsTable`` rather than a bare path write).

    This is the 100 TB co-location contract: a join or aggregation on
    the bucket key between two tables bucketed the same way needs NO
    shuffle at read time — the scan's output partitioning already
    satisfies the join's distribution requirement
    (`tests/test_plans.py::test_bucketed_join_is_shuffle_free` pins
    the Exchange-free plan).  Pay the shuffle once when the table is
    laid down; every downstream consumer skips it.  ``sort_by`` also
    pre-sorts within buckets, letting sort-merge joins skip the sort.
    """
    inner = unwrap_df(df)
    writer = (
        inner.write.mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
    # invalidate any cached file listing from earlier reads of this
    # table: after an append, a consumer holding the cached relation
    # would silently read the PRE-append snapshot (caught by the
    # streaming ingest multi-batch test)
    inner.sparkSession.catalog.refreshTable(table)
