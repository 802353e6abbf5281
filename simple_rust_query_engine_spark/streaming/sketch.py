"""Streaming sketches: continuous count-min-sketch heavy hitters and
a continuous Bloom dedup pre-filter through the streaming engine.

Beyond reference parity (the reference has no stream processing,
SURVEY §2.9).  A training-data ingest pipeline monitors its token
distribution AS DOCUMENTS ARRIVE — vocabulary drift, contamination
spikes, boilerplate floods all show up as frequency anomalies long
before a nightly batch profile would see them.  The operator shape is
the per-shard/per-day CMS merge (`operators/sketch.py
cms_merge_heavy_hitters`) rotated into time: per micro-batch,
``foreachBatch``

1. folds the BATCH's tokens into a local d×w sketch map-only (the
   SAME ``_cms_fold_batches`` Arrow kernel as the batch rows — one
   definition of the counter arithmetic),
2. collapses it to ≤ d·w cells (the only exchange — cell-sized,
   never tokens), and
3. APPENDS the cells, keyed by ``batch_id``, to a running cell table.

Counter linearity — the property ``cms_merge_heavy_hitters`` proves
batch-wise against the whole-corpus oracle — makes the accumulated
sum of per-batch sketches EQUAL to the whole-corpus sketch after any
prefix of batches, so the final extraction shares the batch rows'
oracle verbatim.  State is ≤ d·w cells PER BATCH of bookkeeping and
d·w integers of live sketch — constant in the corpus size, the
streaming-profile shape at 100 TB.

Failure semantics: ``foreachBatch`` is at-least-once, and a replayed
batch re-appends IDENTICAL (batch_id, pos, cnt) rows — the reader
dedups them with one DISTINCT before summing, so replays cannot
double-count (pinned by the multi-batch test, which replays a batch
by hand).  In production pass ``checkpoint_location`` so restarts
resume from committed offsets, and COMPACT the cell table
periodically (sum cells into one epoch row set — e.g. rewrite as
(batch_id=-epoch, pos, summed cnt) — exactly the CMS merge again) so
a long-lived monitor's read cost stays bounded by d·w instead of
growing with batch count; the live sketch itself is always d·w
integers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import (
    CMS_D,
    CMS_W,
    HH_K,
    HH_PHI_DENOM,
    _cms_extract,
    _cms_fold_batches,
    _cms_tokens,
)


def stream_cms_cells(
    spark: SparkSession,
    sf_dir: str,
    cells_table: str,
    cells_path: str,
    query_name: str = "cms_cells_stream",
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
    checkpoint_location: str | None = None,
    w: int = CMS_W,
    d: int = CMS_D,
):
    """readStream(documents) → foreachBatch(fold → cell collapse →
    batch-keyed append).  Returns the started StreamingQuery; the
    caller runs processAllAvailable() + stop()."""
    from .source import file_stream

    src = file_stream(
        spark,
        sf_dir,
        "documents",
        glob=glob,
        max_files_per_trigger=max_files_per_trigger,
    )

    def fold(batch_df, batch_id):
        cells = (
            _cms_tokens(batch_df)
            .mapInPandas(_cms_fold_batches(d, w), "pos long, cnt long")
            .groupBy("pos")
            .agg(F.sum("cnt").alias("cnt"))
            # drop untouched cells: a small batch leaves most of the
            # d·w counters at zero, and zeros add nothing to the merge
            # — the appended bookkeeping is O(tokens-touched cells),
            # not O(d·w), per batch
            .filter(F.col("cnt") != 0)
            .withColumn("batch_id", F.lit(batch_id))
        )
        cells.write.mode("append").option("path", cells_path).saveAsTable(
            cells_table
        )
        # refresh on the OUTER session: inside foreachBatch the write
        # commits through the micro-batch session clone, and the outer
        # session's cached file listing would otherwise serve a stale
        # (pre-append) cell table to the final read — the same trap
        # stream_minhash_ingest documents
        spark.catalog.refreshTable(cells_table)

    writer = src.writeStream.foreachBatch(fold).queryName(query_name)
    if checkpoint_location is not None:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer.trigger(availableNow=True).start()


def merged_cells_sketch(
    spark: SparkSession, cells_table: str, w: int = CMS_W, d: int = CMS_D
) -> "np.ndarray":
    """THE MERGE, read side: DISTINCT (replay-idempotence — a replayed
    batch appends identical rows) then element-wise cell sum across
    batches.  ≤ d·w·batches rows in, d·w scalars of model state out."""
    rows = (
        spark.table(cells_table)
        .distinct()
        .groupBy("pos")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    cms = np.zeros(d * w, dtype=np.int64)
    for r in rows:
        cms[r.pos] = r.cnt
    return cms


_CMS_RUN = [0]


def q_cms_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the corpus ingested through ``stream_cms_cells``
    (single micro-batch at driver scale — the multi-batch accumulation
    and replay idempotence are pinned by
    ``tests/test_streaming_multibatch.py``), the per-batch sketches
    merged cell-wise, heavy hitters extracted through the SAME passes
    as the batch rows — and hash-checked against the SAME whole-corpus
    oracle, because the accumulated sketch IS the whole-corpus sketch
    (counter linearity)."""
    import os

    from .dedup import _ingest_run_dir

    _CMS_RUN[0] += 1
    run = f"cms_stream_{_CMS_RUN[0]}"
    path = os.path.join(_ingest_run_dir(), run)
    q = stream_cms_cells(spark, sf_dir, run, path, query_name=run)
    try:
        q.processAllAvailable()
        cms = merged_cells_sketch(spark, run)
    finally:
        # stop + drop even when the stream or the merge read raises:
        # otherwise the StreamingQuery keeps running and the per-run
        # table leaks into the session catalog.  The sketch is d·w
        # collected integers — the returned frame no longer references
        # the run table, so dropping it is safe (same catalog hygiene
        # as the ingest-stream entries: repeated driver/bench
        # invocations must not accumulate per-run tables; the external
        # files live under the per-process run dir and are removed at
        # interpreter exit).  stop() can itself raise on a query that
        # died mid-stream — the nested finally keeps the DROP
        # unconditional either way
        try:
            q.stop()
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {run}")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return _cms_extract(
        _cms_tokens(docs), cms, HH_K, CMS_W, CMS_D, HH_PHI_DENOM
    )


def _cms_stream_oracle() -> str:
    # the accumulated streaming sketch equals the whole-corpus sketch
    # cell for cell (counter linearity) — one oracle definition with
    # the batch cms_heavy_hitters row
    from ..operators.sketch import _cms_hh_oracle

    return _cms_hh_oracle()


# ------------------------------------------------- streaming Bloom
# The third streaming sketch (VERDICT r10 item 3): the Bloom dedup
# pre-filter's bit array is an OR of per-element bit sets, and OR is
# as mergeable as the CMS cell sum — so the SAME foreachBatch shape
# streams it: per batch, emit the batch's DISTINCT set-bit positions
# (map-only Arrow kernel, ≤ m rows), append batch-keyed; the
# accumulated filter is one more DISTINCT over positions on read.
# Replay-idempotent by construction (a replayed batch appends
# identical (batch_id, pos) rows and distinct absorbs them — stronger
# than the CMS case, which needs the dedup before a SUM).  Live state
# is m bits regardless of stream length; after ANY batch prefix the
# accumulated filter IS the batch-built filter over exactly the rows
# ingested so far, so the one-sided no-false-negative guarantee holds
# continuously — the ingest-time shape at 100 TB.


def stream_bloom_bits(
    spark: SparkSession,
    sf_dir: str,
    bits_table: str,
    bits_path: str,
    query_name: str = "bloom_bits_stream",
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
    checkpoint_location: str | None = None,
    m: int | None = None,
    d: int | None = None,
):
    """readStream(documents) → foreachBatch(existing-side split →
    set-bit emission → batch-keyed append).  Returns the started
    StreamingQuery; the caller runs processAllAvailable() + stop().
    Geometry defaults to the batch row's fixed (BLOOM_M, CMS_D) with
    the affine oracle-parity hash family, so the accumulated bits are
    bit-identical to ``bloom_dedup_precheck``'s."""
    from ..operators.sketch import (
        BLOOM_M,
        _bloom_set_bits_df,
        _bloom_split,
        _cms_bucket_py,
        _kmv_hash,
    )
    from .source import file_stream

    m = BLOOM_M if m is None else m
    d = CMS_D if d is None else d
    src = file_stream(
        spark,
        sf_dir,
        "documents",
        glob=glob,
        max_files_per_trigger=max_files_per_trigger,
    )

    def fold(batch_df, batch_id):
        existing, _ = _bloom_split(batch_df)
        bits = _bloom_set_bits_df(
            existing.select(_kmv_hash(F.col("text")).alias("h")),
            _cms_bucket_py,
            m,
            d,
        ).withColumn("batch_id", F.lit(batch_id))
        bits.write.mode("append").option("path", bits_path).saveAsTable(
            bits_table
        )
        # refresh on the OUTER session (see stream_cms_cells): the
        # write commits through the micro-batch session clone and the
        # outer session's file listing would otherwise be stale
        spark.catalog.refreshTable(bits_table)

    writer = src.writeStream.foreachBatch(fold).queryName(query_name)
    if checkpoint_location is not None:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer.trigger(availableNow=True).start()


def accumulated_bloom_bitset(
    spark: SparkSession, bits_table: str, m: int | None = None
) -> "np.ndarray":
    """THE MERGE, read side: DISTINCT over positions IS the bitwise
    OR across batches (and absorbs at-least-once replays).  ≤
    m·batches rows in, m booleans of filter state out."""
    from ..operators.sketch import BLOOM_M

    m = BLOOM_M if m is None else m
    rows = spark.table(bits_table).select("pos").distinct().collect()
    bitset = np.zeros(m, dtype=bool)
    bitset[[r.pos for r in rows]] = True
    return bitset


_BLOOM_RUN = [0]


def q_bloom_precheck_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the existing corpus ingested through
    ``stream_bloom_bits`` (single micro-batch at driver scale — the
    multi-batch accumulation, replay idempotence and checkpointed
    restart are pinned by ``tests/test_streaming_multibatch.py``),
    the accumulated bit positions OR-merged into the filter, and the
    arriving batch probed + exactly verified through the SAME
    ``_bloom_probe_verify`` tail as the batch row — hash-checked
    against the SAME oracle, because the accumulated filter IS the
    batch-built filter (OR linearity)."""
    import os

    from ..operators.sketch import (
        BLOOM_M,
        _bloom_probe_verify,
        _bloom_split,
        _cms_bucket_py,
    )
    from .dedup import _ingest_run_dir

    _BLOOM_RUN[0] += 1
    run = f"bloom_stream_{_BLOOM_RUN[0]}"
    path = os.path.join(_ingest_run_dir(), run)
    q = stream_bloom_bits(spark, sf_dir, run, path, query_name=run)
    try:
        q.processAllAvailable()
        bitset = accumulated_bloom_bitset(spark, run)
    finally:
        # stop + drop even on failure (catalog hygiene: repeated
        # driver/bench invocations must not accumulate per-run
        # tables; the filter is now m collected booleans and the
        # returned frame no longer references the run table).  stop()
        # can itself raise on a dead query — nested finally keeps the
        # DROP unconditional
        try:
            q.stop()
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {run}")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    existing, batch = _bloom_split(docs)
    return _bloom_probe_verify(
        existing, batch, bitset, _cms_bucket_py, BLOOM_M, CMS_D
    )


def _bloom_stream_oracle() -> str:
    # the accumulated streaming filter equals the batch-built filter
    # bit for bit (OR linearity) — one oracle definition with the
    # batch bloom_dedup_precheck row
    from ..operators.sketch import _bloom_oracle

    return _bloom_oracle()


ORACLE: dict[str, str] = {
    "cms_stream_heavy_hitters": _cms_stream_oracle(),
    "bloom_precheck_stream": _bloom_stream_oracle(),
}

QUERIES: dict = {}

QUERIES_SPARK = {
    "cms_stream_heavy_hitters": q_cms_stream_heavy_hitters,
    "bloom_precheck_stream": q_bloom_precheck_stream,
}
