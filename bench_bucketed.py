#!/usr/bin/env python
"""Bucketed-table join bench: measures the repeated-join win of
`sources.write.write_bucketed` (the storage half of the
incremental-ingest story) against re-shuffling plain parquet.

Shape: lineitem ⋈ orders on orderkey + grouped agg — the suite's
fact↔fact edge.  Broadcast is disabled to emulate the 100 TB regime
where NEITHER side fits an executor (at sf0.1 orders would broadcast
and hide the shuffle being measured).  The bucketed layout pays one
write-time shuffle; every subsequent join reads pre-co-located buckets
and plans NO Exchange (pinned by
tests/test_plans.py::test_bucketed_join_is_shuffle_free).

Run: python bench_bucketed.py   (prints one JSON line; bench-only,
not part of the driver's bench.py contract)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_REPEAT = 5
N_BUCKETS = 16


def _join_agg(li, o):
    from pyspark.sql import functions as F

    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _time_runs(mk_df) -> list[float]:
    out = []
    for _ in range(N_REPEAT):
        t0 = time.perf_counter()
        mk_df().count()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def main() -> None:
    from simple_rust_query_engine_spark.session import get_spark
    from simple_rust_query_engine_spark.sources.write import write_bucketed

    spark = get_spark("srqe-bench-bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    # warmup (parquet footers, codegen)
    _join_agg(li, o).count()

    plain = _time_runs(lambda: _join_agg(li, o))

    tmp = tempfile.mkdtemp(prefix="bucketed_bench_")
    try:
        t0 = time.perf_counter()
        write_bucketed(li, "bb_lineitem", f"{tmp}/li", ["l_orderkey"], N_BUCKETS)
        write_bucketed(o, "bb_orders", f"{tmp}/o", ["o_orderkey"], N_BUCKETS)
        write_cost = round(time.perf_counter() - t0, 4)

        bli, bo = spark.table("bb_lineitem"), spark.table("bb_orders")
        # shuffle-freedom of the bucketed join itself is plan-pinned in
        # tests/test_plans.py; here we only measure
        bucketed = _time_runs(lambda: _join_agg(bli, bo))
    finally:
        spark.sql("DROP TABLE IF EXISTS bb_lineitem")
        spark.sql("DROP TABLE IF EXISTS bb_orders")
        shutil.rmtree(tmp, ignore_errors=True)

    mean = lambda xs: round(sum(xs) / len(xs), 4)
    print(
        json.dumps(
            {
                "metric": "bucketed_join_speedup",
                "sf_dir": SF_DIR,
                "n_repeat": N_REPEAT,
                "plain_runs": plain,
                "bucketed_runs": bucketed,
                "plain_mean": mean(plain),
                "bucketed_mean": mean(bucketed),
                "speedup": round(mean(plain) / mean(bucketed), 3),
                "bucket_write_cost_sec": write_cost,
                "breakeven_joins": round(
                    write_cost / max(mean(plain) - mean(bucketed), 1e-9), 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
