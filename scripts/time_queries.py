#!/usr/bin/env python
"""Isolated per-query timing, bench-methodology (cold + min of 2 warm,
release_barriers between passes, .count() action) — for optimization
A/Bs on a handful of queries without paying for the full bench.

Usage: python scripts/time_queries.py <name> [name ...]
Emits one line per query: name cold steady rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as entry_mod  # noqa: E402
from simple_rust_query_engine_spark.session import (  # noqa: E402
    get_spark,
    release_barriers,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("srqe-time-queries")
    qs = entry_mod.queries()
    # same warmup as bench.py: parquet footers + Python worker fork
    for warm in ("distinct", "simhash"):
        try:
            qs[warm](spark, SF_DIR).count()
        except Exception as exc:
            print(f"# warmup {warm} failed: {exc}", file=sys.stderr)
    for name in names:
        fn = qs[name]
        release_barriers(spark)
        spark.sparkContext.setJobDescription(f"time:{name}:cold")
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        cold = time.perf_counter() - t0
        warm_times = []
        for i in range(2):
            release_barriers(spark)
            spark.sparkContext.setJobDescription(f"time:{name}:warm{i}")
            t0 = time.perf_counter()
            n = fn(spark, SF_DIR).count()
            warm_times.append(time.perf_counter() - t0)
        print(
            f"{name} cold={cold:.3f} steady={min(warm_times):.3f} rows={n}",
            flush=True,
        )


if __name__ == "__main__":
    main()
