#!/usr/bin/env python
"""Dump .explain("formatted") for declared queries into plans/<round>/ (SPARK_GRAFT_PLANS_ROUND, default r14).

Usage: python scripts/capture_plans.py <suffix> [name ...]
  suffix: 'before' or 'after' — file names are plans/<round>/<query>_<suffix>.txt
  names:  queries to capture (default: every queries() entry)

Streaming rows execute foreachBatch machinery at call time; their
result is still a DataFrame whose plan we can capture.  Queries whose
construction itself fails are recorded with the exception text so the
capture run never dies half-way.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as entry_mod  # noqa: E402
from simple_rust_query_engine_spark.session import (  # noqa: E402
    get_spark,
    release_barriers,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
)


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("srqe-plan-capture")
    qs = entry_mod.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        release_barriers(spark)
        try:
            df = fn(spark, SF_DIR)
            # _sc JVM access mirrors DataFrame.explain without printing
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture must never die half-way
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        with open(path, "w") as f:
            f.write(plan)
        print(f"# {name} -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
