#!/usr/bin/env python
"""sf1 growth soak for the late round-11 operators (curation trio +
PQ family): same protocol as soak_sf1.py — re-measure sf0.1 in the
SAME session so the ratio isolates data growth from host drift, one
cold + one steady pass per query per scale.  Output:
docs/SOAK_SF1_R11LATE.json (+ raw lines in BENCH_SF1_RAW_R11LATE.jsonl).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from simple_rust_query_engine_spark.session import get_spark  # noqa: E402

import scripts.soak_sf1 as soak  # noqa: E402

LATE_OPS = [
    "pii_redact",
    "split_by_cluster",
    "tfidf_topterms",
    "pq_encode",
    "ann_pq",
    "ann_pq_rerank",
    "ann_ivf_pq",
    "knn_recall_pq",
]

RAW = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "BENCH_SF1_RAW_R11LATE.jsonl",
)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "SOAK_SF1_R11LATE.json",
)


def main():
    soak.RAW = RAW  # redirect the raw sink; run_scale reads the global
    spark = get_spark("sf1-soak-late")
    qs = entry.queries()
    done = soak._done()
    soak.run_scale(spark, qs, LATE_OPS, soak.SF01, "sf0.1", done)
    soak.run_scale(spark, qs, LATE_OPS, soak.SF1, "sf1", done)

    recs = [json.loads(ln) for ln in open(RAW)]
    by = {
        (r["scale"], r["name"]): r for r in recs if r.get("cold") is not None
    }
    out = {"metric": "sf1_soak_growth_r11late", "sf_base": 0.1,
           "sf_target": 1.0, "queries": {}}
    for n in LATE_OPS:
        a, b = by.get(("sf0.1", n)), by.get(("sf1", n))
        if a and b:
            out["queries"][n] = {
                "cold_sf01": a["cold"], "cold_sf1": b["cold"],
                "cold_ratio": round(b["cold"] / a["cold"], 2),
                "steady_sf01": a["steady"], "steady_sf1": b["steady"],
                "steady_ratio": round(b["steady"] / a["steady"], 2),
                "rows_sf01": a["rows"], "rows_sf1": b["rows"],
            }
    # the full canary envelope, like soak_sf1.py — a spike flags the
    # specific measurement it contaminated (raw lines carry per-record
    # canaries; re-run any record whose canary sits outside the band)
    cans = [r["canary"] for r in recs if r.get("canary")]
    out["canary_min"] = min(cans) if cans else None
    out["canary_max"] = max(cans) if cans else None
    import subprocess

    out["git_sha"] = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        cwd=os.path.dirname(RAW),
    ).stdout.strip()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["queries"], indent=1))


if __name__ == "__main__":
    main()
