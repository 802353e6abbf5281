#!/usr/bin/env python
"""sf1 scale soak (VERDICT r10 item 4): run the 22-query headline set
plus the dedup/ANN families against the seeded 10× dataset
(scripts/gen_sf1.py → localdata/sf1) and record per-query sf0.1→sf1
growth ratios against the same-session sf0.1 numbers it re-measures
(NOT the checked-in bench JSON — same host window, same code, so the
ratio isolates DATA growth from host drift).  One cold + one steady
pass per query per scale.  Output: docs/BENCH_SF1.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (the headline list + canary, one definition)
import __spark_entry__ as entry  # noqa: E402
from simple_rust_query_engine_spark.session import (  # noqa: E402
    get_spark,
    release_barriers,
)

DEDUP_ANN = [
    "dedup_minhash_bucketed",
    "dedup_cc",
    "dedup_keep_best",
    "semantic_dedup",
    "doc_novelty",
    "bloom_dedup_precheck",
    "kmv_ndistinct",
    "knn_join",
    "knn_join_twophase",
    "kmeans_train",
    "ann_ivf_trained",
    "ann_ivf_knn_join",
    "ann_ivf_knn_join_probe",
    "knn_recall_ivf",
    "knn_recall_ivf_probe",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "localdata", "sf1",
)


RAW = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "BENCH_SF1_RAW.jsonl",
)


def _done() -> set:
    if not os.path.exists(RAW):
        return set()
    with open(RAW) as f:
        return {
            (r["scale"], r["name"])
            for r in map(json.loads, f)
            if r.get("cold") is not None
        }


def run_scale(spark, qs, names, sf_dir, scale, done):
    for name in names:
        if (scale, name) in done:
            continue  # resumable: already recorded in a prior run
        release_barriers(spark)
        rec = {"scale": scale, "name": name}
        try:
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            rec["cold"] = round(time.time() - t0, 4)
            release_barriers(spark)
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            rec["steady"] = round(time.time() - t0, 4)
            rec["rows"] = n
            print(
                f"# {scale} {name}: cold {rec['cold']:.2f}s "
                f"steady {rec['steady']:.2f}s rows={n}",
                file=sys.stderr,
            )
        except Exception as e:  # report, keep soaking
            rec["cold"] = None
            rec["error"] = str(e)[:200]
            print(f"# {name}: FAILED {str(e)[:200]}", file=sys.stderr)
        rec["canary"] = bench._canary_sec()
        with open(RAW, "a") as f:
            f.write(json.dumps(rec) + "\n")


def main():
    names = bench.BENCH_QUERIES + DEDUP_ANN
    spark = get_spark("sf1-soak")
    qs = entry.queries()
    done = _done()
    run_scale(spark, qs, names, SF01, "sf0.1", done)
    run_scale(spark, qs, names, SF1, "sf1", done)

    # assemble docs/BENCH_SF1.json from the raw records (all runs)
    recs = [json.loads(ln) for ln in open(RAW)]
    by = {}
    for r in recs:
        if r.get("cold") is not None:
            by[(r["scale"], r["name"])] = r
    cold01 = {n: by[("sf0.1", n)]["cold"] for n in names if ("sf0.1", n) in by}
    cold1 = {n: by[("sf1", n)]["cold"] for n in names if ("sf1", n) in by}
    steady01 = {n: by[("sf0.1", n)]["steady"] for n in names if ("sf0.1", n) in by}
    steady1 = {n: by[("sf1", n)]["steady"] for n in names if ("sf1", n) in by}
    ratios = {
        n: round(cold1[n] / cold01[n], 2)
        for n in names
        if cold01.get(n) and cold1.get(n)
    }
    steady_ratios = {
        n: round(steady1[n] / steady01[n], 2)
        for n in names
        if steady01.get(n) and steady1.get(n)
    }
    canaries = [r["canary"] for r in recs if r.get("canary")] or [None]
    out = {
        "metric": "sf1_soak_growth",
        "sf_base": 0.1,
        "sf_target": 1.0,
        "data_growth": 10.0,
        "canary_min": min(canaries),
        "canary_max": max(canaries),
        "cold_sf01": cold01,
        "cold_sf1": cold1,
        "steady_sf01": steady01,
        "steady_sf1": steady1,
        "rows_sf01": {n: by[("sf0.1", n)].get("rows") for n in cold01},
        "rows_sf1": {n: by[("sf1", n)].get("rows") for n in cold1},
        "cold_growth_ratio": ratios,
        "steady_growth_ratio": steady_ratios,
        "errors": {
            f"{r['scale']}:{r['name']}": r["error"]
            for r in recs
            if r.get("error") and (r["scale"], r["name"]) not in by
        },
        **bench._git_provenance(),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "BENCH_SF1.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    worst = sorted(steady_ratios.items(), key=lambda kv: -kv[1])[:8]
    print(json.dumps({"worst_steady_growth": worst, "missing": [n for n in names if n not in ratios]}))


if __name__ == "__main__":
    main()
