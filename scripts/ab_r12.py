#!/usr/bin/env python
"""Round-12 sf1 A/Bs, one JSON line per measurement to stdout:

1. PQ codebook training — full-corpus vs the r12 deterministic
   id-modulo sample (VERDICT r11 item 5 acceptance: training scans
   drop ~S×).  Session state is evicted between arms so each arm
   pays real Lloyd's work.
2. Connected-components driver-loop jobs — the r12 observed-metrics
   fold vs the old two-jobs-per-round shape (VERDICT r11 item 7
   acceptance: same labels, measured job-count reduction).  The old
   arm is reproduced by monkeypatching ``_materialize_observed`` with
   the pre-r12 materialize-then-collect sequence through the
   UNCHANGED production loop.
3. ``route_text_dedup`` at sf1 — the auto-router must pick the LSH
   path at the closed-vocabulary density where PPJoin measured
   quadratic (docs/SOAK_SF1_R11LATE.json).

Run AFTER scripts/gen_sf1.py has populated localdata/sf1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "localdata", "sf1",
)


def main() -> None:
    from pyspark.sql import functions as F

    from simple_rust_query_engine_spark.session import get_spark, release_barriers
    from simple_rust_query_engine_spark.pipeline import dedup_core
    from simple_rust_query_engine_spark.pipeline import dedup_state as DS
    from simple_rust_query_engine_spark.pipeline import similarity as S

    spark = get_spark("ab-r12")
    sc = spark.sparkContext

    emb = spark.read.parquet(os.path.join(SF1, "embeddings.parquet"))
    docs = spark.read.parquet(os.path.join(SF1, "documents.parquet"))

    # ---- 1. PQ training: full vs sampled -------------------------
    def train(mod):
        # drop every cached trainer product so the arm pays Lloyd's
        dedup_core.evict_state("kmeans")
        dedup_core.evict_state("pq_books")
        release_barriers(spark)
        t0 = time.perf_counter()
        books, _ = S.pq_codebooks(emb, train_mod=mod)
        sec = round(time.perf_counter() - t0, 3)
        return sec, books

    # JVM/worker warmup on the cheap arm first, then measure both
    train(S.PQ_TRAIN_MOD)
    sampled_sec, sampled_books = train(S.PQ_TRAIN_MOD)
    full_sec, _ = train(None)
    print(json.dumps({
        "ab": "pq_train_sampled",
        "sf": 1,
        "full_sec": full_sec,
        "sampled_sec": sampled_sec,
        "train_mod": S.PQ_TRAIN_MOD,
        "speedup": round(full_sec / sampled_sec, 2),
    }))

    # ---- 2. CC loop: observed fold vs two jobs per round ---------
    # each arm rebuilds its own edge table AFTER release_barriers (the
    # sweep drops the non-state caches), so pair generation is inside
    # both arms symmetrically — a shared pre-materialize would not
    # survive the sweep anyway
    verts = docs.select("doc_id")

    def run_cc(tag):
        release_barriers(spark)
        # re-materialize the edge/vertex inputs after the barrier sweep
        e = dedup_core.materialize(
            DS.near_dup_edges(docs).select("doc_a", "doc_b")
        )
        sc.setJobGroup(tag, tag)
        t0 = time.perf_counter()
        lab = DS.connected_components(e, verts)
        n = lab.count()
        sec = round(time.perf_counter() - t0, 3)
        sc.setJobGroup("", "")
        jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
        chk = lab.agg(F.sum("label")).collect()[0][0]
        return {"sec": sec, "jobs": jobs, "rows": n, "label_sum": int(chk)}

    new = run_cc("cc_new")

    real = DS._materialize_observed

    def old_two_jobs(df, *metrics, project=None):
        # the pre-r12 shape: checkpoint job + a SEPARATE convergence
        # collect per round.  Metrics run over the full (pre-project)
        # frame — the changes count references columns the projection
        # drops — then the loop gets the projected view, a plain
        # select over the checkpointed rows (no third job)
        full = dedup_core.materialize(df)           # job 1
        row = full.agg(*metrics).collect()[0]       # job 2
        out = full.select(*project) if project else full
        return out, row.asDict()

    DS._materialize_observed = old_two_jobs
    try:
        old = run_cc("cc_old")
    finally:
        DS._materialize_observed = real
    assert old["label_sum"] == new["label_sum"] and old["rows"] == new["rows"]
    print(json.dumps({
        "ab": "cc_observed_fold", "sf": 1,
        "old": old, "new": new,
        "job_reduction": round(1 - new["jobs"] / old["jobs"], 3),
    }))

    # ---- 3. auto-route at sf1 ------------------------------------
    t0 = time.perf_counter()
    route, bound, n = DS.route_text_dedup(docs)
    probe_sec = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "ab": "route_text_dedup", "sf": 1, "route": route,
        "bound": bound, "docs": n,
        "bound_per_doc": round(bound / n, 1), "probe_sec": probe_sec,
    }))


if __name__ == "__main__":
    main()
