#!/usr/bin/env python
"""Companion detail measurements for the sf1 soak, with provenance —
the numbers docs/SCALE.md's round-11 section cites beyond wall times:
cell-vs-probe recall@k at both scales, and the ngram_jaccard PPJoin
candidate-pair counts at both scales.  Output:
docs/SOAK_SF1_DETAIL.json (git_sha-stamped).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from simple_rust_query_engine_spark.pipeline.dedup_sketch import (  # noqa: E402
    _ngram_candidates,
)
import simple_rust_query_engine_spark.pipeline.similarity as S  # noqa: E402
from simple_rust_query_engine_spark.session import (  # noqa: E402
    get_spark,
    load_tables,
)

SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "localdata", "sf1",
    ),
}


def main():
    spark = get_spark("sf1-detail")
    out = {"metric": "sf1_soak_detail", **bench._git_provenance()}
    for scale, d in SCALES.items():
        t = load_tables(spark, d)
        out[f"{scale}_ngram_candidates"] = _ngram_candidates(
            t["documents"]
        )[1].count()
        rows = {
            r.method: r
            for r in S.knn_recall_ivf_probe(t["embeddings"]).collect()
        }
        out[f"{scale}_recall"] = {
            m: {
                "n_exact_pairs": r.n_exact_pairs,
                "n_hits": r.n_hits,
                "recall_at_k": round(r.recall_at_k, 4),
            }
            for m, r in rows.items()
        }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "SOAK_SF1_DETAIL.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
