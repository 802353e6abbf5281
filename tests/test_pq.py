"""Product-quantization invariants (round-11 additions): code
geometry, map-only plans, and the two-stage retrieval's recovery
guarantee.  Oracle hash parity is covered by test_oracle_parity."""

from pyspark.sql import functions as F

from simple_rust_query_engine_spark.pipeline.similarity import (
    KMEANS_CELLS,
    PQ_K,
    PQ_M,
    PQ_RERANK,
    PQ_TOPK,
    ann_brute_topk,
    ann_ivf_pq_rerank_topk,
    ann_ivf_pq_topk,
    ann_pq_rerank_topk,
    pq_codebooks,
    q_ann_ivf_pq,
    q_ann_pq,
    q_knn_recall_pq,
    q_pq_encode,
)


def test_pq_codebook_geometry(tables):
    books, subdim = pq_codebooks(tables["embeddings"])
    assert len(books) == PQ_M
    for C in books:
        assert C.shape == (PQ_K, subdim)


def test_pq_encode_codes_are_in_range(tables):
    enc = q_pq_encode(tables)
    n_vec = tables["embeddings"].count()
    assert enc.count() == PQ_M * n_vec  # M codes per vector, none lost
    bad = enc.filter(
        (F.col("code") < 0) | (F.col("code") >= PQ_K)
        | (F.col("m") < 0) | (F.col("m") >= PQ_M)
    ).count()
    assert bad == 0


def test_pq_encode_plan_is_map_only(tables):
    # the returned plan reads the PERSISTED code table (the encode
    # pass ran once, state-table pattern) and explodes — no shuffle,
    # no Python at read time
    plan = q_pq_encode(tables)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert plan.count("FileScan parquet") == 1, plan
    assert "EvalPython" not in plan, plan


def test_ann_pq_plan_is_code_scan_plus_takeordered(tables):
    # the ADC query path: scan of the code table + M element_at
    # lookups into LUT array literals — pure JVM expressions, the
    # raw vectors never read, no Python, no shuffle
    plan = q_ann_pq(tables)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("FileScan parquet") == 1, plan


def test_ann_ivf_pq_plan_is_pruned_code_scan(tables):
    # the billion-vector composition: scan the combined (cell, codes)
    # state table, filter to probed cells, M JVM lookups, TakeOrdered
    # — no shuffle, no Python, raw vectors never read
    plan = q_ann_ivf_pq(tables)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("FileScan parquet") == 1, plan
    # the probe prunes at the STORAGE layer: the index is laid out
    # one directory per cell, and the cell filter arrives as a
    # PartitionFilter — unprobed cells' files are never opened
    assert "PartitionFilters: [cell" in plan, plan


def test_ann_ivf_pq_scores_match_pure_adc(tables):
    # IVF pruning only restricts the candidate set — a vector's ADC
    # score is identical whether or not the cell filter ran.  Compare
    # against the UNLIMITED flat-ADC ranking (k = corpus) so every
    # returned row is actually checked — a top-5-vs-top-5 overlap can
    # be legitimately empty and would verify nothing
    from simple_rust_query_engine_spark.pipeline.similarity import (
        ann_pq_topk,
    )

    emb = tables["embeddings"]
    rows = q_ann_ivf_pq(tables).collect()
    assert rows
    full = {
        r.vec_id: r.adc_score
        for r in ann_pq_topk(emb, k=emb.count()).collect()
    }
    for r in rows:
        assert r.adc_score == full[r.vec_id]
        assert 0 <= r.cell < KMEANS_CELLS


def test_pq_rerank_recall_is_monotone(tables):
    # any exact-top-k vector that reaches the ADC shortlist survives
    # the exact re-rank, so recall_rerank >= recall_adc always
    row = q_knn_recall_pq(tables).collect()[0]
    assert 0.0 <= row.recall_adc <= 1.0
    assert row.recall_adc <= row.recall_rerank <= 1.0


def test_pq_codes_are_partitioning_invariant(tables):
    # the 1000-executor assumption: codes depend only on (vector,
    # codebooks), never on how rows are split across tasks — re-encode
    # under two different partitionings and require identical codes
    from simple_rust_query_engine_spark.pipeline.similarity import (
        _pq_codes_udf,
        pq_codebooks,
    )

    emb = tables["embeddings"]
    books, _ = pq_codebooks(emb)
    codes = _pq_codes_udf(books)

    def encode(df):
        return {
            r.vec_id: tuple(r.codes)
            for r in df.select(
                "vec_id", codes("embedding").alias("codes")
            ).collect()
        }

    a = encode(emb.repartition(3))
    b = encode(emb.repartition(11))
    assert a == b and len(a) > 0


def test_pq_rerank_with_full_shortlist_is_exact(tables):
    # r >= corpus size makes the shortlist the whole corpus, so the
    # two-stage result must equal brute force bit-for-bit
    emb = tables["embeddings"]
    n = emb.count()
    rr = ann_pq_rerank_topk(emb, query_vec_id=0, k=PQ_TOPK, r=n).collect()
    ex = ann_brute_topk(emb, query_vec_id=0, k=PQ_TOPK).collect()
    assert [(r.vec_id, r.cos_sim) for r in rr] == [
        (r.vec_id, r.cos_sim) for r in ex
    ]


def test_ann_ivf_pq_rerank_full_dials_equal_brute(tables):
    # the r12 capstone's correctness anchor: with every cell probed
    # and the shortlist covering the corpus, the three-stage path
    # (probe -> ADC -> exact re-rank) must equal brute force
    # bit-for-bit
    emb = tables["embeddings"]
    n = emb.count()
    rr = ann_ivf_pq_rerank_topk(
        emb, query_vec_id=0, k=PQ_TOPK, r=n, n_probe=KMEANS_CELLS
    ).collect()
    ex = ann_brute_topk(emb, query_vec_id=0, k=PQ_TOPK).collect()
    assert [(r.vec_id, r.cos_sim) for r in rr] == [
        (e.vec_id, e.cos_sim) for e in ex
    ]


def test_ann_ivf_pq_rerank_plan_shape(tables):
    # the three-stage stack's cost contract: the ONLY exchanges are
    # the two broadcasts (R-row shortlist + 1-row query), never a
    # shuffle; the shortlist leg keeps the storage-layer cell pruning;
    # no Python anywhere at query time
    from simple_rust_query_engine_spark.pipeline.similarity import (
        q_ann_ivf_pq_rerank,
    )

    plan = (
        q_ann_ivf_pq_rerank(tables)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == plan.count("BroadcastExchange") == 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "PartitionFilters: [cell" in plan, plan


def test_ann_ivf_pq_rerank_is_rerank_of_ivf_pq_shortlist(tables):
    # the re-rank may only REORDER the IVF-PQ shortlist, never reach
    # outside it — pins the composition wiring (same probe set, same
    # ADC scores, exact scoring applied after)
    emb = tables["embeddings"]
    shortlist = {
        r.vec_id for r in ann_ivf_pq_topk(emb, k=PQ_RERANK).collect()
    }
    out = ann_ivf_pq_rerank_topk(emb).collect()
    assert {r.vec_id for r in out} <= shortlist
    assert len(out) == min(PQ_TOPK, len(shortlist))
