"""Regression tests for latent edge cases the driver corpus never
exercises (short/empty docs, string literals with double quotes,
nanosecond-precision timestamps)."""

from pyspark.sql import functions as F

from simple_rust_query_engine_spark.pipeline.dedup import (
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_shingles,
)
from simple_rust_query_engine_spark.pipeline.multimodal import (
    frame_sample,
    with_binary_payload,
)


def test_minhash_short_docs_no_spurious_pairs(spark):
    # docs under SHINGLE_N tokens have all-NULL signatures; they must
    # NOT band together (oracle semantics: NULL band never joins)
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, "x"), (4, "hello world again ok")],
        "doc_id long, text string",
    )
    assert minhash_lsh_pairs(docs).count() == 0
    sigs = {r.doc_id: r.sig for r in minhash_signatures(docs).collect()}
    assert sigs[1] == [None] * 16 and sigs[3] == [None] * 16
    assert all(v is not None for v in sigs[4])


def test_ngram_shingles_short_docs_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "one two three")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", ngram_shingles(F.col("text")).alias("s")
        ).collect()
    }
    assert out[1] == [] and out[2] == []
    assert out[3] == ["one two three"]


def test_frame_sample_empty_payload_emits_nothing(spark):
    docs = spark.createDataFrame([(1, ""), (2, "x" * 65)], "doc_id long, text string")
    fs = frame_sample(with_binary_payload(docs))
    rows = fs.collect()
    # doc 1 (0 bytes): no frames; doc 2 (65 bytes): frames 0 and 1
    assert {(r.doc_id, r.frame_no) for r in rows} == {(2, 0), (2, 1)}


def test_sql_shim_preserves_double_quotes_in_string_literals(spark):
    from simple_rust_query_engine_spark import SessionContext

    ctx = SessionContext(spark)
    row = ctx.sql("""SELECT 'he said "ok"' AS s, 'it''s' AS t""").collect()[0]
    assert row.s == 'he said "ok"'
    assert row.t == "it's"


def test_sql_shim_still_rewrites_identifiers(spark):
    from simple_rust_query_engine_spark import SessionContext

    ctx = SessionContext(spark)
    spark.createDataFrame([(1,)], "x long").createOrReplaceTempView("shim_t")
    out = ctx.sql('SELECT "x" FROM shim_t ORDER BY "x"')
    assert out.collect()[0].x == 1


def test_nanos_to_micros_is_integer_exact(spark):
    # epoch nanos > 2^53: double division would round to 256-ns
    # multiples; integer div must keep exact microseconds
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1700000000000000999,)], "ns long").select(
        F.timestamp_micros(F.expr("ns div 1000")).alias("ts")
    )
    micros = df.select(F.unix_micros("ts").alias("us")).collect()[0].us
    assert micros == 1700000000000000


def test_all_identical_corpus_collapses_to_one_component(spark):
    # hot-bucket degenerate case: every doc identical → every pair is
    # a candidate AND a true duplicate; CC collapses to one label
    from simple_rust_query_engine_spark.pipeline.dedup import (
        connected_components,
        q_ngram_jaccard,
    )

    n = 12
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(n)],
        "doc_id long, text string",
    )
    t = {"documents": docs}
    pairs = q_ngram_jaccard(t)
    assert pairs.count() == n * (n - 1) // 2
    assert pairs.filter(F.col("jaccard") != 1.0).count() == 0
    lab = connected_components(
        pairs.select("doc_a", "doc_b"), docs.select("doc_id")
    )
    assert lab.select("label").distinct().count() == 1


def test_empty_corpus_all_dedup_paths_return_empty(spark):
    from simple_rust_query_engine_spark.pipeline.dedup import (
        q_dedup_exact,
        q_ngram_jaccard,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    t = {"documents": empty}
    assert q_dedup_exact(t).count() == 0
    assert q_ngram_jaccard(t).count() == 0
    assert minhash_lsh_pairs(empty).count() == 0


def test_skew_ops_null_and_string_semantics(spark):
    # two_phase_ndistinct must match COUNT(DISTINCT): NULLs don't
    # count as a value, all-NULL keys stay in the output with 0;
    # salted_collect's salt must work on STRING values (a naive
    # `val % n` would cast to double→NULL and un-spread the hot key)
    from simple_rust_query_engine_spark.operators.skew import (
        salted_collect,
        two_phase_ndistinct,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("a", None), ("b", None)],
        "k string, v string",
    )
    nd = {r.k: r.n_distinct for r in two_phase_ndistinct(df, "k", "v").collect()}
    assert nd == {"a": 2, "b": 0}

    sc = {r.k: r.vs for r in salted_collect(df.filter(F.col("v").isNotNull()), "k", "v").collect()}
    # roster is a comma-joined string (flat columns survive downstream
    # canonicalization/hashing that raw arrays break)
    assert sc == {"a": "x,x,y"}


def test_connected_components_durable_mode(spark, monkeypatch):
    # exercise the persist(DISK_ONLY) + per-round unpersist branch of
    # the CC loop end-to-end (the default path uses localCheckpoint)
    import simple_rust_query_engine_spark.pipeline.dedup as D
    # patch the DEFINING module: materialize() reads the flag from its
    # own globals (dedup_core), not from the facade's re-export
    import simple_rust_query_engine_spark.pipeline.dedup_core as DC

    monkeypatch.setattr(DC, "DURABLE_MATERIALIZE", True)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id long")
    lab = {r.doc_id: r.label for r in D.connected_components(edges, verts).collect()}
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_kmv_sketch_accuracy_and_exact_path(spark):
    from simple_rust_query_engine_spark.operators.sketch import (
        KMV_K,
        kmv_ndistinct,
    )

    # exact path: cardinality below k → n_seen IS the exact count
    small = spark.createDataFrame(
        [("a", i) for i in range(20)] * 3, "k string, v long"
    )
    row = kmv_ndistinct(small, "k", "v").collect()[0]
    assert row.n_seen == 20 and row.est_ndistinct == 20.0

    # sketch path: 5000 distinct values, estimate within the textbook
    # ~2/sqrt(k-2) relative error band
    big = spark.createDataFrame([("a", i) for i in range(5000)], "k string, v long")
    est = kmv_ndistinct(big, "k", "v").collect()[0].est_ndistinct
    rel_err = abs(est - 5000) / 5000
    assert rel_err < 2.5 / (KMV_K - 2) ** 0.5, (est, rel_err)


def test_kmv_merge_equals_whole_corpus_sketch(tables):
    # the merge claim is EXACT set algebra, not approximation on
    # approximation: union-then-take-k over the per-source minima must
    # reproduce the whole-corpus sketch bit for bit — same n_seen,
    # same kth minimum, same estimate
    from simple_rust_query_engine_spark.operators.sketch import (
        kmv_merge_ndistinct,
        kmv_ndistinct,
    )

    whole = {
        r.lang: (r.n_seen, r.est_ndistinct)
        for r in kmv_ndistinct(tables["documents"], "lang", "doc_id").collect()
    }
    merged = {
        r.lang: (r.n_seen, r.est_ndistinct)
        for r in kmv_merge_ndistinct(
            tables["documents"], "lang", "doc_id", "source"
        ).collect()
    }
    assert whole == merged


def test_kmv_merge_dedups_cross_source_minima(spark):
    # the same value appearing in SEVERAL sources must count once
    # after the merge (documents.doc_id is unique, so the driver row
    # never exercises this): 3 sources share 200 values — without the
    # distinct between union and final rank, duplicated minima would
    # fill the top-k and shift the kth smallest.  200 > KMV_K, so this
    # runs the true sketch path, not the exact small-cardinality path.
    from simple_rust_query_engine_spark.operators.sketch import (
        kmv_merge_ndistinct,
        kmv_ndistinct,
    )

    rows = [("k", s, v) for s in ("a", "b", "c") for v in range(200)]
    df = spark.createDataFrame(rows, "k string, src string, v long")
    m = kmv_merge_ndistinct(df, "k", "v", "src").collect()[0]
    w = kmv_ndistinct(df, "k", "v").collect()[0]
    assert (m.n_seen, m.est_ndistinct) == (w.n_seen, w.est_ndistinct)
    assert m.n_sources_merged == 3


def test_bloom_geometry_formulas():
    import pytest

    from simple_rust_query_engine_spark.operators.sketch import (
        bloom_geometry,
    )

    # textbook values: p=1% → ~9.59 bits/element, 7 hashes
    m, d = bloom_geometry(1000, 0.01)
    assert m == 9586 and d == 7, (m, d)
    # p=50% → ~1.44 bits/element; ⌈1.0003⌉ = 2 hashes (ceil, per the
    # published formula — round would give the marginally optimal 1)
    m, d = bloom_geometry(1000, 0.5)
    assert m == 1443 and d == 2, (m, d)
    with pytest.raises(ValueError):
        bloom_geometry(1000, 0.0)
    with pytest.raises(ValueError):
        bloom_geometry(0, 0.01)


def test_bloom_precheck_sized_from_fp_target(spark):
    # end-to-end wiring of the dial: 4000 unique texts, so every
    # batch row is a true non-member and every maybe_dup is a false
    # positive.  Sized at 2% the measured rate must sit in band —
    # far below the saturated fixed-8192-bit geometry, which at this
    # cardinality would flag nearly everything.
    from simple_rust_query_engine_spark.operators.sketch import (
        bloom_dedup_precheck,
    )

    rows = [(i, f"uniq-{i}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bloom_dedup_precheck(df, fp_target=0.02).collect()
    assert out and all(r.sound for r in out)
    assert not any(r.is_dup for r in out)
    fp = sum(r.maybe_dup for r in out) / len(out)
    assert fp <= 3.5 * 0.02, fp


def test_ngram_shingles_udf_matches_expression(tables):
    from pyspark.sql import functions as F

    from simple_rust_query_engine_spark.pipeline.dedup import (
        ngram_shingles,
        ngram_shingles_udf,
    )

    docs = tables["documents"]
    both = docs.select(
        ngram_shingles(F.col("text")).alias("e"),
        ngram_shingles_udf()(F.col("text")).alias("u"),
    ).collect()
    assert len(both) > 0
    for r in both:
        assert list(r.e) == list(r.u)


def test_fuzzy_join_blocks_and_distance(spark):
    # blocking correctness: same-block names pair iff within the edit
    # ceiling; near-identical names in DIFFERENT blocks never pair
    # (that is the blocking trade-off, asserted so it stays explicit);
    # duplicate name rows collapse before pairing
    from simple_rust_query_engine_spark.operators.relational import (
        q_fuzzy_join_names,
    )

    part = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "red widget"),        # duplicate row: distinct first
            (3, "bed widget"),        # dist 1, same block
            (4, "enormous widget"),   # same block, beyond ceiling
            (5, "red gadget"),        # dist 3 to "red widget" but
                                      # different block: must not pair
        ],
        "p_partkey long, p_name string",
    )
    rows = q_fuzzy_join_names({"part": part}).collect()
    got = {(r.name_a, r.name_b): r.edit_dist for r in rows}
    assert got == {("bed widget", "red widget"): 1}
    assert all(r.block == "widget" for r in rows)


def test_levenshtein_matches_duckdb_definition(spark):
    # the fuzzy join's cross-engine contract: Spark and DuckDB agree
    # on the classic unit-cost edit distance
    import duckdb

    pairs = [
        ("red widget", "blue widget"),
        ("small ring", "small gizmo"),
        ("", "abc"),
        ("kitten", "sitting"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {
        (r.a, r.b): r.d
        for r in df.select("a", "b", F.levenshtein("a", "b").alias("d")).collect()
    }
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got[(a, b)] == want, (a, b)


def test_stats_moments_matches_numpy(spark):
    # exact-sufficient-statistics path vs numpy's float accumulation:
    # agreement to the 6-dp rounding contract; the n=1 group emits
    # NULL var/std/corr rather than a divide-by-zero artifact
    import numpy as np

    from simple_rust_query_engine_spark.operators.profile import (
        q_stats_moments,
    )

    rows = [
        ("A", 5.0, 100.25), ("A", 7.0, 210.50), ("A", 3.0, 55.75),
        ("A", 9.0, 300.00), ("B", 4.0, 80.00),
    ]
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_extendedprice double"
    )
    got = {r.l_returnflag: r for r in q_stats_moments({"lineitem": li}).collect()}

    q = np.array([r[1] for r in rows if r[0] == "A"])
    p = np.array([r[2] for r in rows if r[0] == "A"])
    a = got["A"]
    assert a.n == 4
    assert abs(a.mean_qty - q.mean()) < 1e-6
    assert abs(a.var_qty - q.var(ddof=1)) < 1e-6
    assert abs(a.std_qty - q.std(ddof=1)) < 1e-6
    assert abs(a.mean_price - p.mean()) < 1e-6
    assert abs(a.corr_qty_price - np.corrcoef(q, p)[0, 1]) < 1e-6

    b = got["B"]
    assert b.n == 1 and b.mean_qty == 4.0
    assert b.var_qty is None and b.std_qty is None
    assert b.corr_qty_price is None


def test_knn_twophase_small_corpus_falls_back_exact(spark):
    # r9 review finding: with any tile holding <= k vectors the
    # per-tile kernel caps at tile_size-1 candidates and the two-phase
    # merge would silently drop a global neighbor — the precondition
    # is now ENFORCED with a knn_join fallback.  20 vectors / 4 tiles
    # = 5 per tile at k=5: exactly the degenerate case.
    import numpy as np

    from simple_rust_query_engine_spark.pipeline.similarity import (
        knn_join,
        knn_join_twophase,
    )

    rng = np.random.RandomState(7)
    rows = [
        (int(i), [float(x) for x in rng.randn(64)]) for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(tuple(r) for r in knn_join(emb, k=5).collect())
    b = sorted(tuple(r) for r in knn_join_twophase(emb, k=5, tiles=4).collect())
    # the equality is the real pin: the pre-fix bug emitted the SAME
    # row count but WRONG neighbors (each foreign 5-vector tile
    # silently withheld its worst candidate, so a global 5th-best
    # from another tile could be replaced, not dropped)
    assert a == b
    assert len(b) == 20 * 5


def test_cms_merge_null_and_tokenless_sources(spark):
    # r9 review findings: (a) tokens from NULL-source rows must reach
    # the merged sketch (pandas groupby dropna would silently drop
    # them); (b) n_sources_merged mirrors the oracle's COUNT(DISTINCT
    # source) over ALL documents — a source whose rows carry zero
    # non-empty tokens still counts, and NULL does not.
    from simple_rust_query_engine_spark.operators.sketch import (
        cms_merge_heavy_hitters,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta", "src_a"),
            (2, "alpha gamma", None),      # NULL source, real tokens
            (3, "", "src_b"),              # tokenless source
            (4, " ", "src_b"),             # whitespace only
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.token: r
        for r in cms_merge_heavy_hitters(docs, phi_denom=6).collect()
    }
    # 5 tokens total (docs 3/4 split to nothing), thr = ceil(5/6) = 1
    # -> every token is a candidate; the NULL-source doc's tokens
    # must be counted
    assert got["alpha"].exact_count == 3
    assert got["gamma"].exact_count == 1
    assert all(r.overestimate_ok for r in got.values())
    # est >= exact for alpha requires doc 2's fold to have landed
    assert got["alpha"].est_count >= 3
    # src_a + src_b (tokenless but real); NULL excluded
    assert {r.n_sources_merged for r in got.values()} == {2}


def test_knn_twophase_empty_tiles_stay_two_phase(spark):
    # r9 second-pass review finding: an EMPTY tile is harmless (the
    # kernel's kk <= 0 skips it, contributing no candidates) and must
    # NOT trigger the small-corpus fallback — a huge corpus whose
    # vec_ids are modulo-correlated would otherwise regress to the
    # full-corpus broadcast this function exists to avoid.  Even ids
    # only, tiles=4 -> tiles 1 and 3 empty, tiles 0 and 2 hold 12 > k.
    import numpy as np

    from simple_rust_query_engine_spark.pipeline.similarity import (
        knn_join,
        knn_join_twophase,
    )

    rng = np.random.RandomState(11)
    rows = [
        (int(2 * i), [float(x) for x in rng.randn(64)]) for i in range(24)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    tp = knn_join_twophase(emb, k=5, tiles=4)
    # still the two-phase plan (vec_id merge window), not the
    # single-broadcast fallback (map-only, no exchange)
    plan = tp._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan and "Window" in plan, plan
    a = sorted(tuple(r) for r in knn_join(emb, k=5).collect())
    assert sorted(tuple(r) for r in tp.collect()) == a


def test_knn_twophase_negative_ids_exact(spark):
    # r9 third-pass review finding (empirically reproduced): a signed
    # `vec_id % tiles` assigned negative ids to NO tile (remainders
    # -3..-1 never equal t in 0..tiles-1), silently dropping them from
    # every index while the size check (grouped on the same signed
    # remainder) saw healthy groups and did not fall back.  Both now
    # use pmod; ids -24..23 must produce exactly knn_join's output.
    import numpy as np

    from simple_rust_query_engine_spark.pipeline.similarity import (
        knn_join,
        knn_join_twophase,
    )

    rng = np.random.RandomState(13)
    rows = [
        (int(i - 24), [float(x) for x in rng.randn(64)]) for i in range(48)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(tuple(r) for r in knn_join(emb, k=5).collect())
    b = sorted(tuple(r) for r in knn_join_twophase(emb, k=5, tiles=4).collect())
    assert a == b


def test_bloom_precheck_true_duplicate_and_soundness(spark):
    # the driver corpus at sf0.01 happens to have no text duplicate
    # crossing the batch/existing split, so the is_dup=True path needs
    # a synthetic pin: doc 0 (batch: doc_id % 5 == 0) duplicates
    # existing doc 1 -> MUST be flagged by the filter (no false
    # negatives) AND verified; doc 5 is unique -> is_dup False; every
    # row sound
    from simple_rust_query_engine_spark.operators.sketch import (
        bloom_dedup_precheck,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),   # batch, duplicates doc 1
            (1, "alpha beta gamma"),   # existing
            (2, "delta"),              # existing
            (3, None),                 # existing, NULL text: must be
                                       # filtered BEFORE hashing (NaN
                                       # astype(int64) = INT64_MIN
                                       # would set a garbage bit)
            (5, "epsilon zeta"),       # batch, unique
            (10, None),                # batch, NULL text: dropped
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bloom_dedup_precheck(docs).collect()}
    assert set(got) == {0, 5}
    assert got[0].maybe_dup and got[0].is_dup
    assert not got[5].is_dup
    assert all(r.sound for r in got.values())
