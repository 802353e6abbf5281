"""Driver-contract invariants for ``__spark_entry__``.

The driver checks the FIRST 50 queries() entries (observed r2/r3);
these tests pin (a) the ==50 head invariant and its assertion, (b) the
round-4 rotation — every query deferred in r2/r3 now sits inside the
checked window — and (c) the weak-keyed table cache that dies with its
session instead of surviving on a reused ``id()``.
"""

import gc

import pytest

import __spark_entry__ as entry_mod


def test_head_is_exactly_driver_cap():
    names = list(entry_mod.queries())
    head = names[: entry_mod._DRIVER_CAP]
    assert len(names) == entry_mod._DRIVER_CAP + len(entry_mod._DEFER_PAST_CAP)
    assert not set(head) & set(entry_mod._DEFER_PAST_CAP)
    # oracle dict must present the same order (driver zips them);
    # every query carries an oracle twin as of r7 (approx operators
    # emit deterministic validity bands instead of raw estimates)
    osql = entry_mod.oracle_sql()
    assert list(osql) == names


def test_rotation_keeps_new_and_changed_operators_in_window():
    # standing rule (VERDICT r3/r4): every operator added or changed
    # this round must sit inside the driver's 50-entry checked window
    # the round it changes.  After round 4 every query has a
    # driver-green row on record, so the remaining invariant is this
    # one plus the ==50 head assert.  Round 8: the bpe_encode_checked
    # addition, the hash-red-in-r7 bpe_pair_counts retained for its
    # green row (oracle cast fixed — VERDICT r7 item 2), the second
    # re-certification sweep (the 8 oldest deferred rows, r3/r4
    # evidence), and the dedup-family queries whose module was split
    # this round (pure move, names+oracles unchanged, parity-gated).
    must_be_checked = {
        # r8 additions / changes
        "bpe_encode_checked",      # new in r8 (corpus-sized encode pass)
        "knn_join",                # new in r8 (exact k-NN self-join)
        "knn_label_spread",        # new in r8 (k-NN majority vote)
        "knn_join_stream",         # new in r8 (stream-static scoring)
        "multimodal_resize",       # new in r8 (resize step, fake kernel)
        "cms_heavy_hitters",       # new in r8 (hash-checked CMS)
        "bpe_pair_counts",         # r8: oracle SUM(cnt)::BIGINT cast
        "dedup_minhash_ingest_stream",  # r8: catalog-drop + path-read
        "dedup_labels_stream",          # r8: same catalog hygiene
        "ngram_jaccard",           # r8: _same_corpus session-identity
                                   #     guard on the edge-cache reuse
        # (cross_source_overlap, listed below, also changed in r8: it
        # now reads the persisted pair state instead of rebuilding the
        # session edge cache per call — same name, same oracle)
        # r8 re-certifications (oldest driver rows, r3/r4-green only)
        "window_topk_per_group",
        "ann_brute",
        "ann_ivf",
        "simhash",
        "dedup_minhash",
        "pipeline_clean",
        "join_semi",
        "multimodal_decode",
        # r7 additions that keep their rows (the freshly-r7-re-certified
        # relational 8 + feature_extract deferred in exchange — family
        # reps documented at their _DEFER_PAST_CAP entries)
        "pipeline_incr_stateful",
        "dedup_cc",
        "dedup_cc_incr",
        "dedup_keep_best",
        "dedup_minhash_bucketed",
        "doc_novelty",
        "cross_source_overlap",
        "dup_cluster_sizes",
        "profile_table_approx",
        # (profile_table deferred late-r8 when cms_heavy_hitters
        # entered — profile_table_approx + stats_moments are the reps)
        # (dup_span_frac deferred late-r8 when multimodal_resize
        # entered — doc_novelty + decontaminate_stream are the span reps)
        "decontaminate_stream",
        "quality_topk",
        "tpch_q18_like",
    }
    head = set(list(entry_mod.queries())[: entry_mod._DRIVER_CAP])
    assert must_be_checked <= head


def test_ordered_asserts_on_wrong_head_size():
    qs = entry_mod.queries()
    too_many = dict(qs)
    too_many["brand_new_query"] = next(iter(qs.values()))
    with pytest.raises(AssertionError, match="rotation"):
        entry_mod._ordered(too_many)


def test_table_cache_validates_session_identity(spark):
    import os
    import weakref

    sf = "/root/testdata/sf0.001"
    child = spark.newSession()
    t1 = entry_mod._tables(child, sf)
    t2 = entry_mod._tables(child, sf)
    assert t1 is t2  # plain cache hit
    # simulate CPython id reuse: same key, but the stored weakref
    # resolves to a DIFFERENT session object → must rebuild, not
    # hand back the other session's tables
    other = spark.newSession()
    key = (id(child), os.path.abspath(sf))
    entry_mod._table_cache[key] = (weakref.ref(other), {"stale": True})
    t3 = entry_mod._tables(child, sf)
    assert "stale" not in t3
    assert "documents" in t3
    gc.collect()
