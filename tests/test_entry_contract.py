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
    # one plus the ==50 head assert.  Round 7: the stateful ingest
    # pipeline + persisted label state rework, the profile validity
    # band, and the first re-certification sweep of the oldest
    # deferred rows (VERDICT r6 item 6).
    must_be_checked = {
        # r7 additions / changes
        "pipeline_incr_stateful",  # new in r7 (stateful ingest cycle)
        "dedup_labels_stream",     # new in r7 (continuous label state)
        "bpe_pair_counts",         # new in r7 (tokenizer induction)
        "doc_novelty",             # new in r7 (first-seen span frac)
        "cross_source_overlap",    # new in r7 (source leakage matrix)
        "dup_cluster_sizes",       # new in r7 (component-size histo)
        "profile_table_approx",    # r7: deterministic validity-band twin
        "dedup_cc",            # r7: reads/builds persisted label state
        "dedup_cc_incr",       # r7: merges into persisted base labels
        "dedup_keep_best",     # r7: window over persisted label state
        "dedup_minhash_bucketed",  # r7: band index cache unified on
        "ngram_jaccard",           # _STATE_CACHE (weakref eviction)
        # r7 re-certifications (oldest driver rows, r3/r4-green only)
        "set_union",
        "agg_rollup",
        "cross_join_filter",
        "limit_skip",
        "agg_global",
        "sort_multi",
        "coercion",
        "join_nonequi_filter",
        # r6 additions that keep their rows (excise_spans,
        # temperature_mixture and decontaminate_fuzzy deferred when
        # the three dedup-analytics queries entered — family reps
        # noted at their _DEFER_PAST_CAP entries)
        "dedup_minhash_ingest_stream",
        "profile_table",
        "dup_span_frac",
        "decontaminate",
        "decontaminate_stream",
        "quality_topk",
        "tpch_q18_like",
        "tpch_q14_like",
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
