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
    # the round it changes.  Round 14 (optimization): no additions;
    # the three operators whose internals CHANGED this round
    # (ngram_jaccard — aggregated PPJoin pair filter; dedup_minhash —
    # scan-level min_tasks dial; knn_join — per-worker broadcast
    # hydration memo), join_asof_nearest (changed r13 without a
    # re-cert that round), and the eighth re-certification sweep —
    # ALL fourteen r7-evidence rows, which would otherwise breach the
    # MAX_AGE=6 staleness bound at round 14.
    must_be_checked = {
        # r14 changed operators (this optimization round)
        "ngram_jaccard",
        "dedup_minhash",
        "knn_join",
        # changed r13 (growing window frame) — re-cert owed
        "join_asof_nearest",
        # r14 re-certifications: ALL fourteen r7-evidence rows
        "limit_skip",
        "agg_global",
        "sort_multi",
        "coercion",
        "set_union",
        "agg_rollup",
        "cross_join_filter",
        "join_nonequi_filter",
        "feature_extract",
        "tpch_q5_like",
        "join_anti",
        "pipeline_clean_incr",
        "dup_span_frac",
        "profile_table",
        # earlier rows that keep their green (family reps documented
        # at their _DEFER_PAST_CAP entries)
        "flagship",
        "tpch_q1",
        "topk",          # window_topk_per_group's deferral rep
        "distinct",      # set-family deferral rep
        "vocab_drift",   # tfidf_topterms' deferral rep
        "bm25_search",   # stays in-window: the hybrid row consumes
                         # RANKS only; score values need their own row
        "window_running_sum",   # only in-window window-function row
        "dedup_text_auto",      # routes to ppjoin at driver density:
                                # hash-checks the CHANGED candidate
                                # machinery through its own route
        "train_test_split",     # hash-split core rep
        "bpe_encode_checked",   # only in-window tokenizer row
        "ann_ivf_trained",      # ann_ivf's deferral rep; trains the
                                # centroid path end-to-end
        "ann_ivf_knn_join",     # banded-cosine family rep
        "knn_recall_ivf_probe", # fused probe kernel + shared
                                # _probe_global_topk rep
        "ann_ivf_pq",           # codebook/index family rep
        "ann_ivf_pq_knn_join",  # IVFADC join rep
        "events_session_window",
        "dedup_minhash_ingest_stream",
        "dedup_labels_stream",  # CC-semantics rep (from-scratch-CC
                                # oracle) for the deferred state rows
        "cms_stream_heavy_hitters",
        "bloom_precheck_stream",
    }
    head = set(list(entry_mod.queries())[: entry_mod._DRIVER_CAP])
    assert must_be_checked <= head


def test_deferred_evidence_staleness_bounded():
    """VERDICT r12 item 3: the rotation scheme's weak point is
    evidence AGE — a row deferred for many rounds rests on a stale
    driver-green record while the code around it moves.  This guard
    computes every query's last driver-green round from the checked-in
    ``CORRECTNESS_r*.json`` artifacts and fails when any row sitting
    OUTSIDE the upcoming round's window would be more than ``MAX_AGE``
    rounds behind it — forcing the sweep budget to keep pace instead
    of silently slipping.  In-window rows count as current (the
    driver certifies them this round); a deferred row with NO green
    record at all is a rotation bug (new/changed entries must enter
    in-window the round they appear)."""
    import glob
    import json
    import os
    import re

    repo_root = os.path.dirname(os.path.abspath(entry_mod.__file__))
    last: dict[str, int] = {}
    rounds: list[int] = []
    for f in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        rounds.append(r)
        for k, v in json.load(open(f)).items():
            if (
                v.get("rows_match")
                and v.get("schema_match")
                and not v.get("err")
            ):
                last[k] = max(last.get(k, 0), r)
    if not rounds:
        pytest.skip("no driver correctness artifacts checked in")
    upcoming = max(rounds) + 1
    MAX_AGE = 6
    names = list(entry_mod.queries())
    head = set(names[: entry_mod._DRIVER_CAP])
    deferred = [k for k in names if k not in head]
    never_checked = {k for k in deferred if k not in last}
    assert not never_checked, (
        f"deferred rows with no driver-green record: {never_checked} — "
        "new/changed entries must rotate IN-window the round they appear"
    )
    stale = {
        k: last[k]
        for k in deferred
        if upcoming - last[k] > MAX_AGE
    }
    assert not stale, (
        f"deferred rows whose driver evidence is >{MAX_AGE} rounds "
        f"behind round {upcoming}: {stale} — rotate them into the "
        "window (raise the sweep budget) before adding new entries"
    )


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
