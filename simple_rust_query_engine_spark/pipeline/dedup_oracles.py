"""DuckDB oracle twins for the dedup family — every SQL string is
built from the SAME deterministic arithmetic constants as the Spark
side (imported, never duplicated), so a dial change cannot
desynchronize an oracle.  Split out of ``dedup.py`` (r8); the
``dedup`` facade re-exports ``ORACLE`` and the shared CTE blocks.
"""

from __future__ import annotations

from .dedup_ingest import DECON_NM, MH_DUP_NM
from .dedup_sketch import (
    INCR_MOD,
    JACCARD_T,
    MH_BANDS,
    MH_K,
    MH_MOD,
    SH_BITS,
    SH_BLOCK,
    SH_M,
    SH_MOD,
    SH_P,
)
from .dedup_spans import DUP_FRAC_T, EVAL_SOURCE, SPAN_W

# ------------------------------------------------------------ oracle
_SQL_WH = "(ascii(w)*131 + length(w)*31 + ascii(reverse(w)))::BIGINT"
# ordered (with multiplicity) word hashes → shingle hashes, mirroring
# _shingle_hashes exactly (1-indexed DuckDB lists)
_SQL_WHS_ORDERED = f"list_transform(string_split(text, ' '), w -> {_SQL_WH})"
_SQL_SHINGLE_HS = (
    "list_distinct([((whs[i]*{p} + whs[i+1]) % {m} * {p} + whs[i+2]) % {m} "
    "for i in range(1, len(whs) - 1)])"
).format(p=SH_P, m=SH_M)


def _minhash_sig_sql() -> str:
    cols = ", ".join(
        f"list_min(list_transform(hs, x -> ({2 * i + 3}*x + {7 * i + 1}) % {MH_MOD})) AS s{i}"
        for i in range(MH_K)
    )
    return (
        f"SELECT doc_id, {cols} FROM ("
        f"SELECT doc_id, {_SQL_SHINGLE_HS} AS hs FROM ("
        f"SELECT doc_id, {_SQL_WHS_ORDERED} AS whs FROM documents) w) t"
    )


def _minhash_oracle(cand_where: str = "") -> str:
    """Banded-LSH pair oracle; ``cand_where`` narrows the candidate
    CTE (used by the incremental variant) so full and incremental
    stay one definition apart, never two diverging copies."""
    rows = MH_K // MH_BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, '{b},' || {parts} AS band FROM sig".format(
            b=b,
            parts=" || ',' || ".join(f"s{b * rows + j}::VARCHAR" for j in range(rows)),
        )
        for b in range(MH_BANDS)
    )
    n_match = " + ".join(f"(x.s{i} = y.s{i})::INT" for i in range(MH_K))
    return f"""
        WITH sig AS ({_minhash_sig_sql()}),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.doc_id < b.doc_id
            {cand_where}
        )
        SELECT doc_a, doc_b, ({n_match}) AS n_match,
               ({n_match})::DOUBLE / {MH_K}.0 AS est_jaccard
        FROM cand JOIN sig x ON cand.doc_a = x.doc_id
                  JOIN sig y ON cand.doc_b = y.doc_id
    """


def _minhash_incr_oracle() -> str:
    return _minhash_oracle(
        f"WHERE a.doc_id % {INCR_MOD} = 0 OR b.doc_id % {INCR_MOD} = 0"
    )


def _decontaminate_fuzzy_oracle() -> str:
    """Fuzzy (minhash) train-vs-eval probe: same sig/band CTE family
    as ``_minhash_oracle``, with the band rows carrying ``source`` so
    candidates pair train docs against eval docs only."""
    rows = MH_K // MH_BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, source, '{b},' || {parts} AS band FROM sigsrc".format(
            b=b,
            parts=" || ',' || ".join(f"s{b * rows + j}::VARCHAR" for j in range(rows)),
        )
        for b in range(MH_BANDS)
    )
    n_match = " + ".join(f"(x.s{i} = y.s{i})::INT" for i in range(MH_K))
    return f"""
        WITH sig AS ({_minhash_sig_sql()}),
        sigsrc AS (
            SELECT s.*, d.source FROM sig s JOIN documents d USING (doc_id)
        ),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT t.doc_id AS tid, e.doc_id AS eid
            FROM bands t JOIN bands e ON t.band = e.band
            WHERE t.source <> '{EVAL_SOURCE}' AND e.source = '{EVAL_SOURCE}'
        ),
        scored AS (
            SELECT tid, eid, ({n_match}) AS nm
            FROM cand JOIN sig x ON tid = x.doc_id
                      JOIN sig y ON eid = y.doc_id
        ),
        agg AS (
            SELECT tid, COUNT(*) AS n_candidates,
                   COUNT(*) FILTER (nm >= {DECON_NM}) AS n_hits,
                   MAX(nm)::DOUBLE / {MH_K} AS max_est_jaccard
            FROM scored GROUP BY tid
        )
        SELECT d.doc_id,
               COALESCE(a.n_candidates, 0) AS n_candidates,
               COALESCE(a.n_hits, 0) AS n_hits,
               a.max_est_jaccard,
               COALESCE(a.n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.tid
        WHERE d.source <> '{EVAL_SOURCE}'
    """


def _simhash_expr_sql() -> str:
    terms = []
    for j in range(SH_BITS):
        vote = (
            f"list_sum(list_transform(hs, x -> CASE WHEN "
            f"((x*{2 * j + 3} + {j}) % {SH_MOD}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {2**j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::BIGINT"


#: shingle-hash list per doc (the simhash/minhash input set)
_SQL_SHINGLE_SRC = (
    f"(SELECT doc_id, {_SQL_SHINGLE_HS} AS hs FROM "
    f"(SELECT doc_id, {_SQL_WHS_ORDERED} AS whs FROM documents) w)"
)


def _simhash_oracle() -> str:
    return f"""
        SELECT doc_id, {_simhash_expr_sql()} AS simhash
        FROM {_SQL_SHINGLE_SRC} t
    """


def _simhash_pairs_oracle() -> str:
    return f"""
        WITH sh AS (
            SELECT doc_id, {_simhash_expr_sql()} AS simhash
            FROM {_SQL_SHINGLE_SRC} t
        ), blocked AS (
            SELECT doc_id, simhash, simhash // {SH_BLOCK} AS block FROM sh
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash))::INT AS hamming
        FROM blocked a JOIN blocked b
          ON a.block = b.block AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


#: shared CTE block for the exact n-gram pair oracles — ONE definition
#: of tokenize → distinct shingles → per-doc counts → common-shingle
#: pair counts, reused by ngram_jaccard / dedup_cc / dedup_survivors
#: here and pipeline_clean in clean.py, so a change to shingle
#: construction can never desynchronize one of the four.
SQL_NGRAM_PAIR_CTES = """tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w) - 1)]) AS s
                FROM tok
            ) t
        ),
        cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )"""

#: pair CTEs + the greedy drop set (docs near-duplicating a lower id)
SQL_NGRAM_DROPPED_CTES = f"""{SQL_NGRAM_PAIR_CTES},
        dropped AS (
            SELECT DISTINCT doc_b AS doc_id FROM pairs
            JOIN cnt ca ON doc_a = ca.doc_id
            JOIN cnt cb ON doc_b = cb.doc_id
            WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= {JACCARD_T}
        )"""


def _sql_span_hash(width: int = SPAN_W) -> str:
    """DuckDB rolling-hash fold, mirroring _window_hashes exactly."""
    from .text import _FP_MOD, _FP_MUL

    expr = "whs[i]"
    for j in range(1, width):
        expr = f"(({expr})*{_FP_MUL} + whs[i+{j}]) % {_FP_MOD}"
    return expr


#: spans CTE shared by dup_spans / decontaminate — one definition of
#: tokenize → word-hash → rolling window hash (docs shorter than
#: SPAN_W emit no rows, same as the Spark empty-array guard)
SQL_SPAN_CTES = f"""whdoc AS (
            SELECT doc_id, source, {_SQL_WHS_ORDERED} AS whs FROM documents
        ),
        spans AS (
            SELECT doc_id, source,
                   unnest(list_transform(range(1, len(whs) - {SPAN_W - 2}),
                                         i -> {_sql_span_hash()})) AS span_hash
            FROM whdoc
        )"""


#: CC label CTEs shared by dedup_cc / dedup_keep_best /
#: dup_cluster_sizes / split_by_cluster — ONE definition of
#: edges → bidirectional closure → min-reachable-id label, for the
#: same reason SQL_NGRAM_PAIR_CTES exists: a change to the label
#: convention (reach seeding, the COALESCE fallback) must not be
#: able to desynchronize one consumer's oracle.  Requires WITH
#: RECURSIVE on the consuming statement.
SQL_CC_LABEL_CTES = f"""{SQL_NGRAM_PAIR_CTES},
        edges AS (
            SELECT doc_a, doc_b FROM pairs
            JOIN cnt ca ON doc_a = ca.doc_id
            JOIN cnt cb ON doc_b = cb.doc_id
            WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common)
                  >= {JACCARD_T}
        ),
        bidir AS (
            SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION SELECT doc_b, doc_a FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM bidir
            UNION
            SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
        ),
        lab AS (SELECT src AS doc_id, MIN(dst) AS mn FROM reach GROUP BY src)"""

#: the label expression over documents d LEFT JOIN lab l
SQL_CC_LABEL_EXPR = "LEAST(d.doc_id, COALESCE(l.mn, d.doc_id))"


ORACLE: dict[str, str] = {
    "dup_spans": f"""
        WITH {SQL_SPAN_CTES}
        SELECT span_hash,
               COUNT(DISTINCT doc_id) AS n_docs,
               COUNT(*) AS n_occurrences,
               MIN(doc_id) AS first_doc
        FROM spans GROUP BY span_hash
        HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    "dup_span_frac": f"""
        WITH {SQL_SPAN_CTES},
        c AS (
            SELECT doc_id, span_hash,
                   COUNT(*) OVER (PARTITION BY span_hash) AS cnt
            FROM spans
        )
        SELECT doc_id,
               COUNT(*) AS n_windows,
               COUNT(*) FILTER (cnt >= 2) AS n_dup_windows,
               ROUND(COUNT(*) FILTER (cnt >= 2)::DOUBLE / COUNT(*), 6)
                   AS dup_frac,
               ROUND(COUNT(*) FILTER (cnt >= 2)::DOUBLE / COUNT(*), 6)
                   > {DUP_FRAC_T} AS drop_doc
        FROM c GROUP BY doc_id
    """,
    # positional span CTE: parallel unnest zips the window-start list
    # with the hash list (same lengths by construction)
    "excise_spans": f"""
        WITH whdoc AS (
            SELECT doc_id, {_SQL_WHS_ORDERED} AS whs,
                   string_split(text, ' ') AS w
            FROM documents
        ),
        spans AS (
            SELECT doc_id,
                   unnest(range(1, len(whs) - {SPAN_W - 2})) AS j,
                   unnest(list_transform(range(1, len(whs) - {SPAN_W - 2}),
                                         i -> {_sql_span_hash()})) AS span_hash
            FROM whdoc
        ),
        dup AS (
            SELECT doc_id, j FROM (
                SELECT doc_id, j,
                       COUNT(*) OVER (PARTITION BY span_hash) AS cnt
                FROM spans
            ) WHERE cnt >= 2
        ),
        ps AS (SELECT doc_id, list_sort(list(j)) AS js FROM dup GROUP BY doc_id)
        SELECT doc_id,
               -- array_to_string([]) is NULL in DuckDB but Spark's
               -- array_join([]) is '' — a fully-excised doc must
               -- agree on the empty string
               COALESCE(array_to_string(kept, ' '), '') AS text_clean,
               len(w)::INT AS n_tokens,
               (len(w) - len(kept))::INT AS n_removed
        FROM (
            SELECT d.doc_id, d.w,
                   [d.w[i] FOR i IN range(1, len(d.w) + 1)
                    IF len(list_filter(COALESCE(p.js, CAST([] AS BIGINT[])),
                                       j -> j <= i AND i < j + {SPAN_W})) = 0]
                       AS kept
            FROM whdoc d LEFT JOIN ps p USING (doc_id)
        ) t
    """,
    "decontaminate": f"""
        WITH {SQL_SPAN_CTES},
        ev AS (SELECT DISTINCT span_hash FROM spans
               WHERE source = '{EVAL_SOURCE}')
        SELECT doc_id,
               COUNT(*) AS n_windows,
               COUNT(*) FILTER (span_hash IN (SELECT span_hash FROM ev))
                   AS n_hits,
               ROUND(COUNT(*) FILTER (span_hash IN
                         (SELECT span_hash FROM ev))::DOUBLE / COUNT(*), 6)
                   AS contam_frac,
               COUNT(*) FILTER (span_hash IN (SELECT span_hash FROM ev)) > 0
                   AS contaminated
        FROM spans WHERE source <> '{EVAL_SOURCE}'
        GROUP BY doc_id
    """,
    "doc_novelty": f"""
        WITH {SQL_SPAN_CTES},
        firsts AS (
            SELECT span_hash, MIN(doc_id) AS first_doc
            FROM spans GROUP BY span_hash
        )
        SELECT doc_id,
               COUNT(*) AS n_windows,
               COUNT(*) FILTER (first_doc < doc_id) AS n_seen_before,
               ROUND(1 - COUNT(*) FILTER (first_doc < doc_id)::DOUBLE
                         / COUNT(*), 6) AS novelty_frac
        FROM spans JOIN firsts USING (span_hash)
        GROUP BY doc_id
    """,
    "cross_source_overlap": f"""
        WITH {SQL_NGRAM_PAIR_CTES},
        ej AS (
            SELECT doc_a, doc_b,
                   common::DOUBLE / (ca.n_sh + cb.n_sh - common) AS jaccard
            FROM pairs
            JOIN cnt ca ON doc_a = ca.doc_id
            JOIN cnt cb ON doc_b = cb.doc_id
            WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common)
                  >= {JACCARD_T}
        )
        SELECT LEAST(da.source, db.source) AS source_a,
               GREATEST(da.source, db.source) AS source_b,
               COUNT(*) AS n_pairs,
               MAX(jaccard) AS max_jaccard
        FROM ej
        JOIN documents da ON ej.doc_a = da.doc_id
        JOIN documents db ON ej.doc_b = db.doc_id
        GROUP BY 1, 2
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "dedup_minhash": _minhash_oracle(),
    "dedup_minhash_incr": _minhash_incr_oracle(),
    # the bucketed-index probe emits the same pair set as the
    # from-scratch incremental join — one oracle definition for both
    "dedup_minhash_bucketed": _minhash_incr_oracle(),
    "decontaminate_fuzzy": _decontaminate_fuzzy_oracle(),
    "simhash": _simhash_oracle(),
    "simhash_pairs": _simhash_pairs_oracle(),
    "ngram_jaccard": f"""
        WITH {SQL_NGRAM_PAIR_CTES}
        SELECT doc_a, doc_b,
               common::DOUBLE / (ca.n_sh + cb.n_sh - common) AS jaccard
        FROM pairs
        JOIN cnt ca ON doc_a = ca.doc_id
        JOIN cnt cb ON doc_b = cb.doc_id
        WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= {JACCARD_T}
    """,
    # the routed operator's oracle is the pair set of the path the
    # probe CHOOSES at this density — the driver corpora sit firmly on
    # the linear side (bound/doc 3.2 at sf0.01, 86 at sf0.1, vs the
    # 256 dial), so the twin is the exact PPJoin pair set with the
    # route literal; a routing flip would hash-mismatch loudly.  The
    # lsh branch is pinned by tests at the dense density
    # (test_pipeline_paths: routing + pair-set parity vs
    # minhash_lsh_pairs).
    "dedup_text_auto": f"""
        WITH {SQL_NGRAM_PAIR_CTES}
        SELECT doc_a, doc_b, 'ppjoin' AS route
        FROM pairs
        JOIN cnt ca ON doc_a = ca.doc_id
        JOIN cnt cb ON doc_b = cb.doc_id
        WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= {JACCARD_T}
    """,
    "dedup_cc": f"""
        WITH RECURSIVE
        {SQL_CC_LABEL_CTES}
        SELECT d.doc_id,
               {SQL_CC_LABEL_EXPR} AS label
        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    """,
    "dedup_survivors": f"""
        WITH {SQL_NGRAM_DROPPED_CTES}
        SELECT doc_id, lang, source FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    """,
    # dedup_cc's labels + a per-component rank: keeper = max distinct
    # tokens, ties to the lowest doc_id (same integer metric as the
    # Spark window)
    "dedup_keep_best": f"""
        WITH RECURSIVE
        {SQL_CC_LABEL_CTES},
        labeled AS (
            SELECT d.doc_id,
                   {SQL_CC_LABEL_EXPR} AS label,
                   len(list_distinct(string_split(d.text, ' ')))::INT
                       AS uniq_tokens
            FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
        )
        SELECT label, doc_id AS keep_id, uniq_tokens, n_members FROM (
            SELECT label, doc_id, uniq_tokens,
                   ROW_NUMBER() OVER (PARTITION BY label
                                      ORDER BY uniq_tokens DESC, doc_id ASC)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY label) AS n_members
            FROM labeled
        ) WHERE rn = 1
    """,
}

# incremental label maintenance must reproduce from-scratch CC
# exactly — one oracle definition for both
ORACLE["dedup_cc_incr"] = ORACLE["dedup_cc"]

# cluster-size histogram over dedup_cc's labels: component sizes →
# (how many components, how many docs) per size.  SUM over BIGINT is
# HUGEINT in DuckDB — cast back so the schema matches Spark's long.
ORACLE["dup_cluster_sizes"] = f"""
        WITH RECURSIVE
        {SQL_CC_LABEL_CTES},
        labeled AS (
            SELECT d.doc_id,
                   {SQL_CC_LABEL_EXPR} AS label
            FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
        ),
        sz AS (
            SELECT label, COUNT(*) AS cluster_size
            FROM labeled GROUP BY label
        )
        SELECT cluster_size,
               COUNT(*) AS n_clusters,
               SUM(cluster_size)::BIGINT AS n_docs
        FROM sz GROUP BY cluster_size
    """


def _mh_cc_lab_ctes() -> str:
    """Shared oracle CTE chain for minhash-edged connected components:
    full-corpus banded-LSH candidate pairs thresholded at
    ``MH_DUP_NM`` agreeing signature rows (same sig/band family as
    ``_minhash_oracle``) → recursive reachability → per-node reached
    minimum (``lab``).  Consumed by the stateful-pipeline and
    streaming-labels oracles."""
    rows = MH_K // MH_BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, '{b},' || {parts} AS band FROM sig".format(
            b=b,
            parts=" || ',' || ".join(f"s{b * rows + j}::VARCHAR" for j in range(rows)),
        )
        for b in range(MH_BANDS)
    )
    n_match = " + ".join(f"(x.s{i} = y.s{i})::INT" for i in range(MH_K))
    return f"""
        sig AS ({_minhash_sig_sql()}),
        bands AS ({band_selects}),
        edges AS (
            SELECT doc_a, doc_b FROM (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.doc_id < b.doc_id
            ) cand JOIN sig x ON cand.doc_a = x.doc_id
                   JOIN sig y ON cand.doc_b = y.doc_id
            WHERE ({n_match}) >= {MH_DUP_NM}
        ),
        bidir AS (
            SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION SELECT doc_b, doc_a FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM bidir
            UNION
            SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
        ),
        lab AS (SELECT src AS doc_id, MIN(dst) AS mn FROM reach GROUP BY src)
    """


def mh_cc_labels_oracle() -> str:
    """From-scratch minhash-edged component labels over the full
    corpus — the oracle of any incremental/streaming label-state
    maintainer (the state must equal this after every batch)."""
    return f"""
        WITH RECURSIVE {_mh_cc_lab_ctes()}
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS label
        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    """


def _pipeline_incr_stateful_oracle() -> str:
    """From-scratch twin of the stateful ingest cycle: the shared
    minhash-CC label CTEs, then the ``dedup_keep_best`` richness rank
    restricted to components containing a batch doc."""
    return f"""
        WITH RECURSIVE {_mh_cc_lab_ctes()},
        labeled AS (
            SELECT d.doc_id,
                   LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS label,
                   len(list_distinct(string_split(d.text, ' ')))::INT
                       AS uniq_tokens
            FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
        ),
        touched AS (
            SELECT label FROM labeled
            GROUP BY label HAVING bool_or(doc_id % {INCR_MOD} = 0)
        )
        SELECT label, doc_id AS keep_id, uniq_tokens, n_members FROM (
            SELECT label, doc_id, uniq_tokens,
                   ROW_NUMBER() OVER (PARTITION BY label
                                      ORDER BY uniq_tokens DESC, doc_id ASC)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY label) AS n_members
            FROM labeled
            WHERE label IN (SELECT label FROM touched)
        ) WHERE rn = 1
    """


ORACLE["pipeline_incr_stateful"] = _pipeline_incr_stateful_oracle()


def _split_by_cluster_oracle() -> str:
    """dedup_cc's from-scratch label CTEs + pack.py's holdout hash
    applied to the LABEL — constants imported from pack so the two
    splitters can never desynchronize."""
    from .pack import MIX_MOD, SPLIT_A, SPLIT_B, SPLIT_TRAIN

    return f"""
        WITH RECURSIVE
        {SQL_CC_LABEL_CTES}
        SELECT d.doc_id,
               {SQL_CC_LABEL_EXPR} AS cluster_id,
               CASE WHEN ({SQL_CC_LABEL_EXPR} % {MIX_MOD} * {SPLIT_A}
                          + {SPLIT_B})
                         % {MIX_MOD} < {int(SPLIT_TRAIN * MIX_MOD)}
                    THEN 'train' ELSE 'test' END AS split
        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
    """


ORACLE["split_by_cluster"] = _split_by_cluster_oracle()
