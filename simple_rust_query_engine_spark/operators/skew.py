"""Skew-safe aggregation shapes for heavy-key groupBys.

The reference aggregates in one single-threaded hash table
(``/root/reference/src/plan/physical/aggregate/``), so key skew is
invisible there.  On a cluster, a groupBy key whose heaviest group
holds a large fraction of all rows turns into one straggler reducer.
Spark's partial aggregation already dissolves skew for algebraic
aggregates (COUNT/SUM/MIN/MAX combine map-side), and AQE splits
skewed JOIN partitions — but two common shapes still funnel every row
of a hot key through one task, and these operators re-shape them:

* holistic aggregates (``collect_list`` and friends): partial
  collection does not shrink the data, so the hot key's entire
  payload lands on one reducer.  ``salted_collect`` inserts a salt
  derived from the value column, aggregates (key, salt) first —
  spreading a hot key over ``n_salt`` reducers — then merges the
  ``n_salt`` partial arrays per key in a second, small aggregation.
* per-key DISTINCT (exact): per-key set state again concentrates on
  the hot key's reducer.  ``two_phase_ndistinct`` shuffles on the
  *pair* (key, value) — cardinality-reducing and uniformly
  distributed — then counts pre-deduped rows per key.

Both return exactly what the naive single-shuffle form returns (the
DuckDB oracles ARE the naive forms); only the physical distribution
differs.  The salt count trades a second tiny shuffle for an
``n_salt``-way spread of the hottest key; 32 matches local cores and
is a per-call knob at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALT = 32


def salted_collect(
    df: DataFrame, key: str, val: str, n_salt: int = N_SALT
) -> DataFrame:
    """groupBy(key) → sorted array of ``val`` + row count, with the
    holistic collect spread over ``n_salt`` reducers per key.

    The salt is ``hash(val) % n_salt`` — works for ANY value type
    (``val % n_salt`` would implicitly cast strings to double, turn
    non-numeric values into NULL, and silently funnel the whole hot
    key back onto one reducer).  The salt never reaches the output,
    so the result is salt-independent.  Stage 1 collects per (key,
    salt); stage 2 merges the ≤ ``n_salt`` partial arrays per key —
    the second shuffle carries one row per (key, salt), not per input
    row.  The final ``array_sort`` restores the canonical order a
    single-reducer collect would need anyway to be deterministic.

    Output-size honesty: the roster string is O(group size) BY
    CONTRACT — salting spreads the *shuffle and collection work*
    across ``n_salt`` reducers, but the merged output row for a hot
    key is still as wide as the group.  If the consumer doesn't need
    the full roster, aggregate to a bounded summary (count / sketch /
    top-k) instead of collecting."""
    part = (
        df.groupBy(key, F.pmod(F.hash(F.col(val)), F.lit(n_salt)).alias("_salt"))
        .agg(F.collect_list(val).alias("_part"), F.count(F.lit(1)).alias("_pc"))
    )
    # the roster ships as a comma-joined STRING, not a raw array: sort
    # happens first in the value's native type (numeric order for
    # numeric vals), then stringify — and a flat string column survives
    # any downstream canonicalization/hashing that arrays break
    merged = F.array_sort(F.flatten(F.collect_list("_part")))
    return part.groupBy(key).agg(
        F.array_join(F.transform(merged, lambda x: x.cast("string")), ",").alias(
            f"{val}s"
        ),
        F.sum("_pc").alias("n_rows"),
    )


def two_phase_ndistinct(df: DataFrame, key: str, val: str) -> DataFrame:
    """Exact per-key COUNT(DISTINCT val) as dedup-then-count: shuffle 1
    groups on the (key, val) pair (uniform, map-side combinable),
    shuffle 2 counts the surviving pairs per key — one row per
    distinct pair crosses it, never per-key set state.  Phase 2
    counts the VAL column (``count(val)`` skips NULL), so a NULL
    group survives phase 1 to keep its key in the output but is not
    counted as a value — exactly COUNT(DISTINCT) semantics, including
    ``0`` for a key whose values are all NULL."""
    return (
        df.groupBy(key, val)
        .agg(F.lit(1))
        .groupBy(key)
        .agg(F.count(F.col(val)).alias("n_distinct"))
    )


# ------------------------------------------------------------ driver
def q_skew_safe_collect(t: dict) -> DataFrame:
    """Per-language sorted doc_id roster — ``lang`` is the driver
    corpus's skewed key (a handful of values over every doc)."""
    return salted_collect(t["documents"], "lang", "doc_id")


def q_skew_safe_ndistinct(t: dict) -> DataFrame:
    """Exact distinct sources per language, two-phase."""
    return two_phase_ndistinct(t["documents"], "lang", "source")


ORACLE: dict[str, str] = {
    # the oracles are the NAIVE single-shuffle forms — identical
    # results, different physical plan
    "skew_safe_collect": """
        SELECT lang, array_to_string(list_sort(list(doc_id)), ',') AS doc_ids,
               COUNT(*) AS n_rows
        FROM documents GROUP BY lang
    """,
    "skew_safe_ndistinct": """
        SELECT lang, COUNT(DISTINCT source) AS n_distinct
        FROM documents GROUP BY lang
    """,
}

QUERIES = {
    "skew_safe_collect": q_skew_safe_collect,
    "skew_safe_ndistinct": q_skew_safe_ndistinct,
}
