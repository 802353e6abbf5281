"""Single-pass table profiling — the data-quality health check every
ingest pipeline runs before trusting a new batch (null rates, key
cardinalities, value ranges per column).

Beyond-parity: the reference has no statistics surface at all (no
ANALYZE, no column stats — SURVEY §6 lists CBO/statistics as absent).
Spark-first shape: ONE scan.  All per-column aggregates go into a
single ``agg`` — then the wide one-row result is reshaped long with
``stack`` (map-only on one row).

Scale: the ndistinct aggregate is the dial.  Exact ``countDistinct``
plans through an Expand that multiplies the shuffled rows by the
number of distinct-profiled columns; ``profile_table_approx`` swaps
in ``approx_count_distinct`` (HyperLogLog++), whose sketches are
map-side mergeable fixed-size state — no Expand, the shuffle carries
one sketch per column per partition no matter the table size.
min/max/counts partial-aggregate map-side in both variants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: columns profiled by the driver entry: two id columns, a measure,
#: and a low-cardinality string — the four shapes that matter
PROFILE_NUM_COLS = ("o_orderkey", "o_custkey", "o_totalprice")
PROFILE_STR_COLS = ("o_orderpriority",)


def _profile(
    df: DataFrame,
    num_cols: tuple[str, ...],
    str_cols: tuple[str, ...],
    nd_agg,
) -> DataFrame:
    """Shared profile kernel; ``nd_agg(col_name) -> Column`` supplies
    the ndistinct aggregate (exact or HLL)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in (*num_cols, *str_cols):
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            nd_agg(c).alias(f"_nd_{c}"),
        ]
    for c in num_cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
        ]
    for c in str_cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    wide = df.agg(*aggs)

    stack_parts = []
    for c in num_cols:
        stack_parts.append(
            f"'{c}', _n - _nn_{c}, _nd_{c}, _min_{c}, _max_{c}, "
            f"CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in str_cols:
        stack_parts.append(
            f"'{c}', _n - _nn_{c}, _nd_{c}, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE), _min_{c}, _max_{c}"
        )
    n = len(stack_parts)
    return wide.select(
        F.expr(
            f"stack({n}, {', '.join(stack_parts)}) AS "
            "(col_name, n_nulls, n_distinct, min_val, max_val, min_str, max_str)"
        )
    )


def profile_table(
    df: DataFrame,
    num_cols: tuple[str, ...] = PROFILE_NUM_COLS,
    str_cols: tuple[str, ...] = PROFILE_STR_COLS,
) -> DataFrame:
    """One row per profiled column: nulls, exact distinct count, and
    min/max (numeric columns in ``min_val``/``max_val``, string
    columns in ``min_str``/``max_str`` — min/max are raw data values,
    no arithmetic, so they hash-match any engine bit-for-bit).

    Exact COUNT(DISTINCT x, y, z, w) in one pass needs per-column
    dedup sets, so Catalyst Expands the scan output — one copy of
    every row per distinct-profiled column (×4 shuffled rows here).
    Right when the counts must be exact; at 100 TB prefer
    ``profile_table_approx``."""
    return _profile(df, num_cols, str_cols, F.countDistinct)


def q_profile_table(t: dict) -> DataFrame:
    return profile_table(t["orders"])


def profile_table_approx(
    df: DataFrame,
    num_cols: tuple[str, ...] = PROFILE_NUM_COLS,
    str_cols: tuple[str, ...] = PROFILE_STR_COLS,
    rsd: float = 0.02,
) -> DataFrame:
    """The 100 TB profile dial: identical output shape to
    ``profile_table`` but ndistinct via ``approx_count_distinct``
    (HyperLogLog++, relative standard deviation ``rsd``).  HLL
    sketches are map-side mergeable fixed-size state, so the Expand
    disappears entirely (pinned in
    ``tests/test_plans.py::test_profile_approx_has_no_expand``) and
    the shuffle carries one sketch per column per partition instead
    of ×4 copies of the table.

    No DuckDB oracle twin: both engines implement HLL but not the
    same sketch, so estimates agree only within tolerance — the
    driver records the rows-only check, and
    ``tests/test_session_helpers.py::test_profile_approx_within_tolerance``
    pins estimates against the exact counts."""

    def nd(c: str) -> Column:
        return F.approx_count_distinct(c, rsd)

    return _profile(df, num_cols, str_cols, nd)


def q_profile_table_approx(t: dict) -> DataFrame:
    return profile_table_approx(t["orders"])


def _oracle_profile() -> str:
    rows = []
    for c in PROFILE_NUM_COLS:
        rows.append(
            f"SELECT '{c}' AS col_name, COUNT(*) - COUNT({c}) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"MIN({c})::DOUBLE AS min_val, MAX({c})::DOUBLE AS max_val, "
            f"CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str "
            f"FROM orders"
        )
    for c in PROFILE_STR_COLS:
        rows.append(
            f"SELECT '{c}', COUNT(*) - COUNT({c}), COUNT(DISTINCT {c}), "
            f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), MIN({c}), MAX({c}) "
            f"FROM orders"
        )
    return " UNION ALL ".join(rows)


#: profile_table_approx has NO oracle twin (HLL estimates differ
#: across engines) — the driver records the rows-only check for it
ORACLE: dict[str, str] = {"profile_table": _oracle_profile()}

QUERIES = {
    "profile_table": q_profile_table,
    "profile_table_approx": q_profile_table_approx,
}
