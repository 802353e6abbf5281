"""Single-pass table profiling — the data-quality health check every
ingest pipeline runs before trusting a new batch (null rates, key
cardinalities, value ranges per column).

Beyond-parity: the reference has no statistics surface at all (no
ANALYZE, no column stats — SURVEY §6 lists CBO/statistics as absent).
Spark-first shape: ONE scan.  All per-column aggregates go into a
single ``agg`` — Catalyst plans the multiple exact COUNT(DISTINCT)s
through one Expand + two-phase aggregation, so the table is read once
no matter how many columns are profiled — then the wide one-row
result is reshaped long with ``stack`` (map-only on one row).

Scale: exact ndistinct via Expand multiplies the shuffled rows by the
number of distinct-profiled columns; at 100 TB swap
``countDistinct`` for ``approx_count_distinct`` (HLL, map-side
mergeable, one pass, ~2% error) — the structure of the query does not
change.  min/max/counts partial-aggregate map-side as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: columns profiled by the driver entry: two id columns, a measure,
#: and a low-cardinality string — the four shapes that matter
PROFILE_NUM_COLS = ("o_orderkey", "o_custkey", "o_totalprice")
PROFILE_STR_COLS = ("o_orderpriority",)


def profile_table(
    df: DataFrame,
    num_cols: tuple[str, ...] = PROFILE_NUM_COLS,
    str_cols: tuple[str, ...] = PROFILE_STR_COLS,
) -> DataFrame:
    """One row per profiled column: nulls, exact distinct count, and
    min/max (numeric columns in ``min_val``/``max_val``, string
    columns in ``min_str``/``max_str`` — min/max are raw data values,
    no arithmetic, so they hash-match any engine bit-for-bit)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in (*num_cols, *str_cols):
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
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


def q_profile_table(t: dict) -> DataFrame:
    return profile_table(t["orders"])


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


ORACLE: dict[str, str] = {"profile_table": _oracle_profile()}

QUERIES = {"profile_table": q_profile_table}
