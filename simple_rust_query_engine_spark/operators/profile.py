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

    The raw estimates cannot hash-match a DuckDB twin (the engines
    implement different HLL sketches), so the DRIVER entry is
    ``profile_table_approx_checked`` below, which replaces the raw
    estimate with a deterministic validity band; this raw variant is
    pinned against exact counts in
    ``tests/test_session_helpers.py::test_profile_approx_within_tolerance``."""

    def nd(c: str) -> Column:
        return F.approx_count_distinct(c, rsd)

    return _profile(df, num_cols, str_cols, nd)


def _exact_ndistinct_long(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Exact per-column ndistinct WITHOUT Expand: melt the profiled
    columns long with ``stack`` (a Generate, map-side — never the
    Expand that exact multi-column countDistinct plans through), then
    the two-phase dedup-then-count shape from
    ``operators.skew.two_phase_ndistinct``: shuffle 1 groups on the
    uniform (col_name, value) pair with map-side combine, shuffle 2
    counts surviving pairs per column.  CAST to string is the common
    melt type; distinct values stay distinct through it."""
    parts = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    longf = df.select(F.expr(f"stack({len(cols)}, {parts}) AS (col_name, _v)"))
    return (
        longf.groupBy("col_name", "_v")
        .agg(F.lit(1))
        .groupBy("col_name")
        .agg(F.count("_v").alias("_exact_nd"))
    )


def profile_table_approx_checked(
    df: DataFrame,
    num_cols: tuple[str, ...] = PROFILE_NUM_COLS,
    str_cols: tuple[str, ...] = PROFILE_STR_COLS,
    rsd: float = 0.02,
) -> DataFrame:
    """Driver-verifiable form of the HLL profile: the raw estimate
    column is replaced by ``nd_rel_err_band`` — 0 when the HLL
    estimate lands within 3·rsd of the exact distinct count, 1
    otherwise.  HLL++ register merge is max-based and therefore
    order-independent, so the band is deterministic for fixed data
    and rsd, and the DuckDB oracle twin emits the same constant 0
    from its exact counts — a real cross-engine hash gate on the
    estimator's accuracy contract, not on sketch internals.

    The exact side uses the no-Expand two-phase melt
    (``_exact_ndistinct_long``), so the whole query still plans
    without Expand (pinned in
    ``tests/test_plans.py::test_profile_approx_has_no_expand``); the
    4-row exact table is broadcast into the 4-row profile."""
    approx = profile_table_approx(df, num_cols, str_cols, rsd)
    exact = _exact_ndistinct_long(df, (*num_cols, *str_cols))
    band = (
        F.when(
            F.abs(F.col("n_distinct") - F.col("_exact_nd"))
            <= F.lit(3.0 * rsd) * F.col("_exact_nd"),
            0,
        )
        .otherwise(1)
        .cast("int")
    )
    return approx.join(F.broadcast(exact), "col_name").select(
        "col_name",
        "n_nulls",
        band.alias("nd_rel_err_band"),
        "min_val",
        "max_val",
        "min_str",
        "max_str",
    )


def q_profile_table_approx(t: dict) -> DataFrame:
    return profile_table_approx_checked(t["orders"])


def _oracle_profile(nd_expr_fmt: str, nd_alias: str) -> str:
    """Shared oracle builder: ``nd_expr_fmt`` supplies the distinct-
    count column per profiled column ``{c}`` — the exact count for
    ``profile_table``, the constant-0 validity band for the checked
    HLL variant (exact counts are trivially within their own band)."""
    rows = []
    for c in PROFILE_NUM_COLS:
        rows.append(
            f"SELECT '{c}' AS col_name, COUNT(*) - COUNT({c}) AS n_nulls, "
            f"{nd_expr_fmt.format(c=c)} AS {nd_alias}, "
            f"MIN({c})::DOUBLE AS min_val, MAX({c})::DOUBLE AS max_val, "
            f"CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str "
            f"FROM orders"
        )
    for c in PROFILE_STR_COLS:
        rows.append(
            f"SELECT '{c}', COUNT(*) - COUNT({c}), {nd_expr_fmt.format(c=c)}, "
            f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), MIN({c}), MAX({c}) "
            f"FROM orders"
        )
    return " UNION ALL ".join(rows)


ORACLE: dict[str, str] = {
    "profile_table": _oracle_profile("COUNT(DISTINCT {c})", "n_distinct"),
    "profile_table_approx": _oracle_profile("0::INTEGER", "nd_rel_err_band"),
}

QUERIES = {
    "profile_table": q_profile_table,
    "profile_table_approx": q_profile_table_approx,
}
