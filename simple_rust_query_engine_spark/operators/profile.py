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

    r13 restructure (guide §2.3/§2.4): exact COUNT(DISTINCT x, y, z,
    w) in ONE aggregate made Catalyst Expand the scan output — one
    copy of every row per distinct-profiled column (×5 shuffled rows)
    — and the string min/max in the same aggregate forced the whole
    chain to SORT-based aggregation, so the expanded rows were sorted
    TWICE on a 5-part key before and after the exchange (measured
    2.9 s steady at sf0.1 for a 150k-row table).  Now two cheap scans
    replace the Expand: a keyless global aggregate for nulls/min/max
    (no Sort — global SortAggregate has no keys to sort by) and the
    no-Expand two-phase melt ``_exact_ndistinct_long`` for the exact
    distinct counts (all HashAggregate, map-side combined, the
    exchange carries one row per DISTINCT value instead of ×5 copies
    of the table — the same shape the approx-checked variant already
    trusts for its validity band).  At 100 TB the trade is a second
    columnar scan for shuffling ~distinct-values once instead of 5×
    the corpus through two sorts.  Output identical (exact counts,
    same columns)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in (*num_cols, *str_cols):
        aggs.append(F.count(c).alias(f"_nn_{c}"))
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
            f"'{c}', _n - _nn_{c}, _min_{c}, _max_{c}, "
            f"CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in str_cols:
        stack_parts.append(
            f"'{c}', _n - _nn_{c}, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE), _min_{c}, _max_{c}"
        )
    n = len(stack_parts)
    basics = wide.select(
        F.expr(
            f"stack({n}, {', '.join(stack_parts)}) AS "
            "(col_name, n_nulls, min_val, max_val, min_str, max_str)"
        )
    )
    exact = _exact_ndistinct_long(df, (*num_cols, *str_cols))
    return basics.join(F.broadcast(exact), "col_name").select(
        "col_name",
        "n_nulls",
        F.col("_exact_nd").alias("n_distinct"),
        "min_val",
        "max_val",
        "min_str",
        "max_str",
    )


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


def q_stats_moments(t: dict) -> DataFrame:
    """Grouped variance / stddev / correlation via EXACT integer
    sufficient statistics — the distributed-moments pattern: one scan
    accumulates (n, Σx, Σx², Σy, Σy², Σxy) per group with map-side
    partials, and every derived statistic is computed from those six
    numbers at the end.

    Why not ``F.var_samp``/``F.corr`` directly: their internal
    accumulation is floating-point and partial-merge-ORDER-dependent —
    the result drifts in the last bits across partition layouts and
    engines, failing the driver's exact value hash.  Here the inputs
    are re-based to integers first (quantity is integral; price → cents
    via the same IEEE ``ROUND(x*100)`` both engines evaluate
    identically), the sums accumulate EXACTLY (decimal(38,0) in Spark,
    HUGEINT-backed decimal in DuckDB — per-row cents² ~5e13 fits int64,
    the 38-digit accumulator absorbs any corpus size), and the final
    double arithmetic runs ONCE per group on identical exact operands
    — deterministic to the bit, rounded to 6 dp.

    Scale: identical shuffle shape to tpch_q1 — low-cardinality group
    key is safe because partial aggregation reduces each map task to
    ≤|groups| rows of fixed-width state before the exchange."""
    li = t["lineitem"]
    dec = "decimal(38,0)"
    q = F.col("l_quantity").cast("long").cast(dec)
    c = F.round(F.col("l_extendedprice") * 100).cast("long").cast(dec)
    g = (
        li.select(F.col("l_returnflag"), q.alias("q"), c.alias("c"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("sq"),
            F.sum(F.col("q") * F.col("q")).alias("sqq"),
            F.sum("c").alias("sc"),
            F.sum(F.col("c") * F.col("c")).alias("scc"),
            F.sum(F.col("q") * F.col("c")).alias("sqc"),
        )
    )
    n = F.col("n").cast("double")
    sq = F.col("sq").cast("double")
    sqq = F.col("sqq").cast("double")
    sc = F.col("sc").cast("double")
    scc = F.col("scc").cast("double")
    sqc = F.col("sqc").cast("double")
    # greatest(..., 0): the exact sums make n·Σx²−(Σx)² ≥ 0
    # mathematically, but the double subtraction can land an ulp below
    # zero for near-constant groups — identically in both engines, yet
    # sqrt(-ε) would be NaN; clamp on both sides
    var_q = (sqq - sq * sq / n) / (n - F.lit(1.0))
    ssq = F.greatest(n * sqq - sq * sq, F.lit(0.0))
    ssc = F.greatest(n * scc - sc * sc, F.lit(0.0))
    corr_den = F.sqrt(ssq) * F.sqrt(ssc)
    return g.select(
        "l_returnflag",
        "n",
        F.round(sq / n, 6).alias("mean_qty"),
        F.when(F.col("n") > 1, F.round(var_q, 6)).alias("var_qty"),
        F.when(
            F.col("n") > 1, F.round(F.sqrt(F.greatest(var_q, F.lit(0.0))), 6)
        ).alias("std_qty"),
        F.round(sc / n / F.lit(100.0), 6).alias("mean_price"),
        F.when(
            corr_den > 0, F.round((n * sqc - sq * sc) / corr_den, 6)
        ).alias("corr_qty_price"),
    )


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
    # the moments twin mirrors the Spark expression step for step:
    # integer re-base, exact DECIMAL(38,0) sums, then ONE double
    # formula per group on identical operands (same clamp, same
    # rounding) — SUM(BIGINT) in DuckDB is HUGEINT; the explicit
    # DECIMAL cast keeps the -> DOUBLE conversion path identical
    "stats_moments": """
        WITH base AS (
            SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS q,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
            FROM lineitem
        ),
        g AS (
            SELECT l_returnflag, COUNT(*) AS n,
                   SUM(q)::DECIMAL(38,0) AS sq,
                   SUM(q * q)::DECIMAL(38,0) AS sqq,
                   SUM(c)::DECIMAL(38,0) AS sc,
                   SUM(c * c)::DECIMAL(38,0) AS scc,
                   SUM(q * c)::DECIMAL(38,0) AS sqc
            FROM base GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               ROUND(sq::DOUBLE / n, 6) AS mean_qty,
               CASE WHEN n > 1 THEN ROUND(
                   (sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE / n) / (n - 1.0), 6)
               END AS var_qty,
               CASE WHEN n > 1 THEN ROUND(SQRT(GREATEST(
                   (sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE / n) / (n - 1.0),
                   0.0)), 6)
               END AS std_qty,
               ROUND(sc::DOUBLE / n / 100.0, 6) AS mean_price,
               CASE WHEN SQRT(GREATEST(n * sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE, 0.0))
                       * SQRT(GREATEST(n * scc::DOUBLE - sc::DOUBLE * sc::DOUBLE, 0.0)) > 0
                    THEN ROUND(
                        (n * sqc::DOUBLE - sq::DOUBLE * sc::DOUBLE)
                        / (SQRT(GREATEST(n * sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE, 0.0))
                           * SQRT(GREATEST(n * scc::DOUBLE - sc::DOUBLE * sc::DOUBLE, 0.0))),
                        6)
               END AS corr_qty_price
        FROM g
    """,
}

QUERIES = {
    "profile_table": q_profile_table,
    "profile_table_approx": q_profile_table_approx,
    "stats_moments": q_stats_moments,
}
