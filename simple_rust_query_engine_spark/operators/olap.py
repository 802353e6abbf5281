"""OLAP aggregation surfaces beyond the reference's five plain
aggregates: grouping sets (ROLLUP / CUBE), PIVOT, and exact
distributional statistics (percentiles).

The reference's aggregate surface is exactly COUNT/SUM/AVG/MIN/MAX
with a single flat GROUP BY (``/root/reference/src/expression/logical/
aggregate.rs:12-24``; no grouping sets anywhere in the plan enum,
``src/plan/logical/plan.rs:12-44``).  These are the standard report
shapes a warehouse adds on top, all Catalyst built-ins:

* ROLLUP/CUBE expand to grouping sets in ONE pass over the data —
  Spark's ``Expand`` node replicates each input row per grouping set
  before one hash aggregate, so partial (map-side) aggregation still
  applies; no per-level rescan.
* PIVOT with an explicit value list compiles to one groupBy with a
  conditional aggregate per value — no shuffle per pivot column, and
  no extra driver job to discover values (ALWAYS pass the list at
  scale; the discovery path is a distinct + collect over 100 TB).
* ``percentile`` is Spark's exact single-pass implementation, kept
  as the interpolating ``quantile_cont`` oracle twin;
  ``quantile_approx`` is the 100 TB scale path (Greenwald-Khanna
  sketch: mergeable, bounded memory, map-side combinable) — see
  ``q_quantile_approx`` for why it still hash-matches a
  ``quantile_disc`` oracle in the accuracy ≥ N regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def q_agg_rollup(t: dict) -> DataFrame:
    """Quantity totals at (flag, status), per-flag subtotal, and grand
    total in one pass; ``gid`` disambiguates subtotal NULLs from data
    NULLs (bitmask, leftmost grouping column = MSB — same convention
    as standard-SQL GROUPING())."""
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().alias("gid"),
        )
    )


def q_agg_cube(t: dict) -> DataFrame:
    """All four grouping sets of (returnflag, linestatus)."""
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.grouping_id().alias("gid"),
        )
    )


PIVOT_STATUSES = ("F", "O", "P")


def q_agg_grouping_sets(t: dict) -> DataFrame:
    """Arbitrary GROUPING SETS — subtotals by each dimension
    INDEPENDENTLY ((flag), (status)), a shape neither rollup nor cube
    expresses (no pair level, no grand total).  Spark plans one Expand
    + one aggregation, the same single-pass strategy as rollup."""
    return (
        t["lineitem"]
        .groupingSets(
            [["l_returnflag"], ["l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().alias("gid"),
        )
    )


def q_pivot(t: dict) -> DataFrame:
    """Order totals by priority, one column per order status.

    The status list is explicit — at scale the implicit form runs a
    distinct+collect job over the full table just to name columns."""
    piv = (
        t["orders"]
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(PIVOT_STATUSES))
        .agg(F.sum("o_totalprice"))
    )
    for s in PIVOT_STATUSES:
        piv = piv.withColumnRenamed(s, f"total_{s.lower()}")
    return piv


def q_unpivot(t: dict) -> DataFrame:
    """Wide→long reshaping (melt): the four lineitem measures become
    (metric, value) rows, then a per-metric average.  ``unpivot`` is
    a map-side Expand — no shuffle until the aggregation, same as the
    grouping-set family."""
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    return (
        t["lineitem"]
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=measures,
            variableColumnName="metric",
            valueColumnName="value",
        )
        # pin NULL semantics: Spark's unpivot RETAINS NULL-value rows,
        # DuckDB's UNPIVOT excludes them by default — drop them so n
        # counts the same rows in both engines
        .where(F.col("value").isNotNull())
        .groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def q_quantile(t: dict) -> DataFrame:
    """Exact price quartiles per return flag (linear interpolation —
    the ANSI ``PERCENTILE_CONT`` definition on both engines)."""
    price = F.col("l_extendedprice")
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.percentile(price, F.lit(0.25)).alias("p25"),
        F.percentile(price, F.lit(0.5)).alias("p50"),
        F.percentile(price, F.lit(0.75)).alias("p75"),
    )


#: accuracy for the driver/oracle form of quantile_approx.  GK is
#: EXACT whenever accuracy >= the per-group row count (rank error
#: < 1 row), which holds through sf0.1 (~200k rows/group); at real
#: scale dial down to ~1e4 for bounded memory (see docstring).
QUANTILE_APPROX_ACCURACY = 1_000_000


def q_quantile_approx(t: dict) -> DataFrame:
    """Price quartiles per return flag via ``percentile_approx`` —
    the 100 TB scale path for ``q_quantile``.

    Why a second variant: ``percentile`` (exact, interpolating) is
    HOLISTIC — every row of a group funnels into one reducer's sort,
    and grouped on a 3-value key that is the classic low-cardinality
    straggler at scale.  ``percentile_approx`` is a Greenwald-Khanna
    sketch: mergeable, so map-side partial aggregation applies and
    each reducer receives one ~``O(accuracy·log(N/accuracy))`` sketch
    per upstream partition instead of N/3 raw rows.  The crossover:
    use exact percentile only when per-group rows comfortably fit one
    task; approx everywhere else.

    Oracle story (why this can still be hash-exact): GK guarantees
    rank error ≤ N/accuracy, so with accuracy ≥ per-group N the error
    is < 1 row and the sketch returns EXACTLY the order statistic "the
    smallest value with ≥ p·N values ≤ it" — which is DuckDB's
    ``quantile_disc``.  Verified element-for-element on lineitem at
    sf0.01/sf0.1 and on tie-heavy toy sets.  At production accuracy
    (1e4) the result is approximate with that bounded rank error and
    the oracle would become a tolerance check; the driver form pins
    the exact regime.
    """
    price = F.col("l_extendedprice")
    qs = F.percentile_approx(
        price,
        F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
        F.lit(QUANTILE_APPROX_ACCURACY),
    )
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(qs.alias("_q"))
        .select(
            "l_returnflag",
            F.col("_q")[0].alias("p25"),
            F.col("_q")[1].alias("p50"),
            F.col("_q")[2].alias("p75"),
        )
    )


ORACLE: dict[str, str] = {
    "agg_rollup": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n_rows,
               GROUPING(l_returnflag, l_linestatus) AS gid
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg_cube": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               avg(l_extendedprice) AS avg_price,
               GROUPING(l_returnflag, l_linestatus) AS gid
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "agg_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n_rows,
               GROUPING(l_returnflag, l_linestatus) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    "pivot": """
        SELECT o_orderpriority,
               sum(o_totalprice) FILTER (o_orderstatus = 'F') AS total_f,
               sum(o_totalprice) FILTER (o_orderstatus = 'O') AS total_o,
               sum(o_totalprice) FILTER (o_orderstatus = 'P') AS total_p
        FROM orders GROUP BY o_orderpriority
    """,
    "unpivot": """
        WITH long AS (
            SELECT l_orderkey, l_linenumber, name AS metric, value
            FROM (
                UNPIVOT lineitem
                ON l_quantity, l_extendedprice, l_discount, l_tax
                INTO NAME name VALUE value
            )
        )
        SELECT metric, COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_value
        FROM long GROUP BY metric
    """,
    "quantile": """
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.25) AS p25,
               quantile_cont(l_extendedprice, 0.50) AS p50,
               quantile_cont(l_extendedprice, 0.75) AS p75
        FROM lineitem GROUP BY l_returnflag
    """,
    # quantile_disc, not quantile_cont: percentile_approx returns an
    # actual element (no interpolation), and in the accuracy>=N exact
    # regime its rank convention equals DuckDB's discrete quantile
    "quantile_approx": """
        SELECT l_returnflag,
               quantile_disc(l_extendedprice, 0.25) AS p25,
               quantile_disc(l_extendedprice, 0.50) AS p50,
               quantile_disc(l_extendedprice, 0.75) AS p75
        FROM lineitem GROUP BY l_returnflag
    """,
}

QUERIES = {
    "agg_rollup": q_agg_rollup,
    "agg_cube": q_agg_cube,
    "agg_grouping_sets": q_agg_grouping_sets,
    "pivot": q_pivot,
    "unpivot": q_unpivot,
    "quantile": q_quantile,
    "quantile_approx": q_quantile_approx,
}
