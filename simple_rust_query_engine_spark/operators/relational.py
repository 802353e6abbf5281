"""Relational operator query library — the SURVEY.md §2 parity surface.

Each ``q_*`` function takes the loaded driver tables (dict of
DataFrames, see ``session.load_tables``) and returns a lazy DataFrame.
``ORACLE`` holds the DuckDB ANSI-SQL twin for each query, with every
computed column aliased identically on both sides (driver hash
requirement).

Reference mapping (file:line cites into /root/reference):
    scan/projection   src/plan/logical/projection.rs:12-40
    filter            src/plan/logical/filter.rs:15-43
    limit skip+fetch  src/plan/physical/limit.rs:15-185
    aggregate         src/plan/physical/aggregate/*  (COUNT SUM AVG MIN MAX)
    distinct          src/plan/logical/distinct.rs:7-37
    sort              src/plan/physical/sorts/sort.rs:23-200
    hash join         src/plan/physical/joins/hash_join.rs:268-434
    nested-loop join  src/plan/physical/joins/nested_loop_join.rs:89-150
    coercion          src/expression/coercion.rs:33-176

Scale notes: every query is declarative — Catalyst pushes filters and
projections into the parquet scan, picks broadcast vs shuffle joins by
size (the reference always materializes the left side in memory,
hash_join.rs:326-361 — unusable at 100 TB), and AQE re-plans at
runtime.  Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Tables = dict  # name -> DataFrame


# ----------------------------------------------------------------- scan
def q_scan_projection(t: Tables) -> DataFrame:
    """Projection pruning: scan must read only 3 of 11 lineitem columns
    (reference ProjectionPushDownRule, projection_pushdown.rs:17-267 —
    free via Catalyst ColumnPruning + parquet ReadSchema)."""
    return t["lineitem"].select("l_orderkey", "l_linenumber", "l_extendedprice")


def q_filter_predicate(t: Tables) -> DataFrame:
    """Compound predicate with Kleene AND/OR + arithmetic, pushed to the
    parquet scan (reference FilterExec + PredicatePushDownRule)."""
    li = t["lineitem"]
    # raw product, deliberately NOT rounded: price*(1+tax) is an exact
    # 4-decimal value, so ~1% of rows sit exactly on a .xx5 rounding
    # boundary where Spark (shortest-decimal-repr HALF_UP) and other
    # engines (binary-float scaling) disagree — per-row ROUND over such
    # data is a systematic cross-engine mismatch, while the raw IEEE
    # product is bit-identical everywhere
    charge = F.col("l_extendedprice") * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(
            ((F.col("l_quantity") > 45.0) & (F.col("l_discount") < 0.02))
            | (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 49.0)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_returnflag",
            charge.alias("charge"),
        )
    )


def q_limit_skip(t: Tables) -> DataFrame:
    """skip+fetch — reference LimitExec(skip, fetch) (limit.rs:15-185);
    Spark offset()+limit(). Deterministic via unique sort key."""
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


def q_topk(t: Tables) -> DataFrame:
    """ORDER BY + LIMIT → Spark rewrites to TakeOrderedAndProject
    (reference composes SortExec + LimitExec, dataframe.rs:216-234)."""
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ------------------------------------------------------------ aggregate
def q_agg_global(t: Tables) -> DataFrame:
    """Global (no-group) aggregation — all 5 reference aggregate fns
    (AggregateStream, no_groups.rs:19-130). l_quantity holds integral
    values so SUM/AVG are exact in double → oracle-hash-stable."""
    li = t["lineitem"]
    return li.agg(
        F.count(F.lit(1)).alias("cnt_all"),
        F.count("l_quantity").alias("cnt_qty"),
        F.sum("l_quantity").alias("sum_qty"),
        F.avg("l_quantity").alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def q_agg_grouped(t: Tables) -> DataFrame:
    """Grouped hash aggregation (GroupedHashAggregateStream,
    row_hash.rs:21-154). Spark: partial (map-side) + final agg with
    codegen — the shuffle moves only one row per (flag,status) group
    per partition, not 600k rows."""
    li = t["lineitem"]
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_quantity").alias("sum_qty"),
        F.avg("l_quantity").alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def q_agg_having(t: Tables) -> DataFrame:
    """Filter over aggregate output (reference: only via predicate kept
    above Aggregate, predicate_pushdown.rs:262-269)."""
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .filter(F.col("n_orders") >= 15)
    )


def q_distinct(t: Tables) -> DataFrame:
    """DISTINCT → group-by-all-columns (RewriteDistinctRule,
    rewrite_distinct.rs:29-47 == Spark ReplaceDistinctWithAggregate)."""
    return t["lineitem"].select("l_returnflag", "l_linestatus").distinct()


# ----------------------------------------------------------------- sort
def q_sort_multi(t: Tables) -> DataFrame:
    """Multi-key sort, mixed direction (SortExec + k-way loser-tree
    merge, sorts/sort.rs + stream.rs — Spark: range-partitioned
    distributed sort, spills instead of OOM)."""
    return (
        t["customer"]
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy(F.col("c_nationkey").asc(), F.col("c_acctbal").desc())
    )


# ---------------------------------------------------------------- joins
def q_join_inner(t: Tables) -> DataFrame:
    """Equi inner hash join (hash_join.rs:268-434). customer is small →
    Catalyst broadcasts it; no shuffle of orders at any scale where
    the dim fits in memory."""
    o, c = t["orders"], t["customer"]
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .filter(F.col("o_totalprice") > 400000.0)
        .select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")
    )


def q_join_left(t: Tables) -> DataFrame:
    """LEFT outer join with null-extended unmatched rows
    (hash_join.rs:779-811 emits unmatched-build batch; Spark emits
    them streaming per-partition — no order guarantee, driver hash is
    order-insensitive)."""
    c, o = t["customer"], t["orders"]
    big = o.filter(F.col("o_totalprice") > 450000.0)
    return c.join(big, c.c_custkey == big.o_custkey, "left").select(
        "c_custkey", "c_nationkey", "o_orderkey", "o_totalprice"
    )


def q_join_nonequi_filter(t: Tables) -> DataFrame:
    """Equi join + extra non-equi condition (reference JoinFilter,
    joins/utils.rs:21-267): matches are probed on the key then the
    residual predicate filters pairs."""
    li, p = t["lineitem"], t["part"]
    return (
        li.join(p, (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size), "inner")
        .select("l_orderkey", "l_linenumber", "p_partkey", "l_quantity", "p_size")
    )


def q_cross_join_filter(t: Tables) -> DataFrame:
    """Keyless join + filter → nested-loop join (reference
    NestedLoopJoinExec via planner.rs:186-194; Spark
    BroadcastNestedLoopJoin)."""
    n, r = t["nation"], t["region"]
    return (
        n.crossJoin(r)
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_regionkey", "r_name")
    )


def q_join_semi(t: Tables) -> DataFrame:
    """LEFT SEMI join (EXISTS) — beyond parity (reference joins:
    inner/left only, join.rs:14-17). Spark never materializes the
    right side's columns: the probe stops at first match."""
    c, o = t["customer"], t["orders"]
    big = o.filter(F.col("o_totalprice") > 450000.0)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def q_join_anti(t: Tables) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — customers with no orders at all."""
    c, o = t["customer"], t["orders"]
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


# ------------------------------------------------------------- coercion
def q_join_full(t: Tables) -> DataFrame:
    """Full outer join (beyond parity — the reference stops at
    Inner/Left, ``src/plan/logical/join.rs:14-17``): nulls extend
    BOTH unmatched sides.  The canonical reconciliation shape (which
    customers have no orders / which orders have no customer); at
    scale Catalyst plans it as a sort-merge join — full outer cannot
    broadcast (both sides must see unmatched rows), so both sides
    shuffle on the key exactly once."""
    big = t["orders"].filter(F.col("o_totalprice") > 450000.0)
    return (
        t["customer"]
        .filter(F.col("c_acctbal") < 0.0)
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "full")
        .select("c_custkey", "c_acctbal", "o_orderkey", "o_totalprice")
    )


def q_coercion(t: Tables) -> DataFrame:
    """Mixed-type arithmetic — the reference's numeric-widening lattice
    (coercion.rs:33-155) → Catalyst TypeCoercion. int+double → double,
    int+long → long."""
    li = t["lineitem"]
    return li.select(
        "l_orderkey",
        (F.col("l_linenumber") + F.lit(1)).alias("line_plus_int"),
        (F.col("l_quantity") * F.lit(2.5)).alias("qty_scaled"),
        (F.col("l_linenumber") + F.col("l_quantity")).alias("int_plus_double"),
        (F.col("l_orderkey") - F.col("l_linenumber")).alias("long_minus_int"),
    )


# --------------------------------------------------------------- set ops
def q_set_union(t: Tables) -> DataFrame:
    """UNION (beyond parity — reference has no set ops, SURVEY §2.6)."""
    c = t["customer"]
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") < 0.0).select("c_custkey")
    return a.union(b).distinct()


def q_set_intersect(t: Tables) -> DataFrame:
    c = t["customer"]
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") < 0.0).select("c_custkey")
    return a.intersect(b)


def q_set_except(t: Tables) -> DataFrame:
    c = t["customer"]
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") < 0.0).select("c_custkey")
    return a.exceptAll(b)


# -------------------------------------------------------------- windows
def q_window_topk_per_group(t: Tables) -> DataFrame:
    """Top-3 orders per customer via row_number() — the canonical
    windowed top-k (beyond parity; reference has no window fns,
    SURVEY §2.8). One shuffle on o_custkey; no driver loop."""
    from pyspark.sql.window import Window

    o = t["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_window_running_sum(t: Tables) -> DataFrame:
    """Running revenue per customer ordered by date (frame = unbounded
    preceding..current row)."""
    from pyspark.sql.window import Window

    o = t["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


# ------------------------------------------------------------- flagship
def q_flagship(t: Tables) -> DataFrame:
    """The reference README's flagship query (README.md:132-151):
    SELECT l1, SUM(r2), AVG(r3) FROM left LEFT JOIN right ON l1=r1
    WHERE l3 < 40 GROUP BY l1 ORDER BY SUM(r2) DESC
    mapped onto customer ⟕ orders. Exercises scan, filter, left join,
    grouped agg, order-by-aggregate in one plan."""
    c, o = t["customer"], t["orders"]
    return (
        c.filter(F.col("c_acctbal") < 4000.0)
        .join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_total"),
        )
        .orderBy(F.col("sum_total").desc())
    )


def q_tpch_q1(t: Tables) -> DataFrame:
    """TPC-H Q1 shape — pricing summary report. The headline OLAP
    aggregation; money sums rounded for cross-engine hash stability."""
    li = t["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q3_like(t: Tables) -> DataFrame:
    """TPC-H Q3 shape — 3-way join + grouped agg + top-k. customer and
    orders filter before the join (Catalyst pushes both); lineitem
    joins on orderkey."""
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1997-01-01"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def q_tpch_q5_like(t: Tables) -> DataFrame:
    """TPC-H Q5 shape — local-supplier revenue per nation for one
    region and order year.  The deepest join chain in the suite
    (region→nation→supplier→lineitem→orders→customer, with the
    local-supplier constraint c_nationkey = s_nationkey), so it is the
    join-ORDERING showcase: region/nation/supplier/customer are dims
    that broadcast under the 64 MB threshold, the selective
    region+date filters push to the scans, and AQE re-plans the
    lineitem↔orders join from runtime stats.  At 100 TB the only
    shuffle left is fact↔fact (lineitem↔orders on orderkey) — every
    dim edge stays a broadcast hash join, which is exactly the plan a
    1000-executor cluster wants."""
    r = t["region"].filter(F.col("r_name") == "ASIA")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q_tpch_q18_like(t: Tables) -> DataFrame:
    """TPC-H Q18 shape — large-volume-order customers: aggregate the
    fact table, keep groups over a threshold (HAVING), then join the
    survivors back through orders to customer.  The reference's SQL
    front end has no subqueries (SURVEY §2: `src/sql` parses a single
    SELECT block), but the aggregate→filter→join composition is fully
    in-scope for the DataFrame facade and is the canonical big-agg →
    semi-join pattern.

    Scale: the only data-sized shuffle is lineitem's groupBy on
    l_orderkey (uniform key, partial-agg combined map-side).  The
    HAVING output is ~0.3% of orders, so it BROADCASTS into the orders
    scan (hinted — AQE would also derive it from runtime stats; at an
    extreme SF where 0.3% of orders outgrows the broadcast budget,
    drop the hint and AQE picks shuffle-vs-broadcast from the runtime
    size instead of forcing a driver collect); the
    joined result is tiny, so the customer edge broadcasts whichever
    side is smaller at runtime, and the final ORDER BY + LIMIT is a
    TakeOrdered, never a global sort.  At 100 TB: one fact shuffle,
    everything downstream broadcast-sized."""
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    return (
        t["orders"]
        .join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q_tpch_q14_like(t: Tables) -> DataFrame:
    """TPC-H Q14 shape — promotion revenue share by ship month: the
    CONDITIONAL-aggregation pattern (SUM over a CASE inside one agg
    pass — Spark ``F.sum(F.when(...))``), which no other query in the
    suite exercises.  Both sums happen in the SAME grouped aggregate:
    one scan, one partial/final agg, never two passes self-joined.

    Determinism: each money sum rounds to 2 decimals before the
    ratio divides rounded values (the tpch_q1 convention — absorbs
    cross-engine float-fold jitter), so promo_pct is bit-stable.

    Scale: part is a dim — broadcast into the lineitem scan (the date
    filter pushes down); the groupBy key is the ship MONTH (6 groups
    here), safe ONLY because partial aggregation reduces each map task
    to ≤ |months| rows before the exchange — the same low-cardinality
    argument as tpch_q1's 6 flag groups, pinned by the partial/final
    split test."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            # cast to DATE: a month bucket is a calendar fact, and
            # DuckDB's date_trunc returns DATE while Spark keeps ts
            F.date_trunc("month", F.col("l_shipdate"))
            .cast("date")
            .alias("ship_month")
        )
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 2
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
        .withColumn(
            "promo_pct",
            F.round(
                F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 4
            ),
        )
        .orderBy("ship_month")
    )


#: edit-distance ceiling for the fuzzy name join (two short tokens —
#: adjective swaps land at 3-4, unrelated nouns well above)
FUZZY_MAX_DIST = 4


def q_fuzzy_join_names(t: Tables) -> DataFrame:
    """BLOCKED string-similarity self-join — the entity-resolution /
    record-linkage primitive (catalog aliases, near-identical product
    names): all DISTINCT name pairs within ``FUZZY_MAX_DIST``
    Levenshtein edits, blocked on the trailing token so the join
    never goes all-pairs.

    Scale shape: the quadratic step runs over the DISTINCT-name table
    (vocabulary-sized, not corpus-sized — dedup first, then compare),
    and only WITHIN a block (names sharing the last token): the join
    is a hash equi-join on the block key, the edit-distance predicate
    a post-filter per block pair.  Cost is sum(|block|²) over a
    bounded vocabulary, not |corpus|² — the standard blocking
    argument (Papadakis et al., "Blocking and Filtering Techniques
    for Entity Resolution", CSUR 2020).  A skewed mega-block would
    need a second blocking key (prefix + length band); block sizes
    here are adjective-vocabulary-bounded.

    Hash parity: Levenshtein distance is an exact integer — Spark's
    ``levenshtein`` and DuckDB's agree on the classic unit-cost
    definition (spot-pinned in tests); ``name_a < name_b`` emits each
    unordered pair once on both engines.

    The blocked name table is materialized once: a plain self-join
    would plan the corpus scan + DISTINCT aggregate twice (the two
    subtrees differ by output alias, so ReusedExchange cannot share
    them) — the same single-compute barrier rationale as
    ``doc_novelty``'s occurrence table."""
    from ..pipeline.dedup import materialize

    names = t["part"].select(F.col("p_name").alias("name_a")).distinct()
    block = F.element_at(F.split(F.col("name_a"), " "), -1)
    a = materialize(names.withColumn("block", block))
    b = a.select(
        F.col("block"), F.col("name_a").alias("name_b")
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .where(dist <= FUZZY_MAX_DIST)
        .select(
            "block",
            "name_a",
            "name_b",
            dist.cast("int").alias("edit_dist"),
        )
    )


# --------------------------------------------------------------- oracle
ORACLE: dict[str, str] = {
    "scan_projection": """
        SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    """,
    "filter_predicate": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
               l_extendedprice * (1.0 + l_tax) AS charge
        FROM lineitem
        WHERE (l_quantity > 45.0 AND l_discount < 0.02)
           OR (l_returnflag = 'R' AND l_quantity > 49.0)
    """,
    "limit_skip": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
    "topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "agg_global": """
        SELECT COUNT(*) AS cnt_all, COUNT(l_quantity) AS cnt_qty,
               SUM(l_quantity) AS sum_qty, AVG(l_quantity) AS avg_qty,
               MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        FROM lineitem
    """,
    "agg_grouped": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               SUM(l_quantity) AS sum_qty, AVG(l_quantity) AS avg_qty,
               MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "agg_having": """
        SELECT o_custkey, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
    "distinct": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "sort_multi": """
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        ORDER BY c_nationkey ASC, c_acctbal DESC
    """,
    "join_inner": """
        SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 400000.0
    """,
    "join_left": """
        SELECT c_custkey, c_nationkey, o_orderkey, o_totalprice
        FROM customer LEFT JOIN (
            SELECT * FROM orders WHERE o_totalprice > 450000.0
        ) AS big ON c_custkey = o_custkey
    """,
    "join_nonequi_filter": """
        SELECT l_orderkey, l_linenumber, p_partkey, l_quantity, p_size
        FROM lineitem JOIN part
          ON l_partkey = p_partkey AND l_quantity > p_size
    """,
    "cross_join_filter": """
        SELECT n_nationkey, n_name, r_regionkey, r_name
        FROM nation CROSS JOIN region
        WHERE n_regionkey <> r_regionkey
    """,
    "join_semi": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 450000.0
        )
    """,
    "join_anti": """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
    """,
    "join_full": """
        SELECT c_custkey, c_acctbal, o_orderkey, o_totalprice
        FROM (SELECT * FROM customer WHERE c_acctbal < 0.0) c
        FULL OUTER JOIN (
            SELECT * FROM orders WHERE o_totalprice > 450000.0
        ) o ON c_custkey = o_custkey
    """,
    "coercion": """
        SELECT l_orderkey,
               l_linenumber + 1 AS line_plus_int,
               l_quantity * 2.5 AS qty_scaled,
               l_linenumber + l_quantity AS int_plus_double,
               l_orderkey - l_linenumber AS long_minus_int
        FROM lineitem
    """,
    "set_union": """
        SELECT DISTINCT c_custkey FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION ALL
            SELECT c_custkey FROM customer WHERE c_acctbal < 0.0
        ) AS u
    """,
    "set_intersect": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal < 0.0
    """,
    "set_except": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT ALL
        SELECT c_custkey FROM customer WHERE c_acctbal < 0.0
    """,
    "window_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    "window_running_sum": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_total
        FROM orders
    """,
    "flagship": """
        SELECT c_mktsegment,
               ROUND(SUM(o_totalprice), 2) AS sum_total,
               ROUND(AVG(o_totalprice), 4) AS avg_total
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        WHERE c_acctbal < 4000.0
        GROUP BY c_mktsegment
        ORDER BY sum_total DESC
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               AVG(l_quantity) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "tpch_q3_like": """
        SELECT o_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey ASC LIMIT 20
    """,
    "tpch_q5_like": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "tpch_q18_like": """
        WITH big AS (
            SELECT l_orderkey, SUM(l_quantity) AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300.0
        )
        SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "tpch_q14_like": """
        WITH m AS (
            SELECT date_trunc('month', l_shipdate) AS ship_month,
                   ROUND(SUM(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0.0 END), 2) AS promo_revenue,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
            GROUP BY date_trunc('month', l_shipdate)
        )
        SELECT ship_month, promo_revenue, total_revenue,
               ROUND(100.0 * promo_revenue / total_revenue, 4) AS promo_pct
        FROM m
        ORDER BY ship_month
    """,
    "fuzzy_join_names": f"""
        WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        blocked AS (
            SELECT name, string_split(name, ' ')[-1] AS block FROM names
        )
        SELECT a.block, a.name AS name_a, b.name AS name_b,
               levenshtein(a.name, b.name)::INTEGER AS edit_dist
        FROM blocked a
        JOIN blocked b ON a.block = b.block
        WHERE a.name < b.name
          AND levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
    """,
}

QUERIES = {
    "scan_projection": q_scan_projection,
    "filter_predicate": q_filter_predicate,
    "limit_skip": q_limit_skip,
    "topk": q_topk,
    "agg_global": q_agg_global,
    "agg_grouped": q_agg_grouped,
    "agg_having": q_agg_having,
    "distinct": q_distinct,
    "sort_multi": q_sort_multi,
    "join_inner": q_join_inner,
    "join_left": q_join_left,
    "join_nonequi_filter": q_join_nonequi_filter,
    "cross_join_filter": q_cross_join_filter,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_full": q_join_full,
    "coercion": q_coercion,
    "set_union": q_set_union,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "window_topk_per_group": q_window_topk_per_group,
    "window_running_sum": q_window_running_sum,
    "flagship": q_flagship,
    "tpch_q1": q_tpch_q1,
    "tpch_q3_like": q_tpch_q3_like,
    "tpch_q5_like": q_tpch_q5_like,
    "tpch_q18_like": q_tpch_q18_like,
    "tpch_q14_like": q_tpch_q14_like,
    "fuzzy_join_names": q_fuzzy_join_names,
}
