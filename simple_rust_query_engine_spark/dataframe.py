"""Lazy DataFrame facade mirroring the reference's builder API.

Reference: ``DataFrame`` in
``/root/reference/src/execution/dataframe.rs:27-156`` — each fluent
call wraps the logical plan in a new node; nothing executes until
``collect()``/``show()``.  PySpark's DataFrame has identical lazy
semantics, so this facade is a thin adapter that (a) renames methods
to the reference surface (``order_by``, ``aggregate``, ``limit`` with
skip+fetch), and (b) fixes the reference's semantic bugs per
SURVEY.md §4.3 (fetch=None means "no limit", not "0 rows"; MIN/MAX
seeded correctly; NULL aggregates ANSI-style — all free in Spark).

Scale: every method is a logical-plan rewrite; Catalyst plans the
shuffles.  No ``collect()`` anywhere in operator paths.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unwrap(other):
    return other.df if isinstance(other, EngineDataFrame) else other


class EngineDataFrame:
    """Thin lazy wrapper over :class:`pyspark.sql.DataFrame`."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- plan builders (reference: dataframe.rs:60-156) -------------
    def select(self, *exprs) -> "EngineDataFrame":
        """Projection. Accepts column names, Columns, or facade exprs."""
        return EngineDataFrame(self.df.select(*exprs))

    def filter(self, predicate) -> "EngineDataFrame":
        return EngineDataFrame(self.df.filter(predicate))

    where = filter

    def aggregate(
        self, group_by: Sequence, aggregate_expressions: Sequence[Column]
    ) -> "EngineDataFrame":
        """Reference ``aggregate(group_by, agg_exprs)`` (dataframe.rs:83-99).

        Empty ``group_by`` → global aggregation (reference
        ``AggregateStream``, no_groups.rs); else hash aggregation.
        Spark runs partial (map-side) + final aggregation with codegen
        — strictly better than the reference's single blocking hash.
        """
        if group_by:
            return EngineDataFrame(self.df.groupBy(*group_by).agg(*aggregate_expressions))
        return EngineDataFrame(self.df.agg(*aggregate_expressions))

    def order_by(self, *exprs) -> "EngineDataFrame":
        """Reference ``order_by`` (dataframe.rs:103-111). Use
        ``F.col(c).asc()/.desc()`` for direction."""
        return EngineDataFrame(self.df.orderBy(*exprs))

    sort = order_by

    def limit(self, skip: int = 0, fetch: Optional[int] = None) -> "EngineDataFrame":
        """Reference ``limit(skip, fetch)`` (dataframe.rs:114-122).

        Divergence (SURVEY §4.3.1): the reference's physical LimitExec
        coerces ``fetch=None`` to 0 rows (limit.rs:87,135-138) — a
        bug.  Here ``fetch=None`` means "no limit" (ANSI/Spark).
        """
        out = self.df
        if skip:
            out = out.offset(skip)
        if fetch is not None:
            out = out.limit(fetch)
        return EngineDataFrame(out)

    def join(
        self,
        other: "EngineDataFrame",
        on: Optional[Iterable] = None,
        how: str = "inner",
        filter: Optional[Column] = None,
    ) -> "EngineDataFrame":
        """Reference ``join(rhs, on, JoinType, filter)``
        (logical/join.rs:49-71; physical hash_join.rs / nested_loop_join.rs).

        * equi ``on`` + optional non-equi ``filter`` → Spark equi join
          with extra condition (Catalyst picks broadcast / shuffled
          hash / sort-merge by stats — the reference always builds
          left and materializes it in memory, hash_join.rs:326-361).
        * empty ``on`` → cross join then filter (reference
          NestedLoopJoinExec, planner.rs:186-194).
        * join types: inner, left (reference's complete set,
          join.rs:14-17) — plus every other Spark type for free.

        DELIBERATE schema deviation from the reference: for a
        name-based equi join, the reference's
        ``Join::create_join_schema`` concatenates left+right schemas,
        so BOTH same-named key columns survive in the output; this
        facade emits Spark's USING semantics — ONE coalesced key
        column — because the duplicated pair makes every later
        select/filter on the key an AMBIGUOUS_REFERENCE error.
        Tested; parity audits should expect one key column here.
        """
        right = _unwrap(other)
        on_items = list(on) if on else []
        if on_items and all(isinstance(i, str) for i in on_items) and filter is None:
            # name-based (USING-style) join: Spark emits ONE coalesced
            # key column — an explicit self.df[k] == right[k] condition
            # would keep BOTH same-named key columns and make any later
            # select/filter on the key an AMBIGUOUS_REFERENCE error
            return EngineDataFrame(self.df.join(right, on_items, how))
        cond = None
        if on:
            cond = []
            for item in on_items:
                if isinstance(item, str):
                    # same-named key mixed with other condition forms
                    cond.append(self.df[item] == right[item])
                elif isinstance(item, tuple):
                    # reference form: (left_key, right_key) pair
                    lk, rk = item
                    cond.append(self.df[lk] == right[rk])
                else:
                    cond.append(item)
        if filter is not None:
            extra = [filter] if not isinstance(filter, list) else filter
            cond = (cond or []) + extra
        if cond:
            combined = cond[0]
            for c in cond[1:]:
                combined = combined & c
            return EngineDataFrame(self.df.join(right, combined, how))
        if how == "inner":
            return EngineDataFrame(self.df.crossJoin(right))
        return EngineDataFrame(self.df.join(right, None, how))

    def distinct(self) -> "EngineDataFrame":
        """Reference Distinct → Aggregate-on-all-columns rewrite
        (rewrite_distinct.rs:29-47); Spark's
        ReplaceDistinctWithAggregate is the same rule."""
        return EngineDataFrame(self.df.distinct())

    # -- beyond-parity conveniences (Spark-free) --------------------
    def with_column(self, name: str, expr: Column) -> "EngineDataFrame":
        return EngineDataFrame(self.df.withColumn(name, expr))

    def union(self, other: "EngineDataFrame") -> "EngineDataFrame":
        return EngineDataFrame(self.df.unionByName(_unwrap(other)))

    def intersect(self, other: "EngineDataFrame") -> "EngineDataFrame":
        return EngineDataFrame(self.df.intersect(_unwrap(other)))

    def except_(self, other: "EngineDataFrame") -> "EngineDataFrame":
        """SQL ``EXCEPT`` — set semantics (deduplicated), consistent
        with ``intersect``; use ``except_all`` to keep multiplicity."""
        return EngineDataFrame(self.df.subtract(_unwrap(other)))

    def except_all(self, other: "EngineDataFrame") -> "EngineDataFrame":
        """SQL ``EXCEPT ALL`` — removes one occurrence per match."""
        return EngineDataFrame(self.df.exceptAll(_unwrap(other)))

    # -- actions (reference: dataframe.rs:45-57) --------------------
    def collect(self):
        return self.df.collect()

    def show(self, n: int = 20, truncate: bool = False) -> None:
        self.df.show(n=n, truncate=truncate)

    def count(self) -> int:
        return self.df.count()

    def to_pandas(self):
        return self.df.toPandas()

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode=mode)

    @property
    def schema(self):
        return self.df.schema

    @property
    def columns(self):
        return self.df.columns

    def __getattr__(self, item):
        # fall through to the underlying pyspark DataFrame so the
        # facade never blocks access to native capabilities
        return getattr(self.df, item)
