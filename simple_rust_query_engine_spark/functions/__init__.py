"""Expression builders mirroring the reference's logical expression API.

Reference: ``src/expression/logical/expr_fn.rs:14-44`` (``col``,
``lit``, ``count``, ``sum``, ``avg``, ``min``, ``max``, ``sort``) and
the method sugar ``eq/neq/lt/.../and/or`` on ``Expression``
(``expr.rs:143-160``).  In Spark these are all `pyspark.sql.Column`
operators / ``pyspark.sql.functions`` built-ins — JVM-side, codegen'd,
null-aware (Kleene AND/OR matches the reference's
``and_kleene``/``or_kleene``, binary.rs:159-163).

The aggregate result types follow Spark/ANSI, deliberately diverging
from the reference's quirks (SURVEY §4.3.5): SUM is long for integral
/ double for floating input (the reference's schema claims Int64
always, sum.rs:57-59); MIN/MAX keep the input type (the reference's
logical layer claims Float64, logical/aggregate.rs:40-49).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: SURVEY §1.2 — the reference's ScalarValue variants
#: (src/expression/values.rs:66-80) → Spark types.  Spark has no
#: unsigned integers: each UIntN widens to the next signed type that
#: holds its full range; UInt64 (max 2^64−1) exceeds LongType, so it
#: maps to DecimalType(20, 0) — exact, at the cost of decimal
#: arithmetic.  Pipelines that know their values stay < 2^63 should
#: use LongType instead for codegen-speed arithmetic.
REFERENCE_TYPE_MAP = {
    "Null": T.NullType(),
    "Boolean": T.BooleanType(),
    "Int8": T.ByteType(),
    "Int16": T.ShortType(),
    "Int32": T.IntegerType(),
    "Int64": T.LongType(),
    "UInt8": T.ShortType(),
    "UInt16": T.IntegerType(),
    "UInt32": T.LongType(),
    "UInt64": T.DecimalType(20, 0),
    "Float32": T.FloatType(),
    "Float64": T.DoubleType(),
    "Utf8": T.StringType(),
}

# direct re-exports — the complete aggregate set of the reference
# (AggregateFunction enum, src/expression/logical/aggregate.rs:12-24)
col = F.col
lit = F.lit
count = F.count
sum = F.sum  # noqa: A001 - mirrors reference name
avg = F.avg
min = F.min  # noqa: A001
max = F.max  # noqa: A001


def sort(expr: Column, ascending: bool = True) -> Column:
    """Reference ``sort(expr, ascending)`` (expr_fn.rs:35-37)."""
    return expr.asc() if ascending else expr.desc()


def binary_expr(left: Column, op: str, right: Column) -> Column:
    """Reference ``binary_expr`` over the 12-operator set
    (src/expression/operator.rs:5-18). Complete mapping."""
    ops = {
        "eq": lambda l, r: l == r,
        "neq": lambda l, r: l != r,
        "lt": lambda l, r: l < r,
        "lteq": lambda l, r: l <= r,
        "gt": lambda l, r: l > r,
        "gteq": lambda l, r: l >= r,
        "plus": lambda l, r: l + r,
        "minus": lambda l, r: l - r,
        "multiply": lambda l, r: l * r,
        "divide": lambda l, r: l / r,
        "and": lambda l, r: l & r,
        "or": lambda l, r: l | r,
    }
    return ops[op](left, right)
