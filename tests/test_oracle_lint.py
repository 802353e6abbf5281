"""Static lint over every ``oracle_sql()`` twin: the DuckDB-side
result type of each output column must be one Spark can produce.

Round-7 incident (VERDICT r7 item 3): ``bpe_pair_counts``'s oracle
used a bare ``SUM(cnt)``, which DuckDB types as HUGEINT while Spark
emits LONG — the driver's hash is type-sensitive, so the row went
hash-red even though all values were identical, and the local parity
harness couldn't predict it because ``testing._TYPE_CANON``
deliberately coarsens hugeint→int for value comparison.

This lint closes the gap at the source: ``DESCRIBE <oracle sql>`` on
DuckDB (planning only — no query execution, so it's cheap even for
the recursive-CTE oracles) and fail on any column whose type has no
Spark equivalent.  Unlike a regex over the SQL text it has zero false
positives (``SUM(double)`` is DOUBLE and passes; an uncast integer
``SUM``/``COUNT`` arithmetic anywhere in the final projection is
caught no matter how it's spelled).
"""

import re

import duckdb
import pytest

import __spark_entry__ as entry_mod
from simple_rust_query_engine_spark.testing import duckdb_conn

SF_DIR = "/root/testdata/sf0.001"

#: DuckDB types with NO Spark analogue — a driver hash-mismatch
#: waiting to happen.  int128/unsigned widths come from uncast
#: integer aggregates (SUM→HUGEINT is the classic); BIT/UUID/INTERVAL
#: would mean the oracle computes something Spark never returns.
_FORBIDDEN = re.compile(
    r"^(u?hugeint|ubigint|uinteger|usmallint|utinyint|bit|uuid|interval)",
    re.IGNORECASE,
)


def _described_types(con, sql: str) -> list[tuple[str, str]]:
    return [
        (row[0], row[1])
        for row in con.sql(f"DESCRIBE {sql}").fetchall()
    ]


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR)
    yield c
    c.close()


def test_every_oracle_column_type_is_spark_producible(con):
    bad: dict[str, list[str]] = {}
    for name, sql in entry_mod.oracle_sql().items():
        offending = [
            f"{col}: {typ}"
            for col, typ in _described_types(con, sql)
            if _FORBIDDEN.match(typ)
        ]
        if offending:
            bad[name] = offending
    assert not bad, (
        "oracle output columns with DuckDB-only types (cast them, e.g. "
        f"SUM(x)::BIGINT — see VERDICT r7 item 3): {bad}"
    )


def test_lint_catches_a_seeded_uncast_sum(con):
    # the exact r7 regression, re-seeded: strip the ::BIGINT cast from
    # a counting aggregate and the lint must flag the HUGEINT column
    seeded = "SELECT o_custkey, SUM(o_totalprice::BIGINT) AS spend FROM orders GROUP BY 1"
    types = dict(_described_types(con, seeded))
    assert _FORBIDDEN.match(types["spend"]), (
        "seed assumption broken: DuckDB no longer types bare integer "
        "SUM as HUGEINT — revisit whether this lint is still needed"
    )


def test_lint_passes_a_cast_sum(con):
    seeded = (
        "SELECT o_custkey, SUM(o_totalprice::BIGINT)::BIGINT AS spend "
        "FROM orders GROUP BY 1"
    )
    types = dict(_described_types(con, seeded))
    assert not _FORBIDDEN.match(types["spend"])
