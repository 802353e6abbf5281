"""Driver-contract mirror: every queries() entry hash-matches its
DuckDB oracle twin (the t2 gate, run here at sf0.001 for speed —
the driver runs sf0.01)."""

import pytest

import __spark_entry__ as entry_mod
from simple_rust_query_engine_spark.testing import compare
from tests.conftest import SF_DIR

QUERY_NAMES = sorted(entry_mod.queries().keys())


def test_all_queries_have_oracles():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    missing = set(qs) - set(oracles)
    # every op must carry an oracle twin — including the estimate
    # queries, which emit deterministic validity bands instead of raw
    # sketch values (r6 showed the driver records err=no_oracle, NOT
    # a rows-only check, for a missing twin)
    assert not missing, f"queries without oracle: {missing}"
    dangling = set(oracles) - set(qs)
    assert not dangling, f"oracles without query: {dangling}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_parity(name, spark, duck):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        df = fn(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check
        return
    problems = compare(fn(spark, SF_DIR), duck, sql)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"c_mktsegment", "sum_total", "avg_total"}
