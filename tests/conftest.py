import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from simple_rust_query_engine_spark.session import get_spark

    s = get_spark("srqe-tests")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from simple_rust_query_engine_spark.session import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    from simple_rust_query_engine_spark.testing import duckdb_conn

    return duckdb_conn(SF_DIR)
