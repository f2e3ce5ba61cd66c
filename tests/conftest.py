"""Shared pytest fixtures: one SparkSession + one DuckDB oracle con.

The parity tests run at sf0.001 for speed (the driver's gate runs the
same registry at sf0.01); set SPARK_GRAFT_TEST_SF_DIR to override.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slowlog2clickhouse_spark.io import TABLES  # noqa: E402
from slowlog2clickhouse_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_session(app_name="slowlog2clickhouse_spark_tests")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con
