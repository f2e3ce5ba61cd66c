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


def pytest_collection_modifyitems(config, items):
    """Process-level sharding (scripts/ptest.py; no pytest-xdist in the
    container): SPARK_GRAFT_TEST_SHARD=i/N keeps only items whose
    stable nodeid hash lands in shard i. Unset => all tests (the serial
    suite is unchanged). md5, not hash(): PYTHONHASHSEED randomizes the
    latter across processes, which would drop/duplicate tests."""
    shard = os.environ.get("SPARK_GRAFT_TEST_SHARD")
    if not shard:
        return
    import hashlib

    i, n = (int(x) for x in shard.split("/"))
    keep, skip = [], []
    for item in items:
        h = int(hashlib.md5(item.nodeid.encode()).hexdigest(), 16)
        (keep if h % n == i else skip).append(item)
    items[:] = keep
    config.hook.pytest_deselected(items=skip)


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
