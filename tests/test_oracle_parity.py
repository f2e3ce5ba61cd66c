"""Per-operator oracle parity (SURVEY.md §5.2 item 1) — every op with
an oracle must hash-match DuckDB on the same parquet; rows-only ops
must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from slowlog2clickhouse_spark.registry import all_ops
from tests.parity import assert_parity

OPS = all_ops()
SQL_OPS = sorted(n for n, o in OPS.items() if o.oracle)
ROWS_ONLY_OPS = sorted(n for n, o in OPS.items() if not o.oracle)


@pytest.mark.parametrize("name", SQL_OPS)
def test_oracle_parity(name, spark, duck, sf_dir):
    o = OPS[name]
    assert_parity(o.fn(spark, sf_dir), duck, o.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_OPS)
def test_rows_only_runs(name, spark, sf_dir):
    df = OPS[name].fn(spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0
