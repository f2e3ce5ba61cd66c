"""Regenerate the committed ClickHouse-sink contract golden.

sink_jdbc_clickhouse materializes the sink's *contract* — the exact
CREATE TABLE DDL and JDBC writer options that sinks.jdbc.write_jdbc
would execute against a real ClickHouse (no server exists in the
sandbox, so the data-path round-trip runs against Derby elsewhere).
That contract is deterministic, so it can be driver-checked: this
script runs the op ONCE and commits its (item, value) rows as

  tests/fixtures/golden/sink_jdbc_contract.parquet

which the op's oracle reads back by absolute path. A change to the
type mapping, DDL shape or option plumbing shifts this file — a
deliberate, reviewed event: rerun this script and re-commit.

Usage: python scripts/gen_sink_contract_golden.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from slowlog2clickhouse_spark.operators.sinks_ops import sink_jdbc_clickhouse

    rows = sink_jdbc_clickhouse(spark, "")  # sf_dir unused: fixture-driven
    pdf = rows.toPandas()
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "golden",
        "sink_jdbc_contract.parquet",
    )
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), out)
    print(f"wrote {out} ({len(pdf)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
