"""JDBC sink operator registration (integration-deferred)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from slowlog2clickhouse_spark.operators.slowlog_ops import FIXTURE_LOG
from slowlog2clickhouse_spark.plans.pipeline import ingest_slowlog
from slowlog2clickhouse_spark.registry import op
from slowlog2clickhouse_spark.sinks.jdbc import clickhouse_ddl, jdbc_options


@op("sink_jdbc_clickhouse")  # rows-only: no CH server in sandbox (SURVEY §2 A7)
def sink_jdbc_clickhouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse bulk-insert sink, integration-deferred: materializes
    the exact DDL + writer options that ``sinks.jdbc.write_jdbc`` would
    execute for the class table (main.go insertSQL analog [R:M]) so the
    sink's type mapping and batching contract are inspectable and
    tested without a server."""
    classes = ingest_slowlog(spark, FIXTURE_LOG)
    ddl = clickhouse_ddl(classes, "slowlog.queries")
    opts = jdbc_options("jdbc:clickhouse://localhost:8123/slowlog", "slowlog.queries")
    rows = [("ddl", ddl)] + [(f"option:{k}", v) for k, v in sorted(opts.items())]
    return spark.createDataFrame(rows, "item string, value string")
