"""JDBC sink operator registration (integration-deferred)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.operators.slowlog_ops import FIXTURE_LOG
from slowlog2clickhouse_spark.plans.pipeline import ingest_slowlog
from slowlog2clickhouse_spark.registry import op
from slowlog2clickhouse_spark.sinks.jdbc import clickhouse_ddl, jdbc_options, write_jdbc


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


@op(
    "scan_jdbc",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC as a SOURCE: round-trip the nation table through the
    embedded Derby on Spark's classpath (write_jdbc → spark.read.jdbc)
    and hash-check the read-back against the parquet original — proving
    both writer and reader paths execute end-to-end, not just their
    option plumbing (the in-prod shape is reading a ClickHouse dim
    table back for enrichment joins).

    Scale note: a real JDBC read partitions on a numeric column
    (partitionColumn/lowerBound/upperBound → one query per executor);
    the single-partition read here matches the 25-row table.
    """
    db = os.path.join(tempfile.mkdtemp(prefix="scan_jdbc_"), "db")
    url = f"jdbc:derby:{db};create=true"
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(
        nation,
        url,
        "nation_rt",
        mode="overwrite",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        dialect=None,  # Derby types the table
        num_partitions=1,
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "nation_rt")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
    )
    return back.select(
        *[F.col(c).alias(c.lower()) for c in back.columns]
    )
