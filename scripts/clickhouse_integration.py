"""One-command live ClickHouse integration test (run when a server exists).

The sandbox has neither a ClickHouse server nor its JDBC driver jar, so
the sink ships integration-deferred: the deterministic contract (DDL +
writer options) is driver-checked against a committed golden
(sink_jdbc_clickhouse), and the JDBC writer/reader code paths execute
against embedded Derby (scan_jdbc). THIS script is the remaining step —
the real-dialect batch insert over a ClickHouse wire. Run it as:

    CLICKHOUSE_JDBC_URL=jdbc:clickhouse://host:8123/slowlog \\
    CLICKHOUSE_JAR=/path/to/clickhouse-jdbc-*-all.jar \\
    python scripts/clickhouse_integration.py

It will:
  1. parse tests/fixtures/slowlog_small.log into class rows (full D5
     m_* battery);
  2. execute the committed CREATE TABLE DDL (clickhouse_ddl) via the
     JDBC driver;
  3. write_jdbc the classes with the production options (batchsize
     100k, isolationLevel NONE, multi-row VALUES);
  4. read the table back with spark.read.jdbc and assert row count and
     per-digest num_queries sums match the source exactly.

Exit code 0 = the wire path works; any mismatch raises.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    url = os.environ.get("CLICKHOUSE_JDBC_URL")
    jar = os.environ.get("CLICKHOUSE_JAR")
    if not url:
        print(
            "SKIP: set CLICKHOUSE_JDBC_URL (and CLICKHOUSE_JAR) to run "
            "the live integration test; see module docstring"
        )
        return 0

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.master("local[8]").appName("ch-integration")
    if jar:
        # spark.jars alone ships the jar to executors but NOT onto the
        # driver JVM's system classloader — py4j's Class.forName below
        # would throw ClassNotFoundException. extraClassPath puts it on
        # the driver; spark.jars keeps the executor side covered.
        builder = builder.config("spark.jars", jar).config(
            "spark.driver.extraClassPath", jar
        )
    spark = builder.getOrCreate()

    import pyspark.sql.functions as F

    from slowlog2clickhouse_spark.operators.slowlog_ops import FIXTURE_LOG
    from slowlog2clickhouse_spark.plans.pipeline import ingest_slowlog
    from slowlog2clickhouse_spark.sinks.jdbc import clickhouse_ddl, write_jdbc
    from slowlog2clickhouse_spark.sources.slowlog import (
        NUMBER_METRICS,
        TIME_METRICS,
    )

    classes = ingest_slowlog(
        spark, FIXTURE_LOG, metrics=TIME_METRICS + NUMBER_METRICS
    ).cache()
    table = "queries_integration_test"
    ddl = clickhouse_ddl(classes, table)

    # DDL through the driver's Statement (Spark's JDBC writer only
    # issues CREATE TABLE for its own inferred schema; the MergeTree
    # layout needs the explicit form)
    jvm = spark._jvm
    jvm.java.lang.Class.forName("com.clickhouse.jdbc.ClickHouseDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.execute(f"DROP TABLE IF EXISTS {table}")
        st.execute(ddl)
        st.close()
    finally:
        conn.close()

    write_jdbc(classes.drop("labels"), url, table, mode="append")

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", "com.clickhouse.jdbc.ClickHouseDriver")
        .load()
    )
    src_n = classes.count()
    dst_n = back.count()
    assert src_n == dst_n, f"row count mismatch: wrote {src_n}, read {dst_n}"
    src_q = {
        r["digest"]: r["s"]
        for r in classes.groupBy("digest")
        .agg(F.sum("num_queries").alias("s"))
        .collect()
    }
    dst_q = {
        r["digest"]: r["s"]
        for r in back.groupBy("digest").agg(F.sum("num_queries").alias("s")).collect()
    }
    assert src_q == dst_q, "per-digest num_queries sums diverge"
    print(f"OK: {src_n} class rows round-tripped through {url}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
