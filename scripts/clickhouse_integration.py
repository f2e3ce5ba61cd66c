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
     per-digest num_queries sums match the source exactly;
  5. STREAMING round-trip (the full deployment shape,
     stream_slowlog_to_jdbc with the Derby URL swapped for ClickHouse):
     tail the fixture log as a file stream → parse → fingerprint →
     watermarked 1-minute classes → foreachBatch write_jdbc into a
     second MergeTree table → read back and assert it equals the batch
     formulation of the same aggregation row-for-row.

Exit code 0 = both wire paths (batch insert + streaming foreachBatch)
work; any mismatch raises.
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

    # -- 5. streaming foreachBatch round-trip (VERDICT r6 #7) --------
    import shutil
    import tempfile

    from slowlog2clickhouse_spark.streaming.slowlog_stream import (
        read_slowlog_stream,
        stream_classes,
    )

    stream_table = "queries_stream_integration_test"
    sclasses = stream_classes(read_slowlog_stream(spark, FIXTURE_LOG))
    sddl = clickhouse_ddl(sclasses, stream_table)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.execute(f"DROP TABLE IF EXISTS {stream_table}")
        st.execute(sddl)
        st.close()
    finally:
        conn.close()

    ckpt = tempfile.mkdtemp(prefix="ch_stream_ckpt_")
    try:

        def sink_batch(batch_df, epoch_id: int) -> None:
            # complete mode re-emits full state per epoch; TRUNCATE +
            # append keeps the table equal to the latest state without
            # relying on overwrite-DDL semantics against MergeTree
            c = jvm.java.sql.DriverManager.getConnection(url)
            try:
                s2 = c.createStatement()
                s2.execute(f"TRUNCATE TABLE {stream_table}")
                s2.close()
            finally:
                c.close()
            write_jdbc(batch_df, url, stream_table, mode="append")

        q = (
            sclasses.writeStream.foreachBatch(sink_batch)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    sback = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", stream_table)
        .option("driver", "com.clickhouse.jdbc.ClickHouseDriver")
        .load()
    )
    # expected sunk state = the BATCH formulation of stream_classes'
    # aggregation over the batch parse of the same log (the exact
    # cross-check stream_slowlog_to_jdbc's oracle runs against Derby)
    from slowlog2clickhouse_spark.functions.fingerprint import (
        digest_col,
        fingerprint_col,
    )
    from slowlog2clickhouse_spark.sources.slowlog import read_slowlog_records

    bev = read_slowlog_records(spark, FIXTURE_LOG)
    bev = bev.where(~F.col("admin") & F.col("query").isNotNull())
    bev = bev.withColumn("fingerprint", fingerprint_col(F.col("query")))
    bev = bev.withColumn("digest", digest_col(F.col("fingerprint")))
    want = {
        (r["period_start"], r["digest"]): (
            r["num_queries"],
            r["m_query_time_sum"],
            r["m_query_time_max"],
            r["fingerprint"],
        )
        for r in bev.groupBy(
            F.date_trunc("minute", "ts").alias("period_start"), "digest"
        )
        .agg(
            F.count("*").alias("num_queries"),
            F.round(F.sum("query_time"), 6).alias("m_query_time_sum"),
            F.max("query_time").alias("m_query_time_max"),
            F.min("fingerprint").alias("fingerprint"),
        )
        .collect()
    }
    got = {
        (r["period_start"], r["digest"]): (
            r["num_queries"],
            round(r["m_query_time_sum"], 6),
            r["m_query_time_max"],
            r["fingerprint"],
        )
        for r in sback.collect()
    }
    assert got == want, (
        "streaming foreachBatch state diverges from the batch "
        f"formulation: {len(got)} vs {len(want)} rows"
    )
    print(
        f"OK: {len(got)} streaming class rows round-tripped through "
        f"{url} ({stream_table})"
    )

    # -- 6. mergeable-percentile state tables (VERDICT r10 #3) -------
    # The r10 pctl pipeline's ClickHouse shape: the (digest, bucket, n)
    # histogram state lands in a SummingMergeTree whose merge-on-read
    # ADDITION is the same operation stream_classes_pctl_merge performs
    # in foreachBatch. Write the state in two halves (two flush
    # cycles), let the server merge, and assert the quantiles extracted
    # from the read-back equal the single-pass batch recompute.
    from slowlog2clickhouse_spark.operators.slowlog_ops import (
        hist_quantiles,
        qt_hist_bucket,
    )
    from slowlog2clickhouse_spark.sources.slowlog import (
        parse_slowlog,
        with_fingerprint,
    )

    ev = with_fingerprint(parse_slowlog(spark, FIXTURE_LOG)).where(
        (~F.col("admin"))
        & F.col("query").isNotNull()
        & F.col("query_time").isNotNull()
    )
    buckets = ev.select(
        "digest", qt_hist_bucket().alias("bucket"), F.col("record_no")
    ).cache()
    state_table = "queries_pctl_state_integration_test"
    cls_table = "queries_pctl_integration_test"
    hist_all = buckets.groupBy("digest", "bucket").agg(
        F.count("*").cast("long").alias("n")
    )
    sddl2 = clickhouse_ddl(
        hist_all, state_table, order_by=("digest", "bucket"),
        partition_by=None, engine="SummingMergeTree((n))",
    )
    cddl = clickhouse_ddl(
        hist_quantiles(hist_all), cls_table, order_by=("digest",),
        partition_by=None, engine="ReplacingMergeTree(num_timed)",
    )
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for t, d in ((state_table, sddl2), (cls_table, cddl)):
            st.execute(f"DROP TABLE IF EXISTS {t}")
            st.execute(d)
        st.close()
    finally:
        conn.close()
    # two flush cycles: each writes its half's PARTIAL histogram —
    # SummingMergeTree owns the addition across parts
    half = F.when(F.col("record_no") % 2 == 0, 0).otherwise(1)
    for h in (0, 1):
        part = (
            buckets.where(half == h)
            .groupBy("digest", "bucket")
            .agg(F.count("*").cast("long").alias("n"))
        )
        write_jdbc(part, url, state_table, mode="append")
    # read back with an explicit re-sum: FINAL dedup timing is the
    # server's business; the CONTRACT is sum(n) per (digest, bucket)
    hback = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", state_table)
        .option("driver", "com.clickhouse.jdbc.ClickHouseDriver")
        .load()
        .groupBy("digest", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    want_q = {
        r["digest"]: (r["num_timed"], r["p50_est"], r["p95_est"])
        for r in hist_quantiles(hist_all).collect()
    }
    got_q = {
        r["digest"]: (r["num_timed"], r["p50_est"], r["p95_est"])
        for r in hist_quantiles(hback).collect()
    }
    assert got_q == want_q, "pctl state round-trip quantiles diverge"
    # class rows: flush twice (num_timed grows) — newest version wins
    write_jdbc(
        hist_quantiles(
            buckets.where(half == 0)
            .groupBy("digest", "bucket")
            .agg(F.count("*").cast("long").alias("n"))
        ),
        url, cls_table, mode="append",
    )
    write_jdbc(hist_quantiles(hist_all), url, cls_table, mode="append")
    cback = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", cls_table)
        .option("driver", "com.clickhouse.jdbc.ClickHouseDriver")
        .load()
    )
    # contract view of ReplacingMergeTree: max-version row per digest
    from pyspark.sql import Window

    latest = (
        cback.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("digest").orderBy(F.desc("num_timed"))
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    got_c = {
        r["digest"]: (r["num_timed"], r["p50_est"], r["p95_est"])
        for r in latest.collect()
    }
    assert got_c == want_q, "pctl class re-flush: newest version did not win"
    print(
        f"OK: pctl state ({state_table}) + class ({cls_table}) tables "
        f"round-tripped; SummingMergeTree addition == batch recompute"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
