"""Product-analytics pipeline: raw events → sessions → daily rollup.

The events-domain sibling of ``plans/pipeline.py`` (slow log → query
classes): the same ONE-declarative-plan discipline applied to the
clickstream shape every events warehouse runs nightly —

  load events → enrich with the customer dim (broadcast) →
  sessionize (30-minute inactivity gaps, window lag over user time) →
  per-session stats → daily per-segment rollup →
  date-partitioned parquet sink, sorted within partitions.

Scale: one shuffle on user_id services BOTH the session window and the
per-session groupBy (same key prefix); the daily rollup shuffles
|days × segments| rows; the dim join broadcasts. Shuffle volume never
scales with raw events past the first aggregation — the same
pre-aggregation property the slowlog pipeline has.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.registry import op

SESSION_GAP_S = 1800  # 30-minute inactivity boundary


def sessionize_events(events: DataFrame) -> DataFrame:
    """events → one row per (user, session) with the session stat
    battery. Session ids are deterministic: (user_id, session ordinal
    by time)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_timestamp(F.col("ts").cast("timestamp"))
        - F.unix_timestamp(F.lag("ts").over(w).cast("timestamp"))
    )
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0),
    ).withColumn("session_no", F.sum("new_session").over(w))
    return marked.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "n_purchases"
        ),
    )


def daily_rollup(sessions: DataFrame, customer: DataFrame) -> DataFrame:
    """Sessions × customer dim → per-(day, segment) rollup."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        sessions.join(F.broadcast(dim), "user_id")
        .groupBy(
            F.to_date("session_start").alias("day"),
            "segment",
        )
        .agg(
            F.count("*").alias("n_sessions"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("n_events").alias("n_events"),
            F.sum("n_purchases").alias("n_purchases"),
            F.round(F.sum("session_value"), 4).alias("total_value"),
            F.round(
                F.sum(
                    F.unix_timestamp("session_end")
                    - F.unix_timestamp("session_start")
                )
                / F.count("*"),
                4,
            ).alias("avg_session_secs"),
        )
    )


def run_events_pipeline(
    spark: SparkSession, sf_dir: str, out_dir: str | None = None
) -> DataFrame:
    """End-to-end: load → sessionize → rollup → partitioned sink →
    read-back (the returned DataFrame is the durable table, proving
    the sink round-trip, exactly like the slowlog pipeline's test)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    rollup = daily_rollup(sessionize_events(ev), cust)
    out = out_dir or os.path.join(
        tempfile.mkdtemp(prefix="events_pipeline_"), "rollup"
    )
    (
        rollup.repartition("day")
        .sortWithinPartitions("day", "segment")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(out)
    )
    return spark.read.parquet(out)


@op(
    "events_pipeline",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, value, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM marked),
    sessions AS (
      SELECT user_id, session_no,
             count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end,
             round(sum(value), 4) AS session_value,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purchases
      FROM numbered GROUP BY 1, 2)
    SELECT cast(to_timestamp(epoch(cast(session_start AS DATE)))
                AT TIME ZONE 'UTC' AS DATE) AS day,
           c.c_mktsegment AS segment,
           cast(count(*) AS BIGINT) AS n_sessions,
           cast(count(DISTINCT s.user_id) AS BIGINT) AS n_users,
           cast(sum(n_events) AS BIGINT) AS n_events,
           cast(sum(n_purchases) AS BIGINT) AS n_purchases,
           round(sum(session_value), 4) AS total_value,
           round(sum(cast(floor(epoch(session_end)) AS BIGINT)
                     - cast(floor(epoch(session_start)) AS BIGINT))
                 * 1.0 / count(*), 4) AS avg_session_secs
    FROM sessions s JOIN customer c ON s.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def events_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed product-analytics pipeline as one driver-checked
    op: sessionize → dim-enrich → daily rollup → partitioned sink →
    read-back. See module docstring for the scale contract."""
    return run_events_pipeline(spark, sf_dir)
