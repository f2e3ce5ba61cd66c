"""Slow-log domain + source/sink operators — SURVEY.md §2 A & K (core).

These run on the committed fixture log (tests/fixtures/), not the
testdata star schema, so they are rows-only at the driver; their
correctness gate is the golden-file test suite (tests/test_slowlog.py)
mirroring the go-mysql fixture-corpus style (SURVEY.md §5.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.plans.pipeline import (
    ingest_slowlog,
    sink_classes_parquet,
    top_digests,
)
from slowlog2clickhouse_spark.registry import op
from slowlog2clickhouse_spark.sources.slowlog import (
    EVENT_SCHEMA,
    parse_record,
    parse_slowlog,
    read_slowlog_records,
)

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
FIXTURE_LOG = os.path.join(_REPO_ROOT, "tests", "fixtures", "slowlog_small.log")
_TMP = "/tmp/slowlog2clickhouse_spark"


@op(
    "scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with projection pushdown (ReadSchema pruned)."""
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@op("scan_text_multiline")  # rows-only: input is the repo fixture log
def scan_text_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-line record assembly via lineSep='\\n# Time: ' — the
    reference parser's record boundary ([go-mysql] log/slow/parser.go
    state machine [R:H]) pushed down into the text source, so splits
    align with records and the scan parallelizes at 100 TB."""
    rec = read_slowlog_records(spark, FIXTURE_LOG)
    return rec.select(
        F.length("value").alias("record_len"),
        F.substring("value", 1, 40).alias("head"),
    )


def _driver_safe(events: DataFrame) -> DataFrame:
    """JSON-encode map columns for driver-facing results: the driver's
    pandas canonicalizer cannot sort/hash dict cells (same failure
    class as round-1's mm_decode_features array crash). Internal
    consumers keep the typed map."""
    return events.withColumn("extra_metrics", F.to_json("extra_metrics"))


@op("map_in_pandas_chunker")  # rows-only: golden-tested
def map_in_pandas_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched record parser (mapInPandas) — the reference's
    state machine as a partition-streaming transform."""
    return _driver_safe(parse_slowlog(spark, FIXTURE_LOG))


@op("udtf_parse_slowlog")  # rows-only: golden-tested
def udtf_parse_slowlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF: one text record → N typed event rows
    (the table-function formulation of the parser)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=EVENT_SCHEMA)
    class ParseSlowlog:
        def eval(self, rec: str):
            if rec and rec.strip():
                d = parse_record(rec)
                if d is not None:  # pure-preamble chunk → no event
                    yield tuple(d[f.name] for f in EVENT_SCHEMA.fields)

    spark.udtf.register("parse_slowlog_udtf", ParseSlowlog)
    records = read_slowlog_records(spark, FIXTURE_LOG)
    records.createOrReplaceTempView("slowlog_records")
    return _driver_safe(
        spark.sql(
            "SELECT t.* FROM slowlog_records r, LATERAL parse_slowlog_udtf(r.value) t"
        )
    )


@op("slowlog_classes")  # rows-only: pipeline output, golden-tested
def slowlog_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END reference pipeline: parse → fingerprint/digest →
    1-minute class aggregation with full stat battery (cnt/sum/min/
    max/avg/med/p95/p99 + bool sums + worst-execution example)."""
    classes = ingest_slowlog(spark, FIXTURE_LOG)
    return classes.withColumn("labels", F.to_json("labels"))


@op("slowlog_global")  # rows-only: pipeline output, golden-tested
def slowlog_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Result.Global analog ([go-mysql] event/global.go [R:H]):
    whole-period stat battery beside the per-class rows — one GLOBAL
    row per minute over the fixture log."""
    from slowlog2clickhouse_spark.plans.pipeline import aggregate_global
    from slowlog2clickhouse_spark.sources.slowlog import with_fingerprint

    events = with_fingerprint(parse_slowlog(spark, FIXTURE_LOG))
    return aggregate_global(events).withColumn("labels", F.to_json("labels"))


@op("slowlog_classes_approx")  # rows-only: sketch percentiles (G8)
def slowlog_classes_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented 100 TB default for the class pipeline:
    ``percentiles='approx'`` swaps exact per-group value buffers for
    approx_percentile sketches (bounded memory per group regardless of
    class size). tests/test_slowlog.py bounds its drift vs the exact
    pipeline."""
    classes = ingest_slowlog(spark, FIXTURE_LOG, percentiles="approx")
    return classes.withColumn("labels", F.to_json("labels"))


@op("slowlog_parse_stats")  # rows-only: observability, golden-tested
def slowlog_parse_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse-quality accounting — the reference logs skipped/partial
    events; here it is a one-row DataFrame a monitoring job can sink:
    totals of events, admin commands, unparseable (no ts), rate-limited
    sessions, and records carrying unknown `# Key:` pairs."""
    ev = parse_slowlog(spark, FIXTURE_LOG)

    def tally(cond):  # count_if with NULL-as-false (sum of all-NULL is NULL)
        return F.coalesce(F.sum(cond.cast("long")), F.lit(0))

    return ev.agg(
        F.count("*").alias("n_events"),
        tally(F.col("admin")).alias("n_admin"),
        tally(F.col("ts").isNull()).alias("n_no_ts"),
        tally(F.col("query").isNull()).alias("n_no_query"),
        tally(F.col("rate_limit") > 1).alias("n_rate_limited"),
        tally(F.size("extra_metrics") > 0).alias("n_extra_kv"),
    )


@op("slowlog_top_digests")  # rows-only
def slowlog_top_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The M2 slice: top-10 digests by total query time — what QAN
    renders on its landing page."""
    return top_digests(ingest_slowlog(spark, FIXTURE_LOG), k=10)


@op("sink_parquet")  # rows-only: write + read-back verify
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink with read-back (the INSERT-batching analog,
    main.go:~200-320 [R:M])."""
    out = f"{_TMP}/sink_parquet"
    df = load_table(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count("*").alias("n")
    )
    df.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@op("sink_parquet_partitioned")  # rows-only: write + read-back verify
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned, digest-sorted sink mirroring the reference's
    MergeTree layout (PARTITION BY toDate(period_start) ORDER BY
    (digest, period_start) — README DDL [R:M]); read-back counts per
    partition prove pruning-compatible layout."""
    out = f"{_TMP}/sink_classes"
    classes = ingest_slowlog(spark, FIXTURE_LOG)
    sink_classes_parquet(classes, out)
    back = spark.read.parquet(out)
    return back.groupBy("period_date").agg(F.count("*").alias("n_classes"))


@op("scan_csv")  # rows-only: csv round-trip with explicit schema
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimited text scan with declared schema (never inferSchema in
    production — schema inference is a full extra pass at 100 TB)."""
    out = f"{_TMP}/events_csv"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    ).option("header", True).csv(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value")
    )


@op(
    "scan_json_props",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
    FROM events
    """,
)
def scan_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed struct extraction from JSON strings via from_json (the
    labels / extra-kv capture analog, main.go:~100 [R:L])."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k BIGINT").getField("k").alias("k_typed"),
    )


@op("scan_slowlog_pyds")  # rows-only; golden-equal to the lineSep source
def scan_slowlog_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The slow-log format as a REGISTERED Spark data source
    (`spark.read.format("slowlog")`) via the Spark 4 Python Data
    Source API — same parse_record state machine as the mapInPandas
    reader, one partition per log file. tests/test_slowlog.py pins
    event-for-event equality between both integration surfaces over
    the whole fixture corpus. Returned aggregated per-file so the
    driver row is stable: per-db event counts + total query time."""
    from slowlog2clickhouse_spark.sources import slowlog_datasource

    slowlog_datasource.register(spark)
    ev = (
        spark.read.format("slowlog")
        .option("path", os.path.dirname(FIXTURE_LOG))
        .load()
    )
    return (
        ev.groupBy("db")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("query_time"), 6).alias("total_qt"),
        )
        .orderBy(F.col("db").asc_nulls_first())
    )


@op("qan_filter_dimensions")  # rows-only: fixture-driven, golden corpus
def qan_filter_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QAN filter-panel op: for each dimension (db, user, host),
    every observed value with its query count and share of total query
    time — what populates the left-hand drilldown list in the QAN UI
    (qan-api2 filters endpoint analog, SURVEY §3.3 [R:M]).

    One pass over parsed events, unpivoted to (dimension, value) pairs
    map-side, then a single partial-agg'd groupBy — at 100 TB the
    dimension fan-out is ×3 before aggregation, the shuffle is
    |dims × values|-sized."""
    ev = parse_slowlog(spark, FIXTURE_LOG).where(
        ~F.col("admin") & F.col("query").isNotNull()
    )
    total = ev.agg(F.sum("query_time").alias("t"))
    pairs = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dim).alias("dimension"),
                        F.coalesce(F.col(dim), F.lit("<none>")).alias("value"),
                    )
                    for dim in ("db", "user", "host")
                ]
            )
        ).alias("dv"),
        "query_time",
    )
    return (
        pairs.select("dv.dimension", "dv.value", "query_time")
        .groupBy("dimension", "value")
        .agg(
            F.count("*").alias("n_queries"),
            F.round(F.sum("query_time"), 6).alias("total_time"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "dimension",
            "value",
            "n_queries",
            "total_time",
            F.round(F.col("total_time") / F.col("t"), 6).alias("time_share"),
        )
    )
