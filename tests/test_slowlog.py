"""Golden-file slow-log parser + pipeline tests (SURVEY.md §5.2 2/4).

Mirrors the go-mysql corpus STYLE: hand-written records with known
expected values, then property/invariant checks over the generated
fixture (min<=med<=p95<=max, count conservation, partitioning
invariance, admin skip)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.operators.slowlog_ops import FIXTURE_LOG
from slowlog2clickhouse_spark.plans.pipeline import aggregate_classes, ingest_slowlog
from slowlog2clickhouse_spark.sources.slowlog import (
    parse_record,
    parse_slowlog,
    with_fingerprint,
)

GOLDEN_RECORD = """# Time: 2024-01-01T00:09:58.778549Z
# User@Host: appuser[appuser] @ web01 [10.0.0.17]  Id:  1234
# Schema: shop  Last_errno: 0  Killed: 0
# Query_time: 0.185220  Lock_time: 0.000023  Rows_sent: 12  Rows_examined: 4096
# Rows_affected: 0  Bytes_sent: 1156
# QC_Hit: No  Full_scan: Yes  Full_join: No  Tmp_table: Yes  Tmp_table_on_disk: No
# Custom_metric: 7
SET timestamp=1704067798;
SELECT c FROM t1 WHERE id IN (1, 2, 3) AND name = 'abc';"""


class TestParseRecord:
    def test_golden_fields(self):
        ev = parse_record(GOLDEN_RECORD)
        assert ev["user"] == "appuser"
        assert ev["host"] == "web01"
        assert ev["db"] == "shop"
        assert ev["admin"] is False
        # SET timestamp is authoritative (parser.go semantics)
        assert ev["ts"].isoformat() == "2024-01-01T00:09:58"
        assert ev["query_time"] == pytest.approx(0.185220)
        assert ev["lock_time"] == pytest.approx(0.000023)
        assert ev["rows_sent"] == 12
        assert ev["rows_examined"] == 4096
        assert ev["bytes_sent"] == 1156
        assert ev["qc_hit"] is False
        assert ev["full_scan"] is True
        assert ev["tmp_table"] is True
        assert ev["query"] == "SELECT c FROM t1 WHERE id IN (1, 2, 3) AND name = 'abc'"
        assert ev["extra_metrics"] == {"Custom_metric": "7"}
        # absent metric lines stay null
        assert ev["innodb_io_r_ops"] is None and ev["merge_passes"] is None

    def test_56_time_format_and_use_db(self):
        rec = (
            "# Time: 240221 10:15:53\n"
            "# User@Host: root[root] @ localhost []\n"
            "# Query_time: 1.5  Lock_time: 0.0  Rows_sent: 1  Rows_examined: 1\n"
            "use warehouse;\n"
            "SELECT 1;"
        )
        ev = parse_record(rec)
        assert ev["ts"].isoformat() == "2024-02-21T10:15:53"
        assert ev["db"] == "warehouse"
        assert ev["host"] == "localhost"
        assert ev["query"] == "SELECT 1"

    def test_admin_command(self):
        rec = (
            "# Time: 2024-01-01T00:00:01Z\n"
            "# User@Host: root[root] @ h []\n"
            "# Query_time: 0.000010  Lock_time: 0.0  Rows_sent: 0  Rows_examined: 0\n"
            "# administrator command: Quit;"
        )
        ev = parse_record(rec)
        assert ev["admin"] is True
        assert ev["query"] == "Quit"

    def test_hash_inside_string_not_a_header(self):
        rec = (
            "# Time: 2024-01-01T00:00:01Z\n"
            "# Query_time: 0.5  Lock_time: 0.0  Rows_sent: 0  Rows_examined: 0\n"
            "SET timestamp=1704067201;\n"
            "SELECT note FROM memos WHERE body = 'prefix # Time: not a header 5';"
        )
        ev = parse_record(rec)
        assert "# Time:" in ev["query"]
        assert ev["query_time"] == pytest.approx(0.5)

    def test_multiline_statement(self):
        rec = (
            "# Time: 2024-01-01T00:00:01Z\n"
            "# Query_time: 0.5  Lock_time: 0.0  Rows_sent: 0  Rows_examined: 0\n"
            "SELECT a\nFROM b\nWHERE c = 1;"
        )
        ev = parse_record(rec)
        assert ev["query"] == "SELECT a\nFROM b\nWHERE c = 1"


class TestParseFixture:
    @pytest.fixture(scope="class")
    def events(self, spark):
        return parse_slowlog(spark, FIXTURE_LOG).cache()

    def test_record_count(self, events):
        # every `# Time:` header in the fixture becomes exactly one event
        with open(FIXTURE_LOG) as fh:
            n_headers = sum(1 for line in fh if line.startswith("# Time: "))
        assert events.count() == n_headers == 1000

    def test_no_null_core_fields(self, events):
        assert events.where(F.col("ts").isNull()).count() == 0
        assert events.where(F.col("user").isNull()).count() == 0
        non_admin = events.where(~F.col("admin"))
        assert non_admin.where(F.col("query").isNull()).count() == 0
        assert non_admin.where(F.col("query_time").isNull()).count() == 0

    def test_admin_records_present_and_skipped(self, events):
        n_admin = events.where(F.col("admin")).count()
        assert n_admin > 0
        classes = aggregate_classes(with_fingerprint(events))
        # admin events never contribute to classes
        total = classes.agg(F.sum("num_queries")).collect()[0][0]
        assert total == 1000 - n_admin

    def test_extra_metrics_escape_hatch(self, events):
        n = events.where(F.map_contains_key("extra_metrics", "Custom_metric")).count()
        assert n > 0


class TestClassAggregation:
    @pytest.fixture(scope="class")
    def classes(self, spark):
        return ingest_slowlog(spark, FIXTURE_LOG).cache()

    def test_stat_invariants(self, classes):
        """min <= med <= p95 <= p99 <= max; avg within [min,max];
        cnt <= num_queries (SURVEY.md §5.2 item 4)."""
        bad = classes.where(
            (F.col("m_query_time_min") > F.col("m_query_time_med"))
            | (F.col("m_query_time_med") > F.col("m_query_time_p95"))
            | (F.col("m_query_time_p95") > F.col("m_query_time_p99"))
            | (F.col("m_query_time_p99") > F.col("m_query_time_max"))
            | (F.col("m_query_time_avg") < F.col("m_query_time_min"))
            | (F.col("m_query_time_avg") > F.col("m_query_time_max"))
            | (F.col("m_query_time_cnt") > F.col("num_queries"))
        ).count()
        assert bad == 0

    def test_digest_shape(self, classes):
        import re

        for r in classes.select("digest").distinct().collect():
            assert re.fullmatch(r"[0-9A-F]{16}", r[0])

    def test_example_is_worst_execution(self, classes, spark):
        """example column holds a query whose time == m_query_time_max."""
        events = with_fingerprint(parse_slowlog(spark, FIXTURE_LOG)).where(
            ~F.col("admin")
        )
        joined = classes.alias("c").join(
            events.alias("e"),
            (F.col("c.digest") == F.col("e.digest"))
            & (F.date_trunc("minute", F.col("e.ts")) == F.col("c.period_start"))
            & (F.col("c.example") == F.col("e.query"))
            & (F.col("e.query_time") == F.col("c.m_query_time_max")),
            "left_semi",
        )
        assert joined.count() == classes.count()

    def test_partitioning_invariance(self, spark, classes):
        """Union of per-period outputs is invariant to input layout:
        re-parse with a different partition count, same class rows."""
        re_agg = ingest_slowlog(spark, FIXTURE_LOG).repartition(7)
        a = {tuple(r) for r in classes.select("digest", "period_start", "num_queries").collect()}
        b = {tuple(r) for r in re_agg.select("digest", "period_start", "num_queries").collect()}
        assert a == b

    def test_sink_partitioned_roundtrip(self, classes, tmp_path, spark):
        from slowlog2clickhouse_spark.plans.pipeline import sink_classes_parquet

        out = os.path.join(str(tmp_path), "classes")
        sink_classes_parquet(classes, out)
        back = spark.read.parquet(out)
        assert back.count() == classes.count()
        assert "period_date" in back.columns
