"""Slow-log as a first-class Spark data source (Python Data Source API).

Spark 4's ``pyspark.sql.datasource`` API (SPARK-44076) lets a pure-
Python format plug into the planner like parquet/csv do:

    spark.dataSource.register(SlowlogDataSource)
    spark.read.format("slowlog").load("/var/log/mysql/slow*.log")

This wraps the exact same ``parse_record`` state machine as the
mapInPandas source (sources/slowlog.py) — one parser, two integration
surfaces — and the pytest golden test pins that both produce identical
events for the fixture corpus.

Scale: ``partitions()`` returns one InputPartition per input file, so a
directory of rotated logs fans out across executors exactly like the
lineSep-split reader; each partition streams its file through the
parser generator-style (no whole-corpus materialization). For
multi-GB single files the lineSep reader (which byte-splits within a
file) is the better tool — documented trade, same output schema.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from slowlog2clickhouse_spark.sources.slowlog import EVENT_SCHEMA, parse_record

_FIELDS = [f.name for f in EVENT_SCHEMA.fields]


def _records(text: str) -> Iterator[str]:
    """Split a slow-log file into per-event chunks on the record
    boundary marker, mirroring the lineSep-split reader: the first
    chunk keeps any preamble (parse_record skips it), later chunks
    start at their `# Time: ` value."""
    parts = text.split("\n# Time: ")
    yield parts[0]
    for p in parts[1:]:
        yield "# Time: " + p


class SlowlogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("slowlog datasource requires a path")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*.log")))
        else:
            files = sorted(glob.glob(self.path)) or [self.path]
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        with open(partition.value, "rb") as fh:
            text = fh.read().decode("utf-8", errors="replace")
        for i, rec in enumerate(_records(text)):
            ev = parse_record(rec, i)
            if ev is not None:
                yield tuple(ev[name] for name in _FIELDS)


class SlowlogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "slowlog"

    def schema(self):
        return EVENT_SCHEMA

    def reader(self, schema):
        return SlowlogReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the 'slowlog' format."""
    try:
        spark.dataSource.register(SlowlogDataSource)
    except Exception:
        pass  # already registered in this session
