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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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


_BOUNDARY = b"\n# Time: "


class SlowlogTailStreamReader(SimpleDataSourceStreamReader):
    """Tail ONE growing slow-log file — the reference's deployment
    shape (a PMM agent follows the live file; rotation is a separate
    concern handled by the directory file-stream source). Spark's
    built-in file stream never re-reads a file that grew, so this is a
    genuine capability gap the Python Data Source API closes.

    Offsets are byte positions of COMPLETE-record boundaries:
    ``read(start)`` consumes from ``start.pos`` up to (not including)
    the LAST ``\n# Time:`` marker currently in the file — the bytes
    after it are an in-flight record that mysqld may still be writing
    (the torn-tail hazard every tailer has) and are held back until a
    later record's header terminates them. Restart/retry safety comes
    from the offset contract itself: Spark checkpoints {pos, rno}, and
    ``readBetweenOffsets`` re-reads the exact byte range
    deterministically on replay (exactly-once into an idempotent
    sink). ``rno`` carries the record ordinal across batches so
    record_no stays stable and deterministic — a per-batch enumerate
    would restart at 0 every micro-batch.

    Scale note: a SimpleDataSourceStreamReader reads on the DRIVER —
    correct for the single-file tail (the reference's tailer is
    single-node too, and one mysqld writes one slow log); fan-out
    across many hosts' logs is the directory source's job."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("slowlog tail stream requires a path")

    _HEAD_BYTES = 64

    def initialOffset(self) -> dict:
        return {"pos": 0, "rno": 0, "head": "", "head_n": 0, "gen": 0}

    def _head(self, n: int) -> str:
        """md5 of the file's first ``n`` bytes — an incarnation stamp.
        Appends never change a file's first bytes, so a mismatch means
        truncate-and-rewrite (logrotate copytruncate), INCLUDING the
        case where the new content already regrew past the stale
        offset between polls (size alone cannot detect that)."""
        import hashlib

        if n <= 0:
            return ""
        with open(self.path, "rb") as fh:
            return hashlib.md5(fh.read(n)).hexdigest()

    def _truncated(self, start: dict, size: int) -> bool:
        pos = int(start["pos"])
        if size < pos:
            return True  # shrank below the offset: unambiguous
        head_n = int(start.get("head_n", 0))
        if head_n and size >= head_n:
            return self._head(head_n) != start.get("head", "")
        return False

    def _range(self, start: dict) -> tuple[bytes, dict]:
        pos = int(start["pos"])
        gen = int(start.get("gen", 0))
        try:
            size = os.path.getsize(self.path)
        except OSError:
            return b"", start
        if self._truncated(start, size):
            # copytruncate: the emitted bytes left with the rotated
            # copy — reset to the head; stalling at the stale offset
            # (or worse, seeking into the NEW file's middle when it
            # regrew past it) would drop or tear post-rotation records.
            # gen increments so a replay of this batch knows its bytes
            # start at 0, not at start.pos (reset-spanning replay).
            pos = 0
            gen += 1
        if size <= pos:
            return b"", start
        with open(self.path, "rb") as fh:
            fh.seek(pos)
            buf = fh.read(size - pos)
        cut = buf.rfind(_BOUNDARY)
        if cut < 0:
            # no complete-record boundary yet (first record still
            # growing, or a preamble-only file): hold everything back
            return b"", start
        chunk = buf[:cut]
        head_n = min(self._HEAD_BYTES, size)
        end = {
            "pos": pos + cut + 1,  # +1 eats the \n
            "rno": int(start["rno"]),
            "head": self._head(head_n),
            "head_n": head_n,
            "gen": gen,
        }
        return chunk, end

    def _parse(self, chunk: bytes, rno0: int):
        if not chunk:
            return iter([]), 0
        text = chunk.decode("utf-8", errors="replace")
        rows = []
        n = 0
        for rec in _records(text):
            ev = parse_record(rec, rno0 + n)
            n += 1
            if ev is not None:
                rows.append(tuple(ev[name] for name in _FIELDS))
        return iter(rows), n

    def read(self, start: dict):
        chunk, end = self._range(start)
        rows, n = self._parse(chunk, int(start["rno"]))
        if chunk:
            end = dict(end, rno=int(start["rno"]) + n)
        return rows, end

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of [start.pos, end.pos): same bytes,
        # same record ordinals — the exactly-once leg Spark calls on
        # recovery
        pos, stop = int(start["pos"]), int(end["pos"])
        if int(end.get("gen", 0)) > int(start.get("gen", 0)) or stop < pos:
            # the planned batch spanned a copytruncate reset (read()
            # restarted from byte 0 and bumped gen): replay the
            # post-rotation range [0, stop). Without this the recovery
            # replay returned EMPTY (stop < pos) or a mid-file slice of
            # the NEW incarnation (stop >= pos) and the batch's records
            # were silently lost (r11 code-review finds).
            pos = 0
        if stop <= pos:
            return iter([])
        with open(self.path, "rb") as fh:
            fh.seek(pos)
            buf = fh.read(stop - pos - 1)  # -1: end.pos sits after the \n
        rows, _ = self._parse(buf, int(start["rno"]))
        return rows


class SlowlogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "slowlog"

    def schema(self):
        return EVENT_SCHEMA

    def reader(self, schema):
        return SlowlogReader(self.options)

    def simpleStreamReader(self, schema):
        return SlowlogTailStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the 'slowlog' format."""
    try:
        spark.dataSource.register(SlowlogDataSource)
    except Exception:
        pass  # already registered in this session
