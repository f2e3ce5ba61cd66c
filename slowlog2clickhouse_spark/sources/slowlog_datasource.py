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
        if head_n and size < head_n:
            # head_n was <= the file size at checkpoint time, so a
            # current size below it proves the file shrank — appends
            # can never shrink a file. Without this branch the window
            # pos <= size < head_n skipped the hash check and returned
            # False, leaving the reader at a stale offset inside the
            # NEW incarnation (r11 advisor find).
            return True
        if head_n and size >= head_n:
            return self._head(head_n) != start.get("head", "")
        return False

    def _salvage(self, start: dict) -> bytes:
        """Best-effort read of the rotated copy's unread tail on
        copytruncate. The bytes past ``start.pos`` at rotation time —
        complete-but-not-yet-read records written between the last
        poll and the rotation — left with the rotated copy, NOT just
        already-emitted bytes. If logrotate kept that copy as
        ``<path>.1`` (the default dateext-off layout, and what the
        reference tailers probe), and its head matches our
        incarnation stamp (so it really is our old file), read its
        tail so those records are emitted instead of dropped. When no
        matching sibling exists (compressed, dateext, shipped away)
        the loss window is real and unavoidable from a single-path
        tailer; the reset comment below states it honestly."""
        import hashlib

        sib = self.path + ".1"
        head_n = int(start.get("head_n", 0))
        if not head_n or not start.get("head"):
            return b""
        try:
            if os.path.getsize(sib) < head_n:
                return b""
            with open(sib, "rb") as fh:
                if hashlib.md5(fh.read(head_n)).hexdigest() != start["head"]:
                    return b""  # a different incarnation — not ours
                fh.seek(int(start["pos"]))
                return fh.read()
        except OSError:
            return b""

    def _range(self, start: dict) -> tuple[bytes, bytes, dict]:
        pos = int(start["pos"])
        gen = int(start.get("gen", 0))
        salvage = b""
        try:
            size = os.path.getsize(self.path)
        except OSError:
            return b"", b"", start
        if self._truncated(start, size):
            # copytruncate: everything past start.pos left with the
            # rotated copy — both already-emitted bytes AND complete
            # records written between the last poll and the rotation.
            # _salvage best-effort recovers the latter from <path>.1;
            # when that fails the unread records are LOST (the honest
            # loss window of a copytruncate tailer). Then reset to the
            # head; stalling at the stale offset (or seeking into the
            # NEW file's middle when it regrew past it) would drop or
            # tear post-rotation records. gen increments so a replay
            # of this batch knows its bytes start at 0, not start.pos.
            salvage = self._salvage(start)
            pos = 0
            gen += 1
        if size <= pos and not salvage:
            return b"", b"", start
        buf = b""
        if size > pos:
            with open(self.path, "rb") as fh:
                fh.seek(pos)
                buf = fh.read(size - pos)
        cut = buf.rfind(_BOUNDARY)
        head_n = min(self._HEAD_BYTES, size)
        if cut < 0:
            # no complete-record boundary in the live file yet (first
            # record still growing, or a preamble-only file): hold the
            # live bytes back. With salvage in hand the offset must
            # still advance past the reset, else every poll would
            # re-salvage and re-emit the same rows.
            if not salvage:
                return b"", b"", start
            end = {
                "pos": 0,
                "rno": int(start["rno"]),
                "head": self._head(head_n),
                "head_n": head_n,
                "gen": gen,
                "sib_n": len(salvage),
            }
            return salvage, b"", end
        chunk = buf[:cut]
        end = {
            "pos": pos + cut + 1,  # +1 eats the \n
            "rno": int(start["rno"]),
            "head": self._head(head_n),
            "head_n": head_n,
            "gen": gen,
            "sib_n": len(salvage),
        }
        return salvage, chunk, end

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
        import itertools

        salvage, chunk, end = self._range(start)
        rno0 = int(start["rno"])
        # salvage bytes are FINAL (the rotated copy will never grow),
        # so the whole tail parses — no boundary hold-back needed.
        srows, sn = self._parse(salvage, rno0)
        rows, n = self._parse(chunk, rno0 + sn)
        if salvage or chunk:
            end = dict(end, rno=rno0 + sn + n, sib_rn=sn)
        return itertools.chain(srows, rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of [start.pos, end.pos): same bytes,
        # same record ordinals — the exactly-once leg Spark calls on
        # recovery
        import itertools

        pos, stop = int(start["pos"]), int(end["pos"])
        pre = iter([])
        sib_rn = 0
        if int(end.get("gen", 0)) > int(start.get("gen", 0)) or stop < pos:
            # the planned batch spanned a copytruncate reset (read()
            # restarted from byte 0 and bumped gen): replay the
            # post-rotation range [0, stop). Without this the recovery
            # replay returned EMPTY (stop < pos) or a mid-file slice of
            # the NEW incarnation (stop >= pos) and the batch's records
            # were silently lost (r11 code-review finds).
            sib_rn = int(end.get("sib_rn", 0))
            if int(end.get("sib_n", 0)):
                # best-effort replay of the salvaged rotated-copy tail.
                # If the sibling rotated away between the original read
                # and this recovery (a crash AND a second rotation in
                # the same window), the salvage rows are dropped here —
                # documented residual loss; the stored sib_rn still
                # keeps the live-file record ordinals deterministic.
                salvage = self._salvage(start)[: int(end["sib_n"])]
                pre, _ = self._parse(salvage, int(start["rno"]))
            pos = 0
        if stop <= pos:
            return pre
        with open(self.path, "rb") as fh:
            fh.seek(pos)
            buf = fh.read(stop - pos - 1)  # -1: end.pos sits after the \n
        rows, _ = self._parse(buf, int(start["rno"]) + sib_rn)
        return itertools.chain(pre, rows)


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
