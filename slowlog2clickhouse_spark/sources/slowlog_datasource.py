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
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

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


def _file_ino(path: str) -> int:
    """st_ino, or 0 when unavailable — the second leg of the
    incarnation stamp. copytruncate keeps the inode (caught by the
    size/head checks); create/rename rotation changes it, which the
    head hash alone cannot see when the new incarnation starts with
    an identical >=64-byte preamble (mysqld's restart banner is)."""
    try:
        return os.stat(path).st_ino
    except OSError:
        return 0


def _read_verified_tail(
    path: str,
    head: str,
    head_n: int,
    pos: int,
    ino: int = 0,
    limit: int | None = None,
) -> bytes:
    """Read ``path[pos:pos+limit]`` (to EOF when ``limit`` is None)
    iff the file's identity matches the recorded incarnation stamp —
    the ONE shared primitive behind every rotated-sibling salvage and
    plan-to-read fallback (keeping the call sites on one
    implementation prevents the checks from drifting apart). Identity
    holds when either leg matches:

    * md5 of the first ``head_n`` bytes equals ``head`` (the rotated
      COPY of our incarnation — copytruncate gives it a new inode but
      identical content), or
    * ``st_ino`` equals ``ino`` (the renamed ORIGINAL — logrotate
      create/rename moves our very inode to ``<path>.1``).

    The inode leg is ONLY sound for verifying a rotated SIBLING: the
    LIVE path keeps its inode across copytruncate while the content
    changes, so an ino match there would falsely authenticate a new
    incarnation (r12 second-review find) — live-path callers pass
    ino=0 and rely on the head hash alone.

    Both stats come from ``os.fstat`` on the OPENED handle, not the
    path — a path-level stat-then-open would let a rotation between
    the two calls authenticate one file and read another (TOCTOU).

    Returns b"" when the file is missing, unreadable, or fails both
    identity legs."""
    import hashlib

    try:
        with open(path, "rb") as fh:
            st = os.fstat(fh.fileno())
            ok = bool(ino) and st.st_ino == ino
            if not ok and head_n and head:
                ok = (
                    st.st_size >= head_n
                    and hashlib.md5(fh.read(head_n)).hexdigest() == head
                )
            if not ok:
                return b""
            fh.seek(pos)
            return fh.read() if limit is None else fh.read(limit)
    except OSError:
        return b""


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
        self.start_at = str(options.get("startat", "earliest")).lower()
        if self.start_at not in ("earliest", "latest"):
            raise ValueError(
                f"startAt must be 'earliest' or 'latest', got {self.start_at!r}"
            )

    _HEAD_BYTES = 64

    def initialOffset(self) -> dict:
        zero = {"pos": 0, "rno": 0, "head": "", "head_n": 0, "gen": 0, "ino": 0}
        if self.start_at != "latest":
            return zero
        # tail-from-now: skip every record COMPLETE at start (their
        # bulk load is the batch byte-splitting reader's job). Exact
        # semantics: pos starts at the last complete-record boundary,
        # so the single record still IN FLIGHT at start — including a
        # file whose only record has no terminating successor yet —
        # is emitted once a later header terminates it. That is the
        # one record per file that can overlap a prior `ingest` pass
        # (which may or may not have caught its final form); pair the
        # recipe with an idempotent sink or accept <=1 boundary
        # record per file. _stamp_file guards the whole stat+scan
        # body: a rotation racing the start falls back to earliest.
        st = _stamp_file(self.path, self._HEAD_BYTES)
        if st is None:
            return zero
        return {"rno": 0, "gen": 0, **st}

    def _head(self, n: int) -> str:
        """md5 of the file's first ``n`` bytes — the content leg of the
        incarnation stamp. Appends never change a file's first bytes,
        so a mismatch means truncate-and-rewrite (copytruncate),
        including when the new content already regrew past the stale
        offset between polls. NOT sufficient alone: a create/rename
        rotation whose new incarnation starts with an identical
        >= head_n-byte preamble hashes equal — the inode leg
        (_file_ino) catches that regime."""
        return _head_hash(self.path, n)

    def _truncated(self, start: dict, size: int) -> bool:
        pos = int(start["pos"])
        if size < pos:
            return True  # shrank below the offset: unambiguous
        ino = int(start.get("ino", 0))
        if ino and _file_ino(self.path) not in (0, ino):
            # create/rename rotation: a different inode now answers to
            # this path — even an identical preamble can't hide it
            return True
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

    def _salvage(self, start: dict, limit: int | None = None) -> bytes:
        """Best-effort read of the rotated copy's unread tail on
        rotation. The bytes past ``start.pos`` at rotation time —
        complete-but-not-yet-read records written between the last
        poll and the rotation — left with the rotated copy, NOT just
        already-emitted bytes. If logrotate kept that copy as
        ``<path>.1`` (the default dateext-off layout, and what the
        reference tailers probe) and it verifies as OUR incarnation
        (head hash for copytruncate's copy, inode for create/rename's
        moved original — _read_verified_tail), read its tail so those
        records are emitted instead of dropped. When no matching
        sibling exists (compressed, dateext, shipped away) the loss
        window is real and unavoidable from a single-path tailer; the
        reset comment below states it honestly."""
        return _read_verified_tail(
            self.path + ".1",
            start.get("head", ""),
            int(start.get("head_n", 0)),
            int(start["pos"]),
            int(start.get("ino", 0)),
            limit=limit,
        )

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
                "ino": _file_ino(self.path),
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
            "ino": _file_ino(self.path),
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
                salvage = self._salvage(start, limit=int(end["sib_n"]))
                pre, _ = self._parse(salvage, int(start["rno"]))
            pos = 0
        if stop <= pos:
            return pre
        with open(self.path, "rb") as fh:
            fh.seek(pos)
            buf = fh.read(stop - pos - 1)  # -1: end.pos sits after the \n
        rows, _ = self._parse(buf, int(start["rno"]) + sib_rn)
        return itertools.chain(pre, rows)


# ---------------------------------------------------------------------------
# Fleet tail: MANY growing files, partitioned (executor-side) reads
# ---------------------------------------------------------------------------

# EVENT_SCHEMA + provenance: which mysqld's log a row came from — the
# fleet aggregation key PMM-style deployments group by.
MULTI_EVENT_SCHEMA = StructType(
    list(EVENT_SCHEMA.fields) + [StructField("source_file", StringType())]
)


def _head_hash(path: str, n: int) -> str:
    import hashlib

    if n <= 0:
        return ""
    with open(path, "rb") as fh:
        return hashlib.md5(fh.read(n)).hexdigest()


def _last_boundary(path: str, size: int) -> int:
    """Byte index of the LAST ``\\n# Time: `` in ``path[:size]``, or -1.
    Backward block scan from EOF with boundary-length overlap — O(tail
    block), not O(file): a long-running tail must not re-scan the whole
    multi-GB log every trigger just to find the newest record header."""
    blk = 1 << 16
    ov = len(_BOUNDARY) - 1
    end = size
    with open(path, "rb") as fh:
        while end > 0:
            lo = max(0, end - blk)
            fh.seek(lo)
            buf = fh.read(min(end - lo + ov, size - lo))
            i = buf.rfind(_BOUNDARY)
            if i >= 0:
                return lo + i
            end = lo
    return -1


def _stamp_file(path: str, head_bytes: int = 64) -> dict | None:
    """One file's offset entry {pos, head, head_n, ino} — pos is the
    byte after the last complete-record boundary, head/head_n/ino the
    incarnation stamp. The WHOLE body is guarded: a rotation or
    removal between the stat and the opens returns None instead of
    crashing the caller (both readers share this — the guard can't
    drift between them)."""
    try:
        size = os.path.getsize(path)
        b = _last_boundary(path, size)
        head_n = min(head_bytes, size)
        return {
            "pos": b + 1 if b >= 0 else 0,
            "head": _head_hash(path, head_n),
            "head_n": head_n,
            "ino": _file_ino(path),
        }
    except OSError:
        return None


def _parse_bytes(buf: bytes, base: int, path: str):
    """Parse a byte range into event tuples. record_no is the record's
    BYTE OFFSET within its file incarnation — unlike the single-file
    tail's running ordinal, a byte offset is derivable from the
    partition alone (no cross-batch counter in the offsets), unique and
    monotonic per incarnation, and stable under replay."""
    parts = buf.split(_BOUNDARY)
    cur = 0
    for i, part in enumerate(parts):
        rec = part if i == 0 else b"# Time: " + part
        ev = parse_record(rec.decode("utf-8", errors="replace"), base + cur)
        if ev is not None:
            yield tuple(ev[name] for name in _FIELDS) + (path,)
        cur += len(rec) + 1  # +1: the \n the boundary split consumed


_ZERO_FILE = {"pos": 0, "head": "", "head_n": 0}


class SlowlogMultiTailStreamReader(DataSourceStreamReader):
    """Tail a FLEET of growing slow-log files (one per mysqld; the
    many-agents-one-ingest-job deployment) — the partitioned
    counterpart of SlowlogTailStreamReader: per-file byte offsets in
    the stream offset dict, one InputPartition per grown file, reads
    on EXECUTORS (the driver only plans byte ranges).

    Offset model — STATELESS by construction. After a restart whose
    last batch committed, Spark calls ``latestOffset()`` with no start
    offset and no prior ``partitions()`` call, so the end offset must
    be derivable from the files alone:

      {"files": {path: {"pos": <byte after the last complete-record
                                boundary, backward-scanned from EOF>,
                        "head": md5(first head_n bytes),   # incarnation
                        "head_n": min(64, size)}}}

    Everything start-dependent — the emitted range, copytruncate reset
    detection, rotated-sibling salvage — is derived in
    ``partitions(start, end)`` from the two offsets, which is exactly
    the call Spark replays on recovery, so a re-planned batch is
    byte-identical without any driver-side counters.

    Per file and per batch, the same guarantees as the single-file
    tail: the in-flight torn tail is held back (pos stops at the last
    record-header boundary); copytruncate is detected via the head
    stamp (including shrink-below-head_n and regrow-past-offset); the
    rotated copy's unread tail is best-effort salvaged from
    ``<path>.1`` when its head matches the OLD incarnation stamp.

    record_no is the record's byte offset within its incarnation (see
    _parse_bytes) and ``source_file`` carries provenance.

    Cluster note: every executor must see the log files (shared FS, or
    run the ingest job co-located with the agents' spool directory) —
    the same constraint any distributed file source has.

    Plan-to-read race: if a file copytruncates between planning and
    the executor read, the executor detects the stamp mismatch and
    reads the planned range from ``<path>.1`` (which IS the planned
    incarnation after one rotation); if that is gone too, the range's
    records are lost — the same residual window the single-file
    reader documents.

    Batch sizing: each micro-batch covers ALL growth since the last
    trigger (stateless offsets can't carry an admission-control
    cursor — latestOffset gets no start). In follow mode the trigger
    interval naturally bounds per-batch growth to seconds of log
    emission; a cold-start drain over a large backlog lands in ONE
    batch per file — for bulk historical logs use the batch lineSep
    reader, which byte-splits WITHIN files (this reader's partition
    grain is the file)."""

    def __init__(self, options: dict):
        self.options = options
        self.path = options.get("path")
        if not self.path:
            raise ValueError("slowlog multi-tail stream requires a path")
        self.start_at = str(options.get("startat", "earliest")).lower()
        if self.start_at not in ("earliest", "latest"):
            raise ValueError(
                f"startAt must be 'earliest' or 'latest', got {self.start_at!r}"
            )
        # last-known per-file offset entries. NOT part of the offset
        # contract (offsets alone fully determine every batch) — this
        # only lets latestOffset CARRY FORWARD a file's entry through
        # a transient stat failure (NFS hiccup, mid-rotation rename)
        # instead of dropping it, which would make the next successful
        # poll treat the file as brand new and re-ingest it from byte
        # 0. Primed from every offset that passes through this reader
        # (latestOffset results, partitions' start/end, commit); after
        # a process restart the residual window is a stat failure on
        # the very first poll — carried entries reappear as soon as
        # partitions()/commit() hand the checkpointed offsets back.
        self._known: dict = {}
        # bases EVER tailed in this run — unlike _known this never
        # ages, so a decommissioned host's slow.log.1 stays excluded
        # from the fleet even after its base's carried offset entry
        # expires (re-ingesting rotation history as a "new" fleet
        # member would be wholesale duplication). Tiny: one string per
        # distinct path ever seen. Restart residual: a fresh process
        # that only ever sees the orphaned .1 will tail it — same as
        # a fleet that genuinely starts with only rotation history.
        self._seen_bases: set = set()

    _HEAD_BYTES = 64

    def _files(self) -> list:
        if os.path.isdir(self.path):
            files = glob.glob(os.path.join(self.path, "*.log"))
        else:
            files = glob.glob(self.path)
        # known bases count too: during a rename-to-recreate gap the
        # live slow.log is briefly absent while slow.log.1 exists —
        # the carried offset entry proves the base is a tailed file,
        # so its history must not join the fleet in that window; the
        # non-aging _seen_bases keeps the exclusion after the carried
        # entry itself expires (decommissioned host)
        self._seen_bases.update(files)
        self._seen_bases.update(self._known)
        live = set(files) | set(self._known) | self._seen_bases
        # never tail a rotated sibling as its own fleet member: with a
        # broad glob (--log '/var/log/mysql/*') slow.log.1 would be
        # ingested wholesale (mostly bytes already emitted while it
        # was slow.log) AND re-read by slow.log's salvage leg. A file
        # whose ".N"-stripped base is itself being tailed is that
        # base's rotation history, not a mysqld of its own.
        out = []
        for p in files:
            base = p
            while True:
                root, ext = os.path.splitext(base)
                if ext[1:].isdigit():
                    base = root
                else:
                    break
            if base != p and base in live:
                continue
            out.append(p)
        return sorted(out)

    def initialOffset(self) -> dict:
        if self.start_at == "latest":
            # tail-from-now for the whole fleet: every currently
            # existing file starts at its current boundary (stamped);
            # files appearing later still start at byte 0
            return self.latestOffset()
        return {"files": {}}

    # how many consecutive polls a vanished file's offset entry is
    # carried before it is forgotten. An NFS mount flap or host churn
    # makes whole directories disappear from the glob; dropping their
    # entries would re-ingest EVERY file from byte 0 on remount. With
    # the default 5 s follow trigger, 720 misses ≈ one hour of outage
    # survived with positions intact. Override: .option("missLimit", n)
    _MISS_LIMIT = 720

    def latestOffset(self) -> dict:
        files = {}
        for p in self._files():
            st = _stamp_file(p, self._HEAD_BYTES)
            if st is None:
                continue  # raced away mid-poll: the carry loop handles it
            files[p] = st
        # carry entries for known files that vanished from the glob or
        # failed to stat (transient NFS hiccup, mid-rotation rename,
        # mount flap, host churn): dropping one would make its next
        # successful poll re-ingest the file from byte 0. Carried
        # entries age out after _MISS_LIMIT consecutive absent polls.
        for p, e in self._known.items():
            if p in files:
                continue
            miss = int(e.get("miss", 0)) + 1
            if miss <= self._miss_limit:
                files[p] = dict(e, miss=miss)
        self._known = dict(files)
        return {"files": files}

    @property
    def _miss_limit(self) -> int:
        return int(self.options.get("misslimit", self._MISS_LIMIT))

    def partitions(self, start: dict, end: dict):
        out = []
        sf = start.get("files", {})
        self._known.update(sf)
        self._known.update(end.get("files", {}))
        self._seen_bases.update(sf)
        self._seen_bases.update(end.get("files", {}))
        for p, e in end.get("files", {}).items():
            s = sf.get(p, _ZERO_FILE)
            reset = False
            s_ino = int(s.get("ino", 0))
            e_ino = int(e.get("ino", 0))
            if int(s["head_n"]):
                if s_ino and e_ino and s_ino != e_ino:
                    # create/rename rotation: a different inode now
                    # answers to this path — an identical preamble
                    # can't hide it from this leg of the stamp
                    reset = True
                elif int(e["head_n"]) < int(s["head_n"]) or int(
                    e["pos"]
                ) < int(s["pos"]):
                    # the file shrank below a previously observed size
                    # (head_n <= size-at-checkpoint) or below the
                    # committed offset: unambiguous truncation
                    reset = True
                elif int(e["head_n"]) == int(s["head_n"]):
                    reset = e["head"] != s["head"]
                else:
                    # end stamp covers more bytes than start's (start
                    # saw a <64-byte file): hashes aren't comparable,
                    # re-stamp the start prefix live. Tiny race if the
                    # file changes under us — self-healing: a wrong
                    # verdict surfaces as a stamp mismatch next batch.
                    try:
                        reset = _head_hash(p, int(s["head_n"])) != s["head"]
                    except OSError:
                        reset = True
            pos0 = 0 if reset else int(s["pos"])
            stop = int(e["pos"])
            if not reset and stop <= pos0:
                continue  # no growth past the committed boundary
            if reset and stop == 0 and not int(s["head_n"]):
                continue
            out.append(
                InputPartition(
                    {
                        "path": p,
                        "pos": pos0,
                        "stop": stop,
                        "head": e["head"],
                        "head_n": int(e["head_n"]),
                        "ino": e_ino,
                        # salvage leg (reset only): the OLD incarnation
                        # stamp verifies <path>.1 really is our file
                        "salv": bool(reset and int(s["head_n"])),
                        "sib_pos": int(s["pos"]),
                        "sib_head": s["head"],
                        "sib_head_n": int(s["head_n"]),
                        "sib_ino": s_ino,
                    }
                )
            )
        return out

    def read(self, partition: InputPartition):
        v = partition.value
        p = v["path"]
        if v["salv"]:
            # best-effort rotated-copy tail: complete-but-unread
            # records left with the copy at rotation time (verified as
            # the OLD incarnation via head stamp or inode); if the
            # sibling is gone, that is the documented residual loss
            # window
            buf = _read_verified_tail(
                p + ".1",
                v["sib_head"],
                v["sib_head_n"],
                v["sib_pos"],
                v.get("sib_ino", 0),
            )
            if buf:
                yield from _parse_bytes(buf, v["sib_pos"], p)
        if v["stop"] - v["pos"] <= 1:
            return
        # live leg, stamp-verified: if the file rotated between plan
        # and read, the planned incarnation is now <path>.1 (if
        # anywhere) — read the planned byte range from whichever path
        # still verifies; records are lost only if both fail. The LIVE
        # path verifies by head hash alone (ino=0): copytruncate keeps
        # the inode while replacing the content, so an inode match
        # there would falsely authenticate the NEW incarnation. The
        # sibling may verify by either leg (a renamed original keeps
        # our inode). Reads are bounded to the planned range.
        want = v["stop"] - v["pos"] - 1
        for cand, ino in ((p, 0), (p + ".1", v.get("ino", 0))):
            buf = _read_verified_tail(
                cand, v["head"], v["head_n"], v["pos"], ino, limit=want
            )
            if buf:
                yield from _parse_bytes(buf, v["pos"], p)
                return

    def commit(self, end: dict) -> None:
        pass  # offsets carry everything; nothing to clean up

    def stop(self) -> None:
        pass


class SlowlogMultiTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "slowlog_tail_multi"

    def schema(self):
        return MULTI_EVENT_SCHEMA

    def streamReader(self, schema):
        return SlowlogMultiTailStreamReader(self.options)


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
    """Idempotent registration of the 'slowlog' and
    'slowlog_tail_multi' formats."""
    try:
        spark.dataSource.register(SlowlogDataSource)
    except Exception:
        pass  # already registered in this session
    try:
        spark.dataSource.register(SlowlogMultiTailDataSource)
    except Exception:
        pass
