"""Generate the MySQL 8.0 + gzipped-rotation slow-log fixtures.

VERDICT r8 #3: FIXTURES.md's corpus stopped at 5.7/Percona headers.
This script writes two committed fixtures (deterministic bytes —
rerunning reproduces them exactly):

  tests/fixtures/slowlog_80.log
      MySQL 8.0 format with ``log_slow_extra=ON`` (8.0.14+): ISO8601Z
      time lines, and the extended metric block whose keys partially
      RENAME the Percona spellings (``Errno`` vs ``Last_errno``,
      ``Created_tmp_tables`` vs ``Tmp_tables``, ``Sort_merge_passes``
      vs ``Merge_passes``) and partially REUSE bool-family names as
      counters (``Sort_rows: 12``). Exercises the parser's 8.0 key
      dispatch ([go-mysql] log/slow/parser.go time-format dispatch
      [R:H]) and the bool-vs-count disambiguation.

  tests/fixtures/gz/slowlog_rot.log.{1,2,3}.gz
      A rotation set: one logical log split at FLUSH LOGS boundaries
      into three gzipped segments (the operational layout logrotate
      produces). Gzip streams are written with mtime=0 and no
      filename so the .gz bytes are reproducible. Lives in gz/ (NOT
      tests/fixtures/ itself) so directory-scoped *.log readers never
      see it.

Goldens: scripts/gen_slowlog_golden.py picks up slowlog_80.log
automatically (it globs *.log); the gz set's golden is written here
(slowlog_rot_gz_events.parquet) since the golden script only globs
plain logs.

Usage: python scripts/gen_slowlog_80_fixture.py
"""

from __future__ import annotations

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")
GZ_DIR = os.path.join(FIXTURES, "gz")

PREAMBLE = (
    "/usr/sbin/mysqld, Version: 8.0.36 (MySQL Community Server - GPL). "
    "started with:\n"
    "Tcp port: 3306  Unix socket: /var/run/mysqld/mysqld.sock\n"
    "Time                 Id Command    Argument\n"
)


def rec_80(
    ts_iso: str,
    epoch: int,
    user: str,
    host: str,
    qt: float,
    lt: float,
    rs: int,
    re_: int,
    thread: int,
    errno: int,
    brecv: int,
    bsent: int,
    sort_rows: int,
    ctmp: int,
    ctmpd: int,
    smp: int,
    stmt: str,
    db: str | None = None,
) -> str:
    """One MySQL 8.0 log_slow_extra record (layout per the 8.0 docs:
    Query_time line, then the extended counters, then Start/End)."""
    lines = [
        f"# Time: {ts_iso}\n",
        f"# User@Host: {user}[{user}] @ {host} []  Id: {thread:5d}\n",
        f"# Query_time: {qt:.6f}  Lock_time: {lt:.6f} "
        f"Rows_sent: {rs}  Rows_examined: {re_}\n",
        f"# Thread_id: {thread}  Errno: {errno}  Killed: 0  "
        f"Bytes_received: {brecv}  Bytes_sent: {bsent}\n",
        "# Read_first: 1  Read_last: 0  Read_key: 3  Read_next: 0  "
        "Read_prev: 0\n",
        f"# Read_rnd: 0  Read_rnd_next: 5  Sort_merge_passes: {smp}  "
        "Sort_range_count: 0\n",
        f"# Sort_rows: {sort_rows}  Sort_scan_count: 0  "
        f"Created_tmp_disk_tables: {ctmpd}\n",
        f"# Created_tmp_tables: {ctmp}  Start: {ts_iso}  End: {ts_iso}\n",
    ]
    if db:
        lines.append(f"use {db};\n")
    lines.append(f"SET timestamp={epoch};\n")
    lines.append(f"{stmt};\n")
    return "".join(lines)


# 2024-03-01T00:00:00Z = 1709251200
RECORDS_80 = [
    rec_80(
        "2024-03-01T00:00:05.123456Z", 1709251205, "app", "web01",
        0.251100, 0.000021, 10, 2048, 81, 0, 312, 1156, 0, 1, 0, 0,
        "SELECT c FROM t1 WHERE id IN (1, 2, 3) AND name = 'abc'",
        db="shop",
    ),
    rec_80(
        "2024-03-01T00:00:09.000001Z", 1709251209, "app", "web02",
        1.500000, 0.000500, 0, 500000, 82, 1205, 98, 64, 12, 3, 1, 2,
        "UPDATE inventory SET qty = qty - 1 WHERE sku = 'A-100'",
        db="shop",
    ),
    rec_80(
        "2024-03-01T00:00:12.750000Z", 1709251212, "etl", "batch01",
        7.089000, 0.120000, 100000, 2500000, 83, 0, 2048, 884211,
        100000, 8, 4, 5,
        "SELECT o.id, SUM(l.qty) FROM orders o JOIN lines l "
        "ON l.oid = o.id GROUP BY o.id",
        db="dw",
    ),
    # admin command record (8.0 writes these too)
    "# Time: 2024-03-01T00:00:15.000000Z\n"
    "# User@Host: app[app] @ web01 []  Id:    81\n"
    "# Query_time: 0.000010  Lock_time: 0.000000 Rows_sent: 0  "
    "Rows_examined: 0\n"
    "# administrator command: Quit;\n",
    rec_80(
        "2024-03-01T00:00:20.500000Z", 1709251220, "app", "web01",
        0.302000, 0.000013, 3, 96, 84, 0, 151, 422, 0, 0, 0, 0,
        "SELECT c FROM t1 WHERE id IN (7, 8, 9) AND name = 'xyz'",
        db="shop",
    ),
]

# the rotation set reuses the 8.0 grammar: three segments, each opening
# with the server preamble a FLUSH LOGS rewrites, 2 events per segment
ROT_SEGMENTS = [
    PREAMBLE
    + rec_80(
        "2024-03-02T00:00:01.000000Z", 1709337601, "app", "web01",
        0.410000, 0.000020, 5, 320, 91, 0, 77, 512, 0, 1, 0, 0,
        "SELECT a FROM u WHERE uid = 42", db="shop",
    )
    + rec_80(
        "2024-03-02T00:10:02.000000Z", 1709338202, "app", "web02",
        0.520000, 0.000022, 6, 330, 92, 0, 78, 513, 0, 1, 0, 0,
        "SELECT a FROM u WHERE uid = 43", db="shop",
    ),
    PREAMBLE
    + rec_80(
        "2024-03-02T01:00:03.000000Z", 1709341203, "etl", "batch01",
        2.100000, 0.003000, 1000, 90000, 93, 0, 900, 70000, 1000, 2,
        1, 1,
        "SELECT d, COUNT(*) FROM f GROUP BY d", db="dw",
    )
    + rec_80(
        "2024-03-02T01:10:04.000000Z", 1709341804, "app", "web01",
        0.630000, 0.000024, 7, 340, 94, 0, 79, 514, 0, 1, 0, 0,
        "SELECT a FROM u WHERE uid = 44", db="shop",
    ),
    PREAMBLE
    + rec_80(
        "2024-03-02T02:00:05.000000Z", 1709344805, "app", "web02",
        0.740000, 0.000026, 8, 350, 95, 1062, 80, 515, 0, 1, 0, 0,
        "UPDATE u SET last = NOW() WHERE uid = 45", db="shop",
    )
    + rec_80(
        "2024-03-02T02:10:06.000000Z", 1709345406, "app", "web01",
        0.850000, 0.000028, 9, 360, 96, 0, 81, 516, 0, 1, 0, 0,
        "SELECT a FROM u WHERE uid = 46", db="shop",
    ),
]


def main() -> None:
    log80 = os.path.join(FIXTURES, "slowlog_80.log")
    with open(log80, "w", newline="") as f:
        f.write(PREAMBLE)
        f.writelines(RECORDS_80)
    print(f"wrote {log80}")

    os.makedirs(GZ_DIR, exist_ok=True)
    for i, seg in enumerate(ROT_SEGMENTS, start=1):
        path = os.path.join(GZ_DIR, f"slowlog_rot.log.{i}.gz")
        # mtime=0 + no filename header -> byte-reproducible archive
        with open(path, "wb") as raw:
            with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as gz:
                gz.write(seg.encode())
        print(f"wrote {path}")

    # golden event IR for the gz rotation set (the golden script only
    # globs plain *.log files)
    from scripts.gen_slowlog_golden import _write_single_file, golden_events_df
    from slowlog2clickhouse_spark.session import ensure_compat, get_session

    spark = ensure_compat(get_session())
    _write_single_file(
        golden_events_df(spark, GZ_DIR),
        os.path.join(FIXTURES, "golden", "slowlog_rot_gz_events.parquet"),
    )


if __name__ == "__main__":
    main()
