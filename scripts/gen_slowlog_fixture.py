"""Generate the deterministic slow-log text fixture (FIXTURES.md §1).

Seed=42, UTC. Covers: MySQL 5.7 ISO and 5.6 compact `# Time:` formats,
Percona extended metrics, records with missing optional metric lines,
`use db;` switches, `# administrator command:` records, multi-line
statements, out-of-order timestamps (for streaming late-data tests),
and one statement containing a literal '# Time:' inside a quoted
string (parser trap).

Usage: python scripts/gen_slowlog_fixture.py [n_records] [out_path]
"""

from __future__ import annotations

import random
import sys
from datetime import datetime, timedelta

TEMPLATES = [
    "SELECT c FROM t1 WHERE id IN ({ints}) AND name = '{s}'",
    "SELECT * FROM orders WHERE o_orderkey = {i} AND status = '{s}'",
    "UPDATE users SET last_seen = {i} WHERE user_id = {i2}",
    "INSERT INTO metrics VALUES ({i}, {f}, '{s}'), ({i2}, {f2}, '{s2}')",
    "SELECT a.x, b.y FROM a JOIN b ON a.id = b.id WHERE a.ts > {i}",
    "DELETE FROM sessions WHERE expires < {i}",
    "SELECT count(*) FROM logs WHERE level = '{s}' AND ts BETWEEN {i} AND {i2}",
    "SELECT p.name, sum(o.qty)\nFROM products p\nJOIN orders o ON p.id = o.pid\nWHERE o.day = {i}\nGROUP BY p.name",
    "SELECT note FROM memos WHERE body = 'prefix # Time: not a header {i}'",
    "SELECT /* hint {i} */ col FROM wide_table WHERE k = {i2}",
] + [f"SELECT c{k} FROM table{k} WHERE pk = {{i}} -- q{k}" for k in range(20)]

USERS = ["appuser", "batch", "analytics", "root"]
HOSTS = [("web01", "10.0.0.17"), ("web02", "10.0.0.18"), ("cron01", "10.0.1.5")]
DBS = ["shop", "warehouse", "analytics"]


def gen(n: int, out: str) -> None:
    rng = random.Random(42)
    base = datetime(2024, 1, 1, 0, 0, 0)
    lines: list[str] = []
    ts = base
    for rec in range(n):
        ts = ts + timedelta(seconds=rng.randint(0, 8))
        # occasional out-of-order event (late data)
        ev_ts = ts - timedelta(seconds=rng.randint(60, 300)) if rng.random() < 0.03 else ts
        user = rng.choice(USERS)
        host, ip = rng.choice(HOSTS)
        db = rng.choice(DBS)
        if rng.random() < 0.5:  # 5.7 ISO format
            lines.append(f"# Time: {ev_ts.strftime('%Y-%m-%dT%H:%M:%S')}.{rng.randint(0, 999999):06d}Z")
        else:  # 5.6 compact format
            lines.append(f"# Time: {ev_ts.strftime('%y%m%d %H:%M:%S')}")
        lines.append(
            f"# User@Host: {user}[{user}] @ {host} [{ip}]  Id: {1000 + rec % 50:5d}"
        )
        if rng.random() < 0.02:  # admin command record
            lines.append(f"# Query_time: {rng.uniform(0, 0.001):.6f}  Lock_time: 0.000000"
                         "  Rows_sent: 0  Rows_examined: 0")
            lines.append("# administrator command: Quit;")
            continue
        if rng.random() < 0.7:
            lines.append(f"# Schema: {db}  Last_errno: 0  Killed: 0")
        qt = rng.expovariate(5.0)
        lines.append(
            f"# Query_time: {qt:.6f}  Lock_time: {rng.uniform(0, 0.01):.6f}"
            f"  Rows_sent: {rng.randint(0, 100)}  Rows_examined: {rng.randint(0, 10000)}"
        )
        if rng.random() < 0.8:  # optional metric lines sometimes missing
            lines.append(
                f"# Rows_affected: {rng.randint(0, 10)}  Bytes_sent: {rng.randint(100, 100000)}"
            )
            lines.append(
                f"# Tmp_tables: {rng.randint(0, 3)}  Tmp_disk_tables: 0"
                f"  Tmp_table_sizes: {rng.choice([0, 16384, 262144])}"
            )
            lines.append(
                f"# QC_Hit: No  Full_scan: {rng.choice(['Yes', 'No'])}  Full_join: No"
                f"  Tmp_table: {rng.choice(['Yes', 'No'])}  Tmp_table_on_disk: No"
            )
            lines.append("# Filesort: No  Filesort_on_disk: No  Merge_passes: 0")
        if rng.random() < 0.4:  # Percona InnoDB extended metrics
            lines.append(
                f"# InnoDB_IO_r_ops: {rng.randint(0, 50)}  InnoDB_IO_r_bytes:"
                f" {rng.randint(0, 819200)}  InnoDB_IO_r_wait: {rng.uniform(0, 0.01):.6f}"
            )
            lines.append(
                "# InnoDB_rec_lock_wait: 0.000000  InnoDB_queue_wait: 0.000000"
            )
            lines.append(f"# InnoDB_pages_distinct: {rng.randint(1, 64)}")
        if rng.random() < 0.05:  # unknown key -> extra_metrics escape hatch
            lines.append(f"# Custom_metric: {rng.randint(1, 9)}")
        if rng.random() < 0.15:
            lines.append(f"use {db};")
        lines.append(f"SET timestamp={int(ev_ts.timestamp())};")
        tpl = rng.choice(TEMPLATES)
        q = tpl.format(
            ints=", ".join(str(rng.randint(1, 9999)) for _ in range(rng.randint(1, 6))),
            i=rng.randint(1, 10**6),
            i2=rng.randint(1, 10**6),
            f=round(rng.uniform(0, 100), 3),
            f2=round(rng.uniform(0, 100), 3),
            s=rng.choice(["abc", "def", "xyz"]),
            s2=rng.choice(["abc", "def", "xyz"]),
        )
        lines.append(q + ";")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {n} records to {out}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out = sys.argv[2] if len(sys.argv) > 2 else "tests/fixtures/slowlog_small.log"
    gen(n, out)
