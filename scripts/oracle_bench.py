#!/usr/bin/env python
"""Time every registered DuckDB oracle standalone and list the hogs.

The driver's correctness gate and our parity sweeps pay the ORACLE's
runtime too — and a DuckDB plan can be pathologically worse than the
Spark plan it checks (gotcha #21: an inequality join nested-loops and
re-inlines the signature CTE chain per probe; dedup_keep_best's oracle
took 45 minutes at sf0.1 while its Spark side took 3 s). Run this
after adding an oracle with any non-equi join or heavy CTE:

    python scripts/oracle_bench.py [sf_dir]     # default sf0.1

Prints total oracle wall and the slowest 15; anything over ~10 s at
sf0.1 deserves the same equi-join/MATERIALIZED treatment the dedup
family got in round 8 (42.7 s total for ~300 oracles afterwards).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from slowlog2clickhouse_spark.io import TABLES  # noqa: E402
from slowlog2clickhouse_spark.registry import all_ops  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    times: list[tuple[float, str]] = []
    errs = 0
    for name, o in all_ops().items():
        if o.oracle is None:
            continue
        t0 = time.time()
        try:
            con.execute(o.oracle).fetchall()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"ERR {name}: {str(e)[:100]}", flush=True)
            errs += 1
            continue
        times.append((time.time() - t0, name))
    times.sort(reverse=True)
    print(f"total oracle wall: {sum(t for t, _ in times):.1f}s "
          f"({len(times)} oracles, {errs} errors) @ {sf_dir}")
    for t, n in times[:15]:
        print(f"{t:8.2f}s {n}")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
