"""Fleet-width DRIVER POLL probe (r12 VERDICT #3): what does one
``latestOffset()`` trigger cost at 200-500 tailed files?

The multi-tail reader's poll loop is pure driver-side filesystem work
(glob + per-file stamp); no Spark session is needed to measure it, so
this probe drives SlowlogMultiTailStreamReader directly:

  * cold poll     — first latestOffset(): every file is stamped
                    (stat + open + head hash + backward tail scan);
  * idle polls    — nothing changed: the r13 stat-unchanged fast path
                    should make each file cost ONE os.stat;
  * no-cache polls— the same idle polls with the stat cache cleared
                    each trigger (the pre-r13 behavior, for the
                    speedup column);
  * grow poll     — one file grew: only it re-stamps.

Prints one JSON line per fleet width with per-poll latency (median of
``polls``), offset-dict JSON size, and the fast-path speedup; the
SCALING.md fleet-width table quotes these.

Usage: python scripts/fleet_width_probe.py [widths...] (default 200 500)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slowlog2clickhouse_spark.operators.slowlog_ops import FIXTURE_LOG  # noqa: E402
from slowlog2clickhouse_spark.sources.slowlog_datasource import (  # noqa: E402
    SlowlogMultiTailStreamReader,
)

POLLS = 20


def probe(width: int) -> dict:
    base = f"/tmp/fleet_width_probe_{width}"
    logs = os.path.join(base, "logs")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(logs)
    txt = open(FIXTURE_LOG).read()
    for i in range(width):
        with open(os.path.join(logs, f"host_{i:04d}.log"), "w") as f:
            f.write(
                re.sub(r"# Time: 20(\d\d)-", f"# Time: 21{i % 90:02d}-", txt)
            )

    r = SlowlogMultiTailStreamReader({"path": logs})

    t0 = time.perf_counter()
    off = r.latestOffset()
    cold_s = time.perf_counter() - t0

    idle = []
    for _ in range(POLLS):
        t0 = time.perf_counter()
        off = r.latestOffset()
        idle.append(time.perf_counter() - t0)

    nocache = []
    for _ in range(POLLS):
        r._stat_cache.clear()  # pre-r13 behavior: stamp every file
        t0 = time.perf_counter()
        off = r.latestOffset()
        nocache.append(time.perf_counter() - t0)

    # one file grows: the fast path must miss for exactly that file
    with open(os.path.join(logs, "host_0000.log"), "a") as f:
        f.write(
            "\n# Time: 2031-01-01T00:00:00.000000Z\n"
            "# Query_time: 0.5  Lock_time: 0.0\nSELECT 1;\n"
        )
    t0 = time.perf_counter()
    off2 = r.latestOffset()
    grow_s = time.perf_counter() - t0
    grown = sum(
        1
        for p, e in off2["files"].items()
        if off["files"].get(p, {}).get("pos") != e["pos"]
    )

    idle_med = statistics.median(idle)
    nocache_med = statistics.median(nocache)
    out = {
        "width": width,
        "cold_poll_ms": round(cold_s * 1e3, 2),
        "idle_poll_ms": round(idle_med * 1e3, 3),
        "idle_poll_nocache_ms": round(nocache_med * 1e3, 3),
        "fastpath_speedup": round(nocache_med / max(idle_med, 1e-9), 1),
        "idle_stat_per_file_us": round(idle_med / width * 1e6, 2),
        "offset_entries": len(off["files"]),
        "offset_json_bytes": len(json.dumps(off)),
        "grow_poll_ms": round(grow_s * 1e3, 2),
        "files_restamped_on_grow": grown,
    }
    shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    widths = [int(a) for a in sys.argv[1:]] or [200, 500]
    for w in widths:
        print(json.dumps(probe(w)))


if __name__ == "__main__":
    main()
