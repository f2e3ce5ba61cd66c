#!/usr/bin/env python
"""Sharded test runner — the full suite in parallel processes.

The container has no pytest-xdist, and the serial suite grew to ~13
minutes (VERDICT r8 #7). This runner launches N independent pytest
processes, each seeing a disjoint md5(nodeid)-sharded slice of the
collection (tests/conftest.py::pytest_collection_modifyitems), with:

  * SPARK_GRAFT_CPUS = 32/N      — each shard's local[K] JVM gets an
    equal core slice instead of N×32 oversubscription;
  * SPARK_GRAFT_TMP  = .../shard_i — ops that materialize under /tmp
    (sinks, streaming checkpoints, binary-docs fixtures) write to
    per-shard roots, so two shards running different TESTS that invoke
    the same op never race on a path. (Derby JDBC dbs are already
    per-call tempdirs; /tmp/derby.log is an append-only error log.)

Shard safety rests on test independence — the property driver_sim
--reverse already enforces for ops, and pytest convention for tests.

Usage:
    python scripts/ptest.py [N] [pytest args...]   # default N=4
Exit code: 0 iff every shard exits 0. Prints per-shard tails and a
combined pass/fail/wall summary.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:]
    n = 4
    if args and args[0].isdigit():
        n = int(args[0])
        args = args[1:]
    pytest_args = args or ["tests/", "-q"]
    total_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    per_shard = max(2, total_cpus // n)

    procs = []
    t0 = time.time()
    for i in range(n):
        env = dict(os.environ)
        # ptest IS the full-suite runner: include the `slow`-marked
        # probes the default driver-budget run deselects (conftest.py,
        # VERDICT r16 #6); override with SPARK_GRAFT_FULL_TESTS=0
        env.setdefault("SPARK_GRAFT_FULL_TESTS", "1")
        env["SPARK_GRAFT_TEST_SHARD"] = f"{i}/{n}"
        env["SPARK_GRAFT_CPUS"] = str(per_shard)
        env["SPARK_GRAFT_TMP"] = f"/tmp/slowlog2clickhouse_spark/shard_{i}"
        env["SPARK_GRAFT_DRIVER_MEM"] = os.environ.get(
            "SPARK_GRAFT_SHARD_MEM", "6g"
        )
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", *pytest_args],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        procs.append(p)

    passed = failed = 0
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate()
        tail = out.strip().splitlines()[-25:]
        summary = next(
            (ln for ln in reversed(tail) if re.search(r"\d+ (passed|failed)", ln)),
            "",
        )
        print(f"-- shard {i}/{n} (rc={p.returncode}): {summary.strip()}")
        if p.returncode != 0:
            rc = 1
            print("\n".join(tail))
        m = re.search(r"(\d+) passed", summary)
        passed += int(m.group(1)) if m else 0
        m = re.search(r"(\d+) failed", summary)
        failed += int(m.group(1)) if m else 0

    wall = time.time() - t0
    print(
        f"== ptest: {passed} passed, {failed} failed across {n} shards "
        f"in {wall:.0f}s =="
    )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
