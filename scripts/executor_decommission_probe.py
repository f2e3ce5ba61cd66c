"""Graceful executor decommissioning probe on local-cluster.

Complements scripts/executor_loss_probe.py (SIGKILL → task re-queue +
recompute): at 100 TB the recovery path you actually WANT on spot/
preemptible nodes is `spark.decommission.enabled` — SIGPWR tells the
executor to stop accepting tasks and MIGRATE its cached RDD blocks and
shuffle blocks to peers before exiting, so downstream stages read
migrated blocks instead of recomputing lineage. This probe exercises
that path end to end on a 2-executor local-cluster:

  1. cache an aggregate across both executors, sever its lineage from
     any further need of executor 0 being alive;
  2. SIGPWR executor 0 (the Spark decommission signal);
  3. assert the executor exits GRACEFULLY (process gone without
     SIGKILL) within the timeout;
  4. re-read the cached aggregate and assert exact correctness.

Executor discovery is scoped to THIS process's descendants (driver JVM
→ Worker JVMs → executor JVMs), so concurrent Spark sessions on the
box can't pollute the victim selection (the first draft of this probe
SIGPWRed a stale executor from an earlier session — SIGPWR's default
disposition is terminate, so an unscoped pgrep is a footgun).

Usage: python scripts/executor_decommission_probe.py
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def descendants(pid: int) -> set[int]:
    out = subprocess.run(
        ["ps", "-eo", "pid,ppid"], capture_output=True, text=True
    ).stdout
    children: dict[int, list[int]] = {}
    for line in out.splitlines()[1:]:
        parts = line.split()
        if len(parts) == 2:
            c, p = int(parts[0]), int(parts[1])
            children.setdefault(p, []).append(c)
    seen: set[int] = set()
    stack = [pid]
    while stack:
        cur = stack.pop()
        for c in children.get(cur, []):
            if c not in seen:
                seen.add(c)
                stack.append(c)
    return seen


def my_executor_pids() -> set[int]:
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True,
        text=True,
    ).stdout
    all_ex = {int(p) for p in out.split()}
    return all_ex & descendants(os.getpid())


def main() -> int:
    import pyspark

    os.environ.setdefault(
        "SPARK_HOME", os.path.dirname(os.path.abspath(pyspark.__file__))
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .config("spark.decommission.enabled", "true")
        .config("spark.storage.decommission.enabled", "true")
        .config("spark.storage.decommission.rddBlocks.enabled", "true")
        .config("spark.storage.decommission.shuffleBlocks.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    deadline = time.time() + 90
    while time.time() < deadline and len(my_executor_pids()) < 2:
        time.sleep(1)
    before = my_executor_pids()
    assert len(before) >= 2, f"expected 2 executors, saw {before}"
    print(f"executors (this session only): {sorted(before)}")

    # cache a shuffled aggregate so blocks live on BOTH executors
    df = spark.range(0, 1_000_000, 1, 16).withColumn("k", F.col("id") % 1000)
    agg = df.groupBy("k").count().cache()
    n_groups = agg.count()
    assert n_groups == 1000, n_groups

    victim = sorted(before)[0]
    os.kill(victim, signal.SIGPWR)
    print(f"SIGPWR (decommission) sent to executor pid {victim}")

    # graceful exit: the executor migrates blocks then terminates itself
    t0 = time.time()
    exited = False
    while time.time() - t0 < 120:
        if victim not in my_executor_pids():
            exited = True
            break
        time.sleep(1)
    exit_wall = time.time() - t0
    print(f"victim exited gracefully: {exited} (after {exit_wall:.0f}s)")

    total = agg.agg(F.sum("count").alias("s")).collect()[0]["s"]
    distinct = agg.count()
    ok = total == 1_000_000 and distinct == 1000
    print(
        f"post-decommission correctness: sum={total} (want 1000000), "
        f"groups={distinct} (want 1000) -> {ok}"
    )
    print(f"executors now: {sorted(my_executor_pids())}")
    print("PASS" if (ok and exited) else "FAIL")
    spark.stop()
    return 0 if (ok and exited) else 1


if __name__ == "__main__":
    raise SystemExit(main())
