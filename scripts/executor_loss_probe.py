"""Executor-loss recovery probe on local-cluster (multi-executor).

SCALING.md's local-cluster section listed executor loss/recovery as
out-of-reach; it isn't quite — local-cluster executors are real OS
processes, so we can SIGKILL one mid-query and observe the production
recovery path: TaskSetManager marks the executor lost, re-queues its
tasks (spark.task.maxFailures=4 default), the standalone Worker
re-launches a replacement executor, and the job completes with a
correct result.

Method: run a registry op (dedup_cluster — multi-round shuffle, long
enough to straddle a kill) under local-cluster[2,4,2048]; 2 s into the
action, SIGKILL one CoarseGrainedExecutorBackend; compare the result
against the same op's DuckDB oracle. PASS = oracle parity despite the
loss, with the victim confirmed gone; replacement-executor launch is
reported as evidence but not gated (the master relaunches
asynchronously).

Usage: python scripts/executor_loss_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from slowlog2clickhouse_spark.io import TABLES  # noqa: E402
from tests.parity import canon_rows, duck_result, spark_result  # noqa: E402

OP = "dedup_cluster"


def executor_pids() -> set[int]:
    """This session's executors only: scoped to our process subtree so
    a stale/concurrent session's executor can never be selected as the
    victim (SIGKILLing a foreign process would print PASS while
    proving nothing — same footgun the decommission probe hit)."""
    from executor_decommission_probe import descendants

    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True,
        text=True,
    ).stdout
    return {int(p) for p in out.split()} & descendants(os.getpid())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import pyspark

    os.environ.setdefault(
        "SPARK_HOME", os.path.dirname(os.path.abspath(pyspark.__file__))
    )
    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from slowlog2clickhouse_spark.session import ship_package

    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")

    # wait for both executors to register and capture their pids
    deadline = time.time() + 60
    while time.time() < deadline and len(executor_pids()) < 2:
        time.sleep(1)
    before = executor_pids()
    assert len(before) >= 2, f"expected 2 executors, saw {before}"
    print(f"executors before: {sorted(before)}")

    victim = sorted(before)[0]
    killed_at = []

    def assassin() -> None:
        time.sleep(2.0)
        os.kill(victim, signal.SIGKILL)
        killed_at.append(time.time())
        print(f"SIGKILLed executor pid {victim}")

    q = entrymod.queries()[OP]
    t = threading.Thread(target=assassin)
    t0 = time.time()
    t.start()
    sdf = q(spark, sf_dir)
    scols, srows = spark_result(sdf)
    wall = time.time() - t0
    t.join()
    kill_desc = f"+{killed_at[0] - t0:.1f}s" if killed_at else "never (os.kill failed)"
    assert killed_at and killed_at[0] - t0 < wall, (
        f"kill at {kill_desc} missed the {wall:.1f}s action — "
        "result proves nothing about recovery; rerun with a longer op"
    )

    con = duckdb.connect()
    for tb in TABLES:
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tb}.parquet')"
        )
    dcols, drows = duck_result(con, entrymod.oracle_sql()[OP])
    ok = (
        sorted(scols) == sorted(dcols)
        and len(srows) == len(drows)
        and canon_rows(scols, srows) == canon_rows(dcols, drows)
    )

    after = executor_pids()
    replaced = bool(after - before)
    print(
        f"{OP}: wall {wall:.1f}s, kill at +{killed_at[0]-t0:.1f}s, "
        f"oracle parity: {ok}, executors after: {sorted(after)}, "
        f"replacement launched: {replaced}"
    )
    verdict = ok and victim not in after
    print("PASS" if verdict else "FAIL")
    spark.stop()
    return 0 if verdict else 1


if __name__ == "__main__":
    raise SystemExit(main())
