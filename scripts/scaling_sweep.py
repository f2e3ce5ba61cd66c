"""Warm wall-clock sweep across the sf0.001/0.01/0.1 testdata range —
the measurement protocol behind SCALING.md's tables.

Usage:
    python scripts/scaling_sweep.py <op_id> [<op_id> ...]
    python scripts/scaling_sweep.py --runs 5 <op_id> ...

Protocol (same as every prior round, so numbers are comparable):
one shared warm JVM; per (op, sf) the plan is REBUILT each run (as
bench.py does) and driven with a count() action; the reported figure
is the median of `--runs` (default 5) after one unrecorded warmup.
Prints a markdown row per op: | op | sf0.001 | sf0.01 | sf0.1 | ratio |.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 5
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    if not args:
        print(__doc__)
        sys.exit(2)

    from slowlog2clickhouse_spark.registry import all_ops
    from slowlog2clickhouse_spark.session import get_session

    spark = get_session()
    ops = all_ops()
    unknown = [a for a in args if a not in ops]
    if unknown:
        print(f"unknown ops: {unknown}")
        sys.exit(2)

    for name in args:
        meds = []
        for sf in SFS:
            # drop blocks left by prior iterations (cached plans +
            # stitched_order's lazy localCheckpoints accumulate across
            # a sweep loop — ADVICE r7; RDD cleanup guards the sweep's
            # memory, not any measured plan)
            spark.catalog.clearCache()
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
            ops[name].fn(spark, sf).count()  # warmup, unrecorded
            times = []
            for _ in range(runs):
                t0 = time.monotonic()
                ops[name].fn(spark, sf).count()
                times.append(time.monotonic() - t0)
            meds.append(statistics.median(times))
        ratio = meds[2] / meds[0] if meds[0] else float("inf")
        print(
            f"| {name} | {meds[0]:.2f} | {meds[1]:.2f} | {meds[2]:.2f} "
            f"| {ratio:.1f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
