"""AQE skew-join split probe on local-cluster (remote shuffle).

The engine's skew story has three tiers (operators/skew.py): explicit
salting (`join_salted_skew`), null-key isolation
(`join_null_skew_isolation`), and — for skew discovered only at
runtime — AQE's OptimizeSkewedJoin, which this repo's sessions enable
by default (session.py). The first two are oracle-verified ops; this
probe closes the third tier's evidence gap by making AQE actually
split a skewed partition under a REAL multi-JVM shuffle and asserting
it from the executed plan (`SortMergeJoin(skew=true)` +
`AQEShuffleRead coalesced and skewed`), not from timing.

Two decline-conditions found while building this probe, worth knowing
when a production plan mysteriously refuses to split (each reproduced
here by construction):

1. **A same-key aggregate downstream of the join blocks the split.**
   `join(dim, "k").groupBy("k")` lets the aggregate reuse the join's
   hash(k) output partitioning; splitting a partition would break that
   requirement, so OptimizeSkewedJoin declines (unless
   spark.sql.adaptive.forceOptimizeSkewedJoin accepts the extra
   shuffle). The probe aggregates globally for this reason — and at
   100 TB, a skewed join feeding a same-key groupBy is exactly the
   shape to rewrite (pre-aggregate, or salt via agg_salted_twophase).
2. **Skew detection sees COMPRESSED map-output sizes.** A skewed key
   whose rows are low-entropy (constant key, pruned payload) LZ4s to
   almost nothing and stays under skewedPartitionThresholdInBytes —
   the first draft's 1.8M-row hot partition read as "tiny", got
   `AQEShuffleRead coalesced`, and no split. Column pruning compounds
   it: an aggregate that reduces to count(1) strips the payload before
   the exchange. The probe keeps an md5 payload alive through min().

Thresholds are lowered so the ~50 MB hot partition trips the splitter
at sandbox size; at 100 TB the defaults (256 MB, 5x median) do the
same job. Broadcast is disabled only to force the shuffle join whose
skew is the phenomenon under test.

Usage: python scripts/aqe_skew_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import pyspark

    os.environ.setdefault(
        "SPARK_HOME", os.path.dirname(os.path.abspath(pyspark.__file__))
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1m",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # ~90% of 2M fact rows on key 7; md5 payload keeps the hot
    # partition incompressible AND un-prunable (min() consumes it)
    fact = (
        spark.range(0, 2_000_000, 1, 16)
        .withColumn(
            "k",
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(
                (F.col("id") % 2000).cast("long")
            ),
        )
        .withColumn("payload", F.md5(F.col("id").cast("string")))
    )
    dim = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )

    joined = fact.join(dim, "k").agg(
        F.count("*").alias("n"),
        F.min("payload").alias("mp"),
        F.sum("v").alias("sv"),
    )
    row = joined.collect()[0]
    ok_counts = row["n"] == 2_000_000

    plan = joined._jdf.queryExecution().executedPlan().toString()
    skew_applied = "skew=true" in plan and "skewed" in plan
    print(f"join row count: {row['n']} (want 2000000)")
    print(f"executed plan shows skew split: {skew_applied}")
    for line in plan.splitlines():
        if "SortMergeJoin" in line or "AQEShuffleRead" in line:
            print("  " + line.strip()[:110])
            if "Initial Plan" in line:
                break
    print("PASS" if (ok_counts and skew_applied) else "FAIL")
    spark.stop()
    return 0 if (ok_counts and skew_applied) else 1


if __name__ == "__main__":
    raise SystemExit(main())
