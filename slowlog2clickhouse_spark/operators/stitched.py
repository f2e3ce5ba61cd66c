"""Distributed global rank / running sum — the scale-safe replacement
for a single-partition window (``Window.orderBy`` with no partition).

A partition-less window forces every row through ONE task
(`WindowExec: No Partition Defined`); fine over a bounded aggregate
(months, buckets), a scale-killer over an unbounded domain (users,
customers, event ids) — the exact weakness VERDICT r5 flagged in
events_rfm / orders_pareto / dq_sequence_gaps.

The classic distributed prefix-sum fixes it exactly:

1. ``repartitionByRange`` on the total order — partition ids are then
   monotone in the sort order (RangePartitioner assigns index 0 to the
   lowest range);
2. per-partition ``row_number`` / running sum — a PARTITIONED window,
   fully parallel;
3. per-partition counts/sums (≤ num_buckets rows) get a cumulative
   offset via a window over that provably-bounded table, broadcast
   back, and added to the local values.

Row-for-row identical to the global-window answer whenever the order
is TOTAL (callers must pass a unique tiebreak column); cumulative sums
are exact when the summed column is integral (callers convert rounded
decimals to fixed-point BIGINT first — the round-6 discipline of
SURVEY gotcha #12b made drift-proof: integer sums have no
accumulation-order drift at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def stitched_order(
    df: DataFrame,
    order_cols: list[Column],
    cum_cols: tuple[str, ...] = (),
    num_buckets: int | None = None,
) -> DataFrame:
    """Add ``rn`` (global row number, LONG) and ``cum_<c>`` (global
    running sum) columns for a total order given as Column expressions
    (must include a unique tiebreak; ``cum_cols`` should be integral
    for bit-exact stitching).

    Scale: THREE shuffles — two full-data (the range repartition, then
    the Exchange hashpartitioning(_pid) the per-bucket window inserts:
    Spark cannot prove range partitioning satisfies the window's
    required distribution) plus the tiny per-bucket aggregate — and
    one broadcast of ≤ num_buckets offset rows. The second full-data
    exchange is the price of the pattern; what it buys is that NO
    stage is single-partition — every pass keeps num_buckets-way
    parallelism, unlike the naive global window it replaces.
    """
    spark = df.sparkSession
    n = num_buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = df.repartitionByRange(n, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # `_pid` is NON-DETERMINISTIC (spark_partition_id over a sampled
    # RangePartitioner) and `parts` is consumed by TWO plan branches
    # (the window side and the bucket-totals side). If column pruning
    # makes the branches non-identical, ReuseExchange cannot dedupe
    # them, each branch re-samples range bounds independently, and the
    # two `_pid` assignments disagree — silently corrupting every rank
    # (ADVICE r6, high). localCheckpoint materializes the ranged data
    # ONCE (lazily, at the first action) and truncates lineage, so both
    # consumers read the same frozen `_pid`. Scale note: this is one
    # extra materialization of the ranged dataset to executor-local
    # storage (memory+disk) — the price of correctness, not reliant on
    # spark.sql.exchange.reuse staying enabled or on AQE planner
    # details; on a long-lived production cluster where executor loss
    # matters, swap for `.checkpoint()` to reliable storage.
    # Lifecycle (ADVICE r7): the checkpointed blocks live until the
    # session ends — a driver that rebuilds stitched plans in a loop
    # (bench/scaling sweeps) accumulates them. Spark exposes no
    # unpersist hook on a localCheckpoint'd *plan* (only the action
    # materializes it); loop drivers should call
    # spark.catalog.clearCache() / SparkContext cleanup between
    # sweeps, which scripts/scaling_sweep.py does per scale factor.
    parts = parts.localCheckpoint(eager=False)
    wloc = W.partitionBy("_pid").orderBy(*order_cols)
    out = parts.withColumn("_lrn", F.row_number().over(wloc))
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    for c in cum_cols:
        out = out.withColumn(
            f"_lcum_{c}",
            F.sum(c).over(wloc.rowsBetween(W.unboundedPreceding, 0)),
        )
        aggs.append(F.sum(c).alias(f"_bsum_{c}"))
    btots = parts.groupBy("_pid").agg(*aggs)
    # offsets: exclusive prefix over the ≤ num_buckets bucket-stats
    # rows — the ONE global window here runs over a provably-bounded
    # aggregate (allowlisted as such in tests/test_plan_lint.py)
    woff = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    off_cols = [
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off_cnt")
    ] + [
        F.coalesce(F.sum(f"_bsum_{c}").over(woff), F.lit(0)).alias(f"_off_{c}")
        for c in cum_cols
    ]
    offs = btots.select("_pid", *off_cols)
    out = out.join(F.broadcast(offs), "_pid")
    out = out.withColumn("rn", F.col("_lrn") + F.col("_off_cnt"))
    for c in cum_cols:
        out = out.withColumn(f"cum_{c}", F.col(f"_lcum_{c}") + F.col(f"_off_{c}"))
    drop = ["_pid", "_lrn", "_off_cnt"] + [
        x for c in cum_cols for x in (f"_lcum_{c}", f"_off_{c}")
    ]
    return out.drop(*drop)


def ranked_topk(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Global top-k WITH a rank column, scale-safe: ``orderBy + limit``
    plans as TakeOrderedAndProject (per-partition k-row heaps, one
    k-row merge — no global sort, no full-data single-partition
    window), and only then does ``row_number`` run — over the k-row
    result. Identical output to the naive
    ``row_number().over(global order) <= k`` filter whenever the order
    is total (callers pass a unique tiebreak).

    The residual global window is Limit-bounded; the plan lint
    (tests/test_plan_lint.py) auto-recognizes that shape as safe.
    """
    top = df.orderBy(*order_cols).limit(k)
    return top.withColumn(
        rank_col, F.row_number().over(W.orderBy(*order_cols))
    )


def ntile_from_rn(rn: Column, n: Column, k: int) -> Column:
    """Exact ``ntile(k)`` from a global row number and total count —
    SQL-standard tile sizing: the first ``n % k`` tiles get
    ``n div k + 1`` rows, the rest ``n div k`` (matches Spark's and
    DuckDB's ntile bit-for-bit, so the oracle can keep plain ntile).
    """
    # float-division-then-floor is exact for positive ints < 2^52
    # (the quotient is >half-ulp away from the next integer)
    base = (n / k).cast("long")  # n div k (n, k positive)
    r = n % k
    big = base + 1
    first_block = r * big
    return F.when(
        rn <= first_block, ((rn - 1) / big).cast("long") + 1
    ).otherwise(
        r + ((rn - first_block - 1) / base).cast("long") + 1
    ).cast("int")
