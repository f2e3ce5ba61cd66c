#!/usr/bin/env python
"""Z-order pruning PAYOFF, measured (VERDICT r9 #7).

tests/test_sinks.py pins the layout geometry (per-file range coverage
on both dims well below a stripe); this probe measures the number that
geometry buys: ROW GROUPS READ for (user-range x time-range) rectangle
predicates on the z-ordered layout vs the single-column time-sorted
layout, at x10 scale (the stress corpus: 1M events).

Both layouts are written with identical knobs (8 range partitions,
small parquet.block.size so each file holds many row groups — the
granularity parquet min/max skipping actually operates at). A reader
must fetch every row group whose [min, max] stats intersect the
predicate on EVERY conjunct; the probe counts those intersections from
the footers — exactly the arithmetic the parquet reader's filter
pushdown performs, with no scheduler noise.

Usage: python scripts/zorder_pruning_probe.py
Requires the x10 corpus (scripts/stress_probe.py builds it on first
run; this script builds events-only if absent).
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

STRESS = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/spark_graft_stress_x10")
OUT = "/tmp/spark_graft_zorder_probe"
N_PREDICATES = 8
FRAC = 0.1  # each rectangle spans 10% of each dimension


def layouts(spark):
    from slowlog2clickhouse_spark.operators.sinks_ops import _spread16

    src = f"{STRESS}/events.parquet"
    if not os.path.exists(src):
        raise SystemExit(
            f"{src} missing — run scripts/stress_probe.py once to build it"
        )
    ev = spark.read.parquet(src).select(
        "event_id",
        "user_id",
        F.unix_timestamp(F.date_trunc("minute", F.col("ts"))).alias(
            "minute_epoch"
        ),
    )
    stats = ev.agg(
        F.min("user_id").alias("ulo"),
        F.greatest(F.max("user_id") - F.min("user_id"), F.lit(1)).alias("uspan"),
        F.min("minute_epoch").alias("mlo"),
        F.greatest(
            F.max("minute_epoch") - F.min("minute_epoch"), F.lit(1)
        ).alias("mspan"),
    )
    srow = stats.collect()[0]
    u16 = F.expr("div((user_id - ulo) * 65535, uspan)")
    m16 = F.expr("div((minute_epoch - mlo) * 65535, mspan)")
    z = _spread16(u16).bitwiseOR(F.shiftleft(_spread16(m16), 1))
    with_z = ev.join(F.broadcast(stats)).select(
        "event_id", "user_id", "minute_epoch", z.alias("zval")
    )
    # identical knobs for both layouts: 8 range partitions, ~128 KiB
    # row groups so skipping operates at sub-file granularity
    for name, key in (("zorder", "zval"), ("timesort", "minute_epoch")):
        (
            with_z.repartitionByRange(8, key)
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .option("parquet.block.size", 128 * 1024)
            .parquet(f"{OUT}/{name}")
        )
    return srow


def row_group_stats(path):
    groups = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            cols = {
                g.column(i).path_in_schema: g.column(i).statistics
                for i in range(g.num_columns)
            }
            groups.append(
                (
                    cols["user_id"].min,
                    cols["user_id"].max,
                    cols["minute_epoch"].min,
                    cols["minute_epoch"].max,
                    g.num_rows,
                )
            )
    return groups


def main() -> None:
    from slowlog2clickhouse_spark.session import get_session

    spark = get_session(app_name="zorder_probe")
    srow = layouts(spark)
    ulo, uspan = srow["ulo"], srow["uspan"]
    mlo, mspan = srow["mlo"], srow["mspan"]

    z_groups = row_group_stats(f"{OUT}/zorder")
    t_groups = row_group_stats(f"{OUT}/timesort")
    print(
        f"row groups: zorder={len(z_groups)} timesort={len(t_groups)}"
        f" (total rows {sum(g[4] for g in z_groups)})"
    )
    print()
    print("| predicate (user% x time%) | rg read z-order | rg read time-sort | rows scanned z / t | rows matched |")
    print("|---|---|---|---|---|")
    tot_z = tot_t = 0
    for k in range(N_PREDICATES):
        # rectangles walk the diagonal so no single stripe gets lucky
        uo = (k / N_PREDICATES) * (1 - FRAC)
        to = ((N_PREDICATES - 1 - k) / N_PREDICATES) * (1 - FRAC)
        u_lo, u_hi = ulo + uo * uspan, ulo + (uo + FRAC) * uspan
        t_lo, t_hi = mlo + to * mspan, mlo + (to + FRAC) * mspan

        def read(groups):
            n = rows = 0
            for umin, umax, tmin, tmax, nr in groups:
                if umin <= u_hi and umax >= u_lo and tmin <= t_hi and tmax >= t_lo:
                    n += 1
                    rows += nr
            return n, rows

        nz, rz = read(z_groups)
        nt, rt = read(t_groups)
        matched = (
            spark.read.parquet(f"{OUT}/zorder")
            .where(
                (F.col("user_id") >= u_lo)
                & (F.col("user_id") <= u_hi)
                & (F.col("minute_epoch") >= t_lo)
                & (F.col("minute_epoch") <= t_hi)
            )
            .count()
        )
        tot_z += nz
        tot_t += nt
        print(
            f"| u[{uo:.0%},{uo + FRAC:.0%}] x t[{to:.0%},{to + FRAC:.0%}]"
            f" | {nz}/{len(z_groups)} | {nt}/{len(t_groups)}"
            f" | {rz} / {rt} | {matched} |"
        )
    print(
        f"| **total** | **{tot_z}/{N_PREDICATES * len(z_groups)}**"
        f" | **{tot_t}/{N_PREDICATES * len(t_groups)}** | | |"
    )


if __name__ == "__main__":
    main()
