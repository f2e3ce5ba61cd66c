#!/usr/bin/env python
"""Capture `.explain("formatted")` plans + isolated noop-sink timings
for named registry ops / bench gate queries (r16 optimization round).

Usage:
    python scripts/plan_capture.py before q_agg_groupby dedup_cluster ...
    python scripts/plan_capture.py after  dedup_cluster
    python scripts/plan_capture.py before --all-bench     # every bench row
    ... --no-time        # plans only, skip the timed noop runs

Writes plans/r16/<name>_<tag>.txt and prints one JSON line per op:
    {"name": ..., "noop_s": [t1, t2, t3], "tag": ...}

Timing methodology (guide §1.4): the timed action is
``df.write.format("noop").mode("overwrite").save()`` — computes every
column of every row, no sink cost, no driver collect. Jobs are
labelled via setJobDescription (guide §1.5). Streaming ops (whose fn
runs the query itself and returns a materialized batch DF) are timed
around the fn call instead, which includes their drain — stated in
the output as "mode": "fn+noop".
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slowlog2clickhouse_spark.io import register_views  # noqa: E402
from slowlog2clickhouse_spark.registry import all_ops  # noqa: E402
from slowlog2clickhouse_spark.session import get_session  # noqa: E402

# ops whose fn() executes work eagerly (streaming drains, foreachBatch
# merges, sink ops): time the fn call itself, not just the noop of its
# returned DF
EAGER_OPS = {
    "stream_slowlog_tail",
    "stream_slowlog_tail_multi",
    "stream_slowlog_tail_sharded",
    "stream_journey_state",
    "stream_slowlog_classes",
    "stream_slowlog_to_jdbc",
    "stream_stateful_counter",
    "stream_classes_pctl_merge",
    "slowlog_classes_incremental",
    "slowlog_classes_incremental_pctl",
}

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_TAG", "r17"),
)


def bench_rows() -> list[str]:
    import bench

    return list(bench.BASELINE_QUERIES) + list(bench.EXTRA_OPS)


def build_df(spark, name, sf_dir, ops):
    import bench

    if name in bench.BASELINE_QUERIES:
        return spark.sql(bench.BASELINE_QUERIES[name])
    if name == "slowlog_pipeline":
        from slowlog2clickhouse_spark.operators.slowlog_ops import FIXTURE_LOG
        from slowlog2clickhouse_spark.plans.pipeline import ingest_slowlog

        return ingest_slowlog(spark, FIXTURE_LOG)
    if name == "q_semi_anti_rewrite":
        return ops["join_semi_anti_rewrite"].fn(spark, sf_dir)
    return ops[name].fn(spark, sf_dir)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    do_time = True
    if "--no-time" in names:
        names.remove("--no-time")
        do_time = False
    if "--all-bench" in names:
        names.remove("--all-bench")
        names = bench_rows() + names
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_session(app_name=f"plan_capture_{tag}")
    register_views(spark, sf_dir)
    ops = all_ops()
    from bench import _drop_persisted_rdds

    for name in names:
        eager = name in EAGER_OPS
        t_build0 = time.time()
        df = build_df(spark, name, sf_dir, ops)
        t_build = time.time() - t_build0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        times = []
        if do_time:
            # rebuild per rep (bench.py's time_df shape): ops with
            # internal localCheckpoints must re-materialize, since the
            # persisted blocks are dropped between reps
            spark.sparkContext.setJobDescription(f"{name} [{tag}] warmup")
            if not eager:
                df.write.format("noop").mode("overwrite").save()
            _drop_persisted_rdds(spark)
            for i in range(3):
                spark.sparkContext.setJobDescription(f"{name} [{tag}] rep{i}")
                t0 = time.time()
                d2 = build_df(spark, name, sf_dir, ops)
                d2.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
                _drop_persisted_rdds(spark)
            spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "name": name,
                    "tag": tag,
                    "mode": "fn+noop" if eager else "noop",
                    "build_s": round(t_build, 3),
                    "noop_s": times,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
