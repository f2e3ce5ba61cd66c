"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All operators live in the ``slowlog2clickhouse_spark`` package and
register themselves in ``slowlog2clickhouse_spark.registry``; this
module is a thin adapter over that registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from slowlog2clickhouse_spark.registry import all_ops  # noqa: E402
from slowlog2clickhouse_spark.session import ensure_compat  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference pipeline's heart: time-bucketed per-class metric
    stats (SURVEY.md §2 agg_time_bucket + agg_groupby_stats).
    """
    ensure_compat(spark)
    ops = all_ops()
    return ops["agg_time_bucket"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_compat(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(o.fn) for name, o in all_ops().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible op; rows-only ops
    (engine-specific hashes, sampling, sketches, streaming) omitted."""
    return {name: o.oracle for name, o in all_ops().items() if o.oracle is not None}
