"""SparkSession factory.

Defaults follow SURVEY.md §7 M0: local master, UTC session timezone
(the DuckDB oracle is UTC), AQE enabled, shuffle partitions sized to
local cores (32 — at cluster scale this is overridden per-job), and
``spark.sql.legacy.parquet.nanosAsLong=true`` so the driver's
``events.parquet`` (parquet timestamp[ns]) is readable; ``io.py``
re-materializes the column as a microsecond timestamp.

Scale note (100 TB): everything here is per-session config, not code —
on a real cluster the same code runs with ``spark.sql.shuffle.partitions``
sized to ~2-3× total cores and AQE coalescing/skew-join handling the
rest at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "slowlog2clickhouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # embedded Derby (JDBC tests) writes derby.log into user.dir by
        # default — keep the repo clean
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.stream.error.file=/tmp/derby.log",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_compat(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable configs this engine relies on to a
    session we did not create (e.g. the verify driver's).

    ``nanosAsLong`` is read at parquet scan planning time, so setting it
    on an existing session is sufficient as long as it happens before
    the first read of ``events.parquet``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # performance (all runtime-mutable): a foreign session arrives with
    # the 200-partition default — at our test SFs that is 200 near-empty
    # tasks (and 200 Python workers for every applyInPandas); size to
    # local cores and let AQE coalesce upward jobs re-split
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark
