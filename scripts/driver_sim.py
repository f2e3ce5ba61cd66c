"""Simulate the external verify driver against __spark_entry__.py.

Mirrors the driver's t1/t2: builds a VANILLA SparkSession (none of our
session.py configs — the real driver owns its session), smoke-runs
entry(), then runs every queries()[name] at sf0.01 and compares with
oracle_sql()[name] via DuckDB: row count + sorted schema +
order-insensitive canonical value multiset.

Usage: python scripts/driver_sim.py [--master URL] [sf_dir] [op ...]

--master accepts any Spark master URL. The load-bearing non-default is
``local-cluster[W,C,MB]`` (e.g. ``local-cluster[2,8,4096]``): unlike
local[N]'s single JVM, it spawns W REAL worker JVMs with C cores and
MB MiB each, so shuffles serialize over the block-transfer service,
broadcasts actually ship to remote executors, and Python workers fork
per-executor — the closest in-sandbox stand-in for the 1000-executor
deployment the docstrings design for. Requires SPARK_HOME (set
automatically here from the pyspark install dir).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from slowlog2clickhouse_spark.io import TABLES  # noqa: E402
from tests.parity import canon_rows, duck_result, spark_result  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    # --reverse: run ops in reversed name order — smokes out run-order
    # state leaks (a conf set by op A that op B silently depends on)
    reverse = "--reverse" in args
    args = [a for a in args if a != "--reverse"]
    master = "local[32]"
    if "--master" in args:
        i = args.index("--master")
        if i + 1 >= len(args):
            print("usage: driver_sim.py [--master URL] [sf_dir] [op ...]")
            return 2
        master = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    if master.startswith("local-cluster"):
        # Worker JVMs are launched via $SPARK_HOME/sbin machinery; the
        # pip install ships it but doesn't export the env var.
        import pyspark

        os.environ.setdefault(
            "SPARK_HOME", os.path.dirname(os.path.abspath(pyspark.__file__))
        )

    # vanilla session, exactly what an external driver would build
    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    if not master.startswith("local["):
        # Remote executors don't inherit the driver's sys.path, so UDF
        # closures that unpickle by module reference need the package
        # shipped — the same --py-files step a real spark-submit
        # deployment performs. local[N] never exercises this; that the
        # suite is green here proves the package is py-files-shippable
        # (no closure depends on driver-local filesystem state).
        # Applies to every multi-JVM master: local-cluster, spark://,
        # yarn, k8s://.
        from slowlog2clickhouse_spark.session import ship_package

        ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")

    print("== t1 smoke: entry(spark) ==")
    df = entrymod.entry(spark)
    rows = df.collect()
    print(f"entry -> {len(rows)} rows, schema ok: {len(df.schema) > 0}")
    assert len(rows) > 0

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    print(f"== t2: {len(q)} queries, {len(o)} oracles, sf_dir={sf_dir} ==")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name in sorted(q, reverse=reverse):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q[name](spark, sf_dir)
            scols, srows = spark_result(sdf)
            if name in o:
                dcols, drows = duck_result(con, o[name])
                ok = (
                    sorted(scols) == sorted(dcols)
                    and len(srows) == len(drows)
                    and canon_rows(scols, srows) == canon_rows(dcols, drows)
                )
                kind = "oracle"
            else:
                # mimic the real driver: its pandas canonicalizer runs
                # on EVERY result (rows-only included) and crashes on
                # unhashable cells — r01 lost mm_decode_features to
                # exactly this, so reproduce the sort here
                if srows:
                    import pandas as pd

                    pd.DataFrame(srows, columns=scols).sort_values(by=scols)
                ok = len(srows) >= 0
                kind = "rows-only"
        except Exception as exc:  # driver records failures, not crashes
            ok, kind = False, f"ERROR {type(exc).__name__}: {exc}"
            srows = []
        dt = time.time() - t0
        n_pass += ok
        n_fail += not ok
        print(f"{'PASS' if ok else 'FAIL'} {name:32s} {kind:10s} rows={len(srows):6d} {dt:5.1f}s")

    print(f"== result: {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
