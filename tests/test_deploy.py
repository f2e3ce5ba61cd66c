"""Deployment plumbing: --py-files package shipping + multi-executor run.

``local[N]`` (every other test in this suite) runs executors inside the
driver JVM, so executor Python workers inherit the driver's sys.path
and a missing --py-files step is invisible. ``local-cluster[W,C,MB]``
spawns W REAL worker JVMs — remote block-transfer shuffle, actual
broadcast shipping, per-executor Python workers — and is therefore the
in-sandbox stand-in for the 1000-executor deployment the operator
docstrings design for (SURVEY §2 scale contract; VERDICT r15 "What's
missing" #2).

The parity test is opt-in (SPARK_GRAFT_LOCAL_CLUSTER=1) because a
local-cluster app takes ~30 s to start and only one SparkContext can
live per process — it runs scripts/driver_sim.py in a subprocess, the
same code path the full 335-op multi-executor sweep used (SCALING.md
r16 §local-cluster).
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest

# r17 (VERDICT r16 #6): the local-cluster deploy probes spawn worker
# JVMs (~30 s+ each) — full-suite only (scripts/ptest.py); the default
# driver-budget run deselects them (tests/conftest.py slow handling)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_zip_ships_sources_only():
    from slowlog2clickhouse_spark.session import package_zip

    zpath = package_zip()
    names = zipfile.ZipFile(zpath).namelist()
    # module-reference unpickling on executors needs the real package
    # layout under the zip root
    assert "slowlog2clickhouse_spark/registry.py" in names
    assert "slowlog2clickhouse_spark/operators/dedup.py" in names
    assert "slowlog2clickhouse_spark/streaming/slowlog_stream.py" in names
    assert all(n.endswith(".py") for n in names), "sources only, no bytecode"
    assert not any(n.startswith("tests/") for n in names)
    # every .py in the package is present — a module silently dropped
    # from the zip fails only at executor unpickle time on a cluster
    pkg_dir = os.path.join(REPO, "slowlog2clickhouse_spark")
    on_disk = set()
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                on_disk.add(os.path.relpath(full, REPO))
    assert on_disk == set(names)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_LOCAL_CLUSTER") != "1",
    reason="opt-in: SPARK_GRAFT_LOCAL_CLUSTER=1 (starts 2 worker JVMs, ~90 s)",
)
def test_local_cluster_parity_subset():
    """Oracle parity for a shuffle + a Python-worker op on real
    multi-executor topology. The Python-worker op is the load-bearing
    one: it fails with ModuleNotFoundError if ship_package regresses."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "driver_sim.py"),
            "--master",
            "local-cluster[2,4,2048]",
            "/root/testdata/sf0.001",
            "join_shuffle_inner",
            "pandas_udf_fingerprint",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "2 pass / 0 fail" in proc.stdout


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_LOCAL_CLUSTER") != "1",
    reason="opt-in: SPARK_GRAFT_LOCAL_CLUSTER=1 (starts 2 worker JVMs, ~60 s)",
)
def test_get_session_autoships_on_multi_jvm_master():
    """get_session(master=cluster) must ship the package itself — a
    notebook user gets ModuleNotFoundError on every UDF otherwise."""
    snippet = (
        "import sys; sys.path.insert(0, %r)\n"
        "import os, pyspark\n"
        "os.environ.setdefault('SPARK_HOME',"
        " os.path.dirname(os.path.abspath(pyspark.__file__)))\n"
        "from slowlog2clickhouse_spark.session import get_session\n"
        "spark = get_session(master='local-cluster[2,4,2048]')\n"
        "import __spark_entry__ as e\n"
        "df = e.queries()['pandas_udf_fingerprint'](spark,"
        " '/root/testdata/sf0.001')\n"
        "assert df.count() > 0\n"
        "print('AUTOSHIP-OK')\n"
        "spark.stop()\n" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", snippet],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "AUTOSHIP-OK" in proc.stdout


def test_ship_package_idempotent_per_app(spark):
    from slowlog2clickhouse_spark.session import ship_package

    p1 = ship_package(spark)
    p2 = ship_package(spark)
    # cached per applicationId: same zip path, addPyFile called once —
    # a re-zip would trip Spark's same-name-different-contents check
    assert p1 == p2
    assert os.path.exists(p1)
