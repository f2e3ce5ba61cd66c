"""Data-quality suite semantics (operators/quality.py).

The oracle parity run proves the zero-violation path on clean
testdata; these tests construct DIRTY tables and prove the checks
actually fire — a quality suite that never detects anything is
indistinguishable from a broken one.
"""

from __future__ import annotations

import pytest

from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    """Minimal testdata layout with planted violations:
    - 1 order with totalprice <= 0, 1 with an out-of-domain status
    - 1 lineitem with discount > 1, 1 with quantity <= 0
    - 1 order pointing at a missing customer, 1 lineitem at a missing
      order, 1 customer at a missing nation
    """
    d = tmp_path_factory.mktemp("dirty_sf")
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, "2020-01-01", "1-URGENT"),
            (2, 10, "X", -5.0, "2020-01-02", "5-LOW"),  # bad status+price
            (3, 99, "F", 50.0, "2020-01-03", "2-HIGH"),  # orphan custkey
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 1, 1, 1, 5.0, 10.0, 0.1),
            (1, 1, 1, 2, -2.0, 10.0, 1.5),  # bad qty + discount
            (7, 1, 1, 1, 3.0, 10.0, 0.0),  # orphan orderkey
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double",
    )
    customer = spark.createDataFrame(
        [(10, "c10", 1, 0.0, "BUILDING"), (11, "c11", 42, 0.0, "AUTOMOBILE")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
        "c_mktsegment string",
    )  # nationkey 42 is an orphan
    nation = spark.createDataFrame(
        [(1, "NATION_1", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    for name, df in (
        ("orders", orders),
        ("lineitem", lineitem),
        ("customer", customer),
        ("nation", nation),
    ):
        df.coalesce(1).write.parquet(f"{d}/{name}.parquet")
    return str(d)


def test_dq_constraints_detects_planted_violations(spark, dirty_dir):
    rows = {
        (r["tbl"], r["check_name"]): r
        for r in OPS["dq_constraints"].fn(spark, dirty_dir).collect()
    }
    assert rows[("orders", "o_totalprice_positive")]["n_violations"] == 1
    assert rows[("orders", "o_orderstatus_domain")]["n_violations"] == 1
    assert rows[("lineitem", "l_discount_range")]["n_violations"] == 1
    assert rows[("lineitem", "l_quantity_positive")]["n_violations"] == 1
    # n_checked is the full table, violations never filter the scan
    assert rows[("orders", "o_totalprice_positive")]["n_checked"] == 3


def test_dq_fk_integrity_counts_planted_orphans(spark, dirty_dir):
    rows = {
        r["fk"]: r for r in OPS["dq_fk_integrity"].fn(spark, dirty_dir).collect()
    }
    assert rows["orders.o_custkey->customer"]["n_orphans"] == 1
    assert rows["lineitem.l_orderkey->orders"]["n_orphans"] == 1
    assert rows["customer.c_nationkey->nation"]["n_orphans"] == 1
    assert rows["orders.o_custkey->customer"]["n_child_rows"] == 3


def test_dq_profile_null_and_ndv_accounting(spark, dirty_dir):
    rows = {r["col"]: r for r in OPS["dq_profile"].fn(spark, dirty_dir).collect()}
    p = rows["o_totalprice"]
    assert p["n_rows"] == 3
    assert p["n_non_null"] == 3
    assert p["n_distinct"] == 3
    assert p["min_val"] == -5.0 and p["max_val"] == 100.0


def test_drift_metrics_internally_consistent(spark, sf_dir):
    from slowlog2clickhouse_spark.registry import all_ops

    rows = {r["metric"]: r for r in all_ops()["dq_drift"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"row_count", "avg_price", "status_ndv", "urgent_rate"}
    for r in rows.values():
        if r["baseline"] and r["rel_change"] is not None:
            expect = (r["current"] - r["baseline"]) / r["baseline"]
            assert abs(r["rel_change"] - expect) < 1e-6
            assert r["drifted"] == (abs(expect) > 0.1)
    rc = rows["row_count"]
    assert rc["baseline"] > 0 and rc["current"] > 0


def test_sequence_gaps_finds_exactly_the_simulated_holes(spark, sf_dir):
    import pyspark.sql.functions as F

    from slowlog2clickhouse_spark.io import load_table
    from slowlog2clickhouse_spark.registry import all_ops

    gaps = all_ops()["dq_sequence_gaps"].fn(spark, sf_dir).collect()
    assert gaps
    ids = {
        r["event_id"]
        for r in load_table(spark, sf_dir, "events").select("event_id").collect()
    }
    surviving = {i for i in ids if i % 97 != 0}
    expected_missing = {
        i for i in ids if i % 97 == 0 and min(surviving) < i < max(surviving)
    }
    reported = set()
    for g in gaps:
        assert g["n_missing"] == g["gap_end"] - g["gap_start"] + 1
        reported.update(range(g["gap_start"], g["gap_end"] + 1))
    assert reported == expected_missing
