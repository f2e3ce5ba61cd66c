"""Approx-variant accuracy bounds + bucketed-join plan guarantee."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()


def test_approx_percentile_close_to_exact(spark, sf_dir):
    exact = {
        (r["event_type"],): (r["p50"], r["p95"], r["p99"])
        for r in OPS["agg_percentile"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r["event_type"],): (r["p50_approx"], r["p95_approx"], r["p99_approx"])
        for r in OPS["agg_percentile_approx"].fn(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    # exact interpolates between order stats; approx returns an actual
    # sample — in a sparse long tail those legitimately diverge, so the
    # bound loosens with the quantile (p99 gap at n≈200 spans the two
    # largest observations)
    tolerances = (0.05, 0.15, 0.40)
    for k in exact:
        for e, a, tol in zip(exact[k], approx[k], tolerances):
            assert abs(e - a) <= max(tol * abs(e), 1.0), (k, e, a, tol)


def test_approx_count_distinct_close_to_exact(spark, sf_dir):
    row = OPS["agg_count_distinct"].fn(spark, sf_dir).collect()[0]
    arow = OPS["agg_approx_count_distinct"].fn(spark, sf_dir).collect()[0]
    assert abs(arow["approx_du"] - row["du"]) <= max(0.1 * row["du"], 2)
    assert abs(arow["approx_de"] - row["de"]) <= max(0.1 * row["de"], 2)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    df = OPS["join_bucketed_colocated"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # the join itself must be exchange-free; only the final
    # low-cardinality groupBy may shuffle
    join_part = p.split("HashAggregate")[0]
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p
    assert p.count("Exchange hashpartitioning") <= 1


def test_bucketed_join_matches_shuffle_join(spark, sf_dir):
    # bucketed revenue is DECIMAL (exact associative sum); the shuffle
    # variant sums doubles — equal up to double-summation rounding
    bucketed = {
        r["o_orderpriority"]: (r["n"], float(r["revenue"]))
        for r in OPS["join_bucketed_colocated"].fn(spark, sf_dir).collect()
    }
    plain = {
        r["priority"]: (r["n_items"], float(r["revenue"]))
        for r in OPS["join_shuffle_inner"].fn(spark, sf_dir).collect()
    }
    assert bucketed.keys() == plain.keys()
    for k, (n, rev) in bucketed.items():
        pn, prev = plain[k]
        assert n == pn, k
        assert abs(rev - prev) <= 1e-6 * max(1.0, abs(rev)), k


def test_pivot_unpivot_roundtrip_cardinality(spark, sf_dir):
    wide = OPS["pivot_wide"].fn(spark, sf_dir)
    long = OPS["unpivot_long"].fn(spark, sf_dir)
    assert wide.count() == 5  # priorities
    # unpivot: 2 metric rows per customer
    from slowlog2clickhouse_spark.io import load_table

    assert long.count() == 2 * load_table(spark, sf_dir, "customer").count()
