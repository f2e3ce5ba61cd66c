"""Approx-variant accuracy bounds + bucketed-join plan guarantee."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """The op now carries its own error-bound verdicts (r6 partial
    oracle); cross-check them against the independently-computed exact
    op and assert every verdict is green."""
    exact = {
        (r["event_type"],): (r["p50"], r["p95"], r["p99"])
        for r in OPS["agg_percentile"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r["event_type"],): r
        for r in OPS["agg_percentile_approx"].fn(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        r = approx[k]
        # agg_percentile rounds to 4 decimals (G5); this op emits raw
        got = (r["p50_exact"], r["p95_exact"], r["p99_exact"])
        assert tuple(round(v, 4) for v in got) == exact[k]
        assert r["p50_ok"] and r["p95_ok"] and r["p99_ok"], (k, r)


def test_approx_count_distinct_close_to_exact(spark, sf_dir):
    row = OPS["agg_count_distinct"].fn(spark, sf_dir).collect()[0]
    arow = OPS["agg_approx_count_distinct"].fn(spark, sf_dir).collect()[0]
    assert arow["exact_du"] == row["du"] and arow["exact_de"] == row["de"]
    assert arow["approx_du_ok"] and arow["approx_de_ok"]


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
