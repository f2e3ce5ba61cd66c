"""Time-series op semantics: dense LOCF spine, period deltas, and
mergeable-HLL accuracy bounds (SURVEY.md §2 L)."""

from __future__ import annotations

from collections import defaultdict

from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()

HOUR = 3600


def test_gapfill_spine_is_dense_and_locf_total(spark, sf_dir):
    rows = OPS["time_gapfill_locf"].fn(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    assert by_user, "gapfill produced no rows"
    for user, urows in by_user.items():
        hours = sorted(r["h"].timestamp() for r in urows)
        # spine is dense: every hour between min and max present exactly once
        assert len(hours) == int((hours[-1] - hours[0]) / HOUR) + 1, user
        assert len(set(hours)) == len(hours), user
        # first spine hour comes from an observation, so LOCF never has
        # a leading NULL — and carrying forward means none at all
        assert all(r["v_locf"] is not None for r in urows), user
        # filled rows must carry the value of the latest observed hour
        urows.sort(key=lambda r: r["h"])
        carried = None
        for r in urows:
            if r["observed"] == 1:
                carried = r["v_locf"]
            else:
                assert r["v_locf"] == carried, (user, r["h"])


def test_gapfill_observed_matches_raw_buckets(spark, sf_dir):
    import pyspark.sql.functions as F

    from slowlog2clickhouse_spark.io import load_table

    rows = OPS["time_gapfill_locf"].fn(spark, sf_dir).collect()
    observed = sum(r["observed"] for r in rows)
    raw = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("hour", "ts").alias("h"))
        .distinct()
        .count()
    )
    assert observed == raw


def test_compare_periods_delta_consistency(spark, sf_dir):
    rows = OPS["qan_compare_periods"].fn(spark, sf_dir).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    for et, trows in by_type.items():
        trows.sort(key=lambda r: r["week"])
        assert trows[0]["prev_cnt"] is None and trows[0]["cnt_delta"] is None
        for prev, cur in zip(trows, trows[1:]):
            assert cur["prev_cnt"] == prev["cnt"], et
            assert cur["cnt_delta"] == cur["cnt"] - prev["cnt"], et
            expect_pct = round((cur["cnt"] - prev["cnt"]) * 100.0 / prev["cnt"], 4)
            assert abs(cur["cnt_pct_change"] - expect_pct) < 1e-9, et


def test_hll_daily_merge_error_bound(spark, sf_dir):
    """The op carries its own 3σ error-bound verdicts since the r6
    partial-oracle conversion — every day row and the merged
    whole-period row must report the estimate within bound."""
    rows = OPS["agg_hll_daily_merge"].fn(spark, sf_dir).collect()
    total_rows = [r for r in rows if r["day"] is None]
    assert len(total_rows) == 1
    assert all(r["est_ok"] for r in rows), [
        (r["day"], r["exact_users"]) for r in rows if not r["est_ok"]
    ]


def test_events_pipeline_conserves_events(spark, sf_dir):
    """Every raw event lands in exactly one session of the rollup."""
    from slowlog2clickhouse_spark.io import load_table
    from slowlog2clickhouse_spark.registry import all_ops

    roll = all_ops()["events_pipeline"].fn(spark, sf_dir)
    total = sum(r["n_events"] for r in roll.collect())
    assert total == load_table(spark, sf_dir, "events").count()


def test_rolling_distinct_dominates_daily_and_matches_bruteforce(spark, sf_dir):
    import datetime as dt

    import pyspark.sql.functions as F

    from slowlog2clickhouse_spark.io import load_table

    rows = OPS["time_rolling_distinct"].fn(spark, sf_dir).collect()
    assert rows
    by_day = {r["day"]: r for r in rows}
    for r in rows:
        assert r["u7"] >= r["u1"] > 0, r
    # brute-force the window for the median day
    day = sorted(by_day)[len(by_day) // 2]
    ev = load_table(spark, sf_dir, "events")
    lo = day - dt.timedelta(days=6)
    expect = (
        ev.where((F.to_date("ts") >= lo) & (F.to_date("ts") <= day))
        .select("user_id")
        .distinct()
        .count()
    )
    assert by_day[day]["u7"] == expect


def test_latency_histogram_partitions_all_events(spark, sf_dir):
    from slowlog2clickhouse_spark.io import load_table

    rows = OPS["qan_latency_histogram"].fn(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == total
    for r in rows:
        # bucket k covers [2^(k-1), 2^k) on the floored integer value
        # (bucket 1 additionally absorbs 0)
        assert r["hi"] == (1 << r["bucket"]) - 1
        assert r["lo"] == (0 if r["bucket"] == 1 else 1 << (r["bucket"] - 1))
        assert r["n"] > 0


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    import pyspark.sql.functions as F

    from slowlog2clickhouse_spark.io import load_table

    rows = {
        r["event_type"]: r
        for r in OPS["agg_bitmap_distinct"].fn(spark, sf_dir).collect()
    }
    expect = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {k: v["n_users"] for k, v in rows.items()} == expect
    for r in rows.values():
        # every bucket holds ≤ 32768 ids
        assert r["n_users"] <= r["n_buckets"] * 32768


def test_interval_binned_matches_bruteforce_inequality_join(spark, sf_dir):
    import pyspark.sql.functions as F

    from slowlog2clickhouse_spark.io import load_table

    got = {
        r["event_id"]: r["purchases_10m"]
        for r in OPS["join_interval_binned"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    n_err = ev.where(F.col("event_type") == "error").count()
    # left spine: one row per error event, zero-match errors included
    assert len(got) == n_err
    assert any(v > 0 for v in got.values())
    # brute-force recount for the busiest error event (test-only)
    busiest = max(got, key=got.get)
    e_row = ev.where(F.col("event_id") == busiest).collect()[0]
    expect = ev.where(
        (F.col("event_type") == "purchase")
        & (F.col("user_id") == e_row["user_id"])
        & (F.col("ts") > F.lit(e_row["ts"]))
        & (F.col("ts") <= F.lit(e_row["ts"]) + F.expr("INTERVAL 10 MINUTES"))
    ).count()
    assert got[busiest] == expect


def test_session_window_builtin_agrees_with_manual_islands(spark, sf_dir):
    """The built-in session_window and the manual lag/cumsum islands
    (win_sessionize's technique) must carve identical sessions."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from slowlog2clickhouse_spark.io import load_table

    got = {
        (r["user_id"], r["session_start"]): r
        for r in OPS["agg_session_window_builtin"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(wo)
    manual = (
        ev.withColumn("new_s", (gap.isNull() | (gap > 600)).cast("long"))
        .withColumn("sid", F.sum("new_s").over(wo))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n"))
        .collect()
    )
    assert len(manual) == len(got)
    for r in manual:
        k = (r["user_id"], r["session_start"])
        assert k in got, k
        assert got[k]["n_events"] == r["n"], k


def test_attribution_never_self_attributes_and_latency_positive(spark, sf_dir):
    rows = OPS["events_attribution"].fn(spark, sf_dir).collect()
    assert rows
    attributed = [r for r in rows if r["attributed"]]
    assert attributed
    for r in attributed:
        assert r["last_click_ts"] < r["purchase_ts"] or (
            r["last_click_ts"] == r["purchase_ts"] and r["latency_s"] == 0
        )
        assert r["latency_s"] >= 0
    for r in rows:
        if not r["attributed"]:
            assert r["latency_s"] is None and r["last_click_ts"] is None


def test_markov_rows_are_proper_distributions(spark, sf_dir):
    from collections import defaultdict

    rows = OPS["events_markov_transitions"].fn(spark, sf_dir).collect()
    assert rows
    by_prev = defaultdict(list)
    for r in rows:
        assert r["n"] > 0 and 0 < r["p"] <= 1
        by_prev[r["prev_type"]].append(r["p"])
    for prev, ps in by_prev.items():
        assert abs(sum(ps) - 1.0) < 1e-9, prev


def test_ohlc_invariants(spark, sf_dir):
    rows = OPS["time_resample_ohlc"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"], r
        assert r["low"] <= r["close"] <= r["high"], r
        assert r["n"] > 0
        if r["n"] == 1:
            assert r["open"] == r["close"] == r["high"] == r["low"]


def test_pareto_thresholds_are_monotone(spark, sf_dir):
    from slowlog2clickhouse_spark.registry import all_ops

    rows = sorted(
        all_ops()["orders_pareto"].fn(spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == [0.5, 0.8, 0.9]
    assert rows[0]["n_customers"] <= rows[1]["n_customers"] <= rows[2]["n_customers"]
    for r in rows:
        assert 0 < r["pct_customers"] <= 1
        # concentration: covering t of revenue takes <= t of customers
        assert r["pct_customers"] <= r["threshold"] + 1e-9


def test_rfm_tiles_partition_users_evenly(spark, sf_dir):
    from collections import Counter

    rows = OPS["events_rfm"].fn(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for dim in ("r_tile", "f_tile", "m_tile"):
        c = Counter(r[dim] for r in rows)
        assert set(c) <= {1, 2, 3, 4}
        # ntile balance: bucket sizes differ by at most 1
        assert max(c.values()) - min(c.values()) <= 1, (dim, c)
    for r in rows:
        assert r["rfm_code"] == r["r_tile"] * 100 + r["f_tile"] * 10 + r["m_tile"]


def test_rolling_median_stitched_equals_naive_window(spark, sf_dir):
    """The r7 scale-safe win_rolling_median (stitched rank + frame
    fan-out equi-join) must be row-for-row identical to the naive
    per-class window form it replaced — on the real events table AND
    on a synthetic set big enough (10k rows, 4 classes, 8 stitch
    buckets) to exercise multi-bucket rank stitching and frame spans
    across bucket boundaries."""
    import random

    import pyspark.sql.functions as F

    from slowlog2clickhouse_spark.io import load_table
    from slowlog2clickhouse_spark.operators.relational import (
        rolling_median_naive,
    )

    got = {
        r["event_id"]: (r["event_type"], r["med5"])
        for r in OPS["win_rolling_median"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    want = {
        r["event_id"]: (r["event_type"], r["med5"])
        for r in rolling_median_naive(ev).collect()
    }
    assert got == want and len(got) > 0

    rng = random.Random(7)
    rows = [
        (i, f"class_{rng.randint(0, 3)}", rng.randint(0, 10**7),
         round(rng.uniform(0, 100), 2))
        for i in range(10_000)
    ]
    syn = spark.createDataFrame(
        rows, "event_id long, event_type string, tsl long, value double"
    ).select(
        "event_id", "event_type",
        F.timestamp_seconds("tsl").alias("ts"), "value",
    )
    from slowlog2clickhouse_spark.operators.stitched import stitched_order

    ranked = stitched_order(
        syn,
        [F.col("event_type").asc(), F.col("ts").asc(), F.col("event_id").asc()],
        num_buckets=8,
    )
    fan = ranked.select(
        "event_type", "event_id", "value", "rn",
        F.explode(F.sequence(F.col("rn"), F.col("rn") + 4)).alias("target_rn"),
    )
    got_syn = {
        r["event_id"]: (r["event_type"], r["med5"])
        for r in fan.groupBy("event_type", "target_rn")
        .agg(
            F.max(
                F.when(F.col("target_rn") == F.col("rn"), F.col("event_id"))
            ).alias("event_id"),
            F.expr("percentile(value, 0.5)").alias("med5"),
        )
        .where(F.col("event_id").isNotNull())
        .collect()
    }
    want_syn = {
        r["event_id"]: (r["event_type"], r["med5"])
        for r in rolling_median_naive(syn).collect()
    }
    assert got_syn == want_syn and len(got_syn) == 10_000


def test_trend_regression_matches_numpy_polyfit(spark, sf_dir):
    """Slope/r² recomputed with numpy over the same rounded daily
    means — the fit is real least squares, not a lookalike."""
    import numpy as np
    from pyspark.sql import functions as F

    from slowlog2clickhouse_spark.io import load_table

    daily = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date(F.date_trunc("day", "ts")),
                F.lit("1970-01-01").cast("date"),
            ).alias("day_idx"),
        )
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
        .collect()
    ):
        daily.setdefault(r["event_type"], []).append(
            (r["day_idx"], r["avg_value"])
        )
    got = {
        r["event_type"]: r
        for r in OPS["qan_trend_regression"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(daily)
    for et, pts in daily.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        r = got[et]
        assert r["n_days"] == len(pts)
        if len(pts) >= 2 and len(set(x)) > 1:
            slope = float(np.polyfit(x, y, 1)[0])
            assert abs(r["slope_per_day"] - slope) < 1e-4
            assert r["degrading"] == (r["slope_per_day"] > 0) or abs(
                r["slope_per_day"]
            ) < 1e-9
