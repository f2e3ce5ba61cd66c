"""Time-series operators — QAN-style dashboard queries over `events`.

The reference's front-end charts sparse per-class counters on a dense
time axis and compares adjacent periods (qan-api2 metrics endpoints,
SURVEY §1.2 [R:M]). These ops are the engine-side building blocks:
dense spine + last-observation-carried-forward gap fill, week-over-week
deltas, and mergeable-sketch distinct counting (daily HLL sketches that
union to any coarser grain without rescanning — the 100-TB pattern for
"unique users this month" panels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.registry import op


@op(
    "time_gapfill_locf",
    oracle="""
    WITH obs AS (
      SELECT user_id, cast(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             min(value) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    spans AS (
      SELECT user_id, generate_series(min(h), max(h), INTERVAL 1 HOUR) AS hs
      FROM obs GROUP BY 1),
    spine AS (SELECT user_id, unnest(hs) AS h FROM spans)
    SELECT s.user_id, s.h,
           last_value(o.v IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf,
           cast(o.v IS NOT NULL AS BIGINT) AS observed
    FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h
    """,
)
def time_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly spine per user + last-observation-carried-forward.

    Sparse observations (min value per present hour) are joined onto a
    generated per-user `sequence(min_h, max_h, 1 hour)` spine, then
    gaps fill with `last(v, ignorenulls)` over an ordered window — the
    standard gap-fill/interpolate operator of time-series engines,
    composed from sequence/explode/window (no UDF).

    Scale: both inputs are post-agg (grain = user×present-hour), so the
    heavy lifting is the partial-agg'd bucket groupBy over raw events.
    The spine side keeps its user_id hash partitioning through the
    explode, and the window reuses it (verified: no Exchange between
    join and Window; the obs side broadcasts at test SF, sort-merges on
    (user_id, h) at scale). Per-user span is bounded by the retention
    window, so no partition can blow up.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    obs = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.min("value").alias("v"))
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = W.partitionBy("user_id").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    return spine.join(obs, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        F.last("v", ignorenulls=True).over(w).alias("v_locf"),
        F.col("v").isNotNull().cast("long").alias("observed"),
    )


@op(
    "qan_compare_periods",
    oracle="""
    WITH wk AS (
      SELECT event_type, cast(date_trunc('week', ts) AS TIMESTAMP) AS week,
             count(*) AS cnt, round(sum(value), 4) AS total
      FROM events GROUP BY 1, 2)
    SELECT event_type, week, cnt, total,
           lag(cnt) OVER w AS prev_cnt,
           cnt - lag(cnt) OVER w AS cnt_delta,
           round((cnt - lag(cnt) OVER w) * 100.0 / lag(cnt) OVER w, 4)
             AS cnt_pct_change
    FROM wk WINDOW w AS (PARTITION BY event_type ORDER BY week)
    """,
)
def qan_compare_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period comparison: weekly rollup per class, then
    lag() deltas and percent change — the reference UI's "compare with
    previous period" view as one plan (agg shuffle on the class key,
    window over |classes|×|weeks| rows, which is tiny post-agg)."""
    e = load_table(spark, sf_dir, "events")
    wk = e.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week")
    ).agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("total"))
    w = W.partitionBy("event_type").orderBy("week")
    prev = F.lag("cnt").over(w)
    return wk.select(
        "event_type",
        "week",
        "cnt",
        "total",
        prev.alias("prev_cnt"),
        (F.col("cnt") - prev).alias("cnt_delta"),
        F.round((F.col("cnt") - prev) * 100.0 / prev, 4).alias("cnt_pct_change"),
    )


@op(
    "agg_hll_daily_merge",
    # r6 partial oracle (VERDICT r5 #7): exact distincts per day and
    # for the merged total are value-checked; the Datasketches HLL
    # estimate (engine-specific raw value — G8) surfaces as a 3σ
    # error-bound verdict asserted TRUE (lgK=12 ⇒ rsd ≈ 1.6%)
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_ok
    FROM events GROUP BY 1
    UNION ALL
    SELECT CAST(NULL AS TIMESTAMP) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_ok
    FROM events
    """,
)
def agg_hll_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: one Datasketches HLL per day
    (`hll_sketch_agg`), unioned to the whole-period estimate with
    `hll_union_agg` — no second scan of the raw events.

    This is THE 100-TB distinct-counting pattern: daily sketches are a
    few KB each, so any rollup grain (week/month/all) is a merge over
    |days| rows instead of a count-distinct shuffle over the corpus.
    tests/test_approx.py bounds the estimate error against the exact
    count. Output is day-grain rows plus one total row (day NULL).
    """
    e = load_table(spark, sf_dir, "events")
    # lazy checkpoint: daily feeds the per-day rows AND the union-merge
    # — without it the day-grain aggregate scans events once per branch
    # (the docstring's 'no second scan' promise, made true in the plan)
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .localCheckpoint(eager=False)
    )

    def est_ok(est: F.Column, exact: F.Column) -> F.Column:
        return F.abs(est - exact) <= F.greatest(
            F.lit(1.0), 0.05 * exact.cast("double")
        )

    per_day = daily.select(
        "day",
        "exact_users",
        est_ok(F.hll_sketch_estimate("sk"), F.col("exact_users")).alias(
            "est_ok"
        ),
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    ).crossJoin(
        e.agg(F.count_distinct("user_id").alias("exact_users"))
    ).select(
        F.lit(None).cast("timestamp").alias("day"),
        "exact_users",
        est_ok(F.col("est_users"), F.col("exact_users")).alias("est_ok"),
    )
    return per_day.unionByName(total)


# the recursive member carries the max bound along instead of
# re-evaluating a scalar subquery every iteration (each re-evaluation
# is a full orders scan per recursion step — 80 steps = 80 scans)
_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE months(m, mx) AS (
  SELECT cast(date_trunc('month', min(cast(o_orderdate AS TIMESTAMP)))
              AS TIMESTAMP),
         cast(date_trunc('month', max(cast(o_orderdate AS TIMESTAMP)))
              AS TIMESTAMP)
  FROM orders
  UNION ALL
  SELECT m + INTERVAL 1 MONTH, mx FROM months WHERE m < mx
)
SELECT m, cast(count(o_orderkey) AS BIGINT) AS n_orders
FROM months
LEFT JOIN orders ON date_trunc('month', cast(o_orderdate AS TIMESTAMP)) = m
GROUP BY 1
"""


@op("cte_recursive_spine", oracle=_RECURSIVE_SPINE_SQL)
def cte_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4): generate the
    dense month spine between the first and last order month by
    recursion, then left-join order counts onto it — zero-filled
    months survive, the gap-fill companion to time_gapfill_locf's
    sequence/explode formulation (two routes to the same spine; the
    recursion is the portable-SQL one).

    Scale: the recursion materializes |months| rows on the driver-side
    plan — O(hundreds) for any retention window — then one broadcast
    of the spine against the fact scan's month-truncated key; the only
    real shuffle is the final groupBy on month."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SPINE_SQL)


@op(
    "time_weighted_avg",
    oracle="""
    WITH spans AS (
      SELECT user_id, value, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_ts
      FROM events WHERE event_type = 'purchase'),
    weighted AS (
      SELECT user_id, value,
             epoch_us(next_ts) - epoch_us(ts) AS dur
      FROM spans WHERE next_ts IS NOT NULL)
    SELECT user_id,
           cast(count(*) AS BIGINT) AS n_spans,
           cast(sum(dur) AS BIGINT) AS total_dur,
           round(sum(value * dur) / sum(dur), 6) AS tw_avg
    FROM weighted GROUP BY 1
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average — the monitoring-correct mean for
    irregularly sampled gauges (each observation holds until the next
    one; a plain avg over-weights bursts): per-user LOCF spans via
    lead(), then Σ(value·duration)/Σ(duration). One user_id shuffle
    shared by the window and the aggregate. Durations are exact
    integer MICROseconds (unix_micros / epoch_us — second-granularity
    epoch() truncates fractions differently across engines), so only
    the final division needs the G8 rounding."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    spans = ev.select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dur"),
    ).where(F.col("dur").isNotNull())
    return spans.groupBy("user_id").agg(
        F.count("*").alias("n_spans"),
        F.sum("dur").cast("long").alias("total_dur"),
        F.round(F.sum(F.col("value") * F.col("dur")) / F.sum("dur"), 6).alias(
            "tw_avg"
        ),
    )


@op(
    "win_islands_runs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_type
      FROM events)
    SELECT user_id, event_type,
           cast(count(*) AS BIGINT) AS run_len,
           min(ts) AS run_start, max(ts) AS run_end
    FROM seq
    GROUP BY user_id, event_type, rn - rn_type
    """,
)
def win_islands_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: group CONSECUTIVE same-type events per user
    into runs via the row_number-difference trick (rn − rn_per_type is
    constant within a run) — the standard SQL idiom for
    state-transition analysis (retry storms, repeated errors) that
    needs no iteration. Two windows share one user_id Exchange; the
    run groupBy is partial-agg'd. event_id tiebreaks equal timestamps
    so runs are deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    return (
        seq.groupBy("user_id", "event_type", "grp")
        .agg(
            F.count("*").alias("run_len"),
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
        )
        .drop("grp")
    )


@op(
    "time_bucket_custom",
    oracle="""
    SELECT to_timestamp((cast(floor(epoch(ts)) AS BIGINT) // 900) * 900)
             AT TIME ZONE 'UTC' AS bucket_15m,
           cast(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS sv
    FROM events GROUP BY 1
    """,
)
def time_bucket_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-width time bucketing (15-minute): epoch-div-multiply,
    the bucket width date_trunc can't express (QAN dashboards zoom
    through 1m/5m/15m/1h grains; only the constant changes). Integer
    division on epoch seconds is exact cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col("ts").cast("timestamp")) / 900)
        .cast("long") * 900
    )
    return ev.groupBy(bucket.alias("bucket_15m")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sv"),
    )


@op(
    "qan_apdex",
    oracle="""
    SELECT event_type,
           cast(count(*) AS BIGINT) AS n,
           cast(sum(CASE WHEN value <= 25 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_satisfied,
           cast(sum(CASE WHEN value > 25 AND value <= 100 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tolerating,
           (sum(CASE WHEN value <= 25 THEN 1 ELSE 0 END)
            + sum(CASE WHEN value > 25 AND value <= 100 THEN 1 ELSE 0 END)
              / 2.0) / count(*) AS apdex
    FROM events GROUP BY 1
    """,
)
def qan_apdex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apdex score per class (satisfied ≤ T, tolerating ≤ 4T,
    frustrated above) — the industry-standard latency-satisfaction
    index a QAN dashboard headlines next to p95. Pure conditional
    counting (int/int + /2.0 — exact cross-engine), one partial-agg'd
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    sat = (F.col("value") <= 25).cast("long")
    tol = ((F.col("value") > 25) & (F.col("value") <= 100)).cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(sat).alias("n_satisfied"),
        F.sum(tol).alias("n_tolerating"),
        ((F.sum(sat) + F.sum(tol) / 2.0) / F.count("*")).alias("apdex"),
    )


@op(
    "qan_slo_burn",
    oracle="""
    WITH now_t AS (SELECT max(ts) AS now FROM events),
    windows AS (
      SELECT e.event_type,
             sum(CASE WHEN e.ts > now - INTERVAL 1 HOUR
                      THEN 1 ELSE 0 END) AS n_1h,
             sum(CASE WHEN e.ts > now - INTERVAL 1 HOUR AND e.value > 100
                      THEN 1 ELSE 0 END) AS bad_1h,
             sum(CASE WHEN e.ts > now - INTERVAL 6 HOUR
                      THEN 1 ELSE 0 END) AS n_6h,
             sum(CASE WHEN e.ts > now - INTERVAL 6 HOUR AND e.value > 100
                      THEN 1 ELSE 0 END) AS bad_6h
      FROM events e CROSS JOIN now_t GROUP BY 1)
    SELECT event_type,
           cast(n_1h AS BIGINT) AS n_1h, cast(bad_1h AS BIGINT) AS bad_1h,
           cast(n_6h AS BIGINT) AS n_6h, cast(bad_6h AS BIGINT) AS bad_6h,
           (bad_1h * 1.0 / n_1h) / 0.05 AS burn_1h,
           (bad_6h * 1.0 / n_6h) / 0.05 AS burn_6h,
           CASE WHEN (bad_1h * 1.0 / n_1h) / 0.05 > 14.4
                 AND (bad_6h * 1.0 / n_6h) / 0.05 > 6 THEN 1 ELSE 0 END
             AS page_alert
    FROM windows WHERE n_1h > 0 AND n_6h > 0
    """,
)
def qan_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO burn rate, SRE-workbook style: fraction of slow events
    (value > 100) against a 5% error budget over a short AND a long
    window (1h/6h relative to the stream head), with the classic
    fast-burn page condition (14.4×/6×). Multi-window burn alerts are
    THE production latency-SLO pattern; here it's two conditional
    aggregates sharing one scan, exact int arithmetic until the final
    ratios."""
    ev = load_table(spark, sf_dir, "events")
    now = ev.agg(F.max("ts").alias("now"))
    e = ev.crossJoin(F.broadcast(now))
    in_1h = F.col("ts") > F.col("now") - F.expr("INTERVAL 1 HOUR")
    in_6h = F.col("ts") > F.col("now") - F.expr("INTERVAL 6 HOUR")
    bad = F.col("value") > 100
    w = e.groupBy("event_type").agg(
        F.sum(in_1h.cast("long")).alias("n_1h"),
        F.sum((in_1h & bad).cast("long")).alias("bad_1h"),
        F.sum(in_6h.cast("long")).alias("n_6h"),
        F.sum((in_6h & bad).cast("long")).alias("bad_6h"),
    )
    burn_1h = (F.col("bad_1h") * 1.0 / F.col("n_1h")) / 0.05
    burn_6h = (F.col("bad_6h") * 1.0 / F.col("n_6h")) / 0.05
    return w.where((F.col("n_1h") > 0) & (F.col("n_6h") > 0)).select(
        "event_type",
        "n_1h",
        "bad_1h",
        "n_6h",
        "bad_6h",
        burn_1h.alias("burn_1h"),
        burn_6h.alias("burn_6h"),
        ((burn_1h > 14.4) & (burn_6h > 6)).cast("long").alias("page_alert"),
    )


@op(
    "qan_anomaly_mad",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             round(sum(value), 4) AS v
      FROM events GROUP BY 1, 2),
    med AS (
      SELECT event_type, quantile_cont(v, 0.5) AS med FROM hourly GROUP BY 1),
    mad AS (
      SELECT h.event_type, quantile_cont(abs(h.v - m.med), 0.5) AS mad
      FROM hourly h JOIN med m USING (event_type) GROUP BY 1)
    SELECT h.event_type, h.hour, h.v, m.med, d.mad,
           round(abs(h.v - m.med) / greatest(d.mad, 1e-9), 4) AS dev_ratio,
           (abs(h.v - m.med) > 3 * d.mad) AS is_anomaly
    FROM hourly h
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    """,
)
def qan_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-class load-anomaly detection: flag hours whose total
    value deviates from the class median by more than 3 median absolute
    deviations — the QAN "this digest misbehaved at 3am" panel, with
    MAD instead of stddev so one incident hour can't inflate its own
    threshold.

    Scale: hourly pre-aggregation first (|classes × hours| rows out of
    the events scan — the same cardinality collapse as the slowlog
    pipeline), then two tiny per-class reductions (median, MAD) that
    broadcast back onto the hourly rows. Exact percentile is fine HERE
    because its input is the pre-aggregated hourly table, not raw
    events; the raw-events path would use approx_percentile.

    Float discipline: hourly sums rounded to the testdata's own
    precision (exact-decimal recovery), medians bit-identical between
    Spark `percentile` and DuckDB `quantile_cont`, ratio guarded
    against MAD = 0 classes."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    med = hourly.groupBy("event_type").agg(
        F.expr("percentile(v, 0.5)").alias("med")
    )
    h_med = hourly.join(F.broadcast(med), "event_type")
    mad = h_med.groupBy("event_type").agg(
        F.expr("percentile(abs(v - med), 0.5)").alias("mad")
    )
    dev = F.abs(F.col("v") - F.col("med"))
    return (
        h_med.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "hour",
            "v",
            "med",
            "mad",
            F.round(dev / F.greatest(F.col("mad"), F.lit(1e-9)), 4).alias(
                "dev_ratio"
            ),
            (dev > 3 * F.col("mad")).alias("is_anomaly"),
        )
    )


@op(
    "time_rolling_distinct",
    # u7 must be EXACT distinct over a 7-day trailing window — not a
    # windowed count over pre-aggregated rows (distinct doesn't merge).
    # Both engines expand each (day, user) pair to the 7 days it
    # covers, then count distinct once.
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    cover AS (
      SELECT CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS day,
             user_id
      FROM pairs),
    roll AS (SELECT day, count(DISTINCT user_id) AS u7 FROM cover GROUP BY 1),
    daily AS (SELECT d AS day, count(DISTINCT user_id) AS u1
              FROM pairs GROUP BY 1)
    SELECT daily.day, daily.u1, roll.u7
    FROM daily JOIN roll USING (day)
    """,
)
def time_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct users per day (the WAU-by-day panel)
    beside the daily distinct count. Exact rolling distinct does NOT
    decompose into a window over daily partials — two days' distinct
    sets overlap — so the classic trick is used: reduce to distinct
    (day, user) pairs first, then map-side explode each pair onto the
    ≤7 days it covers and run ONE distinct aggregation.

    Scale: the first distinct collapses the raw event stream to
    |active days × users| pairs (the only full-data shuffle); the ×7
    fan-out happens AFTER that collapse, on the small pair set. This
    beats both a per-day self-join (7 scans) and a naive
    range-join (|days| × |events| candidate explosion). Joining back
    to the daily table trims the 6 phantom lead days."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    cover = pairs.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
        "user_id",
    )
    roll = cover.groupBy("day").agg(F.countDistinct("user_id").alias("u7"))
    daily = pairs.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("u1")
    )
    return daily.join(roll, "day").select("day", "u1", "u7")


@op(
    "qan_latency_histogram",
    # power-of-two bucket = number of binary digits of floor(value),
    # computed with integer/string ops on BOTH engines (no float log2
    # whose libm rounding could flip a boundary): Spark
    # length(conv(iv, 10, 2)) == DuckDB length(bin(iv)), incl. iv=0
    # ('0', length 1 — merged with the [1,1] bucket by design).
    oracle="""
    WITH b AS (
      SELECT event_type,
             length(bin(greatest(CAST(floor(value) AS BIGINT), 0))) AS bucket
      FROM events),
    cnt AS (
      SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2)
    SELECT event_type,
           CAST(bucket AS INTEGER) AS bucket,
           CASE WHEN bucket = 1 THEN 0
                ELSE (CAST(1 AS BIGINT) << (bucket - 1)) END AS lo,
           (CAST(1 AS BIGINT) << bucket) - 1 AS hi,
           cast(n AS BIGINT) AS n
    FROM cnt ORDER BY 1, 2
    """,
)
def qan_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class latency histogram with power-of-two buckets — the QAN
    latency-distribution bar chart (and ClickHouse's own
    ``quantileTiming`` bucketing philosophy): bucket k holds values in
    [2^(k-1), 2^k), so 40 buckets span ns→hours with constant
    relative error.

    Scale: bucketing is a map-side integer expression (no UDF, no
    float log); the aggregation shuffles |classes × ~40 buckets| tiny
    rows with map-side partials. Histograms at 100 TB should cost one
    partial-agg pass — this plan does."""
    ev = load_table(spark, sf_dir, "events")
    iv = F.greatest(F.floor("value").cast("long"), F.lit(0))
    bucket = F.length(F.conv(iv.cast("string"), 10, 2))
    b = ev.select("event_type", bucket.alias("bucket"))
    return (
        b.groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "bucket",
            F.when(F.col("bucket") == 1, F.lit(0).cast("long"))
            .otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)"))
            .alias("lo"),
            (F.expr("shiftleft(CAST(1 AS BIGINT), bucket)") - 1).alias("hi"),
            "n",
        )
        .orderBy("event_type", "bucket")
    )


@op(
    "join_interval_binned",
    # the oracle states the semantics as the naive inequality join —
    # correct but quadratic per user; the Spark plan must reproduce it
    # through the binned equi-join.
    oracle="""
    WITH err AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
    pur AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT e.event_id, e.user_id,
           cast(count(p.ts) AS BIGINT) AS purchases_10m
    FROM err e LEFT JOIN pur p
      ON p.user_id = e.user_id
     AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 10 MINUTE
    GROUP BY 1, 2
    """,
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join done scale-safe: for every error event, count the
    same user's purchases in the following 10 minutes (does the error
    suppress conversion?). The naive formulation is an inequality
    join — Catalyst plans those as nested loops, the classic 100 TB
    killer. The scale-safe plan bins both sides into 10-minute epochs
    and equi-joins on (user_id, bin): a purchase at most 10 minutes
    ahead lives in the error's own bin or the next one, so the error
    side explodes to those two bins and the post-filter applies the
    exact interval — a plain hash join whose candidate set is bounded
    by per-(user, 10-min) activity, not per-user history.

    Left semantics are restored by joining the counted matches back
    onto the error spine (zero-match errors keep count 0)."""
    ev = load_table(spark, sf_dir, "events")
    bin_of = (F.unix_timestamp("ts") / 600).cast("long")
    # lazy checkpoint: err is both the probe side and the left spine of
    # the final join — share the filtered scan instead of re-running it
    err = (
        ev.where(F.col("event_type") == "error")
        .select(
            "event_id", "user_id", F.col("ts").alias("e_ts"), bin_of.alias("b")
        )
        .localCheckpoint(eager=False)
    )
    probe = err.select(
        "event_id",
        "user_id",
        "e_ts",
        F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("jb"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        bin_of.alias("jb"),
    )
    hits = (
        probe.join(
            pur,
            (probe["user_id"] == pur["p_user"]) & (probe["jb"] == pur["jb"]),
        )
        .where(
            (F.col("p_ts") > F.col("e_ts"))
            & (F.col("p_ts") <= F.col("e_ts") + F.expr("INTERVAL 10 MINUTES"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n"))
    )
    return err.join(hits, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce(F.col("n"), F.lit(0)).alias("purchases_10m"),
    )


@op(
    "agg_session_window_builtin",
    # oracle reproduces Spark's session_window semantics with the
    # islands technique: a row starts a new session when its gap from
    # the previous event exceeds 10 min; window end = last event + gap
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 10 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 10 MINUTE AS session_end,
           cast(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def agg_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via the BUILT-IN ``session_window``
    aggregation — the one-liner alternative to win_sessionize's manual
    lag/cumsum islands (same semantics, pinned against each other by
    the oracle: window end = last event + gap). In streaming this same
    expression becomes the stateful session operator; using it in
    batch keeps one definition of "session" across both modes.

    Scale: session_window aggregates with ONE shuffle on the user key
    (no window-function sort pass followed by a second groupBy — the
    manual islands plan pays both); merging is done by the aggregate
    operator itself. The r6 sweep's 3.0× wall at 100× data prompted a
    plan audit (VERDICT r6 #6): the physical plan is Scan → partial
    HashAggregate → Exchange(user_id) → Sort → MergingSessions → final
    HashAggregate — no single-task stage and no bounded-cardinality
    key (user count grows 10× per 10× data in this corpus), so the
    growth is per-core sort/merge throughput at FIXED local cores,
    which a cluster absorbs by adding executors; re-measured 1.7× in
    the r7 session (SCALING.md)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "10 minutes").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@op(
    "events_attribution",
    # last_value(... IGNORE NULLS) over (user, ts) is deterministic
    # because (ts, event_id) is unique per user; latency is exact
    # integer epoch arithmetic
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_type, event_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_ts
      FROM events WHERE event_type IN ('click', 'purchase'))
    SELECT event_id, user_id, ts AS purchase_ts, last_click_ts,
           CASE WHEN last_click_ts IS NOT NULL
                THEN CAST(date_diff('second', last_click_ts, ts) AS BIGINT)
                END AS latency_s,
           (last_click_ts IS NOT NULL) AS attributed
    FROM s WHERE event_type = 'purchase'
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the user's most
    recent PRECEDING click and the click→purchase latency — the
    marketing-analytics join expressed as one window pass instead of
    an as-of self-join (the stream is unioned, ordered per user, and
    `last_value(click_ts) IGNORE NULLS` carries the touch forward;
    frame ends at 1 PRECEDING so a same-timestamp purchase can't
    attribute to itself).

    Scale: ONE shuffle on user_id for the window; no join at all —
    the as-of formulation (join_asof) pays a range-merge per key pair,
    this pays a linear scan per user partition. Unattributed
    purchases (no prior click) survive with NULL latency."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    s = ev.withColumn(
        "last_click_ts", F.last(click_ts, ignorenulls=True).over(w)
    )
    lat = F.when(
        F.col("last_click_ts").isNotNull(),
        F.col("ts").cast("long") - F.col("last_click_ts").cast("long"),
    )
    return s.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
        lat.alias("latency_s"),
        F.col("last_click_ts").isNotNull().alias("attributed"),
    )


@op(
    "time_resample_ohlc",
    # open/close use min_by/max_by on a UNIQUE order key — a
    # fixed-width string of (epoch_us, event_id): lexicographic ==
    # numeric at equal width, identical in both engines, and the
    # event_id suffix makes duplicate-timestamp buckets deterministic
    oracle="""
    WITH k AS (
      SELECT *, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                || lpad(CAST(event_id AS VARCHAR), 12, '0') AS okey
      FROM events)
    SELECT event_type,
           cast(time_bucket(INTERVAL 15 MINUTE, ts) AS TIMESTAMP) AS bucket,
           arg_min(value, okey) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, okey) AS close,
           cast(count(*) AS BIGINT) AS n
    FROM k
    GROUP BY 1, 2
    """,
)
def time_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling: 15-minute buckets per class with
    open/high/low/close of the value series — the downsampling shape
    every monitoring chart and financial rollup uses (plot 4 points
    per bucket instead of every event).

    Scale: ONE partial-agg'd groupBy — min_by/max_by fold the
    first/last selection INTO the aggregate (each partial carries its
    candidate row), so there is no window pass, no self-join back to
    the extremes, and shuffle volume is |classes × buckets|. That's
    the difference vs the naive row_number()-twice formulation, which
    pays a full window sort before it can aggregate."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / 900).cast("long") * 900
    )
    okey = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return ev.groupBy(
        "event_type", bucket.alias("bucket")
    ).agg(
        F.min_by("value", okey).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", okey).alias("close"),
        F.count("*").alias("n"),
    )


@op(
    "qan_load_heatmap",
    # G9 date-part conventions in action: Spark dayofweek is
    # 1=Sunday, DuckDB dow is 0=Sunday — both sides emit ISO
    # (1=Monday..7=Sunday) explicitly so the heatmap axes agree
    oracle="""
    SELECT CAST(isodow(ts) AS INTEGER) AS iso_dow,
           CAST(hour(ts) AS INTEGER) AS hr,
           cast(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS load_sum
    FROM events GROUP BY 1, 2
    """,
)
def qan_load_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekday × hour load heatmap — every monitoring dashboard's
    "when does this system hurt" panel (batch jobs light up the 03:00
    row, business load the weekday 9-17 block). Also the living
    example of gotcha G9: day-of-week numbering differs across
    engines, so both sides emit ISO day numbers explicitly.

    Scale: one partial-agg'd shuffle onto a ≤168-cell key domain —
    the heatmap for 100 TB of events costs a map-side pass."""
    ev = load_table(spark, sf_dir, "events")
    iso_dow = F.weekday("ts") + 1  # Spark weekday: 0=Monday
    return ev.groupBy(
        iso_dow.cast("int").alias("iso_dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("load_sum"),
    )


@op(
    "events_bounce_rate",
    # sessionization restated with the islands technique (the same
    # equivalence agg_session_window_builtin pins); bounce_rate is
    # exact int/int
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 10 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g),
    sess AS (
      SELECT user_id, sid,
             CAST(min(ts) AS DATE) AS day,
             count(*) AS n_events
      FROM s GROUP BY 1, 2)
    SELECT day,
           cast(count(*) AS BIGINT) AS n_sessions,
           cast(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0 / count(*)
             AS bounce_rate
    FROM sess GROUP BY 1
    """,
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: the share of sessions containing exactly one
    event — the engagement headline metric, built ON the built-in
    session_window aggregation (one definition of "session" across
    this op, the batch sessionizer and the streaming path; the oracle
    restates it via the islands technique their equivalence test
    already pins).

    Scale: session_window's single user-keyed aggregate shuffle, then
    a tiny |days| rollup. Sessions are attributed to the day they
    START (min ts), so midnight-spanning sessions count once."""
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy(
        "user_id", F.session_window("ts", "10 minutes").alias("w")
    ).agg(F.count("*").alias("n_events"))
    by_day = sess.select(
        F.to_date("w.start").alias("day"), "n_events"
    )
    bounce = F.sum((F.col("n_events") == 1).cast("long"))
    return by_day.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        bounce.alias("n_bounces"),
        (bounce * 1.0 / F.count("*")).alias("bounce_rate"),
    )


@op(
    "events_props_band_stats",
    # typed JSON extraction feeding integer banding: k and its band
    # are exact ints, value sums round-recovered per band. TRY_CAST,
    # not CAST: Spark's cast('long') yields NULL on a non-numeric k
    # and the filter drops it — DuckDB must degrade the same way
    # instead of raising (ADVICE r5)
    oracle="""
    WITH x AS (
      SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             value
      FROM events)
    SELECT CAST(k // 10 AS BIGINT) AS k_band,
           cast(count(*) AS BIGINT) AS n,
           min(k) AS k_min,
           max(k) AS k_max,
           round(sum(value), 4) AS value_sum
    FROM x WHERE k IS NOT NULL
    GROUP BY 1
    """,
)
def events_props_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured drill-down: extract a TYPED numeric field from
    the JSON props column, band it, and aggregate — the everyday
    "group by a property buried in the payload" query that decides
    whether a pipeline promotes a JSON field to a real column (if
    this panel is hot, promote; scan_json_props is the promotion).

    Scale: extraction is a map-side expression (Spark's JSON path
    evaluation inside codegen — no UDF); the band groupBy
    partial-aggregates onto a ≤|k-range|/10 key domain."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    x = ev.select(k.alias("k"), "value").where(F.col("k").isNotNull())
    return x.groupBy(
        F.floor(F.col("k") / 10).cast("long").alias("k_band")
    ).agg(
        F.count("*").alias("n"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.round(F.sum("value"), 4).alias("value_sum"),
    )


@op(
    "qan_trend_regression",
    # the regression INPUTS are made bit-identical first (integer day
    # index; daily mean rounded at 4), then regr_* runs over ≤|days|
    # points per class — the agg_regression G8 discipline, rounded at
    # 6 on the way out; the verdict coalesces NULL (single-point
    # classes) to false on both sides
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS day_idx,
             round(avg(value), 4) AS avg_value
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(regr_slope(avg_value, day_idx), 6) AS slope_per_day,
           round(regr_r2(avg_value, day_idx), 6) AS fit_r2,
           coalesce(regr_slope(avg_value, day_idx) > 0, false) AS degrading
    FROM daily GROUP BY 1
    """,
)
def qan_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Which query classes are getting slower?" — the QAN triage
    question qan_compare_periods answers pairwise, answered as a
    single trend line: per class, fit latency-proxy vs calendar day
    (least squares over the DAILY mean series, not raw rows, so one
    noisy burst can't masquerade as a trend) and flag classes with a
    positive slope. slope_per_day is the drift rate a capacity planner
    multiplies out ("at +0.8/day this class doubles in a quarter");
    fit_r2 says whether the line is believable.

    Scale: one |classes|×|days| pre-aggregate (partial map-side), then
    regr_* moment sums over that tiny series — mergeable, so the final
    shuffle is |classes| rows. The daily mean is rounded BEFORE the
    fit so both engines regress identical IEEE inputs."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", "ts")), F.lit("1970-01-01").cast("date")
        ).alias("day_idx"),
    ).agg(F.round(F.avg("value"), 4).alias("avg_value"))
    slope = F.regr_slope("avg_value", "day_idx")
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round(F.regr_r2("avg_value", "day_idx"), 6).alias("fit_r2"),
        F.coalesce(slope > 0, F.lit(False)).alias("degrading"),
    )
