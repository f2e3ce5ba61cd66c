"""Relational operator surface — SURVEY.md §2 B/C/D/E/F/G.

These are the QAN-style "consumer" queries the reference's ClickHouse
table exists to serve (top-N digests, per-period time series, dimension
filters — SURVEY.md §3.3), generalized to the driver's star schema.
Everything is plain DataFrame API: Catalyst handles pushdown, pruning,
join selection and partial aggregation; no custom physical machinery.

Scale notes are per-op docstrings. The recurring ones:
  * groupBy on low-cardinality keys => map-side partial agg shrinks the
    shuffle to |groups| × partitions rows — safe at 100 TB;
  * dimension joins broadcast (customer/nation/region are small by
    design in a star schema); fact-fact joins shuffle on the join key
    and AQE handles skew;
  * every window partitions by a bounded key (digest/user/custkey), so
    per-partition state stays small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.operators.stitched import ranked_topk, stitched_order
from slowlog2clickhouse_spark.registry import op


def exact_avg(col: str, scale: int = 100):
    """Cross-engine-exact mean of a fixed-decimal column.

    ``avg(x)`` of exact-decimal data frequently lands on a decimal half
    (e.g. 51.19875) where Spark's round (decimal-string HALF_UP) and
    DuckDB's round (float multiply) disagree; and the unrounded float
    sum differs in low bits across engines because accumulation order
    differs. Summing integer cents (exact) and dividing once keeps the
    result bit-identical with the DuckDB expression
    ``sum(cast(round(x*100,0) AS BIGINT)) / 100.0 / count(x)``.
    """
    cents = F.round(F.col(col) * scale, 0).cast("long")
    return F.sum(cents) / float(scale) / F.count(col)


def EXACT_AVG_SQL(col: str, scale: int = 100) -> str:
    return f"sum(cast(round({col} * {scale}, 0) AS BIGINT)) / {scale}.0 / count({col})"

# ---------------------------------------------------------------------------
# B. Projection / filter
# ---------------------------------------------------------------------------


@op(
    "project_select",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           upper(l_returnflag) AS flag
    FROM lineitem
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection / aliasing / computed columns.

    Reference analog: row-struct construction, main.go:~150-200 [R:M].
    Scalar float math is IEEE-deterministic => no rounding needed.
    Scale: pure map-side; column pruning reaches the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.upper("l_returnflag").alias("flag"),
    )


@op(
    "project_case",
    oracle="""
    SELECT CASE WHEN value < 50 THEN 'low'
                WHEN value < 200 THEN 'mid'
                ELSE 'high' END AS band,
           count(*) AS n,
           sum(cast(round(value * 100, 0) AS BIGINT)) / 100.0 / count(value) AS avg_value
    FROM events GROUP BY 1
    """,
)
def project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (latency bands — QAN dashboard style)."""
    ev = load_table(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
        .alias("band")
    )
    return ev.groupBy(band).agg(
        F.count("*").alias("n"), exact_avg("value").alias("avg_value")
    )


@op(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_totalprice BETWEEN 1000 AND 50000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND NOT (o_custkey < 10)
      AND o_orderpriority LIKE '%H%'
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate surface: =, BETWEEN, IN, LIKE, AND/OR/NOT.

    Reference analog: admin-command skip (event.Admin), main.go:~140.
    Scale: all predicates push down to the parquet scan (verified via
    .explain → PushedFilters).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderstatus") == "F")
        & F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ~(F.col("o_custkey") < 10)
        & F.col("o_orderpriority").like("%H%")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@op(
    "filter_null",
    oracle="""
    SELECT count(*) AS n_total,
           count(CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 1 END) AS n_null,
           count(nullif(c_mktsegment, 'BUILDING')) AS n_not_null,
           count(CASE WHEN nullif(c_mktsegment, 'BUILDING')
                      IS NOT DISTINCT FROM 'AUTOMOBILE' THEN 1 END) AS n_nullsafe_eq
    FROM customer
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: IS NULL / IS NOT NULL / null-safe equality (<=>).

    Reference analog: absent metric lines → missing map keys [R:H];
    here nulls are synthesized via nullif since testdata is dense.
    """
    c = load_table(spark, sf_dir, "customer").withColumn(
        "seg", F.expr("nullif(c_mktsegment, 'BUILDING')")
    )
    return c.agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("seg").isNull(), 1)).alias("n_null"),
        F.count("seg").alias("n_not_null"),
        F.count(F.when(F.col("seg").eqNullSafe("AUTOMOBILE"), 1)).alias("n_nullsafe_eq"),
    )


# ---------------------------------------------------------------------------
# C. Joins
# ---------------------------------------------------------------------------


@op(
    "join_broadcast_inner",
    oracle="""
    SELECT r_name AS region, n_name AS nation, count(*) AS n_cust,
           round(sum(c_acctbal), 4) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
)
def join_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension equi-join chain, broadcast strategy.

    Scale: nation/region are O(10^2) rows at any SF — broadcast them so
    the fact side never shuffles for the join; the only shuffle is the
    final low-cardinality groupBy (partial-agg'd map-side).
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
        )
    )


@op(
    "join_shuffle_inner",
    oracle="""
    SELECT o_orderpriority AS priority, count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def join_shuffle_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi-join (sort-merge / shuffled-hash via AQE).

    Scale: both sides shuffle on orderkey; at 100 TB this is the
    canonical co-partitioned fact-fact join — bucketing both tables by
    orderkey at write time removes the shuffle entirely (see
    sinks/parquet.py bucketed writer).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
    )


@op(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY 1, 2
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER: customers kept at 0 orders (count(col) skips nulls)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@op(
    "join_full_outer",
    oracle="""
    WITH l AS (SELECT DISTINCT o_custkey AS lk FROM orders WHERE o_orderstatus = 'F'),
         r AS (SELECT DISTINCT o_custkey AS rk FROM orders WHERE o_orderstatus = 'O')
    SELECT count(*) AS n_rows,
           count(CASE WHEN lk IS NULL THEN 1 END) AS only_right,
           count(CASE WHEN rk IS NULL THEN 1 END) AS only_left,
           count(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL THEN 1 END) AS in_both
    FROM l FULL OUTER JOIN r ON lk = rk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER over two key spaces (custkeys by order status)."""
    o = load_table(spark, sf_dir, "orders")
    left = (
        o.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("lk"))
        .distinct()
    )
    right = (
        o.where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("rk"))
        .distinct()
    )
    j = left.join(right, left.lk == right.rk, "full")
    return j.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("lk").isNull(), 1)).alias("only_right"),
        F.count(F.when(F.col("rk").isNull(), 1)).alias("only_left"),
        F.count(F.when(F.col("lk").isNotNull() & F.col("rk").isNotNull(), 1)).alias(
            "in_both"
        ),
    )


@op(
    "join_semi",
    oracle="""
    SELECT count(*) AS n, round(sum(c_acctbal), 4) AS bal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS-style filter; right side only probes."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 4).alias("bal"))
    )


@op(
    "join_anti",
    oracle="""
    SELECT count(*) AS n, round(sum(c_acctbal), 4) AS bal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS (customers with no orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 4).alias("bal"))
    )


@op(
    "join_semi_anti_rewrite",
    oracle="""
    SELECT count(*) AS n FROM customer WHERE c_custkey IN
    (SELECT o_custkey FROM orders) OR c_custkey NOT IN
    (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def join_semi_anti_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe rewrite of bench.py's ``q_semi_anti``.

    The disjunctive ``IN (...) OR NOT IN (...)`` forces Spark into a
    BroadcastNestedLoopJoin ExistenceJoin — O(|customer| x |distinct
    o_custkey|) per partition, a 100-TB killer. Because the second
    subquery filters ``o_custkey IS NOT NULL``, ``NOT IN`` degenerates
    to "no match AND c_custkey IS NOT NULL", so the whole predicate is
    decidable from ONE left outer join against the deduped key set:

        matched OR (c_custkey IS NOT NULL AND NOT matched)

    Plan: distinct(o_custkey) partial-aggregates map-side, then a single
    hash join on the key — both sides shuffle once on c_custkey; AQE
    broadcasts the deduped side when it fits. No nested loop anywhere
    (pinned by tests/test_plans.py).
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    okeys = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("ok"))
        .where(F.col("ok").isNotNull())
        .distinct()
    )
    joined = c.join(okeys, c.c_custkey == okeys.ok, "left_outer")
    matched = F.col("ok").isNotNull()
    keep = matched | (F.col("c_custkey").isNotNull() & ~matched)
    return joined.where(keep).agg(F.count("*").alias("n"))


@op(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (small × small only; guarded at scale)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@op(
    "join_theta_range",
    oracle="""
    SELECT p_brand AS brand, count(*) AS n,
           round(sum(l_extendedprice), 4) AS total
    FROM lineitem JOIN part
      ON l_partkey = p_partkey AND l_quantity > p_size
    GROUP BY 1
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + range residual (theta join).

    Scale: the equi key carries the shuffle; the range predicate is a
    post-probe residual filter, so no nested-loop blowup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("total"))
    )


@op(
    "join_asof",
    oracle="""
    SELECT event_id, user_id, ts, last_view_ts FROM (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
      FROM events
    ) t WHERE event_type = 'click'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest strictly-prior 'view' per 'click', per user.

    Spark has no native ASOF JOIN; the scalable formulation is a single
    window over the unioned stream (one shuffle on user_id, no range
    join blowup) — identical semantics to DuckDB's ASOF JOIN for the
    strictly-before case, expressed here as the same window on both
    engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        ev.withColumn(
            "last_view_ts",
            F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .where(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_view_ts")
    )


# ---------------------------------------------------------------------------
# D. Aggregation
# ---------------------------------------------------------------------------


@op(
    "agg_global",
    oracle="""
    SELECT count(*) AS n, round(sum(l_quantity), 4) AS sum_qty,
           sum(cast(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
             / count(l_extendedprice) AS avg_price,
           min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-input stats (reference Result.Global, event/global.go)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        exact_avg("l_extendedprice").alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@op(
    "agg_groupby_stats",
    oracle="""
    SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
           count(*) AS cnt,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_price,
           sum(cast(round(l_discount * 100, 0) AS BIGINT)) / 100.0
             / count(l_discount) AS avg_disc,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
    FROM lineitem GROUP BY 1, 2
    """,
)
def agg_groupby_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: per-group cnt/sum/min/max/avg — the reference's
    per-digest metric stats (event/class.go AddEvent/Finalize,
    event/metrics.go [R:H]) on the star schema.

    Scale: hash aggregation with map-side partial agg; shuffle volume
    is |groups| × partitions regardless of input rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        exact_avg("l_discount").alias("avg_disc"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@op(
    "agg_time_bucket",
    oracle="""
    SELECT date_trunc('hour', ts) AS period_start, event_type,
           count(*) AS n, round(sum(value), 4) AS sum_value,
           min(value) AS min_value, max(value) AS max_value,
           sum(cast(round(value * 100, 0) AS BIGINT)) / 100.0 / count(value) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def agg_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-bucket aggregation — the reference's period_start
    truncation (main.go:~120-150 ts.Truncate(time.Minute); hourly here
    so sf0.01 output stays bounded).

    Scale: this is THE pre-aggregation pattern of the whole pipeline —
    output cardinality = |digests| × |periods|, not |events|.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("period_start"), F.col("event_type")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        exact_avg("value").alias("avg_value"),
    )


@op(
    "agg_percentile",
    oracle="""
    SELECT event_type, count(*) AS n,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY 1
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact P50/P95/P99 per class (reference sorts buffered values at
    Finalize — event/metrics.go:~150-200). Spark exact `percentile`
    uses the same linear interpolation as DuckDB quantile_cont.

    Scale: exact percentile buffers per-group values; at 100 TB use the
    approx_percentile variant (agg_percentile_approx op) — the exact
    form is kept for oracle parity.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@op(
    "agg_count_distinct",
    oracle="""
    SELECT count(DISTINCT user_id) AS du, count(DISTINCT event_type) AS de,
           count(*) AS n
    FROM events
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (reference Class.UniqueQueries)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("du"),
        F.countDistinct("event_type").alias("de"),
        F.count("*").alias("n"),
    )


@op(
    "agg_approx_count_distinct",
    # r6 partial oracle (VERDICT r5 #7): exact distincts are
    # value-checked; the HLL++ estimates (engine-specific raw values —
    # G8) surface as error-bound verdicts the oracle asserts TRUE, so
    # a sketch drifting past its documented rsd now FAILS the driver
    oracle="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_du,
           CAST(count(DISTINCT event_type) AS BIGINT) AS exact_de,
           TRUE AS approx_du_ok,
           TRUE AS approx_de_ok
    FROM events
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB path for distinct dims.
    Default rsd is 0.05; the verdict columns check the estimate landed
    within 3× that bound of the exact count (≈ 3σ)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.count_distinct("user_id").alias("exact_du"),
        F.count_distinct("event_type").alias("exact_de"),
        F.approx_count_distinct("user_id").alias("approx_du"),
        F.approx_count_distinct("event_type").alias("approx_de"),
    )
    return agg.select(
        "exact_du",
        "exact_de",
        (
            F.abs(F.col("approx_du") - F.col("exact_du"))
            <= F.greatest(F.lit(1.0), 0.15 * F.col("exact_du").cast("double"))
        ).alias("approx_du_ok"),
        (
            F.abs(F.col("approx_de") - F.col("exact_de"))
            <= F.greatest(F.lit(1.0), 0.15 * F.col("exact_de").cast("double"))
        ).alias("approx_de_ok"),
    )


@op(
    "agg_having",
    oracle="""
    SELECT user_id, count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY 1 HAVING count(*) > 50
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .where(F.col("n") > 50)
    )


@op(
    "agg_conditional",
    oracle="""
    SELECT l_linestatus AS linestatus,
           count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
           count(*) AS n,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 4)
             AS returned_value,
           count(CASE WHEN l_returnflag = 'R' THEN 1 END) / count(*) AS returned_ratio
    FROM lineitem GROUP BY 1
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bool-metric ratios — the reference's BoolStats{Sum,Cnt}
    (event/metrics.go:~100-130): sum(CASE WHEN b)/count(*)."""
    li = load_table(spark, sf_dir, "lineitem")
    returned = F.col("l_returnflag") == "R"
    return li.groupBy(F.col("l_linestatus").alias("linestatus")).agg(
        F.count(F.when(returned, 1)).alias("n_returned"),
        F.count("*").alias("n"),
        F.round(F.sum(F.when(returned, F.col("l_extendedprice")).otherwise(0.0)), 4).alias(
            "returned_value"
        ),
        (F.count(F.when(returned, 1)) / F.count("*")).alias("returned_ratio"),
    )


@op(
    "agg_argmax_example",
    oracle="""
    SELECT event_type, event_id AS worst_event_id, value AS worst_value FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def agg_argmax_example(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax — keep the example row of the worst execution per class
    (reference keeps the max-Query_time query text, event/class.go
    example logic:~120-160). max_by with a struct key makes ties
    deterministic (value, then event_id)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("max_by(event_id, struct(value, event_id))").alias("worst_event_id"),
        F.max("value").alias("worst_value"),
    )


@op(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           count(*) AS n, round(sum(o_totalprice), 4) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotal hierarchy (QAN drill-down: db → digest)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    ).agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))


@op(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           count(*) AS n, round(sum(o_totalprice), 4) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all dimension combinations."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    ).agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))


@op(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@op(
    "agg_collect_sorted",
    oracle="""
    SELECT o_orderpriority AS priority, string_agg(s, ',' ORDER BY s) AS statuses
    FROM (SELECT DISTINCT o_orderpriority, o_orderstatus AS s FROM orders) t
    GROUP BY 1
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group value list, deterministically ordered (labels agg).

    collect_set → array_sort → array_join; never an unsorted
    collect_list in an oracle-checked query (SURVEY.md §7 G7).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses")
    )


# ---------------------------------------------------------------------------
# E. Window functions
# ---------------------------------------------------------------------------


@op(
    "win_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, cast(rn AS BIGINT) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K rows per group (top queries per schema — QAN staple).

    Scale: single shuffle on the partition key; AQE handles skewed
    groups. Tiebreak on o_orderkey for determinism.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@op(
    "win_rank_dense_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority AS priority,
           cast(rank()       OVER w AS BIGINT) AS rnk,
           cast(dense_rank() OVER w AS BIGINT) AS drnk,
           cast(ntile(4)     OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile quartiles per priority class."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@op(
    "win_lag_lead",
    oracle="""
    SELECT event_type, h, n,
           lag(n, 1)  OVER (PARTITION BY event_type ORDER BY h ASC) AS prev_n,
           lead(n, 1) OVER (PARTITION BY event_type ORDER BY h ASC) AS next_n
    FROM (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
          FROM events GROUP BY 1, 2) t
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta vs previous period — the QAN sparkline slope."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy(F.col("h").asc())
    return hourly.select(
        "event_type",
        "h",
        "n",
        F.lag("n", 1).over(w).alias("prev_n"),
        F.lead("n", 1).over(w).alias("next_n"),
    )


@op(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative load over time per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_total"),
    )


@op(
    "win_moving_avg_time",
    oracle="""
    SELECT event_id,
           sum(cast(round(value * 100, 0) AS BIGINT)) OVER w / 100.0
             / count(value) OVER w AS mavg_1h
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts) ASC
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based sliding mean: 1-hour RANGE window ending at each row
    (ordered by epoch microseconds so both engines bound identically).

    The windowed sum runs over integer cents: Spark maintains sliding
    sums incrementally while DuckDB uses a segment tree, so a float sum
    differs in the low bits and can land on a rounding boundary
    (observed at sf0.01) — an exact integer sum + one double division
    is bit-identical on both engines.
    """
    ev = load_table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    w = (
        W.partitionBy("event_type")
        .orderBy(F.col("us").asc())
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return ev.select(
        "event_id",
        (F.sum(cents).over(w) / 100.0 / F.count("value").over(w)).alias("mavg_1h"),
    )


@op(
    "win_first_last_value",
    oracle="""
    SELECT DISTINCT event_type,
           first_value(event_id) OVER w AS cheapest_event,
           last_value(event_id)  OVER w AS priciest_event
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with an explicit full frame."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy(F.col("value").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "event_type",
        F.first("event_id").over(w).alias("cheapest_event"),
        F.last("event_id").over(w).alias("priciest_event"),
    ).distinct()


@op(
    "win_percent_cume",
    oracle="""
    SELECT o_orderkey,
           percent_rank() OVER w AS pr,
           cume_dist()    OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist (exact rational of int ranks — no
    rounding needed, both engines divide the same integers)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


# ---------------------------------------------------------------------------
# F. Sort / limit / sample
# ---------------------------------------------------------------------------


@op(
    "qan_sparkline",
    oracle="""
    WITH totals AS (
      SELECT event_type, round(sum(value), 4) AS total_value,
             row_number() OVER (ORDER BY round(sum(value), 4) DESC NULLS LAST,
                                event_type ASC) AS rnk
      FROM events GROUP BY 1
    ),
    top3 AS (SELECT event_type, total_value, rnk FROM totals WHERE rnk <= 3)
    SELECT t.event_type, cast(t.rnk AS BIGINT) AS rnk, t.total_value,
           date_trunc('hour', e.ts) AS h,
           count(*) AS n, round(sum(e.value), 4) AS hourly_value
    FROM events e JOIN top3 t USING (event_type)
    GROUP BY 1, 2, 3, 4
    """,
)
def qan_sparkline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE QAN dashboard query (SURVEY.md §3.3, PMM QAN [R:M]): top-N
    classes by total load, each with its per-period time series (the
    sparkline). Composite of limit_topk + agg_time_bucket + a broadcast
    semi-join back onto the facts — top3 is N rows, so the second pass
    over events is shuffle-free on the join."""
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("event_type").agg(
        F.round(F.sum("value"), 4).alias("total_value")
    )
    top3 = ranked_topk(
        totals,
        [F.col("total_value").desc_nulls_last(), F.col("event_type").asc()],
        3,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("long"))
    return (
        ev.join(F.broadcast(top3), "event_type")
        .groupBy(
            "event_type",
            "rnk",
            "total_value",
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("hourly_value"))
    )


@op(
    "win_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
      SELECT user_id, event_id, us,
             cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM marked)
    SELECT user_id, session_id, count(*) AS n_events,
           min(us) AS session_start_us, max(us) AS session_end_us
    FROM sess GROUP BY 1, 2
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap marking + running sum of session
    starts (the stateless formulation of stream_session_window — 30-min
    gap). One shuffle on user_id shared by both windows and the final
    groupBy; Catalyst reuses the partitioning across all three."""
    ev = load_table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(w).isNull() | (F.col("us") - F.lag("us").over(w) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy(F.col("us").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(w2))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
    )


@op(
    "sort_multikey_nulls",
    oracle="""
    SELECT c_custkey, seg, c_acctbal FROM (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
      FROM customer
    ) t
    ORDER BY seg ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey ASC
    LIMIT 50
    """,
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with explicit NULLS FIRST/LAST (defaults
    differ: Spark ASC=NULLS FIRST, DuckDB ASC=NULLS LAST — G4). The
    LIMIT makes the sort observable under an order-insensitive hash."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr("nullif(c_mktsegment, 'BUILDING')").alias("seg"),
        "c_acctbal",
    )
    return c.orderBy(
        F.col("seg").asc_nulls_first(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey").asc(),
    ).limit(50)


@op(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
    LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K (TakeOrderedAndProject — no full sort materialized).

    Scale: per-partition top-K then a K-row merge at the driver; never
    a global sort.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc())
        .limit(10)
    )


@op(
    "sample_fraction",
    # deterministic md5-threshold sample: keep a row iff a 60-bit
    # md5-derived hash of its primary key lands under frac — the same
    # portable-hash idiom as the LSH family (SURVEY §7 G8), so DuckDB
    # reproduces the exact sampled set
    oracle="""
    SELECT count(*) AS n_sampled,
           round(count(*) / 0.1, 0) AS n_estimated_total
    FROM lineitem
    WHERE CAST(('0x' || substr(md5(l_orderkey || '|' || l_linenumber), 1, 15))
               AS BIGINT) % 1000000 < 100000
    """,
)
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row sampling (reference analog: Log_slow_rate_limit rate-limited
    logging; counts upscaled by 1/fraction like RateType/RateLimit).

    Hash-threshold sampling instead of ``df.sample(seed=...)``: the
    keep/drop decision is a pure function of the row's key, so the
    sample is identical across engines, retries and partitionings —
    exactly the property a distributed rate-limiter needs (a seeded
    Bernoulli sample is partition-order-dependent and engine-specific).
    Scale: embarrassingly parallel map-side filter; one md5 per row,
    no shuffle before the count aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    frac = 0.1
    key = F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))
    bucket = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") % 1000000
    return (
        li.where(bucket < int(frac * 1000000))
        .agg(F.count("*").alias("n_sampled"))
        .select(
            "n_sampled",
            F.round(F.col("n_sampled") / frac, 0).alias("n_estimated_total"),
        )
    )


# ---------------------------------------------------------------------------
# G. Set ops / dedup
# ---------------------------------------------------------------------------


@op(
    "set_union_all",
    oracle="""
    SELECT user_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, event_type FROM events WHERE value > 400
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (merge two log sources)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id", "event_type")
    b = ev.where(F.col("value") > 400).select("user_id", "event_type")
    return a.unionByName(b)


@op(
    "set_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (distinct)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "error").select("user_id")
    return a.unionByName(b).distinct()


@op(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (custkeys active in both order states)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@op(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (digests new this period — QAN analog)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.subtract(b)


@op(
    "dedup_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag AS returnflag, l_linestatus AS linestatus,
                    l_shipdate AS shipdate
    FROM lineitem
    """,
)
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
        F.col("l_shipdate").alias("shipdate"),
    ).distinct()


@op(
    "join_lateral",
    oracle="""
    SELECT n_name, c.c_custkey, c.c_acctbal
    FROM nation, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
    """,
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated join: top-2 customers per nation via a
    per-row correlated subquery — the SQL surface for dependent joins
    (Catalyst plans it as a window/partial-sort under the hood, so
    unlike a naive per-row re-scan it is one pass over customer).
    Unique tiebreak (c_custkey) keeps the LIMIT deterministic."""
    from slowlog2clickhouse_spark.io import load_table as _lt

    _lt(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    _lt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n_name, c.c_custkey, c.c_acctbal
        FROM nation JOIN LATERAL (
          SELECT c_custkey, c_acctbal FROM customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        """
    )


@op(
    "filter_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) >= 5
    """,
)
def filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in a predicate — Catalyst decorrelates
    it into an aggregate + join (one shuffle on the correlation key),
    not a per-row re-scan; the count aggregate keeps the predicate
    exact cross-engine."""
    from slowlog2clickhouse_spark.io import load_table as _lt

    _lt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) >= 5
        """
    )


@op(
    "agg_histogram",
    oracle="""
    WITH stats AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
    SELECT cast(least(floor((value - mn) / ((mx - mn) / 20)), 19) AS BIGINT)
             AS bucket,
           mn + cast(least(floor((value - mn) / ((mx - mn) / 20)), 19)
                     AS BIGINT) * ((mx - mn) / 20) AS bucket_lo,
           cast(count(*) AS BIGINT) AS n
    FROM events, stats
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 buckets over the observed [min, max])
    — the profiling/quality-dashboard staple. One global-stats agg
    (broadcast single row) + one map-side bucket computation + one
    partial-agg'd groupBy on the bucket id. All bucket arithmetic is
    the same double-op sequence in both engines, so boundaries are
    bit-identical (no rounding anywhere). Assumes mx > mn (true for
    any non-degenerate metric column)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    step = (F.col("mx") - F.col("mn")) / 20
    bucket = F.least(
        F.floor((F.col("value") - F.col("mn")) / step), F.lit(19)
    ).cast("long")
    return (
        ev.crossJoin(F.broadcast(stats))
        .groupBy(
            bucket.alias("bucket"),
            (F.col("mn") + bucket * step).alias("bucket_lo"),
        )
        .agg(F.count("*").alias("n"))
    )


@op(
    "join_bloom_runtime_filter",
    oracle="""
    SELECT l.l_orderkey, cast(count(*) AS BIGINT) AS n,
           round(sum(l.l_extendedprice), 4) AS s
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY 1
    """,
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dimension join shaped for Spark's runtime bloom-filter
    injection: the filtered orders side builds a bloom filter pushed
    into the lineitem scan, so most probe rows drop BEFORE the shuffle
    — at 100 TB that is shuffling ~2% of the fact table instead of all
    of it. Injection fires when the build side clears
    `runtime.bloomFilter.creationSideThreshold` (automatic at real
    scale; tests/test_plans.py lowers the thresholds and pins
    BloomFilterMightContain in this exact plan). Join itself is an
    ordinary equi-join, so correctness is threshold-independent.

    Relies on `spark.sql.optimizer.runtime.bloomFilter.enabled`
    being default-true (Spark ≥3.4; verified on this build) rather
    than setting it here: the conf is read at action-time optimization
    — after this builder returns — so a set here could not be
    try/finally-restored without disabling the feature, and an
    unrestored set leaks session state across ops."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("s"),
        )
    )


@op(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (min of per-side multiplicities — NOT the
    distinct intersect): Catalyst plans it as a count-compare aggregate,
    one shuffle on the row key."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersectAll(b)


@op(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (multiplicity subtraction, keeps survivors'
    duplicate counts)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.exceptAll(b)


@op(
    "join_null_safe",
    oracle="""
    WITH a AS (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
      FROM customer WHERE c_custkey % 50 = 0),
    b AS (
      SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
             cast(count(*) AS BIGINT) AS seg_n
      FROM customer GROUP BY 1)
    SELECT a.c_custkey, a.seg, b.seg_n
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics a dimension
    join needs when 'unknown' is itself a category. Catalyst still
    plans a hash join (the null-safe comparison is a valid equi-key;
    no fallback to nested loop), which the plan lint enforces."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.expr("nullif(c_mktsegment, 'BUILDING')")
    a = c.where(F.col("c_custkey") % 50 == 0).select(
        "c_custkey", seg.alias("seg")
    )
    b = c.select(seg.alias("seg_b")).groupBy("seg_b").agg(
        F.count("*").alias("seg_n")
    )
    return a.join(b, a["seg"].eqNullSafe(b["seg_b"])).select(
        "c_custkey", "seg", "seg_n"
    )


@op(
    "set_union_by_name",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM (SELECT o_orderkey, o_totalprice, o_orderpriority
          FROM orders WHERE o_orderstatus = 'F'
          UNION ALL BY NAME
          SELECT o_orderkey, CAST(NULL AS VARCHAR) AS o_orderpriority,
                 o_totalprice
          FROM orders WHERE o_orderstatus = 'O') t
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: unionByName with allowMissingColumns — the
    append that survives a source generation losing/gaining a column
    (missing columns fill NULL, alignment is by NAME not position;
    positional union would silently transpose columns here)."""
    o = load_table(spark, sf_dir, "orders")
    old_gen = o.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    new_gen = o.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_totalprice"  # generation dropped the column
    )
    return old_gen.unionByName(new_gen, allowMissingColumns=True)


@op(
    "cache_branch_reuse",
    oracle="""
    SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days,
           count(*) AS n_shared
    FROM orders WHERE o_totalprice > 100000
    """,
)
def cache_branch_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit midpoint caching: an expensive shared stage (filtered
    + enriched orders) is persisted once and TWO downstream branches
    (priority counts, daily totals) read the in-memory columnar form
    instead of recomputing the lineage — the fan-out pattern every
    multi-output pipeline hits. At 100 TB the same seam takes
    MEMORY_AND_DISK or a checkpoint; the branch plans show
    InMemoryTableScan (pytest-pinned). Output: the two branches'
    row counts + a checksum so the driver row is stable."""
    from pyspark import StorageLevel

    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 100000
    )
    shared = o.select("o_orderkey", "o_orderpriority", "o_orderdate").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        by_priority = shared.groupBy("o_orderpriority").count()
        by_day = shared.groupBy(F.to_date("o_orderdate").alias("d")).count()
        n1 = by_priority.count()
        n2 = by_day.count()
        total = shared.count()
        return spark.createDataFrame(
            [(int(n1), int(n2), int(total))],
            "n_priorities long, n_days long, n_shared long",
        )
    finally:
        shared.unpersist()


def rolling_median_naive(ev: DataFrame) -> DataFrame:
    """The textbook form: exact `percentile` as a window aggregate over
    a trailing 5-row frame partitioned by class. Kept as the
    equivalence reference (tests/test_timeseries.py pins the stitched
    form against it) — NOT registered, because `event_type` has only a
    handful of distinct values, so each window partition holds
    |rows|/|classes| rows in ONE task: measured 4.1× wall at 100× data
    (SCALING.md r6), a genuine scale-killer at 100 TB."""
    w = (
        W.partitionBy("event_type")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.expr("percentile(value, 0.5)").over(w).alias("med5"),
    )


@op(
    "win_rolling_median",
    # deterministic frame: unique (ts, event_id) ordering; exact
    # percentile interpolation is bit-identical between Spark
    # percentile and DuckDB quantile_cont (module float discipline)
    oracle="""
    SELECT event_id, event_type,
           quantile_cont(value, 0.5) OVER (
             PARTITION BY event_type ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
    FROM events
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over the trailing 5 events per class — robust
    latency smoothing (a single spike can't drag the trend the way a
    rolling mean lets it) — in the SCALE-SAFE exact form (r7, VERDICT
    r6 #6): `event_type` has ~5 distinct values, so the naive
    per-class window (rolling_median_naive above) serializes each
    class into one task and measured 4.1× wall at 100× data.

    The rewrite makes the frame an equi-join key instead of a window:

      1. global rank `rn` over the total order (class, ts, id) via the
         distributed prefix-sum (stitched_order — every stage keeps
         full parallelism);
      2. each row fans out to the ≤5 target ranks whose trailing frame
         it belongs to (map-side explode, ×5 rows);
      3. groupBy (class, target_rn): percentile(value, 0.5) over the
         group = EXACTLY the window frame's multiset (classes are
         contiguous in the total order, so same-class rows with rn in
         [t−4, t] are precisely the frame; other-class neighbors land
         in different groups; groups whose rank-t row belongs to
         another class have no k=0 member and are dropped).

    Row-for-row identical to the naive window (equivalence pinned in
    tests/test_timeseries.py). Scale: the shuffle key (class,
    target_rn) has full-data cardinality — parallelism scales with
    data, not |classes|; the ×5 fan-out is the price, map-side and
    proportional to frame width, not data².
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    ranked = stitched_order(
        ev,
        [F.col("event_type").asc(), F.col("ts").asc(), F.col("event_id").asc()],
    )
    fan = ranked.select(
        "event_type",
        "event_id",
        "value",
        "rn",
        F.explode(F.sequence(F.col("rn"), F.col("rn") + 4)).alias("target_rn"),
    )
    return (
        fan.groupBy("event_type", "target_rn")
        .agg(
            F.max(
                F.when(F.col("target_rn") == F.col("rn"), F.col("event_id"))
            ).alias("event_id"),
            F.expr("percentile(value, 0.5)").alias("med5"),
        )
        .where(F.col("event_id").isNotNull())
        .select("event_id", "event_type", "med5")
    )
