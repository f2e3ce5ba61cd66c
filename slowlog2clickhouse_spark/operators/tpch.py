"""Classic TPC-H composite queries adapted to the driver testdata
schema — the familiar yardsticks, each one a composition of operators
SURVEY §2 covers individually (pricing-summary agg, shipping-priority
join-topN, local-supplier-volume 6-way join). Differences from spec:
no o_shippriority / l_comment columns in the testdata, dates shifted to
the generated range; noted inline. All money sums are 2-decimal data →
round 4 is cross-engine-safe (SURVEY §7 G5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.registry import op


@op(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
             AS sum_charge,
           sum(cast(round(l_quantity * 100, 0) AS BIGINT)) / 100.0
             / count(l_quantity) AS avg_qty,
           sum(cast(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
             / count(l_extendedprice) AS avg_price,
           cast(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY 1, 2
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (avg_disc dropped: avg of 2-decimal
    discounts lands on decimal halves — exact_avg integer-cents form
    used for the avgs kept, SURVEY §7 G5)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    cents = lambda c: F.round(F.col(c) * 100, 0).cast("long")  # noqa: E731
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("sum_disc_price"),
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            4,
        ).alias("sum_charge"),
        (F.sum(cents("l_quantity")) / 100.0 / F.count("l_quantity")).alias(
            "avg_qty"
        ),
        (
            F.sum(cents("l_extendedprice")) / 100.0 / F.count("l_extendedprice")
        ).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


@op(
    "tpch_q3",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1996-01-01'
      AND l_shipdate > DATE '1996-01-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, o_orderdate ASC NULLS LAST, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (o_shippriority column absent from
    testdata → o_orderpriority; l_orderkey added to the ORDER BY as the
    unique tiebreak every oracle-checked top-k needs)."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("date")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc_nulls_last(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


@op(
    "tpch_q5",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1995-01-01'
    GROUP BY 1
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: the 6-way star join. Fact-fact
    joins shuffle on their keys; nation/region/supplier broadcast; the
    local-supplier condition (c_nationkey = s_nationkey) rides the
    supplier join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@op(
    "join_strategy_hints",
    oracle="""
    SELECT o_orderstatus, cast(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 4) AS sq
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hint surface: the same fact-fact join forced to
    SHUFFLE_HASH (one-sided hash build beats sort-merge when one side
    is moderately sized and memory allows — no sort of the big side).
    tests/test_plans.py pins ShuffledHashJoin in the plan; result is
    strategy-independent, so the oracle is the plain join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("sq"),
        )
    )


@op(
    "tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           cast(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
      AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue change: the pure pushdown
    showcase — every predicate reaches the parquet scan
    (PushedFilters), zero joins, one global agg; at 100 TB the scan
    reads only the 4 referenced columns and skips row groups via
    min/max stats."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )


@op(
    "tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY 1 HAVING sum(l_quantity) > 150)
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 4) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN big ON big.l_orderkey = o_orderkey
    GROUP BY 1, 2, 3, 4
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: HAVING-filtered semi-join set
    (orders whose line quantities exceed a threshold) driving a 3-way
    join and top-N. The `big` set is small → broadcast; o_orderkey is
    the unique tiebreak (spec orders by totalprice/date; testdata's
    orderkey pins determinism)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 150)
        .select("l_orderkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(big.withColumnRenamed("l_orderkey", "bk")),
              F.col("bk") == o["o_orderkey"])
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@op(
    "tpch_q14",
    oracle="""
    WITH sums AS (
      SELECT round(sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END), 4) AS promo_rev,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= DATE '1995-09-01'
        AND l_shipdate < DATE '1995-10-01')
    SELECT promo_rev, total_rev,
           round(100.0 * promo_rev / total_rev, 6) AS promo_pct
    FROM sums
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect (testdata's p_type is a plain
    category, so = 'PROMO' replaces the spec's LIKE 'PROMO%'): month
    fact slice joined to the part dim — broadcast at any SF ratio —
    then one conditional aggregate. The percentage is computed from
    the ROUNDED sums so the final division is bit-identical
    cross-engine (G5/G8)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sums = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(0.0)), 4
            ).alias("promo_rev"),
            F.round(F.sum(net), 4).alias("total_rev"),
        )
    )
    return sums.select(
        "promo_rev",
        "total_rev",
        F.round(100.0 * F.col("promo_rev") / F.col("total_rev"), 6).alias(
            "promo_pct"
        ),
    )
