"""The remaining TPC-H queries (Q2,4,7–13,15–17,19–22) adapted to the
driver testdata schema — completing the 22-query yardstick started in
tpch.py (Q1,3,5,6,14,18 there). The testdata has no partsupp table and
no l_commitdate/l_receiptdate/l_shipmode/c_phone columns, so queries
that depend on them are re-expressed over the columns that exist while
keeping the ORIGINAL operator shape (the point of the yardstick):

  * partsupp links (Q2/Q11/Q16/Q20) → the observed part↔supplier pairs
    from lineitem (DISTINCT l_partkey,l_suppkey);
  * commit/receipt lateness (Q4/Q12/Q21) → shipped more than 60 days
    after the order date (l_shipdate > o_orderdate + 60 days);
  * c_phone country code (Q22) → c_nationkey;
  * ps_supplycost profit term (Q9) → 0.1 * p_retailprice * l_quantity.

Determinism conventions (SURVEY §7 G5/G8): money sums rounded to 4
decimals on both sides; scalar thresholds compared in integer cents
(exact, no float boundary flips); every top-N carries a unique
tiebreak; avg is always spelled sum/count so both engines run the same
IEEE ops. Nation names in the testdata are synthetic (NATION_0..24),
region names are real (ASIA, EUROPE, …).

Scale notes inline per query; the common shape: fact-fact joins
shuffle on their keys, every dim (nation/region/supplier/part ≤ part
table size) broadcasts, aggregates are partial+final, and scalar
thresholds travel as 1-row broadcasts — no driver-side collect
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.registry import op

def _net() -> F.Column:
    """Discounted line revenue (lazy: F.col needs an active session)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _cents(col: str) -> F.Column:
    """2-decimal money → exact integer cents (G5)."""
    return F.round(F.col(col) * 100, 0).cast("long")


@op(
    "tpch_q2",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eur AS (
      SELECT s_suppkey, s_name, s_acctbal FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    best AS (
      SELECT l_partkey AS p_key, round(min(s_acctbal), 4) AS min_bal
      FROM ps JOIN eur ON l_suppkey = s_suppkey GROUP BY 1)
    SELECT p_partkey, p_name, min_bal,
           cast(min(s_suppkey) AS BIGINT) AS best_suppkey
    FROM part
    JOIN best ON p_key = p_partkey
    JOIN ps ON l_partkey = p_partkey
    JOIN eur ON l_suppkey = s_suppkey AND round(s_acctbal, 4) = min_bal
    WHERE p_size = 15 AND p_type = 'STANDARD'
    GROUP BY 1, 2, 3
    ORDER BY min_bal DESC, p_partkey ASC
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier, partsupp replaced by the
    observed lineitem part↔supplier pairs and ps_supplycost by
    s_acctbal (the only per-supplier numeric). Argmin via min-join-back
    (min bal per part, re-join on equality, then min suppkey breaks
    ties) — the cross-engine-safe argmin. Scale: the pair set shuffles
    once on suppkey then partkey; supplier/nation/region broadcast."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eur = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    pse = ps.join(F.broadcast(eur), ps["l_suppkey"] == eur["s_suppkey"])
    best = pse.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.round(F.min("s_acctbal"), 4).alias("min_bal")
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        p.join(F.broadcast(best), F.col("p_key") == p["p_partkey"])
        .join(
            pse.withColumnRenamed("l_partkey", "pk2"),
            (F.col("pk2") == p["p_partkey"])
            & (F.round(F.col("s_acctbal"), 4) == F.col("min_bal")),
        )
        .groupBy("p_partkey", "p_name", "min_bal")
        .agg(F.min("s_suppkey").alias("best_suppkey"))
        .orderBy(F.col("min_bal").desc(), F.col("p_partkey").asc())
        .limit(100)
    )


@op(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, cast(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1995-07-01'
      AND o_orderdate < DATE '1995-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY 1
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking; the spec's commit<receipt
    EXISTS becomes shipped-after-order (the lateness signal the schema
    carries). EXISTS → left-semi hash join on o_orderkey with the
    cross-side predicate riding the join condition — never a
    subquery-per-row. The quarter filter pushes to the orders scan."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@op(
    "tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= DATE '1995-01-01'
        AND l_shipdate < DATE '1997-01-01'
    )
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations (synthetic nation
    names). Both nation dims broadcast; the disjunctive nation-pair
    filter is a plain predicate after the joins, so the two fact joins
    still shuffle on their equi-keys (no nested-loop)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n1), F.col("nk1") == s["s_nationkey"])
        .join(F.broadcast(n2), F.col("nk2") == c["c_nationkey"])
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(_net()), 4).alias("revenue"))
    )


@op(
    "tpch_q8",
    oracle="""
    WITH vol AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= DATE '1995-01-01'
        AND o_orderdate < DATE '1997-01-01'),
    sums AS (
      SELECT o_year,
             round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                            ELSE 0 END), 4) AS nation_rev,
             round(sum(volume), 4) AS total_rev
      FROM vol GROUP BY 1)
    SELECT o_year, nation_rev, total_rev,
           round(nation_rev / total_rev, 6) AS mkt_share
    FROM sums
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: 8-way join, conditional share
    aggregate. The share divides the ROUNDED sums (q14's G5 pattern) so
    the ratio is bit-identical cross-engine. Customer-side nation fixes
    the region; supplier-side nation feeds the share condition."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1"))
    n2 = n.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n1), F.col("nk1") == c["c_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == F.col("rk1"))
        .join(F.broadcast(n2), F.col("nk2") == s["s_nationkey"])
        .select(F.year("o_orderdate").alias("o_year"), _net().alias("volume"),
                "supp_nation")
    )
    sums = vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(0.0)
            ),
            4,
        ).alias("nation_rev"),
        F.round(F.sum("volume"), 4).alias("total_rev"),
    )
    return sums.select(
        "o_year",
        "nation_rev",
        "total_rev",
        F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share"),
    )


@op(
    "tpch_q9",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY 1, 2
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit; ps_supplycost (no partsupp table)
    replaced by a 10% holding cost on p_retailprice. The p_name LIKE
    prunes parts BEFORE the fact join (broadcast the filtered dim), so
    the big scan only keeps matching partkeys — same pushdown story at
    100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = _net() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
    )


@op(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1995-10-01'
      AND o_orderdate < DATE '1996-01-01'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: quarter slice, returnflag
    filter pushed to the lineitem scan, top-20 lost customers.
    c_custkey is the unique tiebreak under the rounded-revenue sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_net()), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@op(
    "tpch_q11",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             sum(cast(round(l_extendedprice * 100, 0) AS BIGINT)) AS value_cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY 1)
    SELECT l_partkey AS partkey,
           round(value_cents / 100.0, 2) AS value
    FROM val
    WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM val)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock, partsupp value replaced by shipped
    extended-price value per part from one nation's suppliers. The
    scalar threshold (0.1% of total) is compared in integer cents —
    value_cents * 1000 > total_cents is exact 64-bit math on both
    engines, no float boundary flips. The 1-row total broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    val = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).alias("value_cents"))
    )
    total = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("value_cents") / 100.0, 2).alias("value"),
        )
    )


@op(
    "tpch_q12",
    oracle="""
    SELECT l_linestatus,
           cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
    GROUP BY 1
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-priority audit; l_shipmode (absent) →
    l_linestatus, commit/receipt lateness → shipped >60 days after
    order. The lateness predicate references both sides so it rides
    the join; the year slice still pushes to the lineitem scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@op(
    "tpch_q13",
    oracle="""
    SELECT c_count, cast(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, cast(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1)
    GROUP BY 1
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: left-outer join so
    zero-order customers count, then the two-level aggregate. count(col)
    skips the nulls the outer join manufactures — exactly the spec's
    semantics, pure counts, no float anywhere."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


@op(
    "tpch_q15",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: quarterly revenue per supplier, keep the
    max. The max is taken over the ROUNDED revenue so the equality join
    back is cross-engine exact; the 1-row max broadcasts (the scalar-
    subquery shape, same as filter_scalar_subquery)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    rev = li.groupBy("l_suppkey").agg(F.round(F.sum(_net()), 4).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(rev, s["s_suppkey"] == rev["l_suppkey"])
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@op(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           cast(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship, partsupp → distinct
    lineitem pairs. count(DISTINCT) shuffles once on the group key with
    partial distinct aggregation map-side; the part dim broadcasts with
    brand/size filters applied before the join."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25))
    )
    return (
        ps.join(F.broadcast(p), ps["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@op(
    "tpch_q17",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey AS avg_key,
             0.2 * (sum(l_quantity) / count(l_quantity)) AS qty_thresh
      FROM lineitem GROUP BY 1)
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON avg_key = l_partkey
    WHERE p_brand = 'Brand#12' AND l_quantity < qty_thresh
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: the correlated avg
    subquery becomes a per-part aggregate joined back (the decorrelation
    Catalyst would do). The threshold is spelled 0.2*(sum/count), NOT
    avg(): quantities are integers so the sum is exact and both engines
    run the identical IEEE divide/multiply — no comparator drift on the
    boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    pavg = li.groupBy(F.col("l_partkey").alias("avg_key")).agg(
        (0.2 * (F.sum("l_quantity") / F.count("l_quantity"))).alias("qty_thresh")
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(pavg), F.col("avg_key") == li["l_partkey"])
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@op(
    "tpch_q19",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           cast(count(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue (shipmode/shipinstruct conjuncts
    dropped with the columns): the disjunctive mixed-side predicate.
    The join stays an equi hash join on partkey — the OR-of-ANDs is a
    post-join filter, and Catalyst still pushes the derivable
    brand/size union down to the part scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .where(cond)
        .agg(
            F.round(F.sum(_net()), 4).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@op(
    "tpch_q20",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, round(sum(l_quantity), 4) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%blue%'
        AND l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      GROUP BY 1 HAVING sum(l_quantity) > 100)
    SELECT s_suppkey, s_name, n_name, qty
    FROM supplier
    JOIN shipped ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion, partsupp availability →
    shipped quantity per supplier of the name-matched parts over one
    year (>100 units). Quantities are integers so the HAVING threshold
    is exact. Semi-join shape: the shipped set is small → broadcast."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%blue%"))
    shipped = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .where(F.col("raw_qty") > 100)
        .select("l_suppkey", F.round("raw_qty", 4).alias("qty"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    return (
        s.join(F.broadcast(shipped), s["s_suppkey"] == F.col("l_suppkey"))
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .select("s_suppkey", "s_name", "n_name", "qty")
    )


@op(
    "tpch_q21",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'),
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li),
    late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late)
    SELECT s_name, cast(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM pairs p2
                  WHERE p2.l_orderkey = l1.l_orderkey
                    AND p2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting (lateness = shipped
    >60 days after order, status F). The EXISTS ('another supplier on
    the order') / NOT EXISTS ('no OTHER late supplier') pair is
    decided per order, so it folds into ONE per-order aggregate:
    n_supp >= 2 AND n_late == 1 — the qualifying orders — inner-joined
    back to the late pairs (of which there is exactly one per
    qualifying order). vs the semi+anti formulation this evaluates the
    lineitem⋈orders join once (both consumers sit above the same
    (l_orderkey, l_suppkey) Exchange → ReuseExchange) and replaces two
    orderkey-joins with one; r6 rewrite for the r5 bench regression
    (1.24 s → ~0.9 s at sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    # one shuffle collapses line items to (order, supplier, ever-late);
    # the per-order supplier counts ride a window PARTITIONED by
    # l_orderkey (groups are basket-sized — bounded), so the whole op
    # is a single linear pipeline: no second scan, no self-join
    g = j.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late"))
    wo = W.partitionBy("l_orderkey")
    sole_late = (
        g.withColumn("n_supp", F.count(F.lit(1)).over(wo))
        .withColumn("n_late", F.count(F.when(F.col("late"), F.lit(1))).over(wo))
        .where(
            F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
        )
        .select("l_orderkey", "l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        sole_late.join(F.broadcast(s), s["s_suppkey"] == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


@op(
    "tpch_q22",
    oracle="""
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal,
             cast(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      FROM customer
      WHERE c_nationkey IN (11, 12, 13, 14, 15, 16, 17)),
    thr AS (
      SELECT sum(bal_cents) AS s, cast(count(*) AS BIGINT) AS n
      FROM eligible WHERE c_acctbal > 0.0)
    SELECT c_nationkey AS cntrycode, cast(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM eligible, thr
    WHERE bal_cents * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '1999-01-01')
    GROUP BY 1
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity; c_phone country code (column
    absent) → c_nationkey. Above-average is decided in integer cents —
    bal_cents * n > sum_cents is exact 64-bit math, identical on both
    engines (avg() as a float threshold WILL flip boundary customers).
    The spec's "no orders in 7 years" becomes no orders since 1999
    (every testdata customer has SOME order); the EXISTS is a left-anti
    join with the date filter pushed to the orders scan; the 1-row
    threshold broadcasts."""
    elig = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(11, 12, 13, 14, 15, 16, 17))
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            _cents("c_acctbal").alias("bal_cents"),
        )
    )
    thr = elig.where(F.col("c_acctbal") > 0.0).agg(
        F.sum("bal_cents").alias("s"), F.count("*").alias("n")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        elig.crossJoin(F.broadcast(thr))
        .where(F.col("bal_cents") * F.col("n") > F.col("s"))
        .join(o, elig["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )
