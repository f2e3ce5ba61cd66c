"""Skew-handling aggregation — the §7 G11 salting pattern, made
concrete and oracle-checked.

A hot grouping key (one digest dominating the log — the classic QAN
skew) stalls the single reducer that owns it. Two-stage salted
aggregation splits the hot key across N_SALT reducers, then merges:

    stage 1: groupBy(key, salt) — partial results, skew spread
    stage 2: groupBy(key)       — N_SALT-row merge per key

Results are EXACTLY the plain aggregation (sums/counts/min/max are
associative), so the oracle is the unsalted query — proving the
rewrite is semantics-preserving is the whole point of checking it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.registry import op

N_SALT = 8


@op(
    "agg_salted_twophase",
    oracle="""
    SELECT event_type, count(*) AS n,
           round(sum(value), 4) AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM events GROUP BY 1
    """,
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation == plain aggregation (the oracle is
    the unsalted SQL — the equality IS the correctness claim).

    Note on floats: the salted sum's addition order differs from the
    plain sum's, which is exactly the partition-order variance the
    round(4) convention absorbs (SURVEY.md §7 G5).
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALT))
    )
    partial = ev.groupBy("event_type", "salt").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.round(F.sum("s"), 4).alias("sum_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
    )


@op(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority AS priority, count(*) AS n,
           round(sum(o_totalprice), 4) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY 1
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted JOIN — the skew pattern for a hot JOIN key (one customer
    owning a third of all orders): salt the skewed (fact) side, then
    EXPLODE the build side across all N_SALT replicas so every salted
    fact row still finds its match. Result == the plain join, so the
    oracle is the unsalted SQL.

    At 100 TB this is the manual fallback when AQE's skew-join split
    can't kick in (e.g. the skew is in a later stage, or the join is
    below a union). Cost model: build side replicates ×N_SALT — use
    only on genuinely hot keys (detect via a cheap count sketch), not
    corpus-wide.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(N_SALT))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1))).alias("salt"))
    )
    joined = o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
    )


@op(
    "join_null_skew_isolation",
    # deterministic null synthesis (every 10th custkey) stands in for
    # the nullable-FK reality; the oracle states plain left-join
    # semantics — the Spark side must reproduce them through the split
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_custkey % 10 = 0 THEN NULL ELSE o_custkey END
               AS cust_fk,
             o_totalprice
      FROM orders)
    SELECT o.o_orderkey, o.cust_fk, c.c_mktsegment,
           round(o.o_totalprice, 4) AS price
    FROM o LEFT JOIN customer c ON o.cust_fk = c.c_custkey
    """,
)
def join_null_skew_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-key skew isolation — the most common real-world join skew:
    a nullable foreign key sends EVERY null row to one hash partition,
    where they do nothing (NULL never equi-matches) except serialize
    one task. The playbook split: route null-key rows around the join
    entirely (they keep their left-outer NULL columns by construction)
    and hash-join only the non-null side, then union.

    Scale: the null fraction rides a map-side filter + union — zero
    shuffle for those rows — and the join's partitions stay balanced.
    Sibling of join_salted_skew (hot VALUES) — this one handles the
    hot NULL, which salting can't fix (salted nulls still produce no
    matches, just spread the waste). The oracle is the plain left
    join, so the split must be semantics-preserving."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 10 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
        "o_totalprice",
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    nulls = o.where(F.col("cust_fk").isNull()).select(
        "o_orderkey",
        "cust_fk",
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.round("o_totalprice", 4).alias("price"),
    )
    matched = (
        o.where(F.col("cust_fk").isNotNull())
        .join(c, F.col("cust_fk") == F.col("c_custkey"), "left")
        .select(
            "o_orderkey",
            "cust_fk",
            "c_mktsegment",
            F.round("o_totalprice", 4).alias("price"),
        )
    )
    return matched.unionByName(nulls)
