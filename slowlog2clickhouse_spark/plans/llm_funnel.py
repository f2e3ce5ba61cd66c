"""End-to-end LLM corpus-curation funnel — the flagship composition:
quality gate → exact dedup → near-dup (minhash-LSH) → chunking, in ONE
declarative plan that reports per-stage survivor counts (the funnel
every data-curation report opens with).

Each stage reuses the registered building blocks' logic (same token
form as operators/text.py, same portable md5 LSH as operators/dedup.py)
so the funnel IS the documented pipeline, not a parallel
implementation. The DuckDB oracle recomputes every stage — including
the LSH candidate join — over the same survivor sets, hash-verifying
the whole cascade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.operators.dedup import (
    _MINHASH_BANDS_DUCK,
    cap_band_buckets,
    minhash_band_keys,
)
from slowlog2clickhouse_spark.operators.text import _tokens
from slowlog2clickhouse_spark.registry import op

MIN_CHARS = 100
MIN_TOKENS = 20


@op(
    "llm_curation_funnel",
    # the bands CTE comes verbatim from the dedup module's shared
    # oracle prefix; stage sets are nested CTEs so each stage counts
    # EXACTLY its predecessor's survivors
    oracle=_MINHASH_BANDS_DUCK
    + f"""
    , total AS (SELECT doc_id, text FROM documents),
    quality AS (
      SELECT doc_id, text FROM total
      WHERE length(text) >= {MIN_CHARS}
        AND len(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) >= {MIN_TOKENS}),
    exact AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, row_number() OVER (
          PARTITION BY md5(lower(text)) ORDER BY doc_id ASC) AS rn
        FROM quality) t WHERE rn = 1),
    near_drop AS (
      -- band equi-join on the MATERIALIZED unnested bands (gotcha
      -- #21: the list_has_any inequality form nested-loops and
      -- re-inlines the signature chain per probe — 449 s at sf0.1)
      SELECT DISTINCT b.doc_id
      FROM bx a JOIN bx b ON a.bv = b.bv AND a.doc_id < b.doc_id
      WHERE a.doc_id IN (SELECT doc_id FROM exact)
        AND b.doc_id IN (SELECT doc_id FROM exact)),
    near AS (
      SELECT doc_id, text FROM exact
      WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)),
    chunks AS (
      SELECT count(*) AS n FROM (
        SELECT doc_id,
               unnest(range(1, greatest(1, len(list_filter(
                 string_split(lower(text), ' '), x -> x <> '')) - 31) + 1,
                 24)) AS s
        FROM near) t)
    SELECT stage, n FROM (
      SELECT 1 AS ord, 'total' AS stage,
             cast((SELECT count(*) FROM total) AS BIGINT) AS n
      UNION ALL SELECT 2, 'quality',
             cast((SELECT count(*) FROM quality) AS BIGINT)
      UNION ALL SELECT 3, 'exact_dedup',
             cast((SELECT count(*) FROM exact) AS BIGINT)
      UNION ALL SELECT 4, 'near_dedup',
             cast((SELECT count(*) FROM near) AS BIGINT)
      UNION ALL SELECT 5, 'chunks',
             cast((SELECT n FROM chunks) AS BIGINT)
    ) s ORDER BY ord
    """,
)
def llm_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation cascade as one plan, reporting survivors per
    stage: raw corpus → quality gate (length + token floor) → exact
    dedup (md5 first-keeper) → near-dup drop (minhash band candidates
    among survivors, lower-id keeps) → chunk inventory of what
    remains. This is the number-one report a training-data pipeline
    produces, and the one that catches a mis-tuned stage (a 90% drop
    at near-dup means the LSH threshold is wrong) before 100 TB of
    compute is spent.

    Scale: each stage is the registered operator's plan shape —
    map-side quality filter, fixed-width-key dedup shuffle, band
    equi-join (never all-pairs). The exact-dedup survivor set is
    localCheckpoint'ed (ONE eager action — gotcha #13's
    evaluation-count trap makes lineage truncation mandatory here);
    every count then folds into ONE lazy plan: total+quality share a
    single corpus scan (conditional count), near+chunks share a
    single pass over the survivor leaf, and the chunk inventory is a
    closed-form per-doc expression (floor((stop-1)/24)+1), not an
    explode — nothing fans out just to be counted (ADVICE r5)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    quality = docs.where(
        (F.length("text") >= MIN_CHARS) & (F.size(_tokens()) >= MIN_TOKENS)
    )
    from pyspark.sql import Window as W

    keeper = W.partitionBy(F.md5(F.lower("text"))).orderBy(F.col("doc_id").asc())
    # localCheckpoint, not persist: the minhash signature chain sits
    # ABOVE this window, and Catalyst's filter inference re-inlines
    # the md5/HOF expressions below the window per row (interpreted —
    # the EVALUATION-COUNT RULE's 30x trap, which resurfaced here
    # under the driver's vanilla session). Truncating the lineage
    # makes the survivor set a materialized leaf for every downstream
    # stage.
    exact = (
        quality.withColumn("rn", F.row_number().over(keeper))
        .where(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint()
    )
    banded = minhash_band_keys(exact).select(
        "doc_id", F.posexplode_outer("band_sigs").alias("band", "band_sig")
    ).repartition("band", "band_sig")
    banded = cap_band_buckets(banded, ("band", "band_sig"))
    # r16 (guide §2.4, the dedup_minhash treatment): "has a smaller
    # doc_id in some shared band bucket" is exactly "is a non-minimum
    # member of some bucket" — derived map-side from the grouped
    # buckets (groupBy rides the repartition's Exchange) instead of the
    # old band-key self-join whose broadcast build side re-evaluated
    # the whole signature chain. Identical drop set.
    grp = banded.groupBy("band", "band_sig").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    near_drop = (
        grp.where(F.size("ds") >= 2)
        .select(
            F.explode(F.slice("ds", 2, F.size("ds") - 1)).alias("doc_id")
        )
        .distinct()
    )
    near = exact.join(near_drop, "doc_id", "left_anti")

    # chunk inventory without the fan-out: |sequence(1, stop, 24)| =
    # floor((stop-1)/24) + 1 for stop >= 1 — count chunks as a scalar
    # per-doc expression and sum
    stop = F.greatest(F.lit(1), F.size(_tokens()) - F.lit(31))
    n_chunks = F.floor((stop - F.lit(1)) / F.lit(24)) + F.lit(1)

    low = docs.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(
            F.when(
                (F.length("text") >= MIN_CHARS)
                & (F.size(_tokens()) >= MIN_TOKENS),
                1,
            )
        ).alias("n_quality"),
    )
    ex = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    up = near.agg(
        F.count(F.lit(1)).alias("n_near"),
        F.coalesce(F.sum(n_chunks), F.lit(0)).alias("n_chunks"),
    )
    # fold the three 1-row aggregates into ONE row (each subtree —
    # corpus scan, survivor leaf, band join — evaluates exactly once;
    # a per-stage union would re-execute its agg subtree per branch),
    # then unpivot with stack to the (stage, n) report shape
    wide = low.crossJoin(ex).crossJoin(up)
    return wide.selectExpr(
        "stack(5, 'total', n_total, 'quality', n_quality, "
        "'exact_dedup', n_exact, 'near_dedup', n_near, "
        "'chunks', n_chunks) AS (stage, n)"
    )
