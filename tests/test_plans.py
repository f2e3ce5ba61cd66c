"""Physical-plan assertions — the 100 TB design contract (SURVEY.md
§4.2). A correct result with a bad plan is a latent scale bug; these
tests pin the plan properties each op's docstring promises."""

from __future__ import annotations

import contextlib
import io

import pytest

from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()


def plan_of(spark, sf_dir, name: str) -> str:
    df = OPS[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    p = plan_of(spark, sf_dir, "filter_pred")
    assert "PushedFilters: [" in p
    # the scan itself must carry real predicates, not just IsNotNull
    assert "GreaterThan" in p or "In(o_orderpriority" in p or "EqualTo" in p


def test_projection_prunes_scan_columns(spark, sf_dir):
    p = plan_of(spark, sf_dir, "project_select")
    read = [line for line in p.splitlines() if "ReadSchema" in line][0]
    # 5 of lineitem's 11 columns; pruned scan must not read shipdate
    assert "l_shipdate" not in read
    assert "l_extendedprice" in read


def test_dimension_joins_broadcast(spark, sf_dir):
    p = plan_of(spark, sf_dir, "join_broadcast_inner")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # dims must never shuffle the fact side


def test_global_topk_avoids_full_sort(spark, sf_dir):
    p = plan_of(spark, sf_dir, "limit_topk")
    assert "TakeOrderedAndProject" in p  # per-partition top-k + k-row merge


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    # Spark's rank-pushdown: per-partition top-k before the shuffle
    p = plan_of(spark, sf_dir, "win_topk_per_group")
    assert "WindowGroupLimit" in p


def test_groupby_stats_partial_aggregation(spark, sf_dir):
    p = plan_of(spark, sf_dir, "agg_groupby_stats")
    # map-side partial agg: HashAggregate appears below AND above the
    # exchange; shuffle volume is |groups|, not |rows|
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_semi_anti_stay_hash_joins(spark, sf_dir):
    for op_name in ("join_semi", "join_anti"):
        p = plan_of(spark, sf_dir, op_name)
        assert "HashJoin" in p, f"{op_name} fell off the hash-join path"
        assert "BroadcastNestedLoopJoin" not in p


def test_semi_anti_rewrite_has_no_nested_loop(spark, sf_dir):
    """The q_semi_anti rewrite's whole point: the disjunctive IN/NOT IN
    becomes one hash join — BNLJ ExistenceJoin must not reappear."""
    p = plan_of(spark, sf_dir, "join_semi_anti_rewrite")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_knn_probes_broadcast(spark, sf_dir):
    p = plan_of(spark, sf_dir, "vec_knn_topk")
    # probes broadcast, corpus streams — never a shuffle-based cartesian
    assert "BroadcastNestedLoop" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # only the top-k window may shuffle (on probe_id), nothing else
    assert p.count("Exchange hashpartitioning") <= 1


def test_minhash_no_cartesian(spark, sf_dir):
    p = plan_of(spark, sf_dir, "dedup_minhash")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p  # band join is an equi-join


@pytest.mark.parametrize(
    "name", ["text_wordcount", "agg_time_bucket", "dedup_exact"]
)
def test_single_shuffle_aggregations(spark, sf_dir, name):
    """One logical aggregation → at most one shuffle round (plus AQE
    bookkeeping); anything more means a lost partial-agg."""
    p = plan_of(spark, sf_dir, name)
    assert p.count("Exchange hashpartitioning") <= 2


def test_bloom_runtime_filter_injected_when_thresholds_allow(spark, sf_dir):
    """With the creation/application thresholds lowered to test-SF
    sizes, Catalyst must inject a bloom filter from the filtered
    orders side into the lineitem scan side of
    join_bloom_runtime_filter — the mechanism that prunes the fact-
    table shuffle at 100 TB (where the default thresholds pass)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # bloom injection targets probable SHUFFLE joins; at test SF the
        # filtered side would broadcast, so disable broadcast to model
        # the 100-TB shape where neither side fits
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = OPS["join_bloom_runtime_filter"].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower() or "BloomFilter" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)


def test_partition_overwrite_backfills_only_target_day(spark, sf_dir):
    rows = OPS["sink_partition_overwrite"].fn(spark, sf_dir).collect()
    assert len(rows) >= 2
    first, rest = rows[0], rows[1:]
    assert first["n_marked"] == first["n"]  # backfilled day fully rewritten
    assert all(r["n_marked"] == 0 for r in rest)  # other days untouched


def test_schema_evolution_merges_generations(spark, sf_dir):
    rows = {r["gen"]: r for r in OPS["scan_schema_evolution"].fn(spark, sf_dir).collect()}
    assert rows[1]["n_null_new"] == rows[1]["n"]  # old files: new col all NULL
    assert rows[2]["n_null_new"] == 0


def test_shuffle_hash_hint_respected(spark, sf_dir):
    p = plan_of(spark, sf_dir, "join_strategy_hints")
    assert "ShuffledHashJoin" in p, p[:1500]


def test_tpch_q5_broadcasts_dims(spark, sf_dir):
    p = plan_of(spark, sf_dir, "tpch_q5")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_cached_branch_uses_in_memory_scan(spark, sf_dir):
    from pyspark import StorageLevel

    from slowlog2clickhouse_spark.io import load_table
    import pyspark.sql.functions as F2

    shared = (
        load_table(spark, sf_dir, "orders")
        .where(F2.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_orderpriority")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        shared.count()  # materialize
        p = shared.groupBy("o_orderpriority").count()._jdf.queryExecution()
        assert "InMemoryTableScan" in p.executedPlan().toString()
    finally:
        shared.unpersist()


def test_tpch_q4_exists_is_semi_hash_join(spark, sf_dir):
    """Q4's EXISTS must lower to a left-semi hash join with the
    lateness predicate riding the join — not a per-row subquery and
    not a nested loop."""
    p = plan_of(spark, sf_dir, "tpch_q4")
    assert "LeftSemi" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_tpch_q9_part_filter_prunes_before_fact_join(spark, sf_dir):
    """Q9's p_name LIKE filter must reach the part scan (the dim is
    filtered BEFORE broadcast, so the fact join only keeps matching
    partkeys)."""
    p = plan_of(spark, sf_dir, "tpch_q9")
    assert "BroadcastHashJoin" in p
    scans = [line for line in p.splitlines() if "PushedFilters" in line]
    # the Contains/LIKE filter itself, not merely IsNotNull(p_name)
    assert any("Contains(p_name,red)" in s for s in scans), p[:2000]


def test_tpch_q21_single_scan_window_pipeline(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS pair folds into per-order counts over a
    window PARTITIONED by l_orderkey (r6 rewrite): ONE lineitem scan,
    no self-join, no nested loop — the semi+anti form re-ran the base
    join per consumer (SCALING.md round-6 case study)."""
    p = plan_of(spark, sf_dir, "tpch_q21")
    assert p.count("lineitem.parquet") == 1
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" in p
    # the window is partitioned (basket-sized groups), never global
    assert "LeftSemi" not in p and "LeftAnti" not in p


def test_tpch_q13_outer_join_preserves_zero_order_customers(spark, sf_dir):
    """Q13 semantic pin: the distribution must contain a c_count=0
    bucket only if some customer has no orders — and the total across
    buckets must equal |customer| (outer join loses nobody)."""
    import duckdb

    rows = OPS["tpch_q13"].fn(spark, sf_dir).collect()
    total = sum(r["custdist"] for r in rows)
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/customer.parquet')"
    ).fetchone()[0]
    assert total == n_cust


def test_tpch_q17_threshold_join_is_broadcast(spark, sf_dir):
    """Q17's decorrelated per-part avg joins back as a broadcast (the
    aggregate output is |parts| rows, dim-sized at any SF)."""
    p = plan_of(spark, sf_dir, "tpch_q17")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_lsh_band_explode_no_inferred_filter_duplication(spark, sf_dir):
    """Regression guard for the round-5 perf trap: plain posexplode
    lets InferFiltersFromGenerate add a size(..)>0 filter whose
    predicate re-inlines the WHOLE signature expression below the
    Generate — re-evaluating the md5/aggregate chain interpreted per
    row (measured 30x wall at sf0.1). posexplode_outer on the
    never-empty band array must keep the signature expression out of
    any Filter node."""
    for op_name in ("dedup_minhash", "dedup_simhash"):
        p = plan_of(spark, sf_dir, op_name)
        filter_lines = [ln for ln in p.splitlines() if "Filter" in ln]
        joined = " ".join(filter_lines)
        assert "size(aggregate" not in joined and "size(transform" not in joined, (
            op_name,
            filter_lines[:3],
        )
        # and the full condition text anywhere: an md5 inside a Filter
        # means the signature chain leaked into a predicate
        in_filter_blocks = [
            blk for blk in p.split("\n\n") if blk.strip().startswith("(")
            and "Filter" in blk.splitlines()[0]
        ]
        assert not any("md5" in blk for blk in in_filter_blocks), op_name


def test_ngram_topk_uses_window_group_limit(spark, sf_dir):
    """Per-language top-5 must ride the rank pushdown (per-partition
    top-k BEFORE the window shuffle), like win_topk_per_group."""
    p = plan_of(spark, sf_dir, "text_ngram_topk")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p


def test_mix_rebalance_corpus_never_shuffles_rows(spark, sf_dir):
    """corpus_mix_rebalance: the per-source rates reach the corpus via
    broadcast (map-side filter); the only hashpartitioning exchanges
    carry per-source partial aggregates, never document rows."""
    p = plan_of(spark, sf_dir, "corpus_mix_rebalance")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    for line in p.splitlines():
        if "Exchange hashpartitioning" in line:
            # partial-agg exchanges key on source only
            assert "source" in line, line


def test_minhash_verified_intersects_map_side(spark, sf_dir):
    """dedup_minhash_verified: the precision stage must be a map-side
    array_intersect on candidate pairs — no cartesian, no token-level
    fan-out join in the verify phase."""
    p = plan_of(spark, sf_dir, "dedup_minhash_verified")
    assert "CartesianProduct" not in p
    assert "array_intersect" in p


def test_multiprobe_lsh_fans_out_probe_side_only(spark, sf_dir):
    """vec_knn_lsh_multiprobe: the ×9 bucket explode sits on the tiny
    probe side (broadcast); the corpus side joins on its single bucket
    via the broadcast hash join, not a nested loop."""
    p = plan_of(spark, sf_dir, "vec_knn_lsh_multiprobe")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_partition_pruned_scan_filters_at_planning_time(spark, sf_dir):
    """scan_partition_pruned: the date predicate must appear as a
    PartitionFilter (planning-time pruning — only one day's files are
    listed/read), not as a post-scan row filter."""
    p = plan_of(spark, sf_dir, "scan_partition_pruned")
    lines = [l for l in p.splitlines() if "PartitionFilters" in l]
    assert lines, p[:2000]
    assert any("event_date" in l and "=" in l for l in lines), lines


def test_rolling_median_parallelism_scales_with_data(spark, sf_dir):
    """r7 scale-safe form: the percentile must be a grouped aggregate
    keyed by (event_type, target_rn) — full-data key cardinality, so
    parallelism scales with rows — with a map-side partial; and NO
    Window node may compute it (the naive per-class window serializes
    each of the ~5 classes into one task: 4.1× wall at 100×,
    SCALING.md r6). The only windows left are stitched_order's: the
    per-_pid rank (partitioned) and the ≤num_buckets offset prefix."""
    p = plan_of(spark, sf_dir, "win_rolling_median")
    assert "percentile" in p, p[:2000]
    win_args = [
        l for l in p.splitlines() if "windowspecdefinition" in l
    ]
    assert win_args and not any("percentile" in l for l in win_args), win_args
    # partial+final pair around one exchange for the median aggregate
    assert p.count("ObjectHashAggregate") >= 2, p[:2000]


def test_doc_chunk_sliding_is_shuffle_free(spark, sf_dir):
    p = plan_of(spark, sf_dir, "doc_chunk_sliding")
    # chunking must stay embarrassingly parallel: no Exchange at all
    assert "Exchange" not in p, p[:2000]


def test_bitmap_distinct_two_level_aggregate(spark, sf_dir):
    p = plan_of(spark, sf_dir, "agg_bitmap_distinct")
    # two-level: bucket bitmaps then count-sum — both hash aggregates,
    # and the shuffle carries bitmap partials, never raw ids
    assert p.count("+- Exchange") == 2, p[:2000]
    assert "bitmap_construct_agg" in p
    assert "bitmapCount" in p  # rendered as BitmapExpressionUtils.bitmapCount


def test_interval_binned_join_is_hash_not_nested_loop(spark, sf_dir):
    p = plan_of(spark, sf_dir, "join_interval_binned")
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]
    assert "CartesianProduct" not in p, p[:2000]
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_dpp_injects_runtime_partition_filter(spark, sf_dir):
    df = OPS["join_dynamic_partition_pruning"].fn(spark, sf_dir)
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in s.lower(), s[:2000]


def test_zipf_fit_head_is_take_ordered(spark, sf_dir):
    # the top-100 head must come from per-partition heaps + one k-row
    # merge, never a full global sort of the vocabulary
    p = plan_of(spark, sf_dir, "text_zipf_fit")
    assert "TakeOrderedAndProject" in p
    assert "BroadcastExchange" in p  # the 1-row totals side broadcasts


def test_trend_regression_shuffles_are_partial_aggregated(spark, sf_dir):
    # two aggregation levels (daily rollup, then per-class moments) —
    # each partial-aggregates map-side so shuffle volume is
    # |classes|x|days| then |classes|, never |rows|
    p = plan_of(spark, sf_dir, "qan_trend_regression")
    assert p.count("HashAggregate") >= 4


def test_dedup_rate_window_rides_hash_key_exchange(spark, sf_dir):
    # the copies/first_doc window partitions on the md5 key: exactly
    # one data-proportional Exchange (hashpartitioning on hh); the
    # per-source rollup partial-aggregates on top of it
    import re

    p = plan_of(spark, sf_dir, "corpus_dedup_rate_by_source")
    assert "hashpartitioning(hh" in p
    # two Exchanges total (formatted output lists each node once in
    # the tree and once in the details — count the detail entries):
    # the hh window key (data-proportional) and the |sources|-row
    # final agg above its map-side partial
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 2
    assert "Window" in p and p.count("HashAggregate") >= 2


def test_journey_pattern_single_shuffle_bounded_buffer(spark, sf_dir):
    # the 10k cap happens UPSTREAM of collect_list (window filter), and
    # the window's user_id Exchange satisfies the aggregate's required
    # distribution: exactly one Exchange in the whole plan
    import re

    p = plan_of(spark, sf_dir, "events_journey_pattern")
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1
    assert "Window" in p
