"""Degenerate-input sweep: every probed operator must run (not crash)
on a corpus of EMPTY tables with correct schemas — at 100 TB empty
partitions, empty date ranges, and freshly-truncated tables are
routine, and a plan that throws on zero rows is a production outage.

funnel_events and cte_recursive_spine legitimately emit their single
global row (zero counts / NULL spine anchor) on empty input; everything
else must return zero rows."""

from __future__ import annotations

import pytest

from slowlog2clickhouse_spark.io import TABLES, load_table
from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()

PROBE = [
    "agg_groupby_stats",
    "win_topk_per_group",
    "dedup_exact",
    "dedup_minhash",
    "dedup_cluster",
    "text_tfidf",
    "text_decontaminate",
    "pack_sequences",
    "sample_stratified",
    "vec_knn_topk",
    "vec_kmeans",
    "corpus_curation",
    "merge_upsert",
    "cohort_retention",
    "agg_histogram",
    "time_gapfill_locf",
    "agg_median_mode",
    "mm_binary_chunks",
    # round-5 additions
    "graph_pagerank",
    "corpus_mix_rebalance",
    "dedup_minhash_verified",
    "vec_knn_lsh_multiprobe",
    # round-5 second-session additions
    "agg_bitmap_distinct",
    "doc_chunk_sliding",
    "time_rolling_distinct",
    "qan_latency_histogram",
    "mm_phash_dedup",
    "dedup_containment",
    "text_bpe_pairs",
    "join_interval_binned",
    "text_oov_rate",
    "win_rolling_median",
    "text_dup_spans",
    "agg_session_window_builtin",
    "events_attribution",
    "scan_binary_files",
    "scan_jsonl_corrupt",
    # round-5 second wave (fixture-reading slowlog/qan ops excluded:
    # they parse the committed log, not the star schema)
    "events_markov_transitions",
    "basket_part_pairs",
    "time_resample_ohlc",
    "text_idf_keywords",
    "text_entropy",
    "events_rfm",
    "mm_scene_cut",
    "dq_sequence_gaps",
    "agg_filter_clause",
    "sql_lateral_alias",
    "sql_identifier_clause",
    "agg_percentile_disc",
    # round-6 scale-safe rewrites (stitched_order / ranked_topk paths)
    "orders_pareto",
    "events_trigram_paths",
    "text_bpe_pairs",
    "text_dup_spans",
    "mm_duplicate_frames",
    "qan_sparkline",
    "fn_hash64",
    "agg_percentile_approx",
    # round-7 additions
    "dedup_minhash_accuracy",
    "corpus_token_budget",
    "vec_dim_stats",
    # round-8 additions
    "events_journey_pattern",
    "vec_contamination_probe",
    "dedup_simhash_accuracy",
    "dedup_keep_best",
    "corpus_dedup_rate_by_source",
    "qan_trend_regression",
    # streaming: the stateful journey tracker survives an empty stream
    # (file-source sniff + availableNow over zero rows)
    "stream_journey_state",
    # round-10 additions: both tuning sweeps must come back empty (no
    # codebooks / no pooled truth) rather than crash on a zero corpus
    "ann_ivfpq_sweep",
    "dedup_lsh_band_sweep",
]
SINGLE_ROW_OK = {
    "funnel_events",
    "cte_recursive_spine",
    # global aggregates legitimately emit their one row of zero/NULL
    # stats on empty input (r6 partial-oracle conversions)
    "agg_approx_count_distinct",
    "agg_hll_daily_merge",
    # r8: global-aggregate shapes — one row of zero/NULL stats
    "agg_weighted_percentile",
    "text_zipf_fit",
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    import pyspark.sql.functions as F

    dst = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        df = load_table(spark, sf_dir, t).limit(0)
        if t == "events":
            # write back as ns-long, matching the driver fixture layout
            df = df.withColumn("ts", F.unix_micros("ts") * 1000)
        df.write.parquet(f"{dst}/{t}.parquet")
    return dst


@pytest.mark.parametrize("name", PROBE)
def test_op_survives_empty_tables(spark, empty_sf_dir, name):
    assert OPS[name].fn(spark, empty_sf_dir).count() == 0


@pytest.mark.parametrize("name", sorted(SINGLE_ROW_OK))
def test_global_row_ops_emit_one_row_on_empty(spark, empty_sf_dir, name):
    assert OPS[name].fn(spark, empty_sf_dir).count() == 1


def test_recall_gate_reports_all_methods_on_empty(spark, empty_sf_dir):
    """ann_recall_eval keeps its 4 method rows on an empty corpus
    (hits 0, truth_n 0, recall NULL) — a monitoring row that vanishes
    on empty input is how a recall regression hides."""
    rows = {r["method"]: r for r in OPS["ann_recall_eval"].fn(spark, empty_sf_dir).collect()}
    assert set(rows) == {"lsh", "ivf", "lsh_mp", "lsh_8p_single"}
    for r in rows.values():
        assert r["hits"] == 0 and r["truth_n"] == 0 and r["recall"] is None
