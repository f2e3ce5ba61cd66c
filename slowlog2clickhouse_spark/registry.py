"""Operator registry — the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Every operator from SURVEY.md §2 registers itself here with its op id,
a ``(spark, sf_dir) -> DataFrame`` builder, and (when SQL-expressible)
the equivalent DuckDB oracle SQL. The driver's correctness gate and our
pytest parity suite both iterate this registry, so an op exists exactly
once.

Conventions (SURVEY.md §7 G — keep the DuckDB value-hash exact):
  * lowercase column aliases on BOTH sides, identical names;
  * round order-dependent float aggregates (sum/avg/percentile) to 4
    decimals on both sides; scalar float math is IEEE-deterministic and
    needs no rounding;
  * explicit NULLS FIRST/LAST on every ORDER BY that feeds a LIMIT;
  * unique tiebreak column on every top-k;
  * md5/sha2 are cross-engine stable, xxhash64/hash are not (rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, Op] = {}


def op(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder under a SURVEY.md §2 op id."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate op id: {name}")
        _REGISTRY[name] = Op(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# Driver-facing iteration order. The external correctness driver scores
# ops in queries() dict order under a finite budget (50 rows per round;
# r01-r04 each scored their window's first 50, all green). The window is
# re-rotated every round so never-scored oracle ops reach the driver
# first, newly-converted oracles queue right behind for the next round,
# and older greens cycle back for re-confirmation after testdata
# regenerations. tests/test_coverage.py asserts the list stays ⊆
# registry; all_ops() appends any unlisted registry ops at the end.
_PRIORITY: tuple[str, ...] = (
    # --- round-6 window positions 1-50: every oracle op the driver
    # has NEVER scored (VERDICT r5 #1). First the remaining round-5
    # oracle conversions, then the head of the round-5 second-wave
    # additions; all replica-green at sf0.01 in the round-5 session.
    "map_in_pandas_chunker",
    "pandas_udf_fingerprint",
    "scan_text_multiline",
    "scan_slowlog_pyds",
    "qan_filter_dimensions",
    "sink_parquet",
    "sink_parquet_partitioned",
    "scan_csv",
    "text_fingerprint_rolling",
    "stream_file_source",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_late_data",
    "sink_stream_foreachbatch",
    "stream_stream_join",
    "stream_transform_with_state",
    "stream_slowlog_classes",
    "stream_slowlog_to_jdbc",
    "sink_compact",
    "sink_partition_overwrite",
    "scan_schema_evolution",
    "sink_v2_writeto",
    "cache_branch_reuse",
    "observe_metrics",
    "vec_quantize_int8",
    "mm_frame_sample",
    "dedup_cluster",
    "udf_arrow_optimized",
    "join_bucketed_colocated",
    "stream_stateful_counter",
    # --- round-7 queue: rest of the never-driver-scored block
    # (~48 ops remain after the r6 window; next rotation promotes
    # these to positions 1-50).
    "qan_anomaly_mad",
    "text_ngram_topk",
    "vec_knn_ivf",
    "pack_sequences",
    "vec_kmeans",
    "graph_pagerank",
    "sample_fraction",
    "sink_jdbc_clickhouse",
    "vec_knn_lsh",
    "vec_knn_lsh_multiprobe",
    "ann_recall_eval",
    "corpus_mix_rebalance",
    "dedup_minhash_verified",
    "mm_decode_features",
    "mm_resize",
    "mm_feature_knn",
    "mm_audio_energy",
    "qan_new_digests",
    "scan_partition_pruned",
    "agg_bitmap_distinct",
    "doc_chunk_sliding",
    "time_rolling_distinct",
    "qan_latency_histogram",
    "mm_phash_dedup",
    "dedup_containment",
    "text_bpe_pairs",
    "join_interval_binned",
    "slowlog_efficiency",
    "text_oov_rate",
    "win_rolling_median",
    "text_dup_spans",
    "agg_session_window_builtin",
    "scan_binary_files",
    "events_attribution",
    "scan_jsonl_corrupt",
    "dq_drift",
    "mm_scene_cut",
    "slowlog_dimensions_matrix",
    "events_markov_transitions",
    "basket_part_pairs",
    "scan_xml",
    "str_collation",
    "time_resample_ohlc",
    "orders_pareto",
    "sql_pipe_syntax",
    "slowlog_load_share",
    "join_dynamic_partition_pruning",
    "text_idf_keywords",
    "dq_sequence_gaps",
    "text_entropy",
    "qan_digest_examples",
    "events_rfm",
    "agg_percentile_disc",
    "events_ab_lift",
    "llm_curation_funnel",
    "agg_filter_clause",
    "sql_lateral_alias",
    "sql_identifier_clause",
    "scan_csv_multiline",
    "qan_load_heatmap",
    "udtf_table_arg",
    "slowlog_rate_adjusted",
    "ann_nprobe_sweep",
    "events_conversion_lag",
    "join_null_skew_isolation",
    "slowlog_top_tables",
    "mm_duplicate_frames",
    "qan_digest_cooccurrence",
    "dedup_prefix",
    "events_trigram_paths",
    "reshape_transpose",
    "events_bounce_rate",
    "supplier_balance_outliers",
    "part_price_dispersion",
    "events_user_lifetime",
    "text_lang_mismatch",
    "orders_running_share",
    "customer_wallet_share",
    "events_props_band_stats",
    "stream_dedup_minhash",
    # --- re-confirmation queue: previously driver-green ops, oldest
    # greens first as they were ordered in earlier rounds, then the
    # genuinely rows-only ops (sketches, rate source, progress metrics)
    "win_moving_avg_time",
    "win_sessionize",
    "qan_compare_periods",
    "text_pii_scrub",
    "text_repetition",
    "sample_stratified",
    "text_decontaminate",
    "text_unigram_logprob",
    "merge_upsert",
    "cohort_retention",
    "funnel_events",
    "diff_snapshots",
    "scd2_intervals",
    "map_funcs",
    "text_normalize",
    "join_lateral",
    "filter_scalar_subquery",
    "agg_histogram",
    "json_variant",
    "join_bloom_runtime_filter",
    "sql_parameterized",
    "set_intersect_all",
    "set_except_all",
    "map_in_arrow",
    "cte_recursive_spine",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q18",
    "tpch_q14",
    "join_strategy_hints",
    "join_null_safe",
    "set_union_by_name",
    "time_weighted_avg",
    "win_islands_runs",
    "str_array_funcs2",
    "agg_bool",
    "win_nth_value",
    "agg_skew_kurt",
    "explode_outer_nulls",
    "str_regex_extract_all",
    "agg_bitwise",
    "str_hex_base64",
    "agg_product",
    "time_bucket_custom",
    "qan_apdex",
    "qan_slo_burn",
    "date_try_parse",
    "str_regex_backref",
    "slowlog_classes_approx",
    "agg_hll_daily_merge",
    "stream_rate_source",
    "stream_progress_metrics",
    "mm_metadata_filter",
    "win_running_sum",
    "win_first_last_value",
    "win_percent_cume",
    "qan_sparkline",
    "sort_multikey_nulls",
    "limit_topk",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "dedup_distinct",
    "pivot_wide",
    "unpivot_long",
    "scan_parquet",
    "scan_json_props",
    "agg_salted_twophase",
    "text_wordcount",
    "text_tfidf",
    "text_langid",
    "text_quality",
    "text_token_count",
    "pandas_grouped_agg",
    "grouped_map_normalize",
    "vec_cosine_pairs",
    "vec_knn_topk",
    "vec_centroid",
    "agg_percentile_approx",
    "join_semi_anti_rewrite",
    "corpus_curation",
    "join_salted_skew",
    "time_gapfill_locf",
    # --- round-5 window (all 50 driver-green in CORRECTNESS_r05):
    # rotated to the back of the re-confirmation queue.
    "tpch_q2",
    "tpch_q4",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "dq_profile",
    "dq_constraints",
    "dq_fk_integrity",
    "events_pipeline",
    "xml_funcs",
    "fuzzy_match_levenshtein",
    "agg_corr_cov",
    "ansi_try_funcs",
    "agg_string_concat",
    "agg_median_mode",
    "win_ratio_to_report",
    "date_month_arith",
    "fn_digest_sha256",
    "array_clean_funcs",
    "agg_grouping_id",
    "agg_regression",
    "str_split_part",
    "map_transform_funcs",
    "fn_from_csv",
    "grouped_apply_arrow",
    "scan_jdbc",
    "scan_orc",
    "scan_jsonl",
    "mm_binary_chunks",
    "slowlog_classes",
    "slowlog_global",
    "slowlog_top_digests",
    "slowlog_parse_stats",
    "udtf_parse_slowlog",
    "udf_fingerprint_py",
    "dedup_minhash",
    "dedup_simhash",
    "stream_tumbling_agg",
    "stream_static_join",
)


def all_ops() -> dict[str, Op]:
    _load_all()
    ordered: dict[str, Op] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, o in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = o
    return ordered


_LOADED = False


def _load_all() -> None:
    """Import every op module so registration side-effects run."""
    global _LOADED
    if _LOADED:
        return
    from slowlog2clickhouse_spark import operators  # noqa: F401

    _LOADED = True
