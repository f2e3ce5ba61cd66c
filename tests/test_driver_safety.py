"""Driver-compat guard: the external driver canonicalizes EVERY result
(including rows-only ops) with pandas sort/factorize, which crashes on
unhashable cells — so no registered op may emit array/map/struct
columns, nor BINARY (pandas materializes it as unhashable bytearray —
r6's only two red rows, mm_resize/mm_frame_sample). Round 1 lost two
ops to the complex-type form; this test makes the class of bug
unrepresentable."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()

# builders that execute real work (streams, table/JDBC writes,
# iterative jobs) — schema-checked in the full driver_sim runs instead
# of per-test here, to keep this guard fast. r17 (VERDICT r16 #6):
# extended with test_plan_lint.EAGER (the maintained list of eager
# builders — the r17 duration audit measured instances like
# sink_parquet_partitioned at 42 s and stream_classes_pctl_merge at
# 41 s re-running whole pipelines just to read a schema) plus the PQ
# codebook trainers, whose fn() collects a trained model.
from tests.test_plan_lint import EAGER as _EAGER  # noqa: E402

HEAVY = {
    "stream_slowlog_to_jdbc",
    "sink_jdbc_clickhouse",
    "scan_jdbc",
    "join_bucketed_colocated",
    "dedup_cluster",
    "stream_file_source",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_late_data",
    "sink_stream_foreachbatch",
    "stream_slowlog_classes",
    "stream_stateful_counter",
    "stream_dedup_minhash",
    # PQ/IVF trainers: fn() runs k-means / codebook training jobs
    "vec_knn_pq_adc",
    "vec_knn_ivf_pq",
    "vec_quantize_pq",
    "vec_ivf_append",
    "vec_knn_ivf",
    "ann_nprobe_sweep",
    "ann_ivfpq_sweep",
    "ann_pq_bits_clustered",
    "ann_opq_rotation",
    "ann_recall_clustered",
} | _EAGER


@pytest.mark.parametrize("name", sorted(set(OPS) - HEAVY))
def test_no_complex_typed_output_columns(spark, name):
    df = OPS[name].fn(spark, "/root/testdata/sf0.001")
    bad = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
        )
    ]
    assert not bad, (
        f"{name} emits driver-unhashable columns {bad}; JSON-encode, "
        "hex(), or explode them in the registered op (keep the typed "
        "form internal)"
    )


def test_every_oracle_sql_plans_in_duckdb():
    """Static guard: every declared oracle must at least EXPLAIN in
    DuckDB over correctly-typed (sf0.001) views — catches SQL syntax
    drift in seconds without running Spark or the full parity suite.
    (Value parity is driver_sim / test_oracle_parity's job.)"""
    import duckdb

    from slowlog2clickhouse_spark.io import TABLES

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = []
    for name, o in OPS.items():
        if not o.oracle:
            continue
        try:
            con.execute(f"EXPLAIN {o.oracle}")
        except Exception as e:  # noqa: BLE001 - collect all failures
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, f"oracle SQL fails to plan in DuckDB: {bad}"
