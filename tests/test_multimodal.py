"""Multimodal plumbing tests: resize stage determinism and shape."""

from __future__ import annotations

from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()

def test_resize_deterministic_and_fixed_dims(spark, sf_dir):
    from slowlog2clickhouse_spark.operators.multimodal import RESIZE_TARGET

    ops = OPS["mm_resize"].fn(spark, sf_dir)
    rows = ops.collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert (r["dst_w"], r["dst_h"]) == RESIZE_TARGET
        assert len(r["resized"]) == RESIZE_TARGET[0] * RESIZE_TARGET[1]
    rerun = {(r["doc_id"], r["resized_md5"]) for r in OPS["mm_resize"].fn(spark, sf_dir).collect()}
    assert rerun == {(r["doc_id"], r["resized_md5"]) for r in rows}
