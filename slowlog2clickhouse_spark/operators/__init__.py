"""Operator modules — importing this package registers every op."""

from slowlog2clickhouse_spark.operators import (  # noqa: F401
    analytics,
    dedup,
    functions_ops,
    multimodal,
    quality,
    relational,
    reshape,
    sinks_ops,
    skew,
    slowlog_ops,
    text,
    timeseries,
    tpch,
    tpch_full,
    udfs,
    vector,
)
from slowlog2clickhouse_spark.plans import events_pipeline as _events_pipeline  # noqa: F401
from slowlog2clickhouse_spark.plans import llm_funnel as _llm_funnel  # noqa: F401
from slowlog2clickhouse_spark.streaming import ops as streaming_ops  # noqa: F401
from slowlog2clickhouse_spark.streaming import slowlog_stream  # noqa: F401
