"""Operator modules — importing this package registers every op."""

from slowlog2clickhouse_spark.operators import (  # noqa: F401
    functions_ops,
    relational,
    slowlog_ops,
)
