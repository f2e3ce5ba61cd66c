"""Operator modules — importing this package registers every op."""

from slowlog2clickhouse_spark.operators import functions_ops, relational  # noqa: F401
