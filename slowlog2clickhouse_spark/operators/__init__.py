"""Operator modules — importing this package registers every op."""

from slowlog2clickhouse_spark.operators import relational  # noqa: F401
