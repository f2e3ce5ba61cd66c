"""Sinks: parquet (partitioned/bucketed) and JDBC/ClickHouse."""
