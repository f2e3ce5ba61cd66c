"""slowlog2clickhouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of
``Percona-Lab/slowlog2clickhouse`` (MySQL slow-query-log ETL +
per-digest time-bucketed aggregation + the QAN-style analytical query
surface), extended with LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) and designed for 100 TB
scale (partition-aware, shuffle-minimal, Catalyst-friendly).

Layout:
    session.py    SparkSession factory (UTC, AQE, ns-timestamp compat)
    io.py         table loaders for the driver testdata (+ ns repair)
    registry.py   op registry backing ``__spark_entry__.queries()``
    operators/    relational / text / vector / streaming query builders
    sources/      slow-log multiline text source + parser
    functions/    fingerprint / digest / vector expression libraries
    sinks/        parquet (partitioned) and JDBC/ClickHouse writers
    streaming/    Structured Streaming variants of the core pipeline
    plans/        end-to-end pipelines (ingest -> classes -> sink)
"""

__version__ = "0.1.0"
