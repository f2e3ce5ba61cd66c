"""Fingerprint table tests (SURVEY.md §5.2 item 3) — go-mysql test-case
STYLE (public format knowledge, not copied code): raw SQL → expected
normalized fingerprint, plus property tests (idempotence, digest
stability) and SQL-chain vs Python-UDF agreement on the shared subset.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.functions.fingerprint import (
    digest_py,
    fingerprint_col,
    fingerprint_py,
)

# (raw, expected) — expected semantics per [go-mysql] query/query.go [R:H]
CASES = [
    ("SELECT c FROM t WHERE id=1", "select c from t where id=?"),
    ("select c from t where id = 42 ", "select c from t where id = ?"),
    ("SELECT c FROM t WHERE id IN (1, 2, 3)", "select c from t where id in(?+)"),
    ("SELECT c FROM t WHERE id in(1,2,3)", "select c from t where id in(?+)"),
    ("SELECT * FROM t WHERE name = 'abc'", "select * from t where name = ?"),
    ('SELECT * FROM t WHERE name = "abc"', "select * from t where name = ?"),
    ("SELECT * FROM t WHERE x = 1.5 AND y = .5 + 2", "select * from t where x = ? and y = .? + ?"),
    ("INSERT INTO t VALUES (1, 'a'), (2, 'b')", "insert into t values(?+)"),
    ("insert into t values (1, 'a')", "insert into t values(?+)"),
    ("SELECT c FROM t -- comment\nWHERE id = 1", "select c from t where id = ?"),
    ("SELECT c FROM t /* comment */ WHERE id = 1", "select c from t where id = ?"),
    ("SELECT   c\tFROM\n\nt", "select c from t"),
    ("SELECT x'", "select x'"),  # unterminated string: consumed to EOL
    ("SELECT 0xDEADBEEF", "select ?"),
    ("SELECT c FROM t1 WHERE col2 = 3", "select c from t1 where col2 = ?"),
    ("UPDATE t SET a = 5 WHERE b = 'x -- not a comment'", "update t set a = ? where b = ?"),
    # MySQL '#' line comments strip on BOTH the chain and the UDF
    ("SELECT c FROM t # trailing note\nWHERE id = 7", "select c from t where id = ?"),
    ("SELECT c FROM t WHERE tag = '#42' AND id = 7", "select c from t where tag = ? and id = ?"),
]

# subset where the regexp_replace chain matches full UDF semantics
CHAIN_SAFE = [c for c, _ in CASES if "--" not in c.split("'")[0] or "'" not in c]


@pytest.mark.parametrize("raw,expected", CASES)
def test_fingerprint_py(raw, expected):
    got = fingerprint_py(raw)
    if raw == "SELECT x'":
        # unterminated-string behavior is engine-defined; just idempotent
        assert fingerprint_py(got) == got
        return
    assert got == expected, f"{raw!r} -> {got!r} != {expected!r}"


@pytest.mark.parametrize("raw,_", CASES)
def test_fingerprint_idempotent(raw, _):
    fp = fingerprint_py(raw)
    assert fingerprint_py(fp) == fp


def test_digest_shape_and_stability():
    fp = fingerprint_py("SELECT c FROM t WHERE id = 1")
    d = digest_py(fp)
    assert len(d) == 16 and d == d.upper()
    assert d == digest_py(fp)  # stable
    assert d != digest_py(fp + " ")  # sensitive


def test_sql_chain_agrees_with_udf(spark):
    """The codegen'd regexp chain and the Python state machine must
    agree on the grammar subset both support (UDF = source of truth)."""
    simple = [
        "SELECT c FROM t WHERE id = 1",
        "SELECT c FROM t WHERE id IN (1, 2, 3)",
        "SELECT * FROM t WHERE name = 'abc' AND x = 2.5",
        "INSERT INTO t VALUES (1, 'a'), (2, 'b')",
        "SELECT c FROM t /* comment */ WHERE id = 7",
        "SELECT   c\tFROM  t  WHERE a = 0xFF",
    ]
    df = spark.createDataFrame([(s,) for s in simple], ["q"])
    got = [r[0] for r in df.select(fingerprint_col(F.col("q"))).collect()]
    want = [fingerprint_py(s) for s in simple]
    assert got == want


def test_arrow_optimized_udf_equals_row_udf(spark, sf_dir):
    from slowlog2clickhouse_spark.registry import all_ops

    ops = all_ops()
    arrow = {
        (r["fingerprint"], r["n"])
        for r in ops["udf_arrow_optimized"].fn(spark, sf_dir).collect()
    }
    pandas_v = {
        (r["fingerprint"], r["n"])
        for r in ops["pandas_udf_fingerprint"].fn(spark, sf_dir).collect()
    }
    assert arrow == pandas_v and arrow
