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

# Extended corpus toward go-mysql's query_test.go breadth (round-5):
# IN-lists across literal kinds, multi-row VALUES, /*! */ version
# hints, escaped quotes, multi-statement, number/identifier boundaries,
# MySQL-isms. Expectations verified against the state machine and
# reviewed for reference semantics.
EXTENDED_CASES = [
    # IN lists: hex / float / string / mixed / long / spacing / nested
    ("SELECT c FROM t WHERE id IN (0x1A, 0xFF)", "select c from t where id in(?+)"),
    ("SELECT c FROM t WHERE id IN (1.5, 2.25, 3.0)", "select c from t where id in(?+)"),
    ("SELECT c FROM t WHERE name IN ('a', 'b', 'c')", "select c from t where name in(?+)"),
    ("SELECT c FROM t WHERE id IN (1, 'a', 2.5, 0xFF)", "select c from t where id in(?+)"),
    (
        "SELECT c FROM t WHERE id IN(" + ", ".join(str(i) for i in range(50)) + ")",
        "select c from t where id in(?+)",
    ),
    ("SELECT c FROM t WHERE id IN ( 1 , 2 , 3 )", "select c from t where id in(?+)"),
    ("SELECT c FROM t WHERE id IN (1)", "select c from t where id in(?+)"),
    ("DELETE FROM t WHERE id IN (7,8) AND x IN (9)", "delete from t where id in(?+) and x in(?+)"),
    ("SELECT c FROM t WHERE a IN (1,2) OR b IN (3,4)", "select c from t where a in(?+) or b in(?+)"),
    (
        "SELECT c FROM t WHERE id IN (SELECT id FROM u WHERE v = 3)",
        "select c from t where id in (select id from u where v = ?)",
    ),
    # VALUES: multi-row, mixed literal kinds, spacing; non-literal rows survive
    (
        "INSERT INTO t VALUES (1, 2.5, 'x'), (2, 3.5, 'y'), (3, 4.5, 'z')",
        "insert into t values(?+)",
    ),
    ("INSERT INTO t(a,b) VALUES (1,'a')", "insert into t(a,b) values(?+)"),
    ("REPLACE INTO t VALUES (0xAB, 'q')", "replace into t values(?+)"),
    ("INSERT INTO t VALUES(1,'a'),(2,'b'),(3,'c'),(4,'d')", "insert into t values(?+)"),
    ("INSERT INTO t VALUES (now(), 1)", "insert into t values (now(), ?)"),
    ("INSERT INTO t VALUES ( 1 , 'a' ) , ( 2 , 'b' )", "insert into t values(?+)"),
    # /*! */ version hints: preserved (not comments), version number masked
    ("SELECT /*! STRAIGHT_JOIN */ c FROM t WHERE id = 1", "select /*! straight_join */ c from t where id = ?"),
    ("SELECT /*!40001 SQL_NO_CACHE */ * FROM t WHERE x = 5", "select /*!? sql_no_cache */ * from t where x = ?"),
    ("INSERT /*!40000 DELAYED */ INTO t VALUES (1, 'a')", "insert /*!? delayed */ into t values(?+)"),
    # comments
    ("SELECT c FROM t /* multi\nline\ncomment */ WHERE id = 3", "select c from t where id = ?"),
    ("SELECT c FROM t WHERE id = 3 -- trailing no newline", "select c from t where id = ?"),
    ("SELECT c FROM t WHERE id = 3 # trailing hash no newline", "select c from t where id = ?"),
    ("SELECT c /* one */ FROM t /* two */ WHERE id = 4", "select c from t where id = ?"),
    ("SELECT c FROM t /* unterminated WHERE id = 5", "select c from t"),
    ("SELECT a#b\nFROM t WHERE c = 2", "select a from t where c = ?"),
    # escaped quotes (UDF-only grammar; the chain documents divergence)
    (r"SELECT * FROM t WHERE name = 'O\'Brien'", "select * from t where name = ?"),
    ("SELECT * FROM t WHERE name = 'O''Brien'", "select * from t where name = ?"),
    (r'SELECT * FROM t WHERE name = "say \"hi\""', "select * from t where name = ?"),
    (r"UPDATE t SET note = 'ends with backslash \\' WHERE id = 2", "update t set note = ? where id = ?"),
    ("SELECT * FROM t WHERE a = 'x' AND b = 'don''t stop' AND c = 9", "select * from t where a = ? and b = ? and c = ?"),
    # numbers vs identifiers
    ("SELECT t1.col2 FROM t1 WHERE t1.id3 = 4", "select t1.col2 from t1 where t1.id3 = ?"),
    ("SELECT a1b2 FROM x9 WHERE q0 = 0", "select a1b2 from x9 where q0 = ?"),
    ("SELECT c FROM t WHERE x = -3.14 AND y = +7", "select c from t where x = -? and y = +?"),
    ("SELECT c FROM t WHERE x = .5 AND y = 0.25", "select c from t where x = .? and y = ?"),
    ("SELECT c FROM t WHERE x = 007", "select c from t where x = ?"),
    ("SELECT c FROM t WHERE x = 6.02e23", "select c from t where x = ?"),
    ("SELECT c FROM t WHERE x = 1e5", "select c from t where x = ?"),
    ("SELECT c FROM t LIMIT 10 OFFSET 20", "select c from t limit ? offset ?"),
    ("SELECT c FROM t LIMIT 5, 10", "select c from t limit ?, ?"),
    ("SELECT c FROM t WHERE ts BETWEEN 1704067200 AND 1704153600", "select c from t where ts between ? and ?"),
    # hex/binary literal edges (MySQL: 0x lowercase only; 0b binary)
    ("SELECT c FROM t WHERE x = 0xdeadBEEF AND y = 0Xff", "select c from t where x = ? and y = ?"),
    ("SELECT c FROM t WHERE flag = 0b1010", "select c from t where flag = ?"),
    # strings
    ("SELECT * FROM t WHERE name LIKE '%abc%'", "select * from t where name like ?"),
    ("SELECT * FROM t WHERE j = '{\"k\": 1, \"v\": [2, 3]}'", "select * from t where j = ?"),
    ("SELECT * FROM t WHERE s = ''", "select * from t where s = ?"),
    ("SELECT * FROM t WHERE d = '2024-01-01 10:00:00'", "select * from t where d = ?"),
    ("SELECT * FROM t WHERE u = 'café über'", "select * from t where u = ?"),
    # multi-statement
    ("SELECT 1; SELECT 2", "select ?; select ?"),
    (
        "SELECT 1; UPDATE t SET a = 2; DELETE FROM u WHERE b = 3",
        "select ?; update t set a = ?; delete from u where b = ?",
    ),
    ("BEGIN; INSERT INTO t VALUES (1); COMMIT", "begin; insert into t values(?+); commit"),
    # statement shapes
    ("SET timestamp=1704067798", "set timestamp=?"),
    ("use warehouse", "use warehouse"),
    ("CREATE TABLE t (id INT, name VARCHAR(255))", "create table t (id int, name varchar(?))"),
    ("ALTER TABLE t ADD COLUMN c INT DEFAULT 5", "alter table t add column c int default ?"),
    ("SELECT `col` FROM `db`.`t` WHERE `id` = 11", "select `col` from `db`.`t` where `id` = ?"),
    (
        "SELECT COUNT(*), MAX(x) FROM t GROUP BY y HAVING COUNT(*) > 5",
        "select count(*), max(x) from t group by y having count(*) > ?",
    ),
    (
        "SELECT c FROM t WHERE a IS NULL AND b = TRUE AND d = FALSE",
        "select c from t where a is null and b = true and d = false",
    ),
    ("SELECT c FROM t ORDER BY x DESC, y ASC LIMIT 100", "select c from t order by x desc, y asc limit ?"),
    (
        "SELECT a.x, b.y FROM a JOIN b ON a.id = b.id AND a.v > 3",
        "select a.x, b.y from a join b on a.id = b.id and a.v > ?",
    ),
    (
        "SELECT c FROM t WHERE x = 1 UNION SELECT c FROM u WHERE x = 2",
        "select c from t where x = ? union select c from u where x = ?",
    ),
    ("GRANT SELECT ON db.* TO 'user'@'host'", "grant select on db.* to ?@?"),
    ("CALL proc(1, 'a', 2.5)", "call proc(?, ?, ?)"),
    ("SELECT DATE_ADD(NOW(), INTERVAL 30 DAY)", "select date_add(now(), interval ? day)"),
    ("SELECT CAST(x AS UNSIGNED) FROM t WHERE id = 8", "select cast(x as unsigned) from t where id = ?"),
    (
        "SELECT c FROM t WHERE MATCH(a) AGAINST ('query' IN BOOLEAN MODE)",
        "select c from t where match(a) against (? in boolean mode)",
    ),
    ("SHOW TABLES LIKE 'prefix%'", "show tables like ?"),
    ("EXPLAIN SELECT c FROM t WHERE id = 1", "explain select c from t where id = ?"),
    ("SELECT c FROM t WHERE ts > NOW() - INTERVAL 1 HOUR", "select c from t where ts > now() - interval ? hour"),
    ("SELECT c FROM t PARTITION (p0, p1) WHERE id = 2", "select c from t partition (p0, p1) where id = ?"),
    (
        "SELECT DISTINCT c FROM t WHERE x <> 4 AND y != 5 AND z <=> 6",
        "select distinct c from t where x <> ? and y != ? and z <=> ?",
    ),
    ("SELECT c FROM t WHERE ip = '10.0.0.1' AND port = 3306", "select c from t where ip = ? and port = ?"),
    ("SELECT IF(x > 1, 'yes', 'no') FROM t", "select if(x > ?, ?, ?) from t"),
    (
        "SELECT c FROM t WHERE EXISTS (SELECT 1 FROM u WHERE u.id = t.id)",
        "select c from t where exists (select ? from u where u.id = t.id)",
    ),
    ("SELECT SUBSTRING(name, 1, 3) FROM t WHERE id = 44", "select substring(name, ?, ?) from t where id = ?"),
    ("SELECT c FROM t WHERE x % 2 = 0 AND y DIV 3 = 1", "select c from t where x % ? = ? and y div ? = ?"),
    (
        "WITH cte AS (SELECT id FROM t WHERE v = 9) SELECT * FROM cte",
        "with cte as (select id from t where v = ?) select * from cte",
    ),
    ("SELECT c INTO @v FROM t WHERE id = 12", "select c into @v from t where id = ?"),
    ("LOAD DATA INFILE '/tmp/f.csv' INTO TABLE t", "load data infile ? into table t"),
    ("SELECT c FROM t FOR UPDATE", "select c from t for update"),
    ("SELECT c FROM t LOCK IN SHARE MODE", "select c from t lock in share mode"),
    ("SELECT GROUP_CONCAT(c SEPARATOR ',') FROM t WHERE id = 3", "select group_concat(c separator ?) from t where id = ?"),
    # signed exponents (tokenizer extends across the sign)
    ("SELECT c FROM t WHERE x = 1E-5 AND y = 2.5e+10", "select c from t where x = ? and y = ?"),
    # tuple IN-lists stay structural (per-element masking only)
    ("SELECT c FROM t WHERE (a, b) IN ((1, 2), (3, 4))", "select c from t where (a, b) in ((?, ?), (?, ?))"),
    # INSERT variants
    (
        "INSERT INTO t (a) VALUES (1) ON DUPLICATE KEY UPDATE a = a + 1",
        "insert into t (a) values(?+) on duplicate key update a = a + ?",
    ),
    ("INSERT INTO t SELECT * FROM u WHERE v = 5", "insert into t select * from u where v = ?"),
    ("INSERT IGNORE INTO t VALUES (9, 'z')", "insert ignore into t values(?+)"),
    # string-literal dialect forms
    (r"SELECT * FROM t WHERE name LIKE 'a\_b%' ESCAPE '\\'", "select * from t where name like ? escape ?"),
    ("SELECT _utf8'abc' FROM t WHERE id = 1", "select _utf8? from t where id = ?"),
    ("SELECT N'abc' FROM t WHERE id = 2", "select n? from t where id = ?"),
    ("SELECT * FROM t WHERE d = DATE '2024-01-01'", "select * from t where d = date ?"),
    ("SELECT * FROM t WHERE ts = TIMESTAMP '2024-01-01 10:00:00'", "select * from t where ts = timestamp ?"),
    ("SELECT c FROM t WHERE flag = b'1010'", "select c from t where flag = b?"),
    ("SELECT c FROM t WHERE h = X'ABCD'", "select c from t where h = x?"),
    ("SELECT c FROM t WHERE s = 'a' COLLATE utf8mb4_bin", "select c from t where s = ? collate utf8mb4_bin"),
    # negatives / operators / admin statements
    ("SELECT c FROM t WHERE x BETWEEN -5 AND -1", "select c from t where x between -? and -?"),
    (
        "SELECT c FROM t WHERE x = 1 UNION ALL SELECT c FROM u WHERE x = 2",
        "select c from t where x = ? union all select c from u where x = ?",
    ),
    ("TRUNCATE TABLE sessions", "truncate table sessions"),
    ("RENAME TABLE old_t TO new_t", "rename table old_t to new_t"),
    ("SET NAMES utf8mb4", "set names utf8mb4"),
    ("SHOW VARIABLES LIKE 'max_connections'", "show variables like ?"),
    ("KILL 12345", "kill ?"),
    (
        "SELECT ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC) FROM t WHERE d = 7",
        "select row_number() over (partition by g order by v desc) from t where d = ?",
    ),
    ("SELECT JSON_EXTRACT(doc, '$.items[0].id') FROM t WHERE id = 3", "select json_extract(doc, ?) from t where id = ?"),
    ("SELECT c FROM t WHERE MOD(x, 4) = 2", "select c from t where mod(x, ?) = ?"),
    ("DROP TABLE IF EXISTS tmp_2024_01", "drop table if exists tmp_2024_01"),
    ("ANALYZE TABLE t UPDATE HISTOGRAM ON c WITH 32 BUCKETS", "analyze table t update histogram on c with ? buckets"),
    (
        "SELECT c FROM t WHERE x IN (1,2) AND s IN ('a','b') AND h IN (0xA, 0xB)",
        "select c from t where x in(?+) and s in(?+) and h in(?+)",
    ),
]

ALL_CASES = CASES + EXTENDED_CASES

# subset where the regexp_replace chain matches full UDF semantics
CHAIN_SAFE = [c for c, _ in CASES if "--" not in c.split("'")[0] or "'" not in c]


@pytest.mark.parametrize("raw,expected", ALL_CASES)
def test_fingerprint_py(raw, expected):
    got = fingerprint_py(raw)
    if raw == "SELECT x'":
        # unterminated-string behavior is engine-defined; just idempotent
        assert fingerprint_py(got) == got
        return
    assert got == expected, f"{raw!r} -> {got!r} != {expected!r}"


@pytest.mark.parametrize("raw,_", ALL_CASES)
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
    ] + [
        # chain-safe slice of the extended corpus: no backslash/doubled
        # quote escapes and no multi-line block comments (the documented
        # UDF-only grammar: Java regex '.' stops at \n) — everything
        # else must agree
        raw
        for raw, _ in EXTENDED_CASES
        if "\\" not in raw and "''" not in raw and "\n" not in raw
        and "unterminated" not in raw
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


def test_parity_corpus_golden_pinned():
    """The committed fingerprint_corpus.parquet fp_py column is the
    live state machine's output — a grammar change that shifts it is a
    deliberate event (rerun scripts/gen_fingerprint_corpus.py)."""
    import pyarrow.parquet as pq

    from slowlog2clickhouse_spark.operators.udfs import FINGERPRINT_CORPUS

    tbl = pq.read_table(FINGERPRINT_CORPUS)
    queries = tbl.column("query").to_pylist()
    committed = tbl.column("fp_py").to_pylist()
    assert [fingerprint_py(q) for q in queries] == committed
    assert len(queries) >= 50 and len(set(tbl.column("construct").to_pylist())) >= 15


def test_parity_supported_regimes_fully_agree(spark, sf_dir):
    """fn_fingerprint_parity: every chain-SUPPORTED construct must
    agree 1.0 with the state machine; the documented-divergence
    regimes must each diverge (a 1.0 there means the corpus stopped
    being adversarial). Divergence rates are recorded in SCALING.md."""
    from slowlog2clickhouse_spark.registry import all_ops

    rows = {
        r["construct"]: r
        for r in all_ops()["fn_fingerprint_parity"].fn(spark, sf_dir).collect()
    }
    divergent = {
        "comment_apostrophe",
        "string_escaped_backslash",
        "string_doubled_quote",
        "comment_block_multiline",
        "unterminated_string",
        # r10 fuzz finds — each defeated the chain AND the original
        # five detectors (see gen_fingerprint_corpus.py)
        "comment_block_degenerate",
        "string_mixed_quotes",
        "number_trailing_dot",
        "number_leading_ident",
    }
    for construct, r in rows.items():
        if construct in divergent:
            assert r["agreement"] < 1.0, construct
        else:
            assert r["agreement"] == 1.0, (construct, r["agreement"])
    assert divergent <= set(rows)


def test_chain_mirror_matches_spark(spark):
    """fingerprint_chain_py (the hypothesis fuzz mirror) must equal the
    LIVE Spark regexp chain row-for-row on the committed adversarial
    corpus — including the divergence regimes, where mirror and chain
    must be wrong IDENTICALLY (Python-re vs Java-regex portability of
    the restricted pattern subset; the Java↔RE2 half is pinned by
    fn_fingerprint_parity's oracle)."""
    import pyarrow.parquet as pq

    from slowlog2clickhouse_spark.functions.fingerprint import (
        fingerprint_chain_py,
    )
    from slowlog2clickhouse_spark.operators.udfs import FINGERPRINT_CORPUS

    queries = pq.read_table(FINGERPRINT_CORPUS).column("query").to_pylist()
    # ASCII rows only: Java's \b is unicode-aware, RE2's and the
    # mirror's (re.ASCII) are not — non-ASCII statements are outside
    # the chain's portability contract and always carry the non_ascii
    # flag (routed to the state machine), so the mirror never stands
    # in for the chain on them (r11)
    queries = [q for q in queries if q.isascii()]
    assert queries, "corpus lost its ASCII rows"
    df = spark.createDataFrame([(q,) for q in queries], ["q"])
    spark_chain = [r[0] for r in df.select(fingerprint_col(F.col("q"))).collect()]
    assert spark_chain == [fingerprint_chain_py(q) for q in queries]


def test_router_flags_are_a_sound_chain_certificate(spark):
    """THE router safety property (VERDICT r9 #3): on the committed
    adversarial corpus, every statement where the regexp chain
    diverges from fingerprint_py raises at least one construct flag —
    so an unflagged corpus certifies the codegen'd chain path. Also
    pins that the divergence constructs are all flagged (the detectors
    may over-route, never under-route)."""
    from slowlog2clickhouse_spark.functions.fingerprint import (
        construct_flags,
        fingerprint_py,
    )
    from slowlog2clickhouse_spark.operators.udfs import FINGERPRINT_CORPUS

    df = spark.read.parquet(FINGERPRINT_CORPUS)
    flags = construct_flags(F.col("query"))
    any_flag = None
    for c in flags.values():
        any_flag = c if any_flag is None else (any_flag | c)
    rows = df.select(
        "construct",
        "query",
        "fp_py",
        fingerprint_col(F.col("query")).alias("fp_chain"),
        any_flag.alias("flagged"),
    ).collect()
    for r in rows:
        assert r["fp_py"] == fingerprint_py(r["query"])  # committed truth live
        if not r["flagged"]:
            assert r["fp_chain"] == r["fp_py"], (
                "unflagged statement diverges — router is unsound: "
                f"{r['construct']}: {r['query']!r}"
            )
    divergent = [r for r in rows if r["fp_chain"] != r["fp_py"]]
    assert divergent, "corpus lost its divergence regimes"
    assert all(r["flagged"] for r in divergent)


def test_router_op_incidence_on_corpus(spark, sf_dir):
    """fn_fingerprint_router emits one row per detector with exact
    incidence; on the committed corpus every detector fires (the
    corpus contains all ten regimes by construction — the four r10
    fuzz-found ones and r11's non_ascii included)."""
    from slowlog2clickhouse_spark.registry import all_ops

    rows = all_ops()["fn_fingerprint_router"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["corpus_n"] > 0
        assert 0 < r["n_flagged"] <= r["corpus_n"], r
        assert r["needs_routing"] is True
        assert abs(r["incidence"] - round(r["n_flagged"] / r["corpus_n"], 4)) < 1e-9


def test_routed_fingerprint_is_state_machine_exact(spark, sf_dir):
    """fn_fingerprint_routed == fingerprint_py on every corpus row
    (including all divergence regimes), and the chain actually handles
    the unflagged mass (the routed column differs from the raw chain
    on at least the flagged divergent rows)."""
    from slowlog2clickhouse_spark.registry import all_ops

    got = {
        r["stmt_id"]: r["fingerprint"]
        for r in all_ops()["fn_fingerprint_routed"].fn(spark, sf_dir).collect()
    }
    df = spark.read.parquet(
        __import__(
            "slowlog2clickhouse_spark.operators.udfs", fromlist=["x"]
        ).FINGERPRINT_CORPUS
    )
    rows = df.select(
        "stmt_id", "fp_py", fingerprint_col(F.col("query")).alias("chain")
    ).collect()
    assert len(got) == len(rows)
    n_diverge = 0
    for r in rows:
        assert got[r["stmt_id"]] == r["fp_py"], r["stmt_id"]
        if r["chain"] != r["fp_py"]:
            n_diverge += 1
    assert n_diverge > 0  # the corpus still exercises the routed path


def test_routed_fn_runs_only_on_flagged_rows(spark):
    """The masked single-pass form's confinement contract (r14;
    supersedes the r10 split+union pin): every row crosses the Arrow
    boundary, but clean rows cross as NULLs (validity bits, no string
    payload) and the per-row state machine ``fn`` runs EXACTLY on the
    flagged slice — pinned with an accumulator bumped once per ``fn``
    invocation. (The r10 hazard this guards against is unchanged: a
    when()/otherwise() VALUE expression would run the UDF's fn on
    every row because Spark extracts Python UDFs out of
    conditionals.)"""
    from slowlog2clickhouse_spark.functions.fingerprint import (
        any_construct_flag,
        fingerprint_py,
        routed_fingerprint,
    )
    from slowlog2clickhouse_spark.operators.udfs import FINGERPRINT_CORPUS

    df = spark.read.parquet(FINGERPRINT_CORPUS)
    total = df.count()
    flag = F.coalesce(any_construct_flag(F.col("query")), F.lit(False))
    n_flagged = df.where(flag).count()
    assert 0 < n_flagged < total  # corpus exercises both branches

    acc = spark.sparkContext.accumulator(0)

    def counting_fp(q):
        acc.add(1)
        return fingerprint_py(q)

    out = routed_fingerprint(df, "query", "fingerprint", fp_fn=counting_fp)
    rows = out.select("stmt_id", "fingerprint").collect()
    assert len(rows) == total
    # exactly the flagged slice crossed the Python boundary
    assert acc.value == n_flagged


def test_spark_flags_equal_python_mirror_on_corpus(spark):
    """Per-row, per-detector equality of the LIVE Spark construct
    flags and the re.ASCII Python mirror over the committed corpus.
    This is the guard that keeps the corpus free of rows where Java's
    unicode-aware \\b and the ASCII engines disagree on a NUMBER
    detector (e.g. 'é5.') — such a row would silently skew
    fn_fingerprint_router's cross-engine incidence oracle; this test
    makes it fail loudly at corpus-regen time instead (r11 review)."""
    from slowlog2clickhouse_spark.functions.fingerprint import (
        construct_flags,
        construct_flags_py,
    )
    from slowlog2clickhouse_spark.operators.udfs import FINGERPRINT_CORPUS

    df = spark.read.parquet(FINGERPRINT_CORPUS)
    flags = construct_flags(F.col("query"))
    rows = df.select(
        "stmt_id",
        "query",
        *[F.coalesce(c, F.lit(False)).alias(f"f_{k}") for k, c in flags.items()],
    ).collect()
    for r in rows:
        want = construct_flags_py(r["query"])
        got = {k: r[f"f_{k}"] for k in want}
        assert got == want, (r["stmt_id"], r["query"])


def test_routed_equals_state_machine_on_adversarial_batch(spark):
    """End-to-end pin of the MASKED routing's full Spark path — mask
    expression, Arrow null transfer, pandas None-skip, coalesce
    fallthrough — on one deterministic adversarial batch (~600 rows):
    every wild lexical atom the pure-Python property fuzz uses, woven
    pairwise (comment×quote, torn×escaped, …), plus multibyte rows
    (CJK/emoji/Cyrillic/combining marks in bare/quoted/commented
    positions) and NULLs. For every row, routed output must equal
    fingerprint_py exactly; NULL in, NULL out. This is the Spark twin
    of test_router_unflagged_implies_chain_exact + the corpus pin —
    those certify the ROUTING DECISION, this certifies the PLUMBING
    the r14 masked form introduced."""
    from slowlog2clickhouse_spark.functions.fingerprint import (
        fingerprint_py,
        routed_fingerprint,
    )

    atoms = [
        "-- don't", "# it's", "/* can't */", "'it''s'", r"'a\'b'",
        "/* a\nb */", "'oops", '"dangling', "'x'", "--", "#",
        ",", "=", "(", ")", "SELECT", "FROM", "WHERE", "IN (1,2)",
        "VALUES (1,'a')", "/**/", "/*", "*/", "/*!40001 x*/", "0xFF",
        "1e5", "0.", ".5", "1.2.3", "1.e5", "0_", "12_5", "/**\n*/",
        "表3", "社員 = '山田'", "🚀 = 7", "-- комментарий",
        "'héllo'", "x́y", "N'literal'", "tbl_2020_01",
    ]
    rows = [(i, a) for i, a in enumerate(atoms)]
    n = len(atoms)
    for i, a in enumerate(atoms):
        for j, b in enumerate(atoms):
            if (i + j) % 3 == 0:  # deterministic 1/3 of the grid
                rows.append((n + i * len(atoms) + j, f"SELECT {a} {b}"))
    rows.append((10_000, None))
    rows.append((10_001, ""))

    df = spark.createDataFrame(rows, "stmt_id int, query string")
    collected = routed_fingerprint(df, "query", "fp").collect()
    assert len(collected) == len(rows)  # no row duped (pre-dict count)
    got = {r["stmt_id"]: r["fp"] for r in collected}
    assert len(got) == len(rows)  # no row lost
    for sid, q in rows:
        want = fingerprint_py(q) if q is not None else None
        assert got[sid] == want, (sid, repr(q), got[sid], want)
