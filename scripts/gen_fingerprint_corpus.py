"""Generate the committed adversarial fingerprint-parity corpus.

The engine ships two fingerprint implementations (SURVEY.md §2 H/K):
the JVM ``regexp_replace`` chain (``fingerprint_col`` — THE 100 TB
path) and the full-grammar Python state machine (``fingerprint_py`` —
the source of truth, reference anchor [go-mysql]
query/query.go:~40-400 [R:H]).  The chain's header documents KNOWN
divergences (apostrophes inside comments, escaped quotes); this script
turns that prose into a MEASURED per-construct agreement rate, the way
dedup_minhash_accuracy / ann_recall_eval calibrate their approximate
paths against exact truth (VERDICT r8 #2).

Output: tests/fixtures/golden/fingerprint_corpus.parquet with columns
  construct  grammar-category label (the GROUP BY axis)
  stmt_id    stable int id within the corpus
  query      the raw adversarial statement
  fp_py      fingerprint_py(query) — committed state-machine truth

tests/test_fingerprint.py pins live fingerprint_py == committed fp_py,
so a grammar change that shifts this file is a deliberate, reviewed
event: rerun this script and re-commit.

Usage: python scripts/gen_fingerprint_corpus.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slowlog2clickhouse_spark.functions.fingerprint import fingerprint_py  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden", "fingerprint_corpus.parquet",
)

# construct -> statements. Every category is either a regime the chain
# handles (expected agreement 1.0 — a regression here is a chain bug)
# or a documented divergence regime (the rate quantifies the gap the
# chain header only described in prose).
CORPUS: dict[str, list[str]] = {
    # -- regimes the chain must get right (expect 1.0) ----------------
    "plain": [
        "SELECT id, name FROM users WHERE id = 42",
        "select count(*) from orders group by status",
        "UPDATE t SET a = 1, b = 2 WHERE c = 3",
        "DELETE FROM sessions WHERE expires < 1700000000",
        "SELECT a.x, b.y FROM a JOIN b ON a.id = b.id",
    ],
    "string_simple": [
        "SELECT * FROM t WHERE name = 'alice'",
        'SELECT * FROM t WHERE name = "bob"',
        "INSERT INTO log (msg) VALUES ('hello world')",
        "SELECT 'a', 'b', 'c' FROM dual",
        "SELECT * FROM t WHERE a = 'x' AND b = \"y\"",
    ],
    "string_comment_chars": [
        "SELECT * FROM t WHERE note = '-- not a comment'",
        "SELECT * FROM t WHERE note = '# not a comment either'",
        "SELECT '/* not a block comment */' FROM t",
        "SELECT * FROM t WHERE a = 'semi; colon'",
    ],
    "numbers_int_float": [
        "SELECT * FROM t WHERE a = 5 AND b > 3.14",
        "SELECT * FROM t LIMIT 10 OFFSET 200",
        "SELECT 0.5 + 100.25 FROM t",
        "SELECT * FROM t WHERE ts > 1699999999.999",
    ],
    "numbers_sci_hex_bin": [
        "SELECT * FROM t WHERE a = 1.5e10",
        "SELECT * FROM t WHERE a = 2E-5 OR b = 3e+7",
        "SELECT * FROM t WHERE flags = 0xDEADbeef",
        "SELECT * FROM t WHERE bits = 0b1010",
        "SELECT * FROM t WHERE h = 0XFF AND v = 1E6",
    ],
    "ident_with_digits": [
        "SELECT t1.col2 FROM t1 JOIN t2 ON t1.id = t2.id",
        "SELECT md5col, sha256sum FROM hashes2",
        "SELECT * FROM db2.tbl3 WHERE k9 = 7",
    ],
    "in_list": [
        "SELECT * FROM t WHERE id IN (1, 2, 3)",
        "SELECT * FROM t WHERE id IN (1,2,3,4,5,6,7,8)",
        "SELECT * FROM t WHERE name IN ('a', 'b', 'c')",
        "SELECT * FROM t WHERE id IN ( 1 , 2 )",
    ],
    "values_multirow": [
        "INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, 'c')",
        "INSERT INTO t (x, y) VALUES (1, 2)",
        "insert into t values (1,'a')",
    ],
    "comment_line_plain": [
        "SELECT 1 -- trailing note\nFROM t",
        "SELECT 2 # hash note\nFROM t",
        "-- leading comment\nSELECT 3 FROM t",
        "# leading hash\nSELECT 4 FROM t",
    ],
    "comment_block_oneline": [
        "/* hint */ SELECT 5 FROM t",
        "SELECT /* mid */ 6 FROM t",
        "SELECT 7 FROM t /* tail */",
    ],
    "version_hint": [
        "SELECT /*! STRAIGHT_JOIN */ a FROM t JOIN u ON t.id = u.id",
        "INSERT /*! IGNORE */ INTO t VALUES (1, 2)",
    ],
    "whitespace_case": [
        "SELECT    a,\n\tb\nFROM     t   WHERE a   =   1",
        "SeLeCt A, B fRoM T wHeRe C = 2",
    ],
    # -- documented divergence regimes (rate measures the gap) --------
    "comment_apostrophe": [
        # the phantom-string regime: the chain masks strings BEFORE
        # comments, so a comment apostrophe pairs with a later real
        # quote and swallows the text between them
        "SELECT 1 -- don't\nFROM t WHERE name = 'alice'",
        "SELECT 2 # it's\nFROM t WHERE x = 'y'",
        "SELECT 3 /* can't */ FROM t WHERE s = 'z'",
        # no later string: the lone apostrophe never matches and the
        # comment strip wins — the benign half of the same regime
        "SELECT 4 -- don't do this\nFROM t",
        "SELECT 5 # it's fine\nFROM t",
    ],
    "string_escaped_backslash": [
        r"SELECT * FROM t WHERE name = 'it\'s'",
        r"SELECT * FROM t WHERE path = 'C:\\dir\\file'",
        r'SELECT * FROM t WHERE s = "say \"hi\""',
    ],
    "string_doubled_quote": [
        "SELECT * FROM t WHERE name = 'it''s'",
        'SELECT * FROM t WHERE s = "a""b"',
        "SELECT 'o''reilly', 'x' FROM t",
    ],
    "comment_block_multiline": [
        "/* line one\nline two */ SELECT 8 FROM t",
        "SELECT 9 /* a\nb\nc */ FROM t",
    ],
    "unterminated_string": [
        "SELECT * FROM t WHERE name = 'oops",
        'SELECT * FROM t WHERE s = "dangling',
    ],
    # -- r10 fuzz-found divergence regimes (hypothesis, 30k examples):
    # each defeated the original 5 detectors AND the chain
    "comment_block_degenerate": [
        "/**/ SELECT 10 FROM t",
        "SELECT 11 /**/ FROM t",
        "SELECT 12 FROM t /* unterminated",
    ],
    "string_mixed_quotes": [
        # ' inside "..." pairs with a later real ' and swallows the
        # text between (the chain masks '...' FIRST)
        "SELECT \"a'b\" FROM t WHERE c = 'd'",
        "'\" '\"",
        # the benign half: cross-quotes that happen to nest cleanly
        "SELECT 'say \"hi\" twice' FROM t",
        'SELECT * FROM t WHERE a = "it\'s fine"',
    ],
    "number_trailing_dot": [
        "SELECT * FROM t WHERE a = 0.",
        "SELECT * FROM t WHERE v = 1.e5",
        "SELECT * FROM t WHERE ver = 1.2.3",
    ],
    "number_leading_ident": [
        "SELECT 0_ FROM t",
        "SELECT * FROM t WHERE c = 12_5",
    ],
    # -- unicode / ASCII boundary (r11; DIVERGENCE regime) ------------
    # The reference scans bytes with ASCII isDigit/isLetter, so
    # fingerprint_py is pinned to ASCII token semantics (re.ASCII,
    # _ascii_alnum): 'é5' masks the 5. Java's \b however is
    # unicode-aware (measured live: the Spark chain KEEPS é5) while
    # RE2's is ASCII — the chain is neither reference-faithful nor
    # cross-engine-portable on non-ASCII statements. Every such row
    # carries the non_ascii flag (octet_length != length) and routes
    # to the state machine; fn_fingerprint_parity scopes its
    # portability claim to ASCII rows.
    "unicode_ascii_boundary": [
        "SELECT é5 FROM t",  # unicode letter then digits
        "SELECT 5é FROM t",  # digits then unicode letter
        "SELECT ٥ FROM t WHERE a = 3",  # Arabic-Indic digit: NOT masked
        "SELECT x \u00a0 = 3 FROM t",  # NBSP is not \s on any engine
        "SELECT 'café' FROM t WHERE id = 7",  # unicode inside string
        "SELECT É5 FROM t",  # uppercase unicode letter + digits (lower())
        "SELECT 1 \u00a0",  # trailing NBSP survives trim on both
    ],
    # -- multibyte contract slice (r13; r12 VERDICT #7) ----------------
    # With the upstream checkout unavailable, byte-vs-char semantics on
    # multibyte SQL cannot be verified against go-mysql; these goldens
    # DECLARE the repo's normative contract: the state machine scans
    # CHARACTERS (Python str - every multibyte letter is ONE non-letter-
    # digit char to the ASCII-token rules, never split into bytes), and
    # ASCII digits adjacent to a multibyte char follow the same
    # _ascii_alnum boundary rules the unicode_ascii_boundary rows pin.
    # Realistic shapes: CJK identifiers/literals, emoji in strings,
    # Cyrillic/Hangul literals, CJK line comments. Any future change to
    # the char-oriented policy shifts these committed digests and
    # becomes a visible, reviewed diff.
    "multibyte_sql": [
        "SELECT \u540d\u524d, \u5e74\u9f62 FROM \u793e\u54e1 WHERE id = 42",
        "SELECT * FROM users WHERE name = '\u5c71\u7530\u592a\u90ce'",
        "INSERT INTO \u6ce8\u6587 (\u54c1\u76ee, \u6570\u91cf) VALUES ('\u308a\u3093\u3054', 3)",
        "SELECT * FROM t WHERE msg = '\U0001f389 party! \U0001f38a'",
        "SELECT * FROM t WHERE city = '\u041c\u043e\u0441\u043a\u0432\u0430' AND n = 7",
        "SELECT \u88683 FROM db WHERE \u52172 = 5",
        "SELECT * FROM t -- \u5099\u8003: \u3053\u308c\u306f\u30b3\u30e1\u30f3\u30c8\nWHERE a = 1",
        "SELECT * FROM t WHERE tag = '\ud55c\uad6d\uc5b4 \ud14c\uc2a4\ud2b8'",
    ],
}


def build_rows() -> list[tuple[str, int, str, str]]:
    rows = []
    sid = 0
    for construct, stmts in sorted(CORPUS.items()):
        for q in stmts:
            rows.append((construct, sid, q, fingerprint_py(q)))
            sid += 1
    return rows


def main() -> None:
    rows = build_rows()
    tbl = pa.table(
        {
            "construct": pa.array([r[0] for r in rows], pa.string()),
            "stmt_id": pa.array([r[1] for r in rows], pa.int64()),
            "query": pa.array([r[2] for r in rows], pa.string()),
            "fp_py": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, OUT)
    print(f"wrote {tbl.num_rows} rows / {len(CORPUS)} constructs -> {OUT}")


if __name__ == "__main__":
    main()
