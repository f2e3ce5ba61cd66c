"""Text-analysis operators — SURVEY.md §2 I (north-star extensions).

Training-data-pipeline text ops over the `documents` table: word
counts, TF-IDF, language-ID heuristic, quality scoring, token
counting, rolling-hash fingerprints. Everything stays in built-in
expressions (explode/split/regexp/ln) — no Python in the hot path, so
the plans scale to 100 TB document corpora (shuffles only on token or
doc_id, both partial-agg'd).

Cross-engine float discipline: int/int division is IEEE-identical and
left unrounded; only transcendentals (ln) are rounded (they differ in
the last ulp across libm implementations but never land on decimal
halves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.operators.stitched import ranked_topk
from slowlog2clickhouse_spark.registry import op


def _tokens(col="text"):
    """lowercased whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(col), " "), lambda t: t != "")


_TOKENS_DUCK = "list_filter(string_split(lower(text), ' '), t -> t <> '')"


@op(
    "text_wordcount",
    oracle=f"""
    SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest({_TOKENS_DUCK}) AS token FROM documents) t
    GROUP BY 1
    """,
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + corpus term frequencies (the hello-world of text
    pipelines; one shuffle on token, partial-agg'd)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    return tok.groupBy("token").agg(
        F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs")
    )


@op(
    "text_tfidf",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term): two aggregations + a broadcast join on
    the term dictionary (df table is |vocab|-sized — tiny next to the
    corpus, so it broadcasts at any scale)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    # lazy checkpoint: tf feeds both the df aggregate and the join —
    # without it the tokenize/explode pass re-runs per consumer
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )


_STOPWORDS = ("the", "a", "and", "of", "in")
_HITS_SQL = " + ".join(
    f"(CASE WHEN ' ' || lower(text) || ' ' LIKE '% {w} %' THEN 1 ELSE 0 END)"
    for w in _STOPWORDS
)


@op(
    "text_langid",
    oracle=f"""
    SELECT lang, predicted, count(*) AS n FROM (
      SELECT lang,
             CASE WHEN ({_HITS_SQL}) >= 2 THEN 'en' ELSE 'other' END AS predicted
      FROM documents) t
    GROUP BY 1, 2
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English stopword presence votes (an
    n-gram/stopword classifier in pure expressions). Confusion matrix
    against the labeled lang column."""
    d = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    hits = sum(
        F.when(padded.like(f"% {w} %"), 1).otherwise(0) for w in _STOPWORDS
    )
    pred = F.when(hits >= 2, "en").otherwise("other").alias("predicted")
    return d.groupBy("lang", pred).agg(F.count("*").alias("n"))


@op(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           cast(length(text) AS BIGINT) AS n_chars,
           cast(len({_TOKENS_DUCK}) AS BIGINT) AS n_tokens,
           length(text) * 1.0 / len({_TOKENS_DUCK}) AS avg_token_span,
           length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) * 1.0
             / length(text) AS punct_ratio,
           ({_HITS_SQL}) * 1.0 / 5 AS stopword_hit_ratio
    FROM documents
    WHERE length(text) > 0
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals (length / punctuation / stopword ratios
    — the standard pre-training filter features). Ratios are int/int
    divisions → bit-identical cross-engine, no rounding."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    hits = sum(
        F.when(padded.like(f"% {w} %"), 1).otherwise(0) for w in _STOPWORDS
    )
    n_tokens = F.size(_tokens())
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        (F.length("text") * 1.0 / n_tokens).alias("avg_token_span"),
        (
            F.length(F.regexp_replace("text", "[a-z0-9 ]", "")) * 1.0
            / F.length("text")
        ).alias("punct_ratio"),
        (hits * 1.0 / 5).alias("stopword_hit_ratio"),
    )


@op(
    "text_token_count",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS token FROM documents)
    SELECT doc_id,
           count(*) AS ws_tokens,
           cast(sum(cast(ceil(length(token) / 4.0) AS BIGINT)) AS BIGINT) AS bpe_ish_tokens
    FROM tok GROUP BY 1
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish estimate (4 chars
    per subword piece) — the budget metric of every LLM data pipeline."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    return tok.groupBy("doc_id").agg(
        F.count("*").alias("ws_tokens"),
        F.sum(F.ceil(F.length("token") / 4.0).cast("long"))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


_BPE_DUCK = (
    f"cast(list_aggregate(list_transform({_TOKENS_DUCK}, "
    "t -> cast(ceil(length(t) / 4.0) AS BIGINT)), 'sum') AS BIGINT)"
)


@op(
    "corpus_curation",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, lang, text,
             length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) * 1.0
               / length(text) AS punct_ratio,
             ({_HITS_SQL}) AS hits
      FROM documents WHERE length(text) > 50),
    kept AS (
      SELECT * FROM quality WHERE punct_ratio < 0.2 AND hits >= 1),
    survivors AS (
      SELECT min(doc_id) AS doc_id
      FROM kept GROUP BY md5(lower(trim(text))))
    SELECT k.lang,
           count(*) AS n_docs,
           cast(sum({_BPE_DUCK.replace('text', 'k.text')}) AS BIGINT) AS total_bpe_tokens,
           round(avg(length(k.text)), 4) AS avg_chars
    FROM kept k JOIN survivors s ON k.doc_id = s.doc_id
    GROUP BY 1
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data curation slice — the composite query an
    LLM data pipeline actually runs, as ONE declarative plan:

      1. quality gate (length > 50, punct_ratio < 0.2, ≥1 stopword hit)
         — pure row filters, pushed to the scan;
      2. exact dedup — group by content hash, survivor = min doc_id,
         semi-joined back (shuffles carry the 32-byte hash + doc_id,
         never text);
      3. token budget — per-language doc counts, BPE-ish token totals,
         avg length (the "what did curation keep" report).

    At 100 TB each stage keeps its scale shape: filters prune before
    the dedup shuffle, the survivor set is ids only, and the final agg
    is |langs| rows. Swap stage 2's content hash for dedup_cluster's
    verdict to go near-dup instead of exact."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 50)
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    hits = sum(
        F.when(padded.like(f"% {w} %"), 1).otherwise(0) for w in _STOPWORDS
    )
    punct_ratio = (
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")) * 1.0 / F.length("text")
    )
    kept = d.where((punct_ratio < 0.2) & (hits >= 1))
    # r17 (guide §2.4): the survivor row IS min_by(row, doc_id) within
    # each content-hash group, so stage 2 needs ONE aggregate instead
    # of the old min-doc_id groupBy + broadcast semi-join back onto a
    # SECOND scan of kept (plan: 2 parquet scans + BroadcastExchange ->
    # 1 scan, no broadcast; the min_by partial-aggregates map-side).
    # Equivalent because doc_id is the documents primary key: the rows
    # whose doc_id equals their group's min are exactly the min_by
    # picks, same lang/text values into the stage-3 report.
    survivors = kept.groupBy(
        F.md5(F.lower(F.trim("text"))).alias("content_hash")
    ).agg(F.min_by(F.struct("lang", "text"), F.col("doc_id")).alias("s"))
    bpe = F.aggregate(
        F.transform(_tokens(), lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        survivors.select(
            F.col("s.lang").alias("lang"), F.col("s.text").alias("text")
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(bpe).cast("long").alias("total_bpe_tokens"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        )
    )


# training-mix fractions per language stratum (en-heavy, the usual shape)
_MIX = {"en": 0.5, "de": 0.3}
_MIX_DEFAULT = 0.2
_MIX_DUCK = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX.items())
    + f" ELSE {_MIX_DEFAULT} END"
)


@op(
    "sample_stratified",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS stratum_n
      FROM documents)
    SELECT doc_id, lang, cast(rn AS BIGINT) AS rn,
           cast(stratum_n AS BIGINT) AS stratum_n
    FROM ranked
    WHERE rn <= ceil(({_MIX_DUCK}) * stratum_n)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the training-mix operator:
    each language stratum contributes exactly ceil(frac × |stratum|)
    documents, selected by md5-of-id rank so the draw is uniform,
    seedless, and rerun-stable (same corpus ⟹ same sample, the
    property a reproducible data pipeline needs).

    Scale: one shuffle on lang; both windows share the partitioning
    (one Exchange). A 100-TB stratum makes the rank window sort-heavy —
    the scale path keeps the same semantics via a hash threshold
    (keep when md5(id) < quantile cutoff from an approx_percentile
    pass), trading exact quota for O(1) memory; the rank form here is
    the oracle-checkable contract both must satisfy.
    """
    d = load_table(spark, sf_dir, "documents")
    frac = None
    for k, v in _MIX.items():
        frac = F.when(F.col("lang") == k, v) if frac is None else frac.when(
            F.col("lang") == k, v
        )
    frac = frac.otherwise(_MIX_DEFAULT)
    w_ord = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    w_all = W.partitionBy("lang")
    ranked = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w_ord).cast("long").alias("rn"),
        F.count("*").over(w_all).alias("stratum_n"),
        frac.alias("frac"),
    )
    return ranked.where(
        F.col("rn") <= F.ceil(F.col("frac") * F.col("stratum_n"))
    ).select("doc_id", "lang", "rn", "stratum_n")


# PII patterns — restricted to the Java-regex ∩ RE2 portable subset
# (\d, \b, bounded repeats; no lookaround) so Spark and DuckDB see the
# same language. Order matters: emails first (they contain digit runs),
# then IPs, then bare long digit runs.
_PII = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("longnum", r"\b\d{6,}\b", "<NUM>"),
)


def scrub_pii(col):
    """Chained redaction of the _PII patterns over a lowercased column
    (the reusable transform; the registered op below adds counts)."""
    out = F.lower(col)
    for _, pat, repl in _PII:
        out = F.regexp_replace(out, pat, repl)
    return out


def _pii_oracle() -> str:
    scrub = "lower(text)"
    for _, pat, repl in _PII:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    counts = ", ".join(
        f"cast(len(regexp_extract_all(lower(text), '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in _PII
    )
    return f"""
    SELECT doc_id, md5({scrub}) AS scrubbed_md5, {counts}
    FROM documents
    """


@op("text_pii_scrub", oracle=_pii_oracle())
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails / IPv4s / long digit runs replaced by
    typed placeholders, plus per-doc match counts — the scrub every
    pre-training pipeline runs before tokenization. Pure regexp
    expressions (codegen'd, no Python); emitted as md5 of the scrubbed
    text so the result is driver-hashable and diff-able."""
    d = load_table(spark, sf_dir, "documents")
    counts = [
        F.regexp_count(F.lower("text"), F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in _PII
    ]
    return d.select("doc_id", F.md5(scrub_pii(F.col("text"))).alias("scrubbed_md5"), *counts)


@op(
    "text_repetition",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS token FROM documents),
    wc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2)
    SELECT doc_id,
           cast(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           cast(max(c) AS BIGINT) AS top_count,
           count(*) * 1.0 / cast(sum(c) AS BIGINT) AS distinct_ratio,
           cast(max(c) AS BIGINT) * 1.0 / cast(sum(c) AS BIGINT) AS top_word_fraction,
           cast(count(*) * 1.0 / cast(sum(c) AS BIGINT) > 0.3
                AND cast(max(c) AS BIGINT) * 1.0 / cast(sum(c) AS BIGINT) < 0.2
                AS BIGINT) AS keep
    FROM wc GROUP BY 1
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (Gopher-rule style): distinct
    token ratio and most-frequent-token fraction per document, plus the
    keep/drop verdict (distinct_ratio > 0.3 AND top_word_fraction <
    0.2). Two partial-agg'd shuffles — (doc_id, token) then doc_id —
    carrying only ids and counts; ratios are int/int divisions, so
    bit-identical cross-engine with no rounding."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    wc = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_count"),
    )
    distinct_ratio = F.col("n_distinct") * 1.0 / F.col("n_tokens")
    top_frac = F.col("top_count") * 1.0 / F.col("n_tokens")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "top_count",
        distinct_ratio.alias("distinct_ratio"),
        top_frac.alias("top_word_fraction"),
        ((distinct_ratio > 0.3) & (top_frac < 0.2)).cast("long").alias("keep"),
    )


@op(
    "text_fingerprint_rolling",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 list_filter(string_split(lower(text), ' '), t -> t <> ''),
                 t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT))),
             (acc, h) -> (acc * 31 + h) % 1000000007) AS rolling_fp
    FROM documents
    """,
)
def text_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: polynomial rolling hash over PORTABLE
    md5-derived token hashes (left fold, mod 1e9+7 keeps acc·31 + h
    within int64 for 60-bit h) — entirely in higher-order functions,
    JVM-side, and byte-identical in the DuckDB oracle (list_reduce with
    a prepended 0 is the same left fold)."""
    from slowlog2clickhouse_spark.operators.dedup import portable_hash60

    d = load_table(spark, sf_dir, "documents")
    token_hashes = F.transform(_tokens(), lambda t: portable_hash60(t))
    rolling = F.aggregate(
        token_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % 1000000007,
    )
    return d.select("doc_id", rolling.alias("rolling_fp"))


# decontamination n-gram width. Production runs on real corpora use
# 8-13 token n-grams (the published train/test-overlap convention); the
# synthetic corpus has a ~40-word vocabulary, so 4 keeps enough overlap
# for the oracle to exercise the join path.
_DECON_N = 4


@op(
    "text_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(t[i:i+{_DECON_N - 1}], ' ') AS gram
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {_DECON_N - 2})) AS i) s
      WHERE len(t) >= {_DECON_N}),
    eval_grams AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 100 < 2)
    SELECT g.doc_id, cast(count(DISTINCT g.gram) AS BIGINT) AS n_hit
    FROM grams g JOIN eval_grams e USING (gram)
    WHERE g.doc_id % 100 >= 2
    GROUP BY g.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training documents sharing any
    token n-gram with the held-out benchmark slice (docs with
    doc_id % 100 < 2 stand in for the eval suites). Output is one row
    per contaminated training doc with its distinct overlapping-gram
    count — the standard pre-training overlap filter.

    Scale: n-gram explode is map-side (fan-out ×|doc|, no shuffle);
    the eval-gram set is DISTINCT over the tiny benchmark slice and is
    explicitly broadcast, so the 100-TB training side never shuffles
    until the final partial-agg'd groupBy on doc_id. At real scale the
    gram string would be replaced by xxhash64(gram) to shrink the
    broadcast and the shuffle keys — same plan shape.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    g = d.where(F.size("t") >= _DECON_N).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {_DECON_N - 1}),"
                f" i -> concat_ws(' ', slice(t, i, {_DECON_N})))"
            )
        ).alias("gram"),
    )
    ev = g.where(F.col("doc_id") % 100 < 2).select("gram").distinct()
    return (
        g.where(F.col("doc_id") % 100 >= 2)
        .join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_hit"))
    )


_PACK_BUDGET = 512  # tokens per training sequence (context window)
_PACK_SHARDS = 16


def first_fit_decreasing(sizes, budget):
    """Pure packing core shared by pack_sequences and its hypothesis
    property tests: sizes (already sorted desc by caller, or not —
    assignment follows input order) → bin index per element. Oversize
    elements get a bin alone (capacity clamps at 0)."""
    remaining: list[int] = []
    assigned: list[int] = []
    for tc in sizes:
        # first-fit over open bins; production swaps the linear scan
        # for a capacity-bucketed index, same assignment semantics
        for bi, cap in enumerate(remaining):
            if cap >= tc:
                remaining[bi] = cap - tc
                assigned.append(bi)
                break
        else:
            remaining.append(max(budget - tc, 0))
            assigned.append(len(remaining) - 1)
    return assigned


# First-fit-decreasing IS SQL-expressible: a recursive CTE walks each
# shard's docs in (tokens desc, doc_id) order carrying the open-bin
# remainders as a BIGINT[] — one recursion step per doc, all shards
# advancing in parallel rows. `fit` (first bin with capacity) is the
# inlined list_filter(...)[1] expression; arithmetic is all-integer,
# so the bin assignment matches Spark's Python packer exactly.
_FIT = (
    "list_filter(range(1, len(st.rem) + 1),"
    " j -> st.rem[j] >= o.n_tokens)[1]"
)

_PACK_DUCK = f"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             CAST(len({_TOKENS_DUCK}) AS BIGINT) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % {{shards}} AS shard
      FROM documents),
    ord AS MATERIALIZED (
      SELECT d.*, row_number() OVER (
          PARTITION BY shard ORDER BY n_tokens DESC, doc_id) AS rn
      FROM d),
    st AS (
      SELECT shard, CAST(0 AS BIGINT) AS rn, CAST(NULL AS BIGINT) AS doc_id,
             CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS bin_id,
             CAST([] AS BIGINT[]) AS rem
      FROM (SELECT DISTINCT shard FROM ord) seed
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN {_FIT} IS NULL THEN len(st.rem)
                  ELSE {_FIT} - 1 END AS bin_id,
             CASE WHEN {_FIT} IS NULL
                  THEN list_append(st.rem,
                                   greatest({{budget}} - o.n_tokens, 0))
                  ELSE list_transform(range(1, len(st.rem) + 1),
                         j -> CASE WHEN j = {_FIT}
                              THEN st.rem[j] - o.n_tokens
                              ELSE st.rem[j] END)
             END AS rem
      FROM st JOIN ord o ON o.shard = st.shard AND o.rn = st.rn + 1)
    SELECT doc_id, shard, bin_id, n_tokens
    FROM st WHERE doc_id IS NOT NULL
    """


@op(
    "pack_sequences",
    oracle=_PACK_DUCK.format(shards=_PACK_SHARDS, budget=_PACK_BUDGET),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign every document to a fixed-token-budget
    training sequence (bin) — the step that turns a curated corpus into
    dense context-window examples. First-fit-decreasing within hash
    shards; output is the doc→(shard, bin) assignment map plus the
    doc's token count, so downstream writers can group-concatenate.

    Scale: packing is embarrassingly parallel across shards — one
    shuffle on pmod(md5-derived hash(doc_id), 16), then a pure
    Arrow-batched applyInPandas per shard; no global coordination, and
    shard count scales with the cluster (set it to ~2× executors at
    100 TB; bin utilization loss vs global packing is <1% for doc
    length ≪ budget). Deterministic: the md5 shard key is portable
    (SURVEY §7 G8 — the oracle re-derives it) and the per-shard sort
    is (tokens desc, doc_id), so reruns produce identical bins. tests/test_text_curation.py pins the invariants:
    exact partition of the corpus, no bin over budget (unless a single
    oversize doc), rerun-stable assignment.
    """
    import pandas as pd

    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(_tokens()).cast("long").alias("n_tokens"),
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("long"),
                F.lit(_PACK_SHARDS),
            )
            .cast("long")
            .alias("shard"),
        )
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["bin_id"] = pd.Series(
            first_fit_decreasing(list(pdf["n_tokens"]), _PACK_BUDGET),
            dtype="int64",
        )
        return pdf[["doc_id", "shard", "bin_id", "n_tokens"]]

    return d.groupBy("shard").applyInPandas(
        _pack, "doc_id long, shard long, bin_id long, n_tokens long"
    )


@op(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS norm,
           cast(length(text) AS BIGINT) AS chars_before,
           cast(length(trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT)
             AS chars_after
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — lowercase, strip non-alnum,
    collapse runs of spaces, trim — the first stage of every curation
    pipeline (exact-dedup keys are computed on THIS form, not raw
    text). Patterns stay in the Java-regex ∩ RE2 portable subset so
    both engines see the same language. Pure map-side codegen: zero
    shuffles, scales linearly with corpus bytes.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return d.select(
        "doc_id",
        norm.alias("norm"),
        F.length("text").cast("long").alias("chars_before"),
        F.length(norm).cast("long").alias("chars_after"),
    )


@op(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_DUCK}) AS token FROM documents),
    freq AS (
      SELECT token, count(*) AS c FROM tok GROUP BY 1),
    total AS (SELECT sum(c) AS t FROM freq)
    SELECT tok.doc_id,
           cast(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(freq.c * 1.0 / total.t)), 6) AS avg_neg_logprob
    FROM tok JOIN freq USING (token) CROSS JOIN total
    GROUP BY 1
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM fluency score (the CCNet-style perplexity proxy):
    train token frequencies on the corpus itself, score each document
    by its mean negative log-probability — low = stereotypical text,
    high = rare-token soup; curation keeps the middle band.

    Scale: one (token) shuffle to build the LM, which is |vocab|-sized
    and broadcast back; the scoring join is map-side against that
    broadcast, then one partial-agg'd groupBy on doc_id. Works
    unchanged when the LM comes from a reference corpus instead of
    self-training (swap the freq input). ln is libm-dependent →
    rounded 6 (G8)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    return (
        tok.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") * 1.0 / F.col("t"))), 6).alias(
                "avg_neg_logprob"
            ),
        )
    )


@op(
    "fuzzy_match_levenshtein",
    oracle="""
    WITH names AS (
      SELECT p_name, cast(count(*) AS BIGINT) AS cnt FROM part GROUP BY 1)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           cast(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
           cast(a.cnt * b.cnt AS BIGINT) AS n_pairs
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching, scale-right: compare DISTINCT
    values, not rows. Rows collapse to (name, count) first — identical
    strings are exact-dup territory (dedup_exact), and comparing them
    pairwise is quadratic in their multiplicity for zero information.
    Candidates come from an equi-join on a blocking key (the noun
    token — after the distinct collapse a block is at most
    |adjective vocabulary| names, bounded regardless of corpus size);
    levenshtein (JVM codegen) runs only inside blocks of distinct
    names; n_pairs carries the row-level pair count
    the match represents. At 100 TB the distinct-value table is
    vocabulary-sized — orders of magnitude under the row count — and
    every stage is a hash shuffle on the block key. Measured: the
    row-level formulation produced 3.1M pairs in 77 s at sf0.1; this
    one produces the same information in ~1 s."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count("*").alias("cnt"))
        .withColumn("blk", F.split_part("p_name", F.lit(" "), F.lit(2)))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("cnt").alias("cnt_a"), "blk"
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("cnt").alias("cnt_b"), "blk"
    )
    return (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("edit_dist") <= 4)
        .select(
            "name_a",
            "name_b",
            "edit_dist",
            (F.col("cnt_a") * F.col("cnt_b")).alias("n_pairs"),
        )
    )


@op(
    "text_ngram_topk",
    oracle="""
    WITH tok AS (
      SELECT lang,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS t
      FROM documents),
    bg AS (
      SELECT lang,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM tok WHERE len(t) >= 2),
    cnt AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2),
    rk AS (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY lang ORDER BY n DESC, bigram ASC) AS INTEGER) AS rk
      FROM cnt)
    SELECT lang, bigram, n, rk FROM rk WHERE rk <= 5
    """,
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics: the top-5 bigrams per language with a
    deterministic (count desc, bigram asc) ranking — the profiling pass
    every corpus report starts with (and the vocabulary seed for
    fingerprinting/tokenizer work).

    Scale: bigram fan-out is map-side (×|doc tokens|, no shuffle);
    the count groupBy partial-aggregates before its shuffle so network
    volume is |lang × distinct bigrams|; the per-language top-5 rides
    Spark's WindowGroupLimit rank pushdown (per-partition top-k BEFORE
    the window shuffle — plan-pinned in tests/test_plans.py).

    The token array is materialized as a column and referenced three
    times in the bigram projection — the EVALUATION-COUNT RULE shape
    (operators/dedup.py) that keeps split() from re-running per
    bigram."""
    d = load_table(spark, sf_dir, "documents")
    with_t = d.select("lang", _tokens().alias("t"))
    t = F.col("t")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    bg = with_t.where(F.size(t) >= 2).select(
        "lang", F.explode(bigrams).alias("bigram")
    )
    cnt = bg.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return cnt.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)


@op(
    "corpus_mix_rebalance",
    # per-source rate = min_count/count as an integer md5-bucket
    # threshold: floor(min*1e6/cnt) is the same IEEE double → BIGINT
    # on both engines, and the keep/drop decision is a pure function
    # of (doc_id, source) — so the oracle reproduces the exact
    # rebalanced sample, not just its expectation
    oracle="""
    WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
    mn AS (SELECT min(n_docs) AS mn FROM c),
    r AS (
      SELECT source, n_docs,
             CAST(floor(mn.mn * 1000000.0 / n_docs) AS BIGINT) AS thr
      FROM c, mn),
    s AS (
      SELECT d.source, count(*) AS n_sampled
      FROM documents d JOIN r USING (source)
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || d.source),
                                 1, 15)) AS BIGINT) % 1000000 < r.thr
      GROUP BY 1)
    SELECT r.source, r.n_docs, r.thr, coalesce(s.n_sampled, 0) AS n_sampled
    FROM r LEFT JOIN s USING (source)
    """,
)
def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing: downsample every source to the
    smallest source's size with a deterministic per-source
    hash-threshold rate — the data-mixing step of an LLM training
    pipeline (cap the over-represented crawl, keep all of the small
    curated sets), with the same retry-stable keep/drop property as
    sample_fraction.

    Scale: two tiny aggregations (per-source counts, global min) that
    broadcast back onto a map-side filter; the corpus crosses the wire
    zero times. Changing the target mixture is a driver-side constant,
    not a re-shuffle — exactly how you want mixture sweeps to work at
    100 TB (N mixtures = N map-side filters over one cached scan).
    """
    d = load_table(spark, sf_dir, "documents")
    # lazy checkpoint: counts feeds BOTH rates and the min — without it
    # each branch re-scans the corpus for its own copy of the aggregate
    counts = (
        d.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    mn = counts.agg(F.min("n_docs").alias("mn"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        "source",
        "n_docs",
        F.floor(F.col("mn") * 1000000.0 / F.col("n_docs"))
        .cast("long")
        .alias("thr"),
    )
    key = F.concat_ws("|", F.col("doc_id").cast("string"), F.col("source"))
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") % 1000000
    )
    sampled = (
        d.select("source", bucket.alias("b"))
        .join(F.broadcast(rates.select("source", "thr")), "source")
        .where(F.col("b") < F.col("thr"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"))
    )
    return (
        rates.join(sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            "thr",
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
        )
    )


@op(
    "doc_chunk_sliding",
    # starts are 1, 1+24, … ≤ greatest(1, n-31): Spark's inclusive
    # sequence(1, stop, 24) == DuckDB's exclusive range(1, stop+1, 24).
    # Chunk identity travels as md5(joined tokens) so the oracle
    # hash-checks content without hauling chunk text through compare.
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents),
    s AS (
      SELECT doc_id, t, len(t) AS n,
             unnest(range(1, greatest(1, len(t) - 31) + 1, 24)) AS start
      FROM tok WHERE len(t) > 0)
    SELECT doc_id,
           CAST((start - 1) // 24 AS INTEGER) AS chunk_idx,
           CAST(start AS INTEGER) AS start,
           CAST(least(32, n - start + 1) AS INTEGER) AS n_tokens,
           md5(array_to_string(list_slice(t, start, start + 31), ' '))
             AS chunk_md5
    FROM s
    """,
)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the RAG/context-window prep
    step: split every document into 32-token chunks with a 24-token
    stride (8-token overlap so no retrieval boundary loses context),
    emitting (doc_id, chunk_idx, start, n_tokens, md5-of-chunk).

    Scale: pure map-side fan-out — tokenize once per doc (the array is
    a named column, so split() runs once — EVALUATION-COUNT RULE),
    explode the precomputed start offsets, slice + hash per chunk. No
    shuffle at all: chunking 100 TB is embarrassingly parallel and
    this plan keeps it that way (the output inherits the scan's
    partitioning for a downstream embed/index stage)."""
    d = load_table(spark, sf_dir, "documents")
    with_t = d.select("doc_id", _tokens().alias("t")).where(F.size("t") > 0)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.size("t") - F.lit(31)),
        F.lit(24),
    )
    s = with_t.select(
        "doc_id",
        F.col("t"),
        F.size("t").alias("n"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    return s.select(
        "doc_id",
        "chunk_idx",
        "start",
        F.least(F.lit(32), F.col("n") - F.col("start") + 1).alias("n_tokens"),
        F.md5(
            F.array_join(F.slice(F.col("t"), F.col("start"), 32), " ")
        ).alias("chunk_md5"),
    )


@op(
    "text_bpe_pairs",
    # adjacent-character pairs inside words (no space in the pair) —
    # the frequency scan that picks BPE merge candidate #1. Tiebreak
    # on the pair string keeps the top-20 deterministic.
    oracle="""
    WITH ch AS (
      SELECT doc_id, lower(text) AS t FROM documents),
    p AS (
      SELECT substr(t, CAST(i AS INT), 2) AS pair
      FROM (SELECT doc_id, t, unnest(range(1, length(t))) AS i FROM ch) x),
    cnt AS (
      SELECT pair, count(*) AS n FROM p
      WHERE pair NOT LIKE '% %' AND length(pair) = 2
      GROUP BY 1),
    rk AS (
      SELECT pair, n,
             CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS INTEGER)
               AS rk
      FROM cnt)
    SELECT pair, n, rk FROM rk WHERE rk <= 20
    """,
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate scan — the inner statistic of byte-pair-
    encoding tokenizer training: count every adjacent character pair
    within words (pairs straddling a space are excluded; BPE never
    merges across word boundaries) and rank the top 20. Iterating
    this scan + merge IS tokenizer induction; one round is the
    representative kernel.

    Scale: the pair fan-out is a map-side substring explode (×|chars|,
    no Python); the aggregation's key domain is the alphabet² (~1k
    distinct pairs), so the shuffle after map-side partials is tiny
    regardless of corpus size — 100 TB of text reduces to a
    few-thousand-row pair table per round."""
    d = load_table(spark, sf_dir, "documents")
    ch = d.select(F.lower("text").alias("t"))
    pairs = ch.select(
        F.explode(F.sequence(F.lit(1), F.length("t") - 1)).alias("i"), "t"
    ).select(F.col("t").substr(F.col("i"), F.lit(2)).alias("pair"))
    cnt = (
        pairs.where(~F.col("pair").contains(" ") & (F.length("pair") == 2))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
    )
    return ranked_topk(cnt, [F.col("n").desc(), F.col("pair").asc()], 20)


@op(
    "text_oov_rate",
    # the vocab boundary is deterministic (count desc, token asc,
    # LIMIT 1000) so both engines cut the same top-1000; oov_rate is
    # int/int — exact cross-engine.
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS token
      FROM documents),
    cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
    voc AS (SELECT token FROM cnt ORDER BY n DESC, token ASC LIMIT 1000)
    SELECT t.doc_id,
           cast(count(*) AS BIGINT) AS n_tokens,
           cast(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*)
             AS oov_rate
    FROM tok t LEFT JOIN voc v USING (token)
    GROUP BY 1
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-1000 token vocabulary — the tokenizer-coverage check an LLM
    data pipeline runs before committing to a vocab (docs with high
    OOV are either noise or a domain the tokenizer will shred into
    bytes).

    Scale: the vocabulary is aggregated once (alphabet-bounded key
    domain, partial-agg'd) and then BROADCAST — the corpus-side token
    stream joins against it map-side, so the only full-data shuffle is
    the per-doc groupBy on doc_id (skew-free key). Swapping in a real
    tokenizer vocab makes the broadcast side a file, not a subquery;
    the plan is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    cnt = tok.groupBy("token").agg(F.count("*").alias("n"))
    voc = (
        cnt.orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(1000)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    joined = tok.join(F.broadcast(voc), "token", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(oov).alias("n_oov"),
        (F.sum(oov) * 1.0 / F.count("*")).alias("oov_rate"),
    )


@op(
    "text_dup_spans",
    # span identity = md5 of the 8-token window (cross-engine stable);
    # doc frequency counts DISTINCT docs so a span repeated inside one
    # page doesn't fake boilerplate
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents),
    sp AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS span_md5
      FROM (SELECT doc_id, t,
                   unnest(range(1, len(t) - 6)) AS i
            FROM tok WHERE len(t) >= 8) x),
    freq AS (
      SELECT span_md5, count(*) AS n_docs FROM sp GROUP BY 1
      HAVING count(*) >= 2)
    SELECT span_md5, cast(n_docs AS BIGINT) AS n_docs,
           cast(rk AS INTEGER) AS rk
    FROM (SELECT *, row_number() OVER (
            ORDER BY n_docs DESC, span_md5 ASC) AS rk FROM freq) t
    WHERE rk <= 50
    """,
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span (boilerplate) detector: 8-token sliding shingles,
    ranked by how many DISTINCT documents contain them — the
    span-level complement to doc-level minhash dedup (catches the
    shared footer/disclaimer that repeats across otherwise-unique
    pages; C4-style pipelines drop or down-weight these spans).

    Scale: map-side shingle fan-out (×|tokens|), per-doc distinct
    folded into the (span, doc) distinct-shuffle on the fixed-width
    md5 key, then a partial-agg'd frequency count whose HAVING ≥2
    prunes the long tail before the tiny top-50 rank. No all-pairs
    anything — boilerplate emerges from counting, not comparing."""
    d = load_table(spark, sf_dir, "documents")
    with_t = d.select("doc_id", _tokens().alias("t")).where(F.size("t") >= 8)
    t = F.col("t")
    spans = F.transform(
        F.sequence(F.lit(1), F.size(t) - 7),
        lambda i: F.md5(F.array_join(F.slice(t, i, 8), " ")),
    )
    sp = with_t.select(
        "doc_id", F.explode(spans).alias("span_md5")
    ).distinct()
    freq = (
        sp.groupBy("span_md5")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
    )
    return ranked_topk(
        freq, [F.col("n_docs").desc(), F.col("span_md5").asc()], 50
    )


@op(
    "text_idf_keywords",
    # idf = ln(N/df): natural log of an exact int ratio — libm ln is
    # correctly rounded for these magnitudes in practice, but the
    # COMPARISON key is (tf*idf) which both engines compute from
    # identical doubles; round(…, 6) before ranking removes any
    # boundary residue, and the (score, token) tiebreak pins order
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS score
      FROM tf JOIN df USING (token), n),
    rk AS (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY doc_id
          ORDER BY score DESC, token ASC) AS INTEGER) AS rk
      FROM scored)
    SELECT doc_id, token, score, rk FROM rk WHERE rk <= 3
    """,
)
def text_idf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 tokens by TF-IDF — the
    lightweight doc-tagging pass (search facets, dedup explanations,
    topic drill-downs) that needs no model, just the corpus's own
    statistics.

    Scale: tf and df are both partial-agg'd token-keyed aggregates off
    ONE tokenize pass; df (vocabulary-sized) broadcasts onto tf; the
    per-doc top-3 rides WindowGroupLimit rank pushdown (per-partition
    top-k BEFORE the window shuffle). Nothing touches raw text twice."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    # ONE tokenize pass, then everything derives from the checkpointed
    # (doc, token) rollup: df = count of tf rows per token (each row is
    # a distinct doc), n = distinct docs in tf — the docstring's
    # 'nothing touches raw text twice' made true in the executed plan
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token").asc())
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)


@op(
    "text_entropy",
    # entropy sums are ORDER-DEPENDENT doubles, so both engines fold
    # the (char, count) list in SORTED char order — a deterministic
    # summation sequence, not a rounded approximation; log2 of
    # identical int-ratio doubles is bit-stable
    oracle="""
    WITH ch AS (
      SELECT doc_id, substr(lower(text), CAST(i AS INT), 1) AS c
      FROM (SELECT doc_id, text,
                   unnest(range(1, length(text) + 1)) AS i
            FROM documents) t),
    cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
    packed AS (
      SELECT doc_id,
             list_sort(list(c)) AS chars,
             sum(n) AS total,
             map_from_entries(list(struct_pack(k := c, v := n))) AS m
      FROM cnt GROUP BY 1)
    SELECT doc_id,
           cast(len(chars) AS BIGINT) AS n_distinct_chars,
           cast(total AS BIGINT) AS n_chars,
           round(list_reduce(
             list_prepend(CAST(0 AS DOUBLE),
               list_transform(chars, c ->
                 -(m[c][1] * 1.0 / total) * log2(m[c][1] * 1.0 / total))),
             (a, x) -> a + x), 6) AS entropy_bits
    FROM packed
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality filter: Shannon entropy (bits/char)
    of each document's character distribution — the cheap detector
    for base64 blobs, minified code and keyboard-mash (entropy too
    high) and boilerplate/padding (too low) that LLM corpus pipelines
    run before any model-based scoring.

    Float discipline worth copying: an entropy is a SUM of doubles,
    and summation order is engine-dependent under hash aggregation —
    so both sides fold the per-char terms in sorted char order (a
    deterministic sequence), making the hash comparison exact instead
    of rounded-and-hopeful.

    Scale: char fan-out is map-side; the (doc, char) count groupBy
    partial-aggregates (≤ alphabet rows per doc partial); the fold
    runs over ≤|alphabet| elements per doc. The r6 sweep's 2.4× wall
    at 100× data is the map-side explode itself — entropy must touch
    every character, so the work is honestly char-proportional (same
    class as text_bpe_pairs) and scales linearly with cores; shuffle
    volume stays |docs| × |alphabet|, never raw-char-proportional."""
    d = load_table(spark, sf_dir, "documents")
    ch = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "")).alias("c"),
    ).where(F.col("c") != "")
    cnt = ch.groupBy("doc_id", "c").agg(F.count("*").alias("n"))
    packed = cnt.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("c", "n"))).alias("pairs"),
        F.sum("n").alias("total"),
    )
    term = (
        "-(x.n * 1.0 / total) * log2(x.n * 1.0 / total)"
    )
    entropy = F.expr(
        f"aggregate(pairs, CAST(0 AS DOUBLE), (a, x) -> a + {term})"
    )
    return packed.select(
        "doc_id",
        F.size("pairs").cast("long").alias("n_distinct_chars"),
        F.col("total").alias("n_chars"),
        F.round(entropy, 6).alias("entropy_bits"),
    )


@op(
    "text_lang_mismatch",
    # same stopword vote as text_langid (whose confusion MATRIX this
    # op drills into row-level); int hit counts, no floats
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN ({_HITS_SQL}) >= 2 THEN 'en' ELSE 'other' END
             AS predicted,
           cast(({_HITS_SQL}) AS BIGINT) AS stopword_hits
    FROM documents
    WHERE (CASE WHEN ({_HITS_SQL}) >= 2 THEN 'en' ELSE 'other' END)
          <> (CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END)
    """,
)
def text_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-disagreement drill-down: the DOCUMENTS where the stopword
    heuristic and the metadata lang label disagree — text_langid shows
    the confusion matrix; this emits the actionable row list (either
    the label is wrong — fix the metadata — or the doc is the kind
    the classifier fumbles — improve the classifier; both start from
    this list, the standard label-audit loop of corpus curation).

    Scale: pure map-side predicate over the scan — the disagreement
    set streams out with zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    hits = sum(
        F.when(padded.like(f"% {w} %"), 1).otherwise(0) for w in _STOPWORDS
    )
    pred = F.when(hits >= 2, "en").otherwise("other")
    label = F.when(F.col("lang") == "en", "en").otherwise("other")
    return d.select(
        "doc_id",
        "lang",
        pred.alias("predicted"),
        hits.cast("long").alias("stopword_hits"),
    ).where(pred != label)


TOKEN_BUDGET = 100_000  # bpe-ish tokens the training run may consume


@op(
    "corpus_token_budget",
    # z = Σ sqrt(tokens) is an ORDER-DEPENDENT double sum, so both
    # engines fold the per-source sqrt terms in SORTED token order
    # (the text_entropy float discipline) — exact integer token counts
    # sort identically cross-engine, so the summation sequence is
    # deterministic, not rounded-and-hopeful; everything downstream is
    # scalar IEEE math on that z; outputs rounded at 6 as the module
    # discipline
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             cast(list_aggregate(list_transform({_TOKENS_DUCK},
                    t -> cast(ceil(length(t) / 4.0) AS BIGINT)), 'sum')
                  AS BIGINT) AS toks
      FROM documents),
    per_src AS (
      SELECT source, count(*) AS n_docs, sum(toks) AS tokens
      FROM per_doc GROUP BY 1),
    tot AS (SELECT list_reduce(
              list_prepend(CAST(0 AS DOUBLE),
                list_transform(list_sort(list(tokens)), t -> sqrt(t))),
              (a, x) -> a + x) AS z FROM per_src)
    SELECT source,
           cast(n_docs AS BIGINT) AS n_docs,
           cast(tokens AS BIGINT) AS tokens,
           round({TOKEN_BUDGET} * sqrt(tokens) / z, 6) AS alloc_tokens,
           round(least(1.0, {TOKEN_BUDGET} * sqrt(tokens) / z / tokens), 6)
             AS sample_rate,
           round(least(cast(tokens AS DOUBLE),
                       {TOKEN_BUDGET} * sqrt(tokens) / z), 6)
             AS expected_tokens
    FROM per_src, tot
    """,
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation across sources — the planning step
    between corpus_mix_rebalance (equalize doc counts) and an actual
    training run: given a global token budget, split it over sources
    by temperature-scaled sampling (alpha = 0.5, the standard
    multilingual-LM mixing rule: weight ∝ tokens^alpha, boosting small
    sources without letting the largest crawl dominate), cap each
    source's allocation at its actual token supply, and report the
    per-source sampling rate that realizes the allocation.

    Scale: one map-side per-doc token count (the bpe-ish estimator of
    text_token_count), a |sources|-row aggregate, and a 1-row
    sqrt-total broadcast — the corpus never shuffles; re-planning for
    a different budget or alpha is a driver-side constant change, the
    same sweep-cheap property corpus_mix_rebalance documents."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.aggregate(
            F.transform(
                _tokens(), lambda t: F.ceil(F.length(t) / 4.0).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("toks"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("toks").alias("tokens")
    )
    # order-fixed float fold (see oracle comment): sort the exact
    # integer token totals, then sqrt+fold sequentially
    tot = per_src.agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list("tokens")), lambda t: F.sqrt(t)
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("z")
    )
    alloc = F.lit(float(TOKEN_BUDGET)) * F.sqrt("tokens") / F.col("z")
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("tokens").cast("long").alias("tokens"),
        F.round(alloc, 6).alias("alloc_tokens"),
        F.round(F.least(F.lit(1.0), alloc / F.col("tokens")), 6).alias(
            "sample_rate"
        ),
        F.round(
            F.least(F.col("tokens").cast("double"), alloc), 6
        ).alias("expected_tokens"),
    )


@op(
    "text_zipf_fit",
    # the fitted points are exact (log of integer counts / ranks —
    # scalar IEEE, bit-identical); the corpus totals are exact
    # integers broadcast from a 1-row aggregate (allowlisted bounded
    # crossJoin); regr sums over the FIXED top-100 rows, rounded at 6
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKENS_DUCK}) AS token FROM documents),
    freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
    totals AS (SELECT count(*) AS n_vocab, sum(cnt) AS n_tokens FROM freq),
    top AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
      FROM freq ORDER BY cnt DESC, token ASC LIMIT 100),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS n_top,
             round(regr_slope(ln(cnt), ln(rank)), 6) AS zipf_slope,
             round(regr_r2(ln(cnt), ln(rank)), 6) AS fit_r2
      FROM top)
    SELECT CAST(n_vocab AS BIGINT) AS n_vocab,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           n_top, zipf_slope, fit_r2
    FROM fit, totals
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health statistics via Zipf's law: natural text follows
    freq ∝ rank^(-s) with s ≈ 1, so the slope of log(freq) over
    log(rank) for the top tokens is a one-number corpus fingerprint —
    machine-generated spam, template farms and over-deduplicated
    corpora bend it visibly (|slope| too small = suspiciously flat
    head; r² collapse = not Zipfian at all). The gate a data-mixing
    pipeline runs per source BEFORE trusting token-budget math.

    Scale: token counting is the vocab-bounded shuffle every text op
    here pays; the top-100 head comes from orderBy+limit
    (TakeOrderedAndProject — per-partition heaps, no global sort) and
    the regression runs over those 100 points; corpus totals are a
    1-row aggregate broadcast in."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = freq.agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum("cnt").cast("long").alias("n_tokens"),
    )
    top = ranked_topk(
        freq, [F.col("cnt").desc(), F.col("token").asc()], 100, rank_col="rank"
    )
    fit = top.agg(
        F.count(F.lit(1)).alias("n_top"),
        F.round(F.regr_slope(F.log("cnt"), F.log("rank")), 6).alias(
            "zipf_slope"
        ),
        F.round(F.regr_r2(F.log("cnt"), F.log("rank")), 6).alias("fit_r2"),
    )
    return fit.crossJoin(F.broadcast(totals)).select(
        "n_vocab", "n_tokens", "n_top", "zipf_slope", "fit_r2"
    )
