"""PII scrub and repetition-signal semantics on crafted rows plus
invariants over the real documents table (SURVEY.md §2 L)."""

from __future__ import annotations

import pyspark.sql.functions as F

from slowlog2clickhouse_spark.operators.text import _PII, scrub_pii
from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()


def test_scrub_pii_crafted(spark):
    df = spark.createDataFrame(
        [
            ("Contact John.Doe+x@Example.COM now", "contact <EMAIL> now"),
            ("src 10.0.0.1 dst 192.168.255.254", "src <IP> dst <IP>"),
            ("card 1234567890 pin 12345", "card <NUM> pin 12345"),
            ("mixed a@b.io at 8.8.8.8 id 999999", "mixed <EMAIL> at <IP> id <NUM>"),
            ("clean text stays clean", "clean text stays clean"),
        ],
        "text string, want string",
    )
    got = df.select("want", scrub_pii(F.col("text")).alias("got")).collect()
    for r in got:
        assert r["got"] == r["want"]


def test_scrub_pii_counts_match_patterns(spark):
    df = spark.createDataFrame(
        [("a@b.io and c@d.net via 1.2.3.4 ref 77777777",)], "text string"
    )
    counts = df.select(
        *[
            F.regexp_count(F.lower("text"), F.lit(pat)).alias(name)
            for name, pat, _ in _PII
        ]
    ).collect()[0]
    assert counts["email"] == 2 and counts["ip"] == 1 and counts["longnum"] == 1


def test_pii_scrub_op_is_total(spark, sf_dir):
    """Every document gets a row; md5 output is 32 hex chars."""
    rows = OPS["text_pii_scrub"].fn(spark, sf_dir).collect()
    from slowlog2clickhouse_spark.io import load_table

    assert len(rows) == load_table(spark, sf_dir, "documents").count()
    assert all(len(r["scrubbed_md5"]) == 32 for r in rows)


def test_repetition_invariants_and_keep_rule(spark, sf_dir):
    rows = OPS["text_repetition"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_tokens"]
        assert 1 <= r["top_count"] <= r["n_tokens"]
        assert abs(r["distinct_ratio"] - r["n_distinct"] / r["n_tokens"]) < 1e-12
        assert abs(r["top_word_fraction"] - r["top_count"] / r["n_tokens"]) < 1e-12
        want_keep = int(r["distinct_ratio"] > 0.3 and r["top_word_fraction"] < 0.2)
        assert r["keep"] == want_keep


def test_repetition_flags_degenerate_doc(spark):
    """A one-token-repeated doc must be dropped, a diverse one kept —
    run the same expressions the op uses over crafted docs."""
    from slowlog2clickhouse_spark.operators.text import _tokens

    df = spark.createDataFrame(
        [(1, "spam " * 50), (2, "the quick brown fox jumps over lazy dogs daily")],
        "doc_id long, text string",
    )
    tok = df.select("doc_id", F.explode(_tokens()).alias("token"))
    wc = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count("*").alias("d"), F.max("c").alias("m")
    )
    got = {
        r["doc_id"]: (r["d"] / r["n"] > 0.3 and r["m"] / r["n"] < 0.2)
        for r in agg.collect()
    }
    assert got == {1: False, 2: True}


def test_stratified_sample_quotas_exact_and_stable(spark, sf_dir):
    """Each lang contributes exactly ceil(frac × stratum) docs, and two
    runs select the SAME doc ids (seedless determinism)."""
    import math

    from slowlog2clickhouse_spark.io import load_table
    from slowlog2clickhouse_spark.operators.text import _MIX, _MIX_DEFAULT

    rows = OPS["sample_stratified"].fn(spark, sf_dir).collect()
    strata = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    got = {}
    for r in rows:
        got.setdefault(r["lang"], set()).add(r["doc_id"])
        assert r["stratum_n"] == strata[r["lang"]]
    for lang, ids in got.items():
        want = math.ceil(_MIX.get(lang, _MIX_DEFAULT) * strata[lang])
        assert len(ids) == want, (lang, len(ids), want)
    rerun = {
        (r["lang"], r["doc_id"])
        for r in OPS["sample_stratified"].fn(spark, sf_dir).collect()
    }
    assert rerun == {(lang, i) for lang, ids in got.items() for i in ids}


def test_pack_sequences_invariants(spark, sf_dir):
    """Every doc assigned exactly once; no bin over budget unless it
    holds a single oversize doc; rerun gives identical assignment."""
    from slowlog2clickhouse_spark.io import load_table
    from slowlog2clickhouse_spark.operators.text import _PACK_BUDGET

    rows = OPS["pack_sequences"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    bins = {}
    for r in rows:
        bins.setdefault((r["shard"], r["bin_id"]), []).append(r["n_tokens"])
    for (shard, bin_id), toks in bins.items():
        if sum(toks) > _PACK_BUDGET:
            assert len(toks) == 1, (shard, bin_id, toks)
    rerun = {
        (r["doc_id"], r["shard"], r["bin_id"])
        for r in OPS["pack_sequences"].fn(spark, sf_dir).collect()
    }
    assert rerun == {(r["doc_id"], r["shard"], r["bin_id"]) for r in rows}


def test_doc_chunk_sliding_tiles_every_doc(spark, sf_dir):
    from collections import defaultdict

    rows = OPS["doc_chunk_sliding"].fn(spark, sf_dir).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    assert by_doc
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        # contiguous 0-based chunk ids at a fixed 24-token stride
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        assert all(c["start"] == 1 + 24 * c["chunk_idx"] for c in chunks)
        # all chunks are full 32-gram windows except possibly the last,
        # and the last window reaches the end of the token stream
        assert all(c["n_tokens"] == 32 for c in chunks[:-1])
        last = chunks[-1]
        assert 0 < last["n_tokens"] <= 32
        n_doc = last["start"] + last["n_tokens"] - 1
        if len(chunks) > 1:
            # stride < size ⇒ overlap: next window starts inside prev
            assert chunks[1]["start"] <= chunks[0]["start"] + 32
            # the doc actually needed more than one window
            assert n_doc > 32


def test_bpe_pairs_ranked_within_word_only(spark, sf_dir):
    rows = OPS["text_bpe_pairs"].fn(spark, sf_dir).collect()
    rows.sort(key=lambda r: r["rk"])
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 20
    for prev, cur in zip(rows, rows[1:]):
        # count-desc with pair-asc tiebreak
        assert (prev["n"], cur["pair"]) >= (cur["n"], prev["pair"])
    for r in rows:
        assert len(r["pair"]) == 2 and " " not in r["pair"]


def test_oov_rate_bounds_and_common_docs_low(spark, sf_dir):
    rows = OPS["text_oov_rate"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_tokens"] > 0
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_rate"] - r["n_oov"] / r["n_tokens"]) < 1e-12
    # with a synthetic vocab this small the corpus's own top-1000
    # covers most tokens: the median doc should be mostly in-vocab
    rates = sorted(r["oov_rate"] for r in rows)
    assert rates[len(rates) // 2] < 0.5


def test_dup_spans_are_really_cross_doc(spark, sf_dir):
    rows = OPS["text_dup_spans"].fn(spark, sf_dir).collect()
    assert rows
    rows.sort(key=lambda r: r["rk"])
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert prev["n_docs"] >= cur["n_docs"]
    assert all(r["n_docs"] >= 2 for r in rows)


def test_idf_keywords_prefer_rare_tokens(spark, sf_dir):
    from collections import defaultdict

    rows = OPS["text_idf_keywords"].fn(spark, sf_dir).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    assert by_doc
    for doc, kws in by_doc.items():
        kws.sort(key=lambda r: r["rk"])
        assert [k["rk"] for k in kws] == list(range(1, len(kws) + 1))
        assert len(kws) <= 3
        for prev, cur in zip(kws, kws[1:]):
            assert (prev["score"], cur["token"]) >= (cur["score"], prev["token"])
        assert all(k["score"] >= 0 for k in kws)


def test_entropy_bounds_and_uniformity_extremes(spark, sf_dir):
    import math

    rows = OPS["text_entropy"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_chars"] > 0
        # 0 <= H <= log2(distinct chars)
        assert -1e-9 <= r["entropy_bits"] <= math.log2(max(r["n_distinct_chars"], 2)) + 1e-9


def test_curation_funnel_is_monotone_and_consistent(spark, sf_dir):
    rows = {r["stage"]: r["n"] for r in OPS["llm_curation_funnel"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"total", "quality", "exact_dedup", "near_dedup", "chunks"}
    assert rows["total"] >= rows["quality"] >= rows["exact_dedup"] >= rows["near_dedup"] > 0
    # every surviving doc yields at least one chunk
    assert rows["chunks"] >= rows["near_dedup"]


def test_token_budget_allocation_invariants(spark, sf_dir):
    """corpus_token_budget: allocations sum to the budget (nothing lost
    by the temperature split), every rate is in (0, 1], expected tokens
    never exceed supply, and smaller sources get a HIGHER sampling rate
    than larger ones (the point of alpha < 1 temperature mixing)."""
    from slowlog2clickhouse_spark.operators.text import TOKEN_BUDGET

    rows = OPS["corpus_token_budget"].fn(spark, sf_dir).collect()
    assert len(rows) >= 2
    assert abs(sum(r["alloc_tokens"] for r in rows) - TOKEN_BUDGET) < 1e-3
    by_tokens = sorted(rows, key=lambda r: r["tokens"])
    for r in rows:
        assert 0.0 < r["sample_rate"] <= 1.0
        assert r["expected_tokens"] <= r["tokens"] + 1e-6
        assert (
            abs(r["expected_tokens"] - min(r["tokens"], r["alloc_tokens"]))
            < 1e-3
        )
    for small, big in zip(by_tokens, by_tokens[1:]):
        assert small["sample_rate"] >= big["sample_rate"] - 1e-9


def test_zipf_fit_matches_numpy_and_is_sane(spark, sf_dir):
    """Slope recomputed with numpy over the same top-100 (freq, rank)
    points; a natural-ish corpus gives a negative slope and a head no
    larger than the vocabulary."""
    import numpy as np

    from slowlog2clickhouse_spark.io import load_table

    row = OPS["text_zipf_fit"].fn(spark, sf_dir).collect()[0]
    assert 0 < row["n_top"] <= min(100, row["n_vocab"])
    assert row["n_tokens"] >= row["n_vocab"]
    assert row["zipf_slope"] < 0
    freq = sorted(
        (
            (r["cnt"], r["token"])
            for r in load_table(spark, sf_dir, "documents")
            .select(F.explode(F.filter(F.split(F.lower("text"), " "), lambda t: t != "")).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        ),
        key=lambda p: (-p[0], p[1]),
    )[:100]
    x = np.log(np.arange(1, len(freq) + 1, dtype=float))
    y = np.log(np.array([p[0] for p in freq], dtype=float))
    slope = float(np.polyfit(x, y, 1)[0])
    assert abs(row["zipf_slope"] - slope) < 1e-4
