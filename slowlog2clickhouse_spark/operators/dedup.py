"""Deduplication operators — SURVEY.md §2 I / BASELINE north star.

The five standard LLM-corpus dedup levels over `documents` /
`embeddings`:

  exact          md5 of normalized text, hash-groupBy        (oracle)
  ngram-jaccard  token-set overlap on candidate pairs        (oracle)
  minhash-LSH    shingle → xxhash64 minhash sigs → band join (rows)
  simhash        bitwise majority of token hashes + hamming  (rows)
  embedding      cosine near-dup on candidate pairs          (oracle)

Scale design: exact & minhash & simhash shuffle on a HASH key (never
on raw text — keys are fixed-width); candidate generation is always
band/bucket-join (linear-ish), never an all-pairs cross join. The
bounded `doc_id` windows used by the oracle-checked pair ops exist
only to keep the oracle evaluable — the LSH ops are the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.registry import op

# ---------------------------------------------------------------------------


@op(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest doc_id
    (deterministic survivor — never dropDuplicates, G7). Shuffle key
    is the 32-byte hash, so the plan is skew-free even on boilerplate-
    heavy corpora."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(
        F.md5(F.lower(F.trim("text"))).alias("content_hash")
    ).agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))


_TOK_DUCK = "list_filter(string_split(lower(text), ' '), t -> t <> '')"


@op(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest({_TOK_DUCK}) AS token FROM documents),
    sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      FROM tok a JOIN tok b
        ON a.token = b.token AND a.doc_id < b.doc_id
       AND b.doc_id - a.doc_id <= 3
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, common,
           common * 1.0 / (sa.sz + sb.sz - common) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE common * 1.0 / (sa.sz + sb.sz - common) > 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup over candidate pairs (bounded doc_id
    window keeps the oracle small; production candidates come from
    dedup_minhash's band join). jaccard = int/int → exact cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens_col()).alias("token")).distinct()
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.doc_id") - F.col("a.doc_id") <= 3),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    j = (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "common",
            (
                F.col("common") * 1.0 / (F.col("sa.sz") + F.col("sb.sz") - F.col("common"))
            ).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") > 0.2)


def _tokens_col(col="text"):
    return F.filter(F.split(F.lower(col), " "), lambda t: t != "")


# ---------------------------------------------------------------------------
# MinHash + LSH (rows-only: xxhash64 is engine-specific)
# ---------------------------------------------------------------------------

N_HASHES = 16
BAND_SIZE = 4  # 4 bands x 4 rows


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """doc_id → n_hashes minhash values over 3-token shingles.

    All JVM-side: shingles via sequence+slice higher-order fns,
    hash family = xxhash64(shingle, seed_i). One explode + one
    groupBy(doc_id) — shuffle carries (doc, shingle-hash) pairs only.
    """
    tokens = _tokens_col()
    n = F.size(tokens)
    shingles = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.array_join(F.slice(tokens, i, 3), " "),
        ),
    ).otherwise(F.array(F.array_join(tokens, " ")))
    sh = docs.select("doc_id", F.explode(shingles).alias("shingle"))
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


@op("dedup_minhash")  # rows-only (G8)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates: banded signature equi-join —
    the scalable candidate generator (no cross join anywhere; the only
    shuffles are the signature groupBy and the band self-join, both on
    hash keys)."""
    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(d)
    bands = []
    for b in range(N_HASHES // BAND_SIZE):
        cols = [F.col(f"mh_{b * BAND_SIZE + r}") for r in range(BAND_SIZE)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.xxhash64(*cols).alias("band_sig"),
            )
        )
    banded = bands[0]
    for x in bands[1:]:
        banded = banded.unionByName(x)
    a = banded.alias("a")
    b2 = banded.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return cand


# ---------------------------------------------------------------------------
# SimHash (rows-only)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


@op("dedup_simhash")  # rows-only (G8)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: per-bit majority vote over token hashes, then hamming-
    distance pairing within a candidate window. bit_count(xor) is a
    single codegen'd expression — comparing two docs costs ~1 cycle,
    which is the whole point of simhash at corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens_col()).alias("token"))
    h = tok.withColumn("h", F.xxhash64("token"))
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"bit_{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sim = sum(
        F.when(F.col(f"bit_{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(SIMHASH_BITS)
    )
    sigs = bit_sums.select("doc_id", sim.alias("simhash"))
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.doc_id") - F.col("a.doc_id") <= 5),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= 12)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (oracle-checked)
# ---------------------------------------------------------------------------


@op(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)), list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON b.vec_id - a.vec_id BETWEEN 1 AND 5
    WHERE round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)), list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) > 0.15
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup on a bounded candidate window (the
    ANN-bucketed variant is vec_knn_lsh). Cosine in pure higher-order
    fns — zip_with dot product, aggregate norms — all JVM-side."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    a = e.select(F.col("vec_id").alias("vec_a"), emb_d.alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), emb_d.alias("eb"))
    add = lambda acc, x: acc + x  # noqa: E731
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), add
    )
    na = F.sqrt(F.aggregate(F.transform("ea", lambda x: x * x), F.lit(0.0), add))
    nb = F.sqrt(F.aggregate(F.transform("eb", lambda x: x * x), F.lit(0.0), add))
    pairs = a.join(
        b, (F.col("vec_b") - F.col("vec_a")).between(1, 5)
    ).select("vec_a", "vec_b", F.round(dot / (na * nb), 6).alias("cos_sim"))
    return pairs.where(F.col("cos_sim") > 0.15)
