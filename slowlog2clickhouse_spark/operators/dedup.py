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
    # The ≤3 window joins on (token, block) — block = floor(doc_id/4),
    # probe side exploded to its two adjacent blocks — so the self-join
    # key includes the window and per-key groups stay tiny even when a
    # token is corpus-frequent. Joining on token alone makes hot tokens
    # quadratic (the tiny synthetic vocab turned that into 560M
    # candidate pairs at sf0.1).
    blk = 4
    a = tok.select(
        F.col("doc_id").alias("a_doc"),
        F.col("token").alias("a_tok"),
        F.explode(
            F.array(
                F.floor(F.col("doc_id") / blk),
                F.floor(F.col("doc_id") / blk) + 1,
            )
        ).alias("jblk"),
    )
    b = tok.select(
        F.col("doc_id").alias("b_doc"),
        F.col("token").alias("b_tok"),
        F.floor(F.col("doc_id") / blk).alias("jblk"),
    )
    pairs = (
        a.join(b, (F.col("a_tok") == F.col("b_tok")) & (a["jblk"] == b["jblk"]))
        .where(
            (F.col("a_doc") < F.col("b_doc"))
            & (F.col("b_doc") - F.col("a_doc") <= 3)
        )
        .groupBy(
            F.col("a_doc").alias("doc_a"), F.col("b_doc").alias("doc_b")
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

    All JVM-side AND shuffle-free — a pure map over the corpus, so at
    100 TB the signature stage costs one scan and zero network:

      * tokens are hashed ONCE (``transform(tokens, xxhash64)``);
      * a shingle's base hash is ``xxhash64`` of its 3 token hashes
        (24 bytes) — never a built shingle STRING (measured 4× faster
        than array_join+hash at sf0.1);
      * hash family i is ``xxhash64(base, seed_i)`` over the 8-byte
        base, and each signature column is an ``array_min`` per row —
        no explode, no groupBy.

    The only shuffle in the whole dedup is the band self-join.
    """
    tokens = _tokens_col()
    th = F.transform(tokens, lambda t: F.xxhash64(t))
    docs_th = docs.select("doc_id", th.alias("th"), F.size(tokens).alias("n"))
    shingle_h = F.when(
        F.col("n") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.col("n") - 2),
            lambda i: F.xxhash64(
                F.element_at("th", i),
                F.element_at("th", i + 1),
                F.element_at("th", i + 2),
            ),
        ),
    ).otherwise(F.array(F.xxhash64(F.col("th"))))
    with_sh = docs_th.select("doc_id", shingle_h.alias("sh"))

    # NB: closure factory, not `lambda s, i=i`: PySpark calls a 2-param
    # higher-order lambda with (element, index) and would clobber i
    def reseed(seed: int):
        return lambda h: F.xxhash64(h, F.lit(seed))

    return with_sh.select(
        "doc_id",
        F.array_min("sh").alias("mh_0"),
        *[
            F.array_min(F.transform("sh", reseed(i))).alias(f"mh_{i}")
            for i in range(1, n_hashes)
        ],
    )


@op("dedup_minhash")  # rows-only (G8)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates: banded signature equi-join —
    the scalable candidate generator (no cross join anywhere; the only
    shuffles are the signature groupBy and the band self-join, both on
    hash keys)."""
    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(d)
    # ONE posexplode instead of a 4-way union: the (shuffle-free)
    # signature expressions are evaluated once per row, not once per
    # band — and both sides of the self-join become identical subplans,
    # so the band-key Exchange is computed once and reused (ReuseExchange)
    band_sigs = F.array(
        *[
            F.xxhash64(*[F.col(f"mh_{b * BAND_SIZE + r}") for r in range(BAND_SIZE)])
            for b in range(N_HASHES // BAND_SIZE)
        ]
    )
    banded = sig.select(
        "doc_id", F.posexplode(band_sigs).alias("band", "band_sig")
    ).repartition("band", "band_sig")
    # ^ explicit shuffle on the band key: without it AQE broadcasts one
    # side of the self-join and the signature map runs TWICE; with it
    # both sides canonicalize to the same Exchange → computed once
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

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 4 bands × 16 bits; hamming ≤ 3 ⟹ some band intact
SIMHASH_MAX_HAMMING = 3  # the classic near-dup radius for 64-bit simhash


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → 64-bit simhash (per-bit majority vote over token
    hashes). Shuffle-free: token hashes are a per-row ``transform``
    array and every bit-sum an ``aggregate`` over it — a pure map over
    the corpus, like minhash_signatures."""
    hashes = F.transform(_tokens_col(), lambda t: F.xxhash64(t))
    docs_h = docs.select("doc_id", hashes.alias("hs"))
    def vote(bit: int):  # closure factory — see minhash_signatures note
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_votes = [
        F.aggregate("hs", F.lit(0), vote(i)) for i in range(SIMHASH_BITS)
    ]
    # assemble via OR of disjoint bits (shiftleft handles bit 63's sign)
    sim = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        sim = sim.bitwiseOR(
            F.when(
                bit_votes[i] > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    return docs_h.select("doc_id", sim.alias("simhash"))


def simhash_candidates_windowed(sigs: DataFrame, window: int = 5) -> DataFrame:
    """Bounded doc_id-adjacency pairing — TEST SCAFFOLDING ONLY (keeps
    a small exhaustive-ish reference for the banding recall pytest);
    production candidates come from dedup_simhash's band join."""
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.doc_id") - F.col("a.doc_id") <= window),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


@op("dedup_simhash")  # rows-only (G8)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup via band-bucketed candidates — the same LSH
    structure as dedup_minhash: split the 64-bit signature into
    4×16-bit bands, equi-self-join on (band, value), then hamming-
    filter with a single codegen'd bit_count(xor). No window, no cross
    join — docs only meet if they agree EXACTLY on one band, which
    pigeonhole GUARANTEES whenever hamming ≤ 3 (4 bands can't all be
    touched by ≤3 flipped bits). Expected bucket size n/65536 per
    band keeps the self-join near-linear at corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    sigs = simhash_signatures(d)
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    # single posexplode (see dedup_minhash): signatures evaluated once,
    # self-join sides identical → band-key Exchange reused
    band_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), bnd * band_width).bitwiseAND(
                F.lit((1 << band_width) - 1)
            )
            for bnd in range(SIMHASH_BANDS)
        ]
    )
    banded = sigs.select(
        "doc_id", "simhash", F.posexplode(band_vals).alias("band", "band_val")
    ).repartition("band", "band_val")
    # ^ shared Exchange — see dedup_minhash; signature map runs once
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Candidate graph → duplicate clusters (connected components)
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame, max_iters: int = 50
) -> DataFrame:
    """Min-label propagation over an undirected edge list
    ``(doc_a, doc_b)`` → ``(doc_id, cluster_id)`` where cluster_id is
    the smallest doc_id reachable. The iterative step a dedup pipeline
    needs to turn pairwise candidates into KEEP/DROP decisions.

    Each iteration is one groupBy-min join round (label[v] :=
    min(label[v], min over neighbors)); converges in O(diameter)
    rounds — near-dup clusters are shallow, so this stops early via a
    changed-row count. ``localCheckpoint`` cuts the lineage so plans
    don't grow exponentially across iterations (the standard Spark
    iteration pattern; GraphX/GraphFrames do the same internally).

    Raises ``RuntimeError`` if the fixpoint is NOT reached within
    ``max_iters`` — a partially-propagated labeling would silently
    split one true component into several clusters (wrong KEEP/DROP
    verdicts), which is strictly worse than failing loud. Min-label
    propagation needs one round per hop of min-label distance, so a
    pathological chain of length > max_iters trips this; callers with
    deep graphs raise max_iters (or switch to a star-contraction
    variant, which is log-round but heavier per round).
    """
    both = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # materialize the edge list ONCE — every iteration joins against it,
    # and without this each round would re-run the whole candidate
    # generation upstream (minhash banding is ~40% of dedup_cluster's
    # wall time per round when left lazy)
    both = both.localCheckpoint(eager=True)
    nodes = both.select(F.col("src").alias("doc_id")).distinct()
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            both.join(labels, both.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    "cluster_id", F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
                (F.coalesce("nbr_min", "cluster_id") < F.col("cluster_id")).alias(
                    "changed"
                ),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.where("changed").count()
        labels = updated.drop("changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations (last round still changed {n_changed} labels); "
            "raise max_iters — returning partial labels would silently "
            "split components"
        )
    return labels


@op("dedup_cluster")  # rows-only: iterative fixpoint, no SQL oracle
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup RESOLUTION: minhash band candidates →
    connected components → one row per involved doc with its cluster
    id and the keep/drop verdict (survivor = smallest doc_id in the
    cluster — deterministic, matching dedup_exact's convention).

    This is the op a training-data pipeline actually runs: candidates
    alone aren't actionable until transitive groups are resolved
    (a~b, b~c ⟹ {a,b,c} is ONE cluster with ONE survivor)."""
    cand = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(cand)
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
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
    fns — zip_with dot product, aggregate norms — all JVM-side.

    The |b−a| ≤ 5 window is realized as a BLOCK EQUI-JOIN, not a theta
    join: both sides key on floor(vec_id/5) and the probe side explodes
    to its two adjacent blocks, so every candidate pair meets inside an
    equi-key group of ~10 rows. Same result set, but the plan is a
    hash/sort-merge join that stays linear in |corpus| — the theta form
    was a BroadcastNestedLoopJoin doing O(n²) 64-dim cosines (90 s at
    sf0.1, unusable at 100 TB)."""
    blk = 5
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        emb_d.alias("ea"),
        F.explode(
            F.array(
                F.floor(F.col("vec_id") / blk),
                F.floor(F.col("vec_id") / blk) + 1,
            )
        ).alias("jblk"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        emb_d.alias("eb"),
        F.floor(F.col("vec_id") / blk).alias("jblk"),
    )
    add = lambda acc, x: acc + x  # noqa: E731
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), add
    )
    na = F.sqrt(F.aggregate(F.transform("ea", lambda x: x * x), F.lit(0.0), add))
    nb = F.sqrt(F.aggregate(F.transform("eb", lambda x: x * x), F.lit(0.0), add))
    pairs = a.join(
        b, ["jblk"]
    ).where((F.col("vec_b") - F.col("vec_a")).between(1, 5)).select(
        "vec_a", "vec_b", F.round(dot / (na * nb), 6).alias("cos_sim")
    )
    return pairs.where(F.col("cos_sim") > 0.15)


def pagerank(edges: DataFrame, iters: int = 5, damping: float = 0.85):
    """Iterative PageRank over an undirected edge list (doc_a, doc_b).

    Per iteration: one shuffle on dst (contribution aggregation) and a
    join back to degrees — the data-parallel loop shape shared with
    _lloyd/connected_components. The rank vector is localCheckpointed
    each round so iteration N+1's lineage doesn't replay rounds 1..N
    (the same truncation connected_components needs). Deterministic:
    uniform init, fixed iteration count, float sums whose cross-run
    partitioning is fixed by the checkpoint.
    """
    both = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    both = both.localCheckpoint(eager=True)
    deg = both.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("doc_id"), "deg")
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "doc_id", F.lit(0.0).alias("rank")
        ).limit(0), 0
    ranks = nodes.select("doc_id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            both.join(ranks, both["src"] == ranks["doc_id"])
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_rank"))
        )
        ranks = (
            nodes.join(contrib, nodes["doc_id"] == contrib["dst"], "left")
            .select(
                "doc_id",
                (
                    F.lit((1.0 - damping) / n)
                    + damping * F.coalesce("in_rank", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks, n


@op("graph_pagerank")  # rows-only: iterative float refinement (G8)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the minhash near-dup candidate graph: centrality
    in the duplicate graph surfaces template/boilerplate hubs — docs
    whose text is near-copied everywhere — which curation pipelines
    down-weight or cap. 5 damped iterations; tests pin that ranks sum
    to ~1 and the algorithm is rerun-stable."""
    cand = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    ranks, _ = pagerank(cand)
    return ranks.select(
        "doc_id", F.round(F.col("rank"), 8).alias("rank")
    )
