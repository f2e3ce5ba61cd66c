"""Deduplication operators — SURVEY.md §2 I / BASELINE north star.

The five standard LLM-corpus dedup levels over `documents` /
`embeddings`:

  exact          md5 of normalized text, hash-groupBy        (oracle)
  ngram-jaccard  token-set overlap on candidate pairs        (oracle)
  minhash-LSH    shingle → md5-family minhash sigs → band join (oracle)
  simhash        bitwise majority of token hashes + hamming  (oracle)
  embedding      cosine near-dup on candidate pairs          (oracle)

Since round 5 the LSH hashes are md5-derived (portable_hash60) rather
than xxhash64, so the minhash/simhash candidate sets are reproducible
in DuckDB and driver-hash-checked like the rest of the family.

Scale design: exact & minhash & simhash shuffle on a HASH key (never
on raw text — keys are fixed-width); candidate generation is always
band/bucket-join (linear-ish), never an all-pairs cross join. The
bounded `doc_id` windows used by the oracle-checked pair ops exist
only to keep the oracle evaluable — the LSH ops are the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import Window as W
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
# MinHash + LSH — PORTABLE hashing (md5-derived, oracle-checkable)
# ---------------------------------------------------------------------------
#
# Hash design (SURVEY §7 G8: md5 is the only cross-engine-stable hash):
#   * token hash  = int(md5(token)[:15 hex], 16) mod P — 60-bit base,
#     byte-identical in Spark (conv+cast) and DuckDB ('0x'||substr
#     cast), reduced mod P = 2^31 − 1;
#   * shingle base = (h1·C1 + h2·C2 + h3) mod P over 3 consecutive
#     token hashes (whole-doc fold if < 3 tokens) — ONE md5 per TOKEN,
#     shingles are pure arithmetic (products < 2^52, no overflow);
#   * family i = (A_i·x + B_i) mod P, A_i/B_i affine in i — the classic
#     universal-hash family;
#   * signature = per-family min over the doc's shingle bases.
# xxhash64 was cheaper per token but engine-specific — the LSH family
# could never be driver-verified.
#
# EVALUATION-COUNT RULE (learned the hard way — a 100× regression): an
# expression captured inside a higher-order-function lambda re-runs on
# EVERY lambda invocation, and CollapseProject inlines a column that is
# referenced only once — turning an innocent column ref into exactly
# that capture. Two safe shapes are used below:
#   1. the md5 pass is the INPUT of transform/aggregate (HOF inputs
#      evaluate once per row, collapse or not);
#   2. the token-hash array is materialized in its own select and the
#      next projection references the column SEVERAL times (multiple
#      references block CollapseProject — the shape the original
#      xxhash64 version already relied on).
# The signature stage stays a pure map — one scan, zero network at
# 100 TB.

N_HASHES = 16
BAND_SIZE = 4  # 4 bands x 4 rows
_MH_P = 2_147_483_647  # 2^31 − 1 (prime)
_MH_A_MUL, _MH_B_BASE, _MH_B_STEP = 1_103_515_245, 12_345, 1_000_003
_MH_C1, _MH_C2 = 1_000_003, 100_019  # shingle-combine multipliers


def portable_hash60(col) -> F.Column:
    """60-bit integer hash both engines compute identically:
    Spark `conv(substr(md5(x),1,15),16,10)` ≡ DuckDB
    `('0x'||substr(md5(x),1,15))::BIGINT` (15 hex digits < 2^63)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _with_shingle_hashes(docs: DataFrame) -> DataFrame:
    """docs → (doc_id, xm): array of shingle base hashes (mod P), from
    ONE md5 pass over the tokens. Token hashes are materialized as a
    column and referenced five times in the next projection (size,
    three element_at, the short-doc fold) — see EVALUATION-COUNT RULE."""
    th_expr = F.transform(_tokens_col(), lambda t: portable_hash60(t) % _MH_P)
    with_th = docs.select("doc_id", th_expr.alias("th"))
    th = F.col("th")
    n = F.size(th)
    c1 = F.lit(_MH_C1).cast("long")
    c2 = F.lit(_MH_C2).cast("long")
    xm = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: (
                F.element_at(th, i) * c1
                + F.element_at(th, i + 1) * c2
                + F.element_at(th, i + 2)
            )
            % _MH_P,
        ),
    ).otherwise(
        F.array(
            F.aggregate(
                th,
                F.lit(0).cast("long"),
                lambda acc, h: (acc * 31 + h) % _MH_P,
            )
        )
    )
    return with_th.select("doc_id", xm.alias("xm"))


def _family_min_cols(xm_col: str = "xm") -> list[F.Column]:
    """The 16 family minima as INDEPENDENT ``array_min(transform(...))``
    columns over the shingle array — min over x of (A_i·x + B_i) mod P
    with the A_i/B_i affine coefficients pre-reduced mod P in Python
    (identical values: the old merge computed the same residues per
    step).

    r16 (guide §1.2 "per-task work"): this replaces a single
    ``aggregate`` whose merge lambda rebuilt the full 16-element
    accumulator ARRAY per shingle (one array allocation per shingle per
    row, all interpreted). 16 flat passes do the same arithmetic with
    no per-step allocation — measured 1.60 → 1.19 s for the band-key
    stage at sf0.1 (OPTIMIZATION_r16.md). Same shape as the DuckDB
    oracle's ``list_transform(range(0,16), i -> list_min(...))``, so
    the cross-engine identity argument is now symmetric too."""
    def _fam(a, b):
        # factory, not a default-arg lambda: pyspark reads HOF lambda
        # arity from the full Python signature (same trap as _tag below)
        return lambda x: (F.lit(a).cast("long") * x + F.lit(b)) % _MH_P

    mins = []
    for i in range(N_HASHES):
        a_i = (_MH_A_MUL * (i + 1)) % _MH_P
        b_i = (_MH_B_BASE + _MH_B_STEP * i) % _MH_P
        mins.append(F.array_min(F.transform(F.col(xm_col), _fam(a_i, b_i))))
    return mins


def _band_fold(mins: list[F.Column], band: int) -> F.Column:
    """base-31 fold of one band's BAND_SIZE family minima — scalar
    arithmetic, no HOF (the values match the old finish-lambda fold)."""
    s = F.lit(0).cast("long")
    for r in range(BAND_SIZE):
        s = s * 31 + mins[band * BAND_SIZE + r]
    return s


def _band_sigs_from_ms(ms_col: str = "ms") -> F.Column:
    """The 4 LSH band keys recomputed from a MATERIALIZED signature
    array column — the same base-31 folds as _band_fold, via element_at,
    so a caller that already holds ``ms`` (dedup_minhash_accuracy's
    checkpointed base) derives identical band keys without re-running
    the md5 + shingle chain (r16, guide §2.4)."""
    def fold(b):
        s = F.lit(0).cast("long")
        for r in range(BAND_SIZE):
            s = s * 31 + F.element_at(F.col(ms_col), b * BAND_SIZE + r + 1)
        return s

    return F.array(*[fold(b) for b in range(N_HASHES // BAND_SIZE)])


def minhash_signature_array(docs: DataFrame) -> DataFrame:
    """doc_id → 16-element minhash signature array. Shuffle-free: the
    16 family minima are flat ``array_min(transform(xm, ...))`` passes
    (see _family_min_cols) assembled with one ``F.array``."""
    xm = _with_shingle_hashes(docs)
    return xm.select("doc_id", F.array(*_family_min_cols()).alias("ms"))


def minhash_band_keys(docs: DataFrame) -> DataFrame:
    """doc_id → 4 LSH band keys: family minima via _family_min_cols,
    bands folded with plain scalar arithmetic (no HOF accumulator)."""
    xm = _with_shingle_hashes(docs)
    mins = _family_min_cols()
    bands = F.array(
        *[_band_fold(mins, b) for b in range(N_HASHES // BAND_SIZE)]
    )
    return xm.select("doc_id", bands.alias("band_sigs"))


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """Column-per-family view (mh_0..mh_15) of the signature array —
    test/analysis surface; the production path (dedup_minhash) folds
    the array directly into band keys without widening."""
    sig = minhash_signature_array(docs)
    return sig.select(
        "doc_id",
        *[F.element_at("ms", i + 1).alias(f"mh_{i}") for i in range(n_hashes)],
    )


# DuckDB mirror of the signature + banding chain (shared by every
# minhash-family oracle; candidates come from the bx band equi-join
# below — see _CAND_EQUI_DUCK)
_MINHASH_BANDS_DUCK = f"""
    WITH tok AS (
      SELECT doc_id, {_TOK_DUCK} AS t FROM documents),
    th AS (
      SELECT doc_id,
             list_transform(t, s ->
               CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {_MH_P}) AS h
      FROM tok),
    xm AS (
      SELECT doc_id,
             CASE WHEN len(h) >= 3
                  THEN list_transform(range(1, len(h) - 1),
                       i -> (h[i] * {_MH_C1} + h[i+1] * {_MH_C2} + h[i+2])
                            % {_MH_P})
                  ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), h),
                        (acc, x) -> (acc * 31 + x) % {_MH_P})] END AS xs
      FROM th),
    mins AS (
      SELECT doc_id,
             list_transform(range(0, {N_HASHES}), i ->
               list_min(list_transform(xs, x ->
                 ((({_MH_A_MUL} * (i + 1)) % {_MH_P}) * x
                  + ({_MH_B_BASE} + {_MH_B_STEP} * i) % {_MH_P}) % {_MH_P}))) AS ms
      FROM xm),
    bands AS (
      SELECT doc_id,
             list_transform(range(0, {N_HASHES // BAND_SIZE}), b ->
               {{'b': b, 's': ((ms[b*4+1] * 31 + ms[b*4+2]) * 31
                               + ms[b*4+3]) * 31 + ms[b*4+4]}}) AS bs
      FROM mins),
    bx AS MATERIALIZED (
      SELECT doc_id, unnest(bs) AS bv FROM bands)
"""

# Candidate pairs via the unnested band EQUI-join — the same plan
# shape the Spark side uses. The list_has_any(a.bs, b.bs) form this
# replaces is an inequality predicate, which DuckDB executes as a
# nested loop that re-inlines the md5 signature chain into every
# probe: measured 287 s for 5000 docs at sf0.1 vs 0.32 s for this
# equi-join (identical 2320 pairs). MATERIALIZED pins the signature
# evaluation to once even when the CTE is referenced twice or sits
# under a recursive CTE. DISTINCT collapses multi-band agreements to
# one pair, matching the pair-level list_has_any semantics.
_CAND_EQUI_DUCK = """
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bx a JOIN bx b ON a.bv = b.bv AND a.doc_id < b.doc_id)
"""


# hot-band guard (VERDICT r5 #4): a band bucket holding B docs emits
# B²/2 candidate pairs — one degenerate signature (empty docs, a
# boilerplate header shared by millions of pages) turns the band
# equi-join quadratic at 100 TB. Buckets over the cap are dropped from
# candidate generation: their members still meet through their other
# bands, and a genuinely hot bucket is near-certainly exact-duplicate
# content that dedup_exact already collapses. The cap NEVER fires at
# test scale (tests/test_dedup.py pins max bucket ≪ cap at sf0.1 and
# exercises the capped path on a synthetic skewed corpus), so the
# uncapped DuckDB oracle stays exact.
MAX_BAND_BUCKET = 1024


def cap_band_buckets(
    banded: DataFrame, keys: tuple[str, ...], cap: int | None = None
) -> DataFrame:
    """Drop rows of band buckets with more than ``cap`` members.

    Implemented as a PARTITIONED count-over-window + filter, not an
    aggregate + anti-join: the window rides the band-key Exchange the
    self-join already created (same partition keys — no new shuffle,
    just a per-partition sort), and critically the caller's a/b
    self-join sides stay IDENTICAL subplans, so ReuseExchange still
    evaluates the expensive signature scan exactly once. (The
    agg+anti-join form column-prunes doc_id out of its branch, the
    Exchanges stop being equal, and the signature chain re-evaluates
    per consumer — measured 1.5× on dedup_minhash at sf0.1.)"""
    cap = MAX_BAND_BUCKET if cap is None else cap
    w = W.partitionBy(*[F.col(k) for k in keys])
    return (
        banded.withColumn("_bn", F.count(F.lit(1)).over(w))
        .where(F.col("_bn") <= cap)
        .drop("_bn")
    )


@op(
    "dedup_minhash",
    oracle=_MINHASH_BANDS_DUCK
    + ", "
    + _CAND_EQUI_DUCK
    + """
    SELECT doc_a, doc_b FROM cand
    """,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates: banded signature equi-join —
    the scalable candidate generator (no cross join anywhere; the only
    shuffles are the signature groupBy and the band self-join, both on
    hash keys). Signatures are md5-derived (module header), so the
    DuckDB oracle reproduces the exact candidate-pair set."""
    d = load_table(spark, sf_dir, "documents")
    # ONE posexplode instead of a 4-way union: the (shuffle-free)
    # signature expressions are evaluated once per row, not once per
    # band. posexplode_OUTER, deliberately: plain posexplode triggers
    # InferFiltersFromGenerate, whose size(..)>0 filter re-inlines the
    # whole signature expression below the Generate and re-evaluates it
    # interpreted per row (measured 30×); band_sigs is always exactly 4
    # elements, so outer is semantically identical.
    banded = minhash_band_keys(d).select(
        "doc_id", F.posexplode_outer("band_sigs").alias("band", "band_sig")
    ).repartition("band", "band_sig")
    banded = cap_band_buckets(banded, ("band", "band_sig"))
    # r16 (guide §2.4): candidate pairs are generated MAP-SIDE from the
    # grouped band buckets instead of a band-key self-join. The old
    # a×b self-join was planned as a BroadcastHashJoin whose build side
    # re-evaluated the whole signature chain (2 parquet scans + 2
    # Exchanges in the plan); here the signature map runs ONCE, the
    # groupBy rides the repartition's Exchange (same keys — no new
    # shuffle), and the intra-bucket pair fan-out is a pure expression.
    # The cap window stays UPSTREAM so a degenerate hot bucket is
    # dropped (spillable window buffer) before collect_list ever
    # buffers it. Singleton buckets (the vast majority) die at the
    # n >= 2 filter instead of riding through a join. Identical result
    # set: pairs (a < b) sharing a (band, band_sig) bucket, distinct.
    return _bucket_pairs(banded, ("band", "band_sig"))


def _bucket_pairs(
    banded: DataFrame, keys: tuple[str, ...], payload: str | None = None
) -> DataFrame:
    """Distinct intra-bucket doc_id pairs (doc_a < doc_b) from a banded
    table, via groupBy-collect_list + expression-level pair fan-out —
    the shared candidate generator for dedup_minhash and the band
    sweep. Caller must have capped bucket sizes (cap_band_buckets), so
    the per-group array is bounded by MAX_BAND_BUCKET.

    With ``payload`` (r16, dedup_simhash), each side also carries that
    column through the fan-out as ``<payload>_a`` / ``<payload>_b`` —
    collect_list gathers (doc_id, payload) structs whose lexicographic
    sort_array still orders by doc_id (unique within a bucket), so the
    emitted pair set is identical to the doc-only form."""
    if payload is not None:
        grp = banded.groupBy(*keys).agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", payload))
            ).alias("ds")
        )
        n = F.size("ds")
        pair_arr = F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.slice(F.col("ds"), i + 1, n - i),
                    lambda d2: F.struct(
                        F.element_at(F.col("ds"), i).alias("a"), d2.alias("b")
                    ),
                ),
            )
        )
        return (
            grp.where(n >= 2)
            .select(F.explode(pair_arr).alias("p"))
            .select(
                F.col("p.a.doc_id").alias("doc_a"),
                F.col("p.b.doc_id").alias("doc_b"),
                F.col(f"p.a.{payload}").alias(f"{payload}_a"),
                F.col(f"p.b.{payload}").alias(f"{payload}_b"),
            )
        )
    grp = banded.groupBy(*keys).agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    n = F.size("ds")
    pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(F.col("ds"), i + 1, n - i),
                lambda d2: F.struct(
                    F.element_at(F.col("ds"), i).alias("doc_a"),
                    d2.alias("doc_b"),
                ),
            ),
        )
    )
    extra = [k for k in keys if k == "bands"]
    return (
        grp.where(n >= 2)
        .select(*extra, F.explode(pair_arr).alias("p"))
        .select(*extra, F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash — PORTABLE hashing (md5-derived, oracle-checkable)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # width of the md5-derived portable token hash
SIMHASH_BANDS = 4  # 4 bands × 15 bits; hamming ≤ 3 ⟹ some band intact
SIMHASH_MAX_HAMMING = 3  # the classic near-dup radius


def simhash_col() -> F.Column:
    """The 60-bit simhash as a COLUMN over ``text`` (per-bit majority
    vote over portable md5-derived token hashes) — exposed separately
    so callers that also need other per-doc columns (token sets, the
    calibration op) compute everything in ONE projection instead of
    joining two scans."""
    hashes = F.transform(_tokens_col(), lambda t: portable_hash60(t))
    # F.shiftright/shiftleft type their bit count as a Python int;
    # call_function reaches the SQL builtin, which takes a Column
    sr, sl = (
        lambda h, b: F.call_function("shiftright", h, b),
        lambda v, b: F.call_function("shiftleft", v, b),
    )
    sim = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, h: F.transform(
            acc,
            lambda v, b: v
            + F.when(sr(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        ),
        lambda acc: F.aggregate(
            F.transform(
                acc,
                lambda v, b: F.when(v > 0, sl(F.lit(1).cast("long"), b)).otherwise(
                    F.lit(0).cast("long")
                ),
            ),
            F.lit(0).cast("long"),
            lambda s, x: s + x,
        ),
    )
    # coalesce makes the column NON-NULLABLE (null text → 0, matching
    # the DuckDB oracle), which stops InferFiltersFromConstraints from
    # deriving IsNotNull(simhash) off the hamming predicate — that
    # inferred filter pushes below the Generate and re-inlines the
    # whole signature chain into an interpreted per-row Filter (the
    # EVALUATION-COUNT RULE above; pinned by
    # tests/test_plans.py::test_lsh_band_explode_no_inferred_filter_duplication)
    return F.coalesce(sim, F.lit(0).cast("long"))


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → 60-bit simhash; see simhash_col for the expression.
    Shuffle-free: ONE `aggregate` whose input is the single md5 pass
    (HOF inputs evaluate once per row — EVALUATION-COUNT RULE above)
    carrying a 60-slot vote accumulator; the finish lambda assembles
    the sign bits into the signature."""
    return docs.select("doc_id", simhash_col().alias("simhash"))


_SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
_SIMHASH_BAND_MASK = (1 << _SIMHASH_BAND_BITS) - 1

# DuckDB mirror of the signature chain (dedup_simhash oracle)
_SIMHASH_SIGS_DUCK = f"""
    WITH hs AS (
      SELECT doc_id,
             list_transform({_TOK_DUCK}, t ->
               CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS h
      FROM documents),
    sigs AS (
      SELECT doc_id,
             coalesce(list_sum(list_transform(range(0, {SIMHASH_BITS}), b ->
               CASE WHEN coalesce(list_sum(list_transform(h, x ->
                         CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
                    THEN (CAST(1 AS BIGINT) << b)
                    ELSE CAST(0 AS BIGINT) END)), 0) AS simhash
      FROM hs),
    bands AS (
      SELECT doc_id, simhash,
             list_transform(range(0, {SIMHASH_BANDS}), b ->
               {{'b': b,
                 'v': (simhash >> (b * {_SIMHASH_BAND_BITS}))
                      & {_SIMHASH_BAND_MASK}}}) AS bs
      FROM sigs),
    bx AS MATERIALIZED (
      SELECT doc_id, simhash, unnest(bs) AS bv FROM bands)
"""


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


@op(
    "dedup_simhash",
    oracle=_SIMHASH_SIGS_DUCK
    + f"""
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM bx a JOIN bx b ON a.bv = b.bv AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup via band-bucketed candidates — the same LSH
    structure as dedup_minhash: split the 60-bit signature into
    4×15-bit bands, equi-self-join on (band, value), then hamming-
    filter with a single codegen'd bit_count(xor). No window, no cross
    join — docs only meet if they agree EXACTLY on one band, which
    pigeonhole GUARANTEES whenever hamming ≤ 3 (4 bands can't all be
    touched by ≤3 flipped bits). Expected bucket size n/32768 per
    band keeps the self-join near-linear at corpus scale. Signatures
    are md5-derived (portable_hash60), so the DuckDB oracle reproduces
    the exact pair set."""
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
        # posexplode_outer: see dedup_minhash — avoids the inferred
        # size()>0 filter re-evaluating the signature per row
        "doc_id", "simhash", F.posexplode_outer(band_vals).alias("band", "band_val")
    ).repartition("band", "band_val")
    # ^ shared Exchange — see dedup_minhash; signature map runs once
    banded = cap_band_buckets(banded, ("band", "band_val"))
    # r16 (guide §2.4, the dedup_minhash treatment): intra-bucket pairs
    # map-side from the grouped band buckets — the old band-key
    # self-join re-evaluated the whole simhash signature chain on its
    # broadcast build side (2 scans, 2 Exchanges); here the signature
    # map runs once, the groupBy rides the repartition's Exchange, and
    # each pair carries both signatures so the hamming radius filter
    # stays a single codegen'd bit_count(xor). Identical result set.
    pairs = _bucket_pairs(banded, ("band", "band_val"), payload="simhash")
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Candidate graph → duplicate clusters (connected components)
# ---------------------------------------------------------------------------

# The iterative CC loops pin session conf (AQE off, sized shuffle
# partitions) for their duration. The pin is SESSION-GLOBAL — two
# concurrent resolutions would race the save/restore and could leave
# the wrong values behind; this lock serializes their pin windows.
# It does not protect UNRELATED queries planned concurrently in the
# same session: streaming plans ignore the AQE flag anyway (Spark
# disables AQE for streaming), but a concurrent BATCH query in
# another thread would plan with the pinned partitions — co-locate
# such work in its own SparkSession if that matters.
import threading as _threading

_CONF_PIN_LOCK = _threading.Lock()


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

    r12: the iteration runs under the same scoped AQE-off +
    size-pinned shuffle-partition conf as connected_components_star
    (restored in finally) — AQE's per-stage replan is pure overhead
    inside a driver-synchronized loop whose partition count the pin
    already right-sizes.
    """
    spark = edges.sparkSession
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
    parts = int(min(4096, max(8, both.count() // 250_000)))
    conf = spark.conf
    with _CONF_PIN_LOCK:
        old_aqe = conf.get("spark.sql.adaptive.enabled", "true")
        old_parts = conf.get("spark.sql.shuffle.partitions", "200")
        try:
            conf.set("spark.sql.adaptive.enabled", "false")
            conf.set("spark.sql.shuffle.partitions", str(parts))
            labels = _label_prop_loop(both, max_iters)
        finally:
            conf.set("spark.sql.adaptive.enabled", old_aqe)
            conf.set("spark.sql.shuffle.partitions", old_parts)
    return labels


def _label_prop_loop(both: DataFrame, max_iters: int) -> DataFrame:
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
            "split components, or use connected_components_star (log-"
            "round) for deep graphs"
        )
    return labels


def connected_components_star(
    edges: DataFrame, max_iters: int = 60, return_rounds: bool = False
) -> DataFrame:
    """Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond" — public algorithm), the deep-graph complement to
    :func:`connected_components`:

    * large-star: per node u over its undirected neighborhood N(u),
      m = min(N(u) ∪ {u}); re-point every STRICTLY LARGER neighbor at
      m — emit (v, m) for v ∈ N(u), v > u.
    * small-star: group the (already larger→smaller oriented) edges by
      the larger endpoint u, m = min(N(u) ∪ {u}); emit (v, m) for
      v ∈ N(u) ∪ {u}, v ≠ m.

    Each alternation is two groupBy shuffles; the edge set converges
    to stars rooted at each component's minimum in O(log² n) rounds
    worst case — ~log n in practice — versus min-label propagation's
    O(diameter). A 10⁴-node CHAIN (the label-prop catastrophe: 10⁴
    rounds) converges in ~15 alternations (SCALING.md;
    tests/test_dedup.py pins the round bound). Near-dup clusters are
    shallow, so dedup_cluster keeps label-prop (cheaper per round,
    3–5 rounds there); this is the documented switch when components
    can be deep.

    r12 redesign of the loop constant (~2x at sf0.1, SCALING.md):

    * Input edges are canonically oriented child=larger -> parent=
      smaller up front (map-side greatest/least); small-star preserves
      the orientation, so it is a loop INVARIANT and no per-round
      re-orientation or distinct is needed (duplicate edges are
      dedup'd map-side by collect_set and don't affect correctness).
    * Convergence is detected by a star-forest CERTIFICATE instead of
      edge-set fixpoint tracking. Under the downward-orientation
      invariant, the labeling is correct as soon as no node x has
      (|N(x)| > 1 and min(N(x)) < x): every multi-neighbor node is
      then a local minimum whose neighbors are all its children, and
      every single-neighbor node either points down (a leaf) or is a
      one-child root — i.e. the graph is a star forest whose roots
      are their components' minima (both star operators preserve
      component connectivity exactly, so these are the ORIGINAL
      components). The certificate is an AGGREGATE over the very
      groupBy large-star needs next — the check free-rides on the
      alternation's own shuffle, fires the round the forest forms (no
      fixpoint-repeat round), and certifies the ANSWER, not plan
      stability, so duplicate edges can't fool it. A star-forest
      INPUT (e.g. incremental state merge) converges in 0 rounds.
    * The loop runs with AQE OFF and shuffle partitions pinned to a
      size-derived count (restored in finally). Measured at sf0.1:
      AQE's per-stage re-planning costs ~0.2 s x 2 stages x round —
      2x the whole loop's useful work — while its only benefit here
      (partition coalescing) is exactly what the explicit pin
      provides. The pin scales: ceil(|E| / 250k) partitions, floor 8,
      cap 4096 — at 10^9 edges that is 4000 partitions of ~250k edges
      each; AQE stays ON for everything outside the loop (and for the
      final label projection).
    """
    spark = edges.sparkSession
    # canonical downward orientation (child=larger): small-star output
    # keeps it, so this is established once, map-side
    e = (
        edges.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    parts = int(min(4096, max(8, n_edges // 250_000)))

    def _alt_grp(cur):
        # the undirected-neighborhood groupBy that BOTH large-star and
        # the certificate read — one shuffle, shared
        und = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        return und.groupBy("u").agg(F.collect_set("v").alias("nbrs"))

    conf = spark.conf
    _CONF_PIN_LOCK.acquire()
    try:
        return _star_loop(conf, e, parts, max_iters, return_rounds, _alt_grp)
    finally:
        # release OUTSIDE the conf-restore failure domain: a py4j error
        # in conf.get/set must not leak the lock and hang every later
        # resolution (r12 second-review find)
        _CONF_PIN_LOCK.release()


def _star_loop(conf, e, parts, max_iters, return_rounds, _alt_grp):
    old_aqe = conf.get("spark.sql.adaptive.enabled", "true")
    old_parts = conf.get("spark.sql.shuffle.partitions", "200")
    rounds = 0
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(parts))
        while True:
            # star-forest certificate — r17 (VERDICT r16 #3): the
            # violation flag rides the SAME job that materializes the
            # neighborhood groupBy, as an Observation on grp's output
            # rows, replacing the former 1-row agg+collect tail (its
            # extra final-aggregate stage + result fetch per
            # alternation; at cluster scale, one fewer per-round driver
            # barrier). The metric is max() of a 0/1 flag — idempotent
            # under task retries/speculation, so the certificate stays
            # EXACT even if a partition's update is delivered twice.
            # obs.get blocks until the eager checkpoint's action
            # completes; semantics of the flag are unchanged.
            obs = Observation()
            grp = (
                _alt_grp(e)
                .observe(
                    obs,
                    F.max(
                        (
                            (F.size("nbrs") > 1)
                            & (F.array_min("nbrs") < F.col("u"))
                        ).cast("int")
                    ).alias("viol"),
                )
                .localCheckpoint(eager=True)
            )
            viol = obs.get["viol"]
            if not viol:
                break
            if rounds >= max_iters:
                raise RuntimeError(
                    f"connected_components_star did not converge in "
                    f"{max_iters} alternations — returning partial "
                    "stars would split components"
                )
            # -- large-star -- (continues from the shared groupBy)
            m = F.array_min(F.array_append("nbrs", F.col("u")))
            large = (
                grp.select(
                    F.explode(
                        F.filter("nbrs", lambda x: x > F.col("u"))
                    ).alias("u2"),
                    m.alias("m"),
                )
                .select(F.col("u2").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v"))
            )
            # -- small-star -- (large's output is already oriented
            # larger→smaller: m = min(N(u) ∪ {u}) <= u < u2, so no
            # greatest/least re-orientation pass is needed)
            grp2 = large.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
            m2 = F.array_min(F.array_append("nbrs", F.col("u")))
            e = (
                grp2.select(
                    F.explode(F.array_append("nbrs", F.col("u"))).alias("u2"),
                    m2.alias("m"),
                )
                .select(F.col("u2").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v"))
            )
            rounds += 1
        # r16 (guide §2.4): labels come straight off the CONVERGED
        # neighborhood groupBy — the certificate just proved `grp` is a
        # star forest rooted at each component's minimum, so per node u:
        # a root's neighbors are all larger (label = u) and a leaf's
        # single neighbor IS its root (label = min(nbrs)); both are
        # least(u, array_min(nbrs)). grp is already materialized (the
        # certificate observation rode its eager checkpoint) and groupBy makes u
        # unique, so this is ONE map stage over cached blocks — replacing
        # the former groupBy-min ∪ distinct ∪ distinct label projection
        # (3 shuffles over e) that recomputed the same star roots.
        labels = grp.select(
            F.col("u").alias("doc_id"),
            F.least(F.col("u"), F.array_min("nbrs")).alias("cluster_id"),
        ).localCheckpoint(eager=True)
    finally:
        conf.set("spark.sql.adaptive.enabled", old_aqe)
        conf.set("spark.sql.shuffle.partitions", old_parts)
    if return_rounds:
        labels = labels.withColumn("rounds", F.lit(rounds))
    return labels


@op(
    "dedup_cluster",
    # The iterative fixpoint IS SQL-expressible now that the candidate
    # edges are portable (md5 minhash): a recursive CTE enumerates
    # reachability (UNION dedups, so it terminates) and min(reachable)
    # is the cluster label — O(Σ component²) pairs, fine at oracle SF
    # because near-dup clusters are tiny.
    oracle=_MINHASH_BANDS_DUCK.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + ", "
    + _CAND_EQUI_DUCK
    + """
    , und AS MATERIALIZED (
      SELECT doc_a AS s, doc_b AS d FROM cand
      UNION ALL
      SELECT doc_b, doc_a FROM cand),
    reach AS (
      SELECT DISTINCT s AS v, s AS r FROM und
      UNION
      SELECT reach.v, und.d FROM reach JOIN und ON und.s = reach.r
    )
    SELECT v AS doc_id, min(r) AS cluster_id,
           (min(r) = v) AS keep
    FROM reach GROUP BY v
    """,
)
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup RESOLUTION: minhash band candidates →
    connected components → one row per involved doc with its cluster
    id and the keep/drop verdict (survivor = smallest doc_id in the
    cluster — deterministic, matching dedup_exact's convention).

    This is the op a training-data pipeline actually runs: candidates
    alone aren't actionable until transitive groups are resolved
    (a~b, b~c ⟹ {a,b,c} is ONE cluster with ONE survivor).

    Resolution runs large-star/small-star (r11, VERDICT r10 #7):
    O(log n) alternations regardless of component shape — a 10⁴-node
    chain takes 15 alternations where min-label propagation needs 10⁴
    rounds — and measured no slower than label-prop on the shallow
    near-dup shape (1.3 vs 1.5 s at sf0.1, SCALING.md)."""
    cand = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components_star(cand)
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


# Unrolled 5-iteration PageRank as plain CTEs: each rK mirrors one
# Spark round exactly — contributions sum rank/deg over in-edges, the
# teleport term is written `(1.0 - 0.85) / n` so both engines evaluate
# the SAME double (0.15000000000000002, not the 0.15 literal). Ranks
# round to 8 dp; PageRank is a 0.85-contraction so cross-engine
# summation-order noise (~1e-15) can't reach that digit.
_PAGERANK_ITER = """,
    r{k} AS MATERIALIZED (
      SELECT d.src AS doc_id,
             (1.0 - 0.85) / (SELECT n FROM nn)
             + 0.85 * coalesce(s.m, 0.0) AS rank
      FROM deg d LEFT JOIN (
        SELECT e.dst, sum(r.rank / dg.deg) AS m
        FROM e
        JOIN r{prev} r ON r.doc_id = e.src
        JOIN deg dg ON dg.src = e.src
        GROUP BY e.dst) s ON s.dst = d.src)"""

_PAGERANK_DUCK = (
    _MINHASH_BANDS_DUCK
    + ", "
    + _CAND_EQUI_DUCK
    + """
    , e AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL
      SELECT doc_b, doc_a FROM cand),
    deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY 1),
    nn AS MATERIALIZED (SELECT count(*) AS n FROM deg),
    r0 AS MATERIALIZED (
      SELECT src AS doc_id, 1.0 / (SELECT n FROM nn) AS rank FROM deg)"""
    + "".join(_PAGERANK_ITER.format(k=k, prev=k - 1) for k in range(1, 6))
    + """
    SELECT doc_id, round(rank, 8) AS rank FROM r5
    """
)


@op(
    "graph_components_star",
    # the DEEP-graph driver check for connected_components_star: per-
    # user event chains are ~66 hops at every sf (min-label propagation
    # would need ~66 rounds — past its default bound), while the star
    # alternation resolves them in O(log n). The oracle enumerates
    # reachability with a recursive CTE (UNION dedups ⇒ terminates;
    # O(Σ chain²) pairs, fine at oracle SF) and labels by min.
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT a, event_id AS b FROM (
        SELECT event_id, lag(event_id) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS a
        FROM events) t WHERE a IS NOT NULL),
    und AS MATERIALIZED (
      SELECT a AS s, b AS d FROM edges
      UNION ALL SELECT b, a FROM edges),
    reach AS (
      SELECT DISTINCT s AS v, s AS r FROM und
      UNION
      SELECT reach.v, und.d FROM reach JOIN und ON und.s = reach.r)
    SELECT v AS node_id, min(r) AS component_id FROM reach GROUP BY v
    """,
)
def graph_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components on a genuinely DEEP graph, driver-checked:
    the per-user event timelines become path graphs (consecutive-event
    edges, ~66 hops per user at every sf) and the large-star/small-star
    alternation labels every event with its chain's minimum event id.
    dedup_cluster exercises star on shallow near-dup components; this
    op pins it where the algorithm earns its keep — min-label
    propagation would need one round per hop (~66), star takes
    O(log n) alternations (SCALING.md r11: 15 rounds for a 10⁴ chain).

    Scale: edge construction is one window over (user_id, ts) — the
    partitioning a sessionized event store already has; each star
    phase is one groupBy+explode, log-round total."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.select(
            F.lag("event_id").over(w).alias("doc_a"),
            F.col("event_id").alias("doc_b"),
        )
        .where(F.col("doc_a").isNotNull())
    )
    labels = connected_components_star(edges)
    return labels.select(
        F.col("doc_id").alias("node_id"),
        F.col("cluster_id").alias("component_id"),
    )


@op("graph_pagerank", oracle=_PAGERANK_DUCK)
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


@op(
    "dedup_minhash_verified",
    # the full production dedup: LSH RECALL stage (band candidates)
    # followed by the exact-Jaccard PRECISION stage; jaccard is
    # int/int → bit-identical cross-engine, no rounding
    oracle=_MINHASH_BANDS_DUCK
    + ", "
    + _CAND_EQUI_DUCK
    + f"""
    , tk AS (SELECT doc_id, list_distinct({_TOK_DUCK}) AS toks FROM documents),
    j AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(ta.toks, tb.toks)) AS common,
             len(ta.toks) AS sza, len(tb.toks) AS szb
      FROM cand c
      JOIN tk ta ON ta.doc_id = c.doc_a
      JOIN tk tb ON tb.doc_id = c.doc_b)
    SELECT doc_a, doc_b, CAST(common AS BIGINT) AS common,
           common * 1.0 / (sza + szb - common) AS jaccard
    FROM j WHERE common * 1.0 / (sza + szb - common) > 0.2
    """,
)
def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase near-dup detection, the shape production dedup
    actually ships: MinHash-LSH band join for RECALL (cheap, may emit
    false candidates) → exact token-set Jaccard for PRECISION (runs
    only on the candidate pairs, never all-pairs). Survivors are the
    pairs a curator can trust.

    Scale: the verify stage joins the candidate-pair table (tiny — LSH
    keeps it near-linear in true dups) against per-doc distinct-token
    arrays on doc_id; the intersection is a map-side array op, so no
    token fan-out and no hot-token skew — the exact failure
    dedup_ngram_jaccard's block bound exists to prevent is structurally
    impossible here.
    """
    cand = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    d = load_table(spark, sf_dir, "documents")
    # r16: lazy checkpoint — tk feeds BOTH pair-join sides; without it
    # each side re-runs the scan + tokenize + array_distinct pass (the
    # shared-subtree discipline dedup_minhash_accuracy already applies)
    tk = d.select(
        "doc_id", F.array_distinct(_tokens_col()).alias("toks")
    ).localCheckpoint(eager=False)
    ta = tk.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    tb = tk.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    common = F.size(F.array_intersect(F.col("ta"), F.col("tb"))).cast("long")
    jac = common * 1.0 / (F.size("ta") + F.size("tb") - common)
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a", "doc_b", common.alias("common"), jac.alias("jaccard")
        )
        .where(F.col("jaccard") > 0.2)
    )


@op(
    "dedup_containment",
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
           common * 1.0 / least(sa.sz, sb.sz) AS containment
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE common * 1.0 / least(sa.sz, sb.sz) > 0.5
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup: common / min(|A|, |B|) instead of Jaccard.
    Jaccard misses the quote-inside-a-bigger-page duplicate (a small
    doc fully embedded in a large one scores low because the union is
    large); containment catches exactly that asymmetric case — the
    boilerplate/quotation dedup pass of an LLM corpus pipeline.

    Scale: identical shape to dedup_ngram_jaccard — the self-join key
    includes the block bound so hot tokens can't go quadratic; only
    the final scoring expression differs (int/int, exact
    cross-engine). Production candidates come from dedup_minhash's
    band join; the bounded window keeps the oracle small."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens_col()).alias("token")).distinct()
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
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
        .groupBy(F.col("a_doc").alias("doc_a"), F.col("b_doc").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    score = F.col("common") * 1.0 / F.least(F.col("sa.sz"), F.col("sb.sz"))
    return (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", "common", score.alias("containment"))
        .where(F.col("containment") > 0.5)
    )


@op(
    "dedup_prefix",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             md5(array_to_string(list_slice({_TOK_DUCK}, 1, 16), ' '))
               AS prefix_md5,
             length(text) AS n_chars
      FROM documents
      WHERE len({_TOK_DUCK}) >= 16)
    SELECT prefix_md5,
           cast(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keeper_doc_id,
           cast(max(n_chars) AS BIGINT) AS longest_chars
    FROM p GROUP BY 1 HAVING count(*) >= 2
    """,
)
def dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-hash near-dup: documents sharing their first 16 tokens —
    the truncated/extended-variant duplicate a crawl produces when the
    same article is cut at different lengths (exact dedup misses it
    because the tails differ; minhash can miss it when the shared
    prefix is a small fraction of the longer doc). Reported as
    clusters with the min-id keeper and the longest variant's size
    (the usual policy keeps the LONGEST — both facts are emitted).

    Scale: one md5 over a bounded prefix per doc (cost independent of
    doc length), one fixed-width-key groupBy — the cheapest near-dup
    pass in the family, which is why crawl pipelines run it FIRST."""
    d = load_table(spark, sf_dir, "documents")
    t = _tokens_col()
    p = d.select(
        "doc_id",
        F.md5(F.array_join(F.slice(t, 1, 16), " ")).alias("prefix_md5"),
        F.length("text").alias("n_chars"),
    ).where(F.size(t) >= 16)
    return (
        p.groupBy("prefix_md5")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.max("n_chars").cast("long").alias("longest_chars"),
        )
        .where(F.col("n_docs") >= 2)
    )


@op(
    "dedup_minhash_accuracy",
    # fully exact cross-engine: sig_agree is an integer count over the
    # md5-portable signatures, est = k/16.0 (exact binary fraction),
    # the estimator's TARGET is the distinct-SHINGLE-set Jaccard
    # (int/int) — the quantity minhash actually estimates, NOT the
    # token-set Jaccard dedup_minhash_verified scores with — and the
    # error is one subtraction of identically-derived doubles
    oracle=_MINHASH_BANDS_DUCK
    + ", "
    + _CAND_EQUI_DUCK
    + f"""
    , sh AS (SELECT doc_id, list_distinct(xs) AS s, ms
           FROM xm JOIN mins USING (doc_id)),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             len(list_filter(range(1, {N_HASHES} + 1),
                             i -> a.ms[i] = b.ms[i])) AS sig_agree,
             len(list_intersect(a.s, b.s)) AS common,
             len(a.s) AS sza, len(b.s) AS szb
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b)
    SELECT doc_a, doc_b,
           CAST(sig_agree AS BIGINT) AS sig_agree,
           sig_agree / {N_HASHES}.0 AS est_jaccard,
           common * 1.0 / (sza + szb - common) AS shingle_jaccard,
           round(abs(sig_agree / {N_HASHES}.0
                     - common * 1.0 / (sza + szb - common)), 6) AS abs_err
    FROM scored
    """,
)
def dedup_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "measure, don't guess" gate for MinHash — what ann_recall_eval
    is for ANN: on every LSH band-candidate pair, compare the signature
    estimate (agreeing positions / 16) against the EXACT quantity the
    estimator targets, the distinct-shingle-set Jaccard. The per-pair
    absolute error tells you whether 16 hashes are enough for your
    dedup threshold BEFORE you trust the estimate at corpus scale
    (E[err] ~ sqrt(J(1-J)/16) ≈ 0.12 worst-case; tests pin the
    corpus-level mean against that bound).

    Scale: candidate pairs come from the LSH band join (near-linear in
    true dups, never all-pairs); signatures and shingle sets are built
    in the SAME single map pass (one md5 per token — the xm column
    feeds both array_distinct and the signature fold, multiple refs
    blocking CollapseProject per the EVALUATION-COUNT RULE); the pair
    join is doc_id-keyed against that compact table. At 100 TB this is
    the estimator-calibration job you run on a SAMPLE partition before
    a full dedup sweep."""
    d = load_table(spark, sf_dir, "documents")
    xm = _with_shingle_hashes(d)
    # lazy checkpoint: base feeds BOTH pair-join sides AND (r16) the
    # candidate generation — without it each consumer re-runs the md5 +
    # shingle + signature chain (the shared-subtree discipline of
    # c490559)
    base = xm.select(
        "doc_id",
        F.array_distinct("xm").alias("s"),
        F.array(*_family_min_cols()).alias("ms"),
    ).localCheckpoint(eager=False)
    # r16 (guide §2.4): candidates from the SAME materialized base —
    # band keys re-folded from the ms column (identical values to
    # minhash_band_keys), then the dedup_minhash bucket-pair path; the
    # old `dedup_minhash(...)` call re-ran the whole signature chain a
    # second time just to produce the pair list.
    banded = base.select(
        "doc_id",
        F.posexplode_outer(_band_sigs_from_ms("ms")).alias("band", "band_sig"),
    ).repartition("band", "band_sig")
    banded = cap_band_buckets(banded, ("band", "band_sig"))
    cand = _bucket_pairs(banded, ("band", "band_sig"))
    a = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("s").alias("sa"),
        F.col("ms").alias("msa"),
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("sb"),
        F.col("ms").alias("msb"),
    )
    agree = F.aggregate(
        F.zip_with("msa", "msb", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("long")
    common = F.size(F.array_intersect("sa", "sb")).cast("long")
    exact = common * 1.0 / (F.size("sa") + F.size("sb") - common)
    est = F.col("sig_agree") / float(N_HASHES)
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", agree.alias("sig_agree"), common, exact.alias("shingle_jaccard"))
        .select(
            "doc_a",
            "doc_b",
            "sig_agree",
            est.alias("est_jaccard"),
            "shingle_jaccard",
            F.round(F.abs(est - F.col("shingle_jaccard")), 6).alias("abs_err"),
        )
    )


@op(
    "dedup_simhash_accuracy",
    # fully exact cross-engine: hamming is an integer bit_count over
    # md5-portable signatures, the token-set Jaccard is int/int (one
    # IEEE division of exact integers — deterministic, no rounding
    # needed), and the flag is an integer comparison
    oracle=_SIMHASH_SIGS_DUCK
    + f"""
    , toks AS (
      SELECT doc_id, list_distinct({_TOK_DUCK}) AS s FROM documents),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM bx a JOIN bx b ON a.bv = b.bv AND a.doc_id < b.doc_id),
    j AS (
      SELECT c.doc_a, c.doc_b, c.hamming,
             len(list_intersect(ta.s, tb.s)) AS common,
             len(ta.s) AS sza, len(tb.s) AS szb
      FROM cand c
      JOIN toks ta ON ta.doc_id = c.doc_a
      JOIN toks tb ON tb.doc_id = c.doc_b)
    SELECT doc_a, doc_b,
           CAST(hamming AS INTEGER) AS hamming,
           common * 1.0 / nullif(sza + szb - common, 0) AS token_jaccard,
           (hamming <= {SIMHASH_MAX_HAMMING}) AS flagged
    FROM j
    """,
)
def dedup_simhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third leg of the calibration suite (VERDICT r7 #7) — what
    dedup_minhash_accuracy is for MinHash and ann_recall_eval for ANN:
    on every simhash band-candidate pair, score the hamming distance
    (the quantity the ≤ SIMHASH_MAX_HAMMING=3 dedup threshold cuts on)
    against the EXACT distinct-token-set Jaccard, WITHOUT the hamming
    filter — the full candidate spectrum, so the curve shows both what
    the threshold keeps and what it discards. ``flagged`` marks the
    pairs production dedup_simhash would emit; tests pin that flagged
    pairs have systematically higher Jaccard than rejected candidates
    (the separation IS the calibration — if it collapses, the 60-bit
    signature or the 4-band radius is mis-sized for the corpus).

    Scale: same band-bucketed candidate generation as dedup_simhash
    (never all-pairs; hot buckets capped); the signature + distinct
    token set are built in ONE map pass shared by the band explode and
    BOTH pair-join sides via a lazy localCheckpoint (the shared-subtree
    discipline of c490559). At 100 TB this runs on a sample partition
    before trusting the hamming threshold corpus-wide."""
    d = load_table(spark, sf_dir, "documents")
    # signature + distinct token set in ONE projection over one scan
    # (simhash_col exists for exactly this); the lazy checkpoint
    # freezes the result for the three consumers (band explode + the
    # two pair-join sides)
    base = d.select(
        "doc_id",
        simhash_col().alias("simhash"),
        F.array_distinct(_tokens_col()).alias("s"),
    ).localCheckpoint(eager=False)
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    band_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), bnd * band_width).bitwiseAND(
                F.lit((1 << band_width) - 1)
            )
            for bnd in range(SIMHASH_BANDS)
        ]
    )
    banded = base.select(
        "doc_id", F.posexplode_outer(band_vals).alias("band", "band_val")
    ).repartition("band", "band_val")
    banded = cap_band_buckets(banded, ("band", "band_val"))
    # r16: map-side intra-bucket pairs (the dedup_minhash treatment) —
    # drops the band-key self-join and its second Exchange; identical
    # distinct pair set
    cand = _bucket_pairs(banded, ("band", "band_val"))
    a = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sha"),
        F.col("s").alias("sa"),
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("shb"),
        F.col("s").alias("sb"),
    )
    common = F.size(F.array_intersect("sa", "sb")).cast("long")
    denom = F.size("sa") + F.size("sb") - common
    hamming = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb"))).cast("int")
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            hamming.alias("hamming"),
            (common * F.lit(1.0) / F.nullif(denom, F.lit(0))).alias(
                "token_jaccard"
            ),
            (hamming <= SIMHASH_MAX_HAMMING).alias("flagged"),
        )
    )


@op(
    "dedup_keep_best",
    # same recursive-CTE reachability as dedup_cluster; the survivor
    # choice adds only exact integers (token counts) and integer
    # tiebreaks, so the verdict is bit-identical cross-engine
    oracle=_MINHASH_BANDS_DUCK.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + ", "
    + _CAND_EQUI_DUCK
    + f"""
    , und AS MATERIALIZED (
      SELECT doc_a AS s, doc_b AS d FROM cand
      UNION ALL
      SELECT doc_b, doc_a FROM cand),
    reach AS (
      SELECT DISTINCT s AS v, s AS r FROM und
      UNION
      SELECT reach.v, und.d FROM reach JOIN und ON und.s = reach.r),
    labels AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
    q AS (SELECT doc_id,
                 coalesce(len({_TOK_DUCK}), 0) AS n_tokens
          FROM documents),
    r AS (
      SELECT l.doc_id, l.cluster_id,
             CAST(q.n_tokens AS BIGINT) AS n_tokens,
             row_number() OVER w AS rn,
             first_value(l.doc_id) OVER (PARTITION BY l.cluster_id
               ORDER BY q.n_tokens DESC, l.doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS kept_doc
      FROM labels l JOIN q ON q.doc_id = l.doc_id
      WINDOW w AS (PARTITION BY l.cluster_id
                   ORDER BY q.n_tokens DESC, l.doc_id ASC))
    SELECT doc_id, cluster_id, n_tokens, (rn = 1) AS keep, kept_doc
    FROM r
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster resolution — the production KEEP/DROP rule
    dedup_cluster's smallest-id convention approximates: within each
    near-dup cluster keep the MOST COMPLETE copy (max whitespace-token
    count, doc_id tiebreak), not the lowest id. This is what corpus
    pipelines actually ship: near-dups are usually truncations /
    boilerplate-wrapped variants of one best document, and dropping
    the long one because its id is larger throws away content. Every
    involved doc reports its cluster, its own size, its verdict, and
    the id of the copy that survives in its place.

    Scale: same minhash-band + star-resolution path as dedup_cluster
    (near-linear candidates, O(log n) alternations — immune to the
    deep-chain catastrophe, VERDICT r10 #7); the
    survivor choice is ONE window over cluster_id — a data-
    proportional key (clusters), no global ordering; token counts ride
    the documents scan map-side. Like dedup_cluster, the builder runs
    the propagation jobs eagerly (plan-linted under EAGER)."""
    cand = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components_star(cand)
    d = load_table(spark, sf_dir, "documents")
    qual = d.select(
        "doc_id",
        F.coalesce(F.size(_tokens_col()), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    lj = labels.join(qual, "doc_id")
    w = W.partitionBy("cluster_id").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    return lj.select(
        "doc_id",
        "cluster_id",
        "n_tokens",
        (F.row_number().over(w) == 1).alias("keep"),
        F.first("doc_id")
        .over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("kept_doc"),
    )


@op(
    "corpus_dedup_rate_by_source",
    # md5 text keys are cross-engine stable; every output is an exact
    # integer or an int/int IEEE division — no rounding needed
    oracle="""
    WITH h AS (
      SELECT source, doc_id, md5(coalesce(text, '')) AS hh
      FROM documents),
    marked AS (
      SELECT source, doc_id,
             count(*) OVER (PARTITION BY hh) AS copies,
             min(doc_id) OVER (PARTITION BY hh) AS first_doc
      FROM h)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_dup_groups,
           CAST(sum(CASE WHEN doc_id <> first_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_redundant,
           sum(CASE WHEN doc_id <> first_doc THEN 1 ELSE 0 END) * 1.0
             / count(*) AS dup_rate
    FROM marked GROUP BY 1
    """,
)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup OBSERVABILITY — the per-source duplicate scorecard a
    curation pipeline reads before deciding where to spend near-dup
    budget: for each source, how many docs sit in exact-duplicate
    groups (md5 of full text) and how many are redundant copies
    (everything but the min-doc_id survivor — dedup_exact's
    convention), as an absolute count and a rate. A crawl source with
    30% redundancy gets MinHash attention; one at 0.1% doesn't.

    Scale: one window over the md5 key (the same data-proportional
    hash-key shuffle dedup_exact pays — fixed-width keys, never text
    payloads) followed by a |sources|-row aggregate; nothing global,
    nothing all-pairs."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "source", "doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("hh")
    )
    w = W.partitionBy("hh")
    marked = h.select(
        "source",
        "doc_id",
        F.count(F.lit(1)).over(w).alias("copies"),
        F.min("doc_id").over(w).alias("first_doc"),
    )
    redundant = F.when(F.col("doc_id") != F.col("first_doc"), 1).otherwise(0)
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("copies") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_in_dup_groups"),
        F.sum(redundant).cast("long").alias("n_redundant"),
        (F.sum(redundant) * F.lit(1.0) / F.count(F.lit(1))).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# LSH band/row tuning sweep (r10) — the dedup family's knob curve,
# companion to ann_ivfpq_sweep: same 16 minhashes, regrouped.
# ---------------------------------------------------------------------------

_LSH_SWEEP_ARMS = ((2, 8), (4, 4), (8, 2), (16, 1))
_LSH_SWEEP_THETA = 0.5  # "near-dup" = shingle-set Jaccard >= 0.5

# tok/th/xm/mins only — the signature pyramid shared by every arm
# (sliced out of the committed 4x4 oracle so the chains stay
# byte-identical)
_MINS_PREFIX_DUCK = _MINHASH_BANDS_DUCK[
    : _MINHASH_BANDS_DUCK.index("    bands AS (")
].rstrip().rstrip(",")


def _lsh_sweep_duck() -> str:
    arms_cte = []
    tagged = []
    for bn, r in _LSH_SWEEP_ARMS:
        sl = f"list_transform(range(1, {r} + 1), i -> ms[band * {r} + i])"
        fold = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), {sl}),"
            f" (acc, x) -> (acc * 31 + x) % {_MH_P})"
        )
        arms_cte.append(f"""
    bx_{bn} AS MATERIALIZED (
      SELECT doc_id, band, {fold} AS sig
      FROM mins, (SELECT unnest(range(0, {bn})) AS band) bs),
    cand_{bn} AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bx_{bn} a JOIN bx_{bn} b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""")
        tagged.append(
            f"SELECT CAST({bn} AS INTEGER) AS bands, doc_a, doc_b FROM cand_{bn}"
        )
    arms_vals = ", ".join(
        f"({bn}, {r}, {round(1 - (1 - _LSH_SWEEP_THETA ** r) ** bn, 6)!r})"
        for bn, r in _LSH_SWEEP_ARMS
    )
    return f"""
    {_MINS_PREFIX_DUCK},
    sh AS MATERIALIZED (
      SELECT doc_id, list_distinct(xs) AS s FROM xm),
    {", ".join(c.strip() for c in arms_cte)},
    tagged AS ({" UNION ALL ".join(tagged)}),
    scored AS (
      SELECT t.bands, t.doc_a, t.doc_b,
             (len(list_intersect(a.s, b.s)) * 1.0
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))))
             >= {_LSH_SWEEP_THETA} AS is_true
      FROM tagged t
      JOIN sh a ON a.doc_id = t.doc_a
      JOIN sh b ON b.doc_id = t.doc_b),
    per AS (
      SELECT bands, CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true
      FROM scored GROUP BY 1),
    pool AS (SELECT n_true AS pool_true FROM per WHERE bands = 16),
    arms(bands, rows_per_band, s_curve_p_at_theta) AS (VALUES {arms_vals})
    SELECT CAST(arms.bands AS INTEGER) AS bands,
           CAST(arms.rows_per_band AS INTEGER) AS rows_per_band,
           coalesce(per.n_candidates, 0) AS n_candidates,
           coalesce(per.n_true, 0) AS n_true,
           pool.pool_true,
           CASE WHEN pool.pool_true > 0
                THEN round(coalesce(per.n_true, 0) * 1.0 / pool.pool_true, 4)
           END AS recall_vs_pool,
           CASE WHEN coalesce(per.n_candidates, 0) > 0
                THEN round(coalesce(per.n_true, 0) * 1.0 / per.n_candidates, 4)
           END AS precision_cand,
           CAST(arms.s_curve_p_at_theta AS DOUBLE) AS s_curve_p_at_theta
    FROM arms LEFT JOIN per ON arms.bands = per.bands, pool
    """


@op("dedup_lsh_band_sweep", oracle=_lsh_sweep_duck())
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH banding curve — the dedup family's production
    knob measured as a frontier, like ann_ivfpq_sweep for ANN: the
    SAME 16 minhash values regrouped as (bands × rows/band) ∈
    {(2,8), (4,4), (8,2), (16,1)}, each arm's band equi-join emitting
    candidates that are then verified against the exact shingle-set
    Jaccard at θ=0.5. Per arm: candidate count (the COST — band-join
    output is what scales), true-pair count, recall vs the pooled
    truth, candidate precision, and the S-curve's theoretical
    candidate probability at θ (1-(1-θ^r)^b) beside the measured
    numbers. Pooled truth = the (16,1) arm's verified pairs — a SOUND
    pool: any arm's band match means every row in that band agrees,
    so each agreeing hash makes the pair a (16,1) candidate (the only
    pairs outside the pool have zero agreeing minhashes, i.e.
    estimated J=0, irrelevant at θ=0.5).

    Scale: signatures + shingle sets built once (localCheckpoint) and
    shared by all arms; each arm is one capped band equi-join (the
    hot-bucket guard applies per arm); verification touches candidate
    pairs only, never all-pairs. More bands of fewer rows = more
    candidates for more recall — this op prices that dial.

    Oracle caveat shared with dedup_minhash: cap_band_buckets never
    fires at test SF (pinned in tests/test_dedup.py), so the uncapped
    DuckDB arms are exact."""
    d = load_table(spark, sf_dir, "documents")
    xm = _with_shingle_hashes(d)
    base = xm.select(
        "doc_id",
        F.array_distinct("xm").alias("s"),
        F.array(*_family_min_cols()).alias("ms"),
    ).localCheckpoint(eager=False)

    def _arm_sigs(rows_per_band: int, n_bands: int) -> F.Column:
        # NB: the transform lambda must take exactly ONE parameter —
        # pyspark treats a 2-arg lambda as (element, index)
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda band: F.aggregate(
                F.slice(F.col("ms"), band * rows_per_band + 1, rows_per_band),
                F.lit(0).cast("long"),
                lambda acc, m: (acc * 31 + m) % _MH_P,
            ),
        )

    # all four arms fan out in ONE exploded table keyed (bands, band,
    # sig) and candidate-generate through ONE self-join (r12: was four
    # repartition+cap+join+distinct pipelines — same 30 signature rows
    # per doc either way, but 1 shuffle family instead of 4). Per-arm
    # results are identical: the arm id is part of the join key, and
    # the cap window partitions by it too.
    def _tag(bn_):
        # factory, not a default arg: pyspark reads the lambda's arity
        # from its signature, and (element, index) is exactly two
        return lambda s, i: F.struct(
            F.lit(bn_).alias("bands"), i.alias("band"), s.alias("band_sig")
        )

    arm_structs = [
        F.transform(_arm_sigs(r, bn), _tag(bn)) for bn, r in _LSH_SWEEP_ARMS
    ]
    banded = base.select(
        "doc_id", F.explode(F.flatten(F.array(*arm_structs))).alias("x")
    ).select(
        "doc_id", F.col("x.bands"), F.col("x.band"), F.col("x.band_sig")
    ).repartition("bands", "band", "band_sig")
    banded = cap_band_buckets(banded, ("bands", "band", "band_sig"))
    # r16: same map-side bucket-pair generation as dedup_minhash (one
    # signature evaluation, no self-join, groupBy rides the
    # repartition's Exchange); the arm id stays part of the group key
    # so per-arm results are unchanged.
    cand_all = _bucket_pairs(banded, ("bands", "band", "band_sig"))

    a_s = base.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b_s = base.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    common = F.size(F.array_intersect("sa", "sb"))
    jac = common * 1.0 / (F.size("sa") + F.size("sb") - common)
    scored = (
        cand_all.join(a_s, "doc_a")
        .join(b_s, "doc_b")
        .select("bands", (jac >= F.lit(_LSH_SWEEP_THETA)).alias("is_true"))
    )
    per = scored.groupBy("bands").agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.col("is_true").cast("long")).alias("n_true"),
    )
    pool = per.where(F.col("bands") == 16).select(
        F.col("n_true").alias("pool_true")
    )
    arms = spark.createDataFrame(
        [
            (bn, r, round(1 - (1 - _LSH_SWEEP_THETA**r) ** bn, 6))
            for bn, r in _LSH_SWEEP_ARMS
        ],
        "bands int, rows_per_band int, s_curve_p_at_theta double",
    )
    return (
        arms.join(per, "bands", "left")
        .crossJoin(F.broadcast(pool))
        .select(
            "bands",
            "rows_per_band",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            F.coalesce("n_true", F.lit(0)).cast("bigint").alias("n_true"),
            "pool_true",
            F.when(
                F.col("pool_true") > 0,
                F.round(
                    F.coalesce("n_true", F.lit(0)) * 1.0 / F.col("pool_true"),
                    4,
                ),
            ).alias("recall_vs_pool"),
            F.when(
                F.coalesce("n_candidates", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_true", F.lit(0))
                    * 1.0
                    / F.col("n_candidates"),
                    4,
                ),
            ).alias("precision_cand"),
            "s_curve_p_at_theta",
        )
    )


_SIMHASH_RADII = (0, 1, 2, 3, 4, 6)


def _simhash_radius_duck() -> str:
    radii = ", ".join(str(r) for r in _SIMHASH_RADII)
    return (
        _SIMHASH_SIGS_DUCK
        + f"""
    , toks AS (
      SELECT doc_id, list_distinct({_TOK_DUCK}) AS s FROM documents),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM bx a JOIN bx b ON a.bv = b.bv AND a.doc_id < b.doc_id),
    j AS (
      SELECT c.hamming,
             coalesce(
               (len(list_intersect(ta.s, tb.s)) * 1.0
                / nullif(len(ta.s) + len(tb.s)
                         - len(list_intersect(ta.s, tb.s)), 0)) >= 0.5,
               FALSE) AS is_true
      FROM cand c
      JOIN toks ta ON ta.doc_id = c.doc_a
      JOIN toks tb ON tb.doc_id = c.doc_b),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
               AS cand_true
      FROM j),
    radii AS (SELECT unnest([{radii}]) AS radius),
    per AS (
      SELECT r.radius,
             CAST(count(*) AS BIGINT) AS n_admitted,
             CAST(sum(CASE WHEN j.is_true THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_admitted
      FROM radii r JOIN j ON j.hamming <= r.radius GROUP BY 1)
    SELECT radii.radius,
           coalesce(per.n_admitted, 0) AS n_admitted,
           coalesce(per.n_true_admitted, 0) AS n_true_admitted,
           tot.n_candidates, tot.cand_true,
           CASE WHEN coalesce(per.n_admitted, 0) > 0
                THEN round(per.n_true_admitted * 1.0 / per.n_admitted, 4)
           END AS precision_adm,
           CASE WHEN tot.cand_true > 0
                THEN round(coalesce(per.n_true_admitted, 0) * 1.0
                           / tot.cand_true, 4)
           END AS recall_vs_cand_truth
    FROM radii LEFT JOIN per ON radii.radius = per.radius, tot
    """
    )


@op("dedup_simhash_radius_sweep", oracle=_simhash_radius_duck())
def dedup_simhash_radius_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The simhash HAMMING-RADIUS knob as a measured frontier — the
    third tuning sweep beside ann_ivfpq_sweep and dedup_lsh_band_sweep
    (every approximation in this engine ships its knob as a curve):
    over the FIXED band-candidate set (dedup_simhash_accuracy's full
    spectrum, built once), each radius r ∈ {0,1,2,3,4,6} admits pairs
    with hamming ≤ r; per arm the admitted count, exact-Jaccard-true
    admitted count (θ=0.5), precision, and recall against the
    candidate-set truth. Radius is a pure post-filter on one shared
    spectrum, so the whole sweep costs ONE candidate build + six
    filters — the cheapest of the three frontiers by construction.

    Scale: identical to dedup_simhash_accuracy (band-bucketed
    candidates, capped hot buckets, one shared signature scan); the
    arms add no shuffle at all."""
    spec = dedup_simhash_accuracy(spark, sf_dir).select(
        "hamming",
        F.coalesce(F.col("token_jaccard") >= 0.5, F.lit(False)).alias(
            "is_true"
        ),
    ).localCheckpoint(eager=False)
    arms = None
    for r in _SIMHASH_RADII:
        a = spec.where(F.col("hamming") <= r).select(
            F.lit(r).alias("radius"), "is_true"
        )
        arms = a if arms is None else arms.unionByName(a)
    per = arms.groupBy("radius").agg(
        F.count("*").alias("n_admitted"),
        F.sum(F.col("is_true").cast("long")).alias("n_true_admitted"),
    )
    tot = spec.agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.col("is_true").cast("long")).alias("cand_true"),
    )
    radii_df = spark.createDataFrame(
        [(r,) for r in _SIMHASH_RADII], "radius int"
    )
    return (
        radii_df.join(per, "radius", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "radius",
            F.coalesce("n_admitted", F.lit(0)).cast("bigint").alias(
                "n_admitted"
            ),
            F.coalesce("n_true_admitted", F.lit(0)).cast("bigint").alias(
                "n_true_admitted"
            ),
            "n_candidates",
            "cand_true",
            F.when(
                F.coalesce("n_admitted", F.lit(0)) > 0,
                F.round(
                    F.col("n_true_admitted") * 1.0 / F.col("n_admitted"), 4
                ),
            ).alias("precision_adm"),
            F.when(
                F.col("cand_true") > 0,
                F.round(
                    F.coalesce("n_true_admitted", F.lit(0))
                    * 1.0
                    / F.col("cand_true"),
                    4,
                ),
            ).alias("recall_vs_cand_truth"),
        )
    )


@op(
    "dedup_cluster_incremental",
    # oracle = the FULL-graph recompute (dedup_cluster's recursive-CTE
    # reachability): incremental state-merge must land on identical
    # labels, or the incremental path silently splits/merges clusters
    oracle=_MINHASH_BANDS_DUCK.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + ", "
    + _CAND_EQUI_DUCK
    + """
    , und AS MATERIALIZED (
      SELECT doc_a AS s, doc_b AS d FROM cand
      UNION ALL
      SELECT doc_b, doc_a FROM cand),
    reach AS (
      SELECT DISTINCT s AS v, s AS r FROM und
      UNION
      SELECT reach.v, und.d FROM reach JOIN und ON und.s = reach.r
    )
    SELECT v AS doc_id, min(r) AS cluster_id,
           (min(r) = v) AS keep
    FROM reach GROUP BY v
    """,
)
def dedup_cluster_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL cluster resolution — the daily-ingest shape a 100 TB
    corpus actually runs: yesterday's resolved clusters are STATE
    (star edges doc→cluster_id, |docs-in-clusters| rows, tiny next to
    the corpus), and today's batch contributes only the NEW candidate
    edges (any pair touching a new doc). Resolution then runs on
    state-stars ∪ new-edges — sound because a component's star edges
    preserve exactly its connectivity, so components of
    (old-edges ∪ new-edges) == components of (star(old) ∪ new-edges) —
    and never re-reads old-vs-old candidates.

    Here the split is deterministic (docs below the median doc_id are
    "yesterday"): phase 1 resolves old-only candidates into state,
    phase 2 star-merges state with edges touching new docs, and the
    oracle is the FULL recompute — hash-equality proves the increment
    is exact, not approximate.

    Scale: phase-2 input is |state| + |new-batch candidates| — the
    full historical edge set is never rebuilt; pair generation for the
    increment is the same capped band equi-join filtered to pairs
    touching a new doc (the band index itself appends per batch, as
    stream_dedup_minhash demonstrates at ingest)."""
    cand = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    cand = cand.localCheckpoint(eager=True)  # reused by both phases
    # FIXTURE SCAFFOLDING, not part of the production shape: this
    # percentile_approx(...).collect() exists only to FABRICATE an
    # old/new split from a single static fixture so the oracle (full
    # recompute) can prove the increment exact. In production the
    # increment boundary is the ingest date — "yesterday's state" and
    # "today's edges" arrive as separate inputs and NO driver
    # round-trip happens. Do not copy this collect as a pattern.
    mid = cand.agg(
        F.expr("percentile_approx(doc_a, 0.5)").cast("long")
    ).collect()[0][0]
    old_edges = cand.where((F.col("doc_a") < mid) & (F.col("doc_b") < mid))
    new_edges = cand.where((F.col("doc_a") >= mid) | (F.col("doc_b") >= mid))
    # phase 1: yesterday's resolution → star-edge state (child → root).
    # Every old doc appears in state: components from an edge list have
    # size ≥ 2, so each doc is either a child (one star edge out) or a
    # root (appears as some child's target) — phase 2 therefore covers
    # ALL old docs and no carry-over branch is needed.
    state = connected_components_star(old_edges).where(
        F.col("doc_id") != F.col("cluster_id")
    ).select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("doc_b"))
    # phase 2: merge state stars with the new batch's edges only
    out = connected_components_star(state.unionByName(new_edges))
    return out.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )
