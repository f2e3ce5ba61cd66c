"""Dedup-operator semantics: LSH banding recall guarantees, signature
determinism, and the no-cross-join plan contract (SURVEY.md §2 I)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.operators.dedup import (
    SIMHASH_MAX_HAMMING,
    minhash_signatures,
    simhash_candidates_windowed,
    simhash_signatures,
)
from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()


@pytest.mark.slow  # r17 driver-budget deselection (VERDICT r16 #6); in the full suite via scripts/ptest.py
def test_simhash_banding_finds_all_guaranteed_pairs(spark, sf_dir):
    """Pigeonhole contract: every pair at hamming ≤ 3 (= ≤3 flipped
    bits across 4×16-bit bands → at least one band identical) MUST be
    produced by the band join. The windowed variant is the exhaustive
    reference over its window."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash_signatures(docs).cache()
    windowed = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_candidates_windowed(sigs, window=50).collect()
        if r["hamming"] <= SIMHASH_MAX_HAMMING
    }
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in OPS["dedup_simhash"].fn(spark, sf_dir).collect()
    }
    assert windowed <= banded, f"missed guaranteed pairs: {windowed - banded}"


def test_simhash_near_dup_pairs_have_high_jaccard(spark, sf_dir):
    """Sanity: hamming==0 pairs found by banding are real near-dups —
    their token sets overlap heavily (the property simhash encodes)."""
    docs = load_table(spark, sf_dir, "documents")
    cand = OPS["dedup_simhash"].fn(spark, sf_dir).where(F.col("hamming") == 0)
    toks = F.array_distinct(F.filter(F.split(F.lower("text"), " "), lambda t: t != ""))
    a = docs.select(F.col("doc_id").alias("doc_a"), toks.alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), toks.alias("tb"))
    joined = cand.join(a, "doc_a").join(b, "doc_b")
    jac = joined.select(
        (
            F.size(F.array_intersect("ta", "tb"))
            / F.size(F.array_union("ta", "tb"))
        ).alias("j")
    )
    rows = jac.collect()
    assert rows, "expected at least one hamming=0 pair in the corpus"
    low = [r["j"] for r in rows if r["j"] < 0.6]
    # signature collisions are possible but must not dominate
    assert len(low) <= len(rows) * 0.2, f"too many low-jaccard pairs: {low}"


def test_signatures_deterministic_across_partitionings(spark, sf_dir):
    """Signature stages are pure per-row maps — repartitioning the
    input must not change a single signature."""
    docs = load_table(spark, sf_dir, "documents")
    s1 = {tuple(r) for r in simhash_signatures(docs).collect()}
    s2 = {tuple(r) for r in simhash_signatures(docs.repartition(13)).collect()}
    assert s1 == s2
    m1 = {tuple(r) for r in minhash_signatures(docs).collect()}
    m2 = {tuple(r) for r in minhash_signatures(docs.repartition(13)).collect()}
    assert m1 == m2


def test_minhash_signature_stage_is_shuffle_free(spark, sf_dir):
    """The signature computation itself must contain no Exchange — it
    is a pure map (array_min over transform), so the only shuffle in
    dedup_minhash is the band self-join."""
    import contextlib
    import io

    docs = load_table(spark, sf_dir, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        minhash_signatures(docs).explain("formatted")
    assert "Exchange" not in buf.getvalue()
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        simhash_signatures(docs).explain("formatted")
    assert "Exchange" not in buf2.getvalue()


def test_connected_components_small_graph(spark):
    """a-b, b-c, d-e ⟹ {a,b,c} labeled a and {d,e} labeled d."""
    from slowlog2clickhouse_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_cluster_transitive_and_deterministic_survivor(spark, sf_dir):
    """Every candidate pair ends up in ONE cluster; the survivor is the
    cluster's smallest doc_id; exactly one keeper per cluster."""
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in OPS["dedup_minhash"].fn(spark, sf_dir).collect()
    ]
    res = {r["doc_id"]: r for r in OPS["dedup_cluster"].fn(spark, sf_dir).collect()}
    for a, b in pairs:
        assert res[a]["cluster_id"] == res[b]["cluster_id"], (a, b)
    clusters: dict[int, list[int]] = {}
    for doc_id, r in res.items():
        clusters.setdefault(r["cluster_id"], []).append(doc_id)
    for cid, members in clusters.items():
        assert cid == min(members)
        keepers = [d for d in members if res[d]["keep"]]
        assert keepers == [cid]


def test_simhash_plan_no_cartesian(spark, sf_dir):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        OPS["dedup_simhash"].fn(spark, sf_dir).explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pagerank_sums_to_one_and_rerun_stable(spark, sf_dir):
    got = {r["doc_id"]: r["rank"] for r in OPS["graph_pagerank"].fn(spark, sf_dir).collect()}
    assert got, "candidate graph should not be empty at test SF"
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert all(v > 0 for v in got.values())
    rerun = {r["doc_id"]: r["rank"] for r in OPS["graph_pagerank"].fn(spark, sf_dir).collect()}
    assert rerun == got


def test_minhash_verified_is_subset_with_exact_jaccard(spark, sf_dir):
    """Verified pairs ⊆ LSH candidates, every jaccard > 0.2, and the
    survivor set is rerun-stable."""
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in OPS["dedup_minhash"].fn(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    ver = OPS["dedup_minhash_verified"].fn(spark, sf_dir).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in ver} <= cand
    for r in ver:
        assert r["jaccard"] > 0.2
        assert 0 < r["common"]


def test_containment_dominates_jaccard_and_respects_threshold(spark, sf_dir):
    cont = {
        (r["doc_a"], r["doc_b"]): r
        for r in OPS["dedup_containment"].fn(spark, sf_dir).collect()
    }
    assert cont
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in OPS["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
    }
    for pair, r in cont.items():
        assert 0.5 < r["containment"] <= 1.0, (pair, r)
        # common/min >= common/union, so any Jaccard-passing pair that
        # also passes the containment threshold must score at least as
        # high here
        if pair in jac:
            assert r["containment"] >= jac[pair]
    # every jaccard > 0.5 pair is necessarily a containment > 0.5 pair
    for pair, j in jac.items():
        if j > 0.5:
            assert pair in cont, pair


def test_band_bucket_cap_never_fires_at_test_scale(spark, sf_dir):
    """The uncapped DuckDB oracle stays exact because no fixture band
    bucket approaches MAX_BAND_BUCKET — pin that precondition."""
    from slowlog2clickhouse_spark.io import load_table
    from slowlog2clickhouse_spark.operators.dedup import (
        MAX_BAND_BUCKET,
        minhash_band_keys,
    )
    import pyspark.sql.functions as F

    d = load_table(spark, sf_dir, "documents")
    banded = minhash_band_keys(d).select(
        "doc_id", F.posexplode_outer("band_sigs").alias("band", "band_sig")
    )
    mx = (
        banded.groupBy("band", "band_sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert mx < MAX_BAND_BUCKET / 4, mx


def test_band_bucket_cap_drops_hot_bucket_keeps_cold(spark):
    """cap_band_buckets on a skewed synthetic corpus: a 50-doc
    identical-signature bucket is dropped while a small bucket
    survives untouched — the quadratic hot band never reaches the
    self-join."""
    import pyspark.sql.functions as F

    from slowlog2clickhouse_spark.operators.dedup import cap_band_buckets

    rows = [(i, 0, 777) for i in range(50)] + [
        (100, 1, 5),
        (101, 1, 5),
    ]
    banded = spark.createDataFrame(
        rows, "doc_id long, band int, band_sig long"
    )
    capped = cap_band_buckets(banded, ("band", "band_sig"), cap=10)
    out = {(r["band"], r["band_sig"]) for r in capped.collect()}
    assert (0, 777) not in out
    assert (1, 5) in out
    assert capped.count() == 2


@pytest.mark.slow  # r17 driver-budget deselection (VERDICT r16 #6); in the full suite via scripts/ptest.py
def test_capped_minhash_still_finds_pairs_via_other_bands(spark):
    """Members of a dropped bucket still pair through their OTHER
    bands — the overflow routing the cap relies on."""
    import pyspark.sql.functions as F

    from slowlog2clickhouse_spark.operators.dedup import cap_band_buckets

    # docs 1,2 share a cold bucket in band 1 AND sit in band 0's hot bucket
    rows = [(i, 0, 777) for i in range(1, 30)] + [(1, 1, 9), (2, 1, 9)]
    banded = spark.createDataFrame(
        rows, "doc_id long, band int, band_sig long"
    )
    capped = cap_band_buckets(banded, ("band", "band_sig"), cap=10)
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .collect()
    )
    assert [(r[0], r[1]) for r in pairs] == [(1, 2)]


def test_minhash_accuracy_error_within_estimator_bound(spark, sf_dir):
    """dedup_minhash_accuracy: estimates are k/16 grid values, the
    exact target is a valid Jaccard, per-pair error is consistent with
    |est - exact|, and the corpus-level MEAN error stays within 2x the
    theoretical minhash std bound sqrt(J(1-J)/16) <= 0.125 — the
    calibration claim the op exists to verify."""
    rows = OPS["dedup_minhash_accuracy"].fn(spark, sf_dir).collect()
    assert rows, "band candidates exist at every committed SF"
    for r in rows:
        assert 0 <= r["sig_agree"] <= 16
        assert abs(r["est_jaccard"] - r["sig_agree"] / 16.0) < 1e-12
        assert 0.0 <= r["shingle_jaccard"] <= 1.0
        assert abs(
            r["abs_err"] - abs(r["est_jaccard"] - r["shingle_jaccard"])
        ) <= 5e-7  # rounded at 6
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err <= 0.25, mean_err


def test_minhash_accuracy_pairs_are_band_candidates(spark, sf_dir):
    """The scored pair set is exactly dedup_minhash's candidate set —
    the accuracy gate measures the estimator on the pairs production
    dedup would actually score."""
    got = {
        (r["doc_a"], r["doc_b"])
        for r in OPS["dedup_minhash_accuracy"].fn(spark, sf_dir).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"])
        for r in OPS["dedup_minhash"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_simhash_accuracy_flag_matches_production_pairs(spark, sf_dir):
    """flagged=True rows are EXACTLY dedup_simhash's emitted pair set
    (same candidates, same hamming, same threshold), and every row's
    hamming/jaccard are internally consistent."""
    rows = OPS["dedup_simhash_accuracy"].fn(spark, sf_dir).collect()
    assert rows, "band candidates exist at every committed SF"
    for r in rows:
        assert 0 <= r["hamming"] <= 60
        assert r["token_jaccard"] is None or 0.0 <= r["token_jaccard"] <= 1.0
        assert r["flagged"] == (r["hamming"] <= 3)
    got = {(r["doc_a"], r["doc_b"]) for r in rows if r["flagged"]}
    want = {
        (r["doc_a"], r["doc_b"])
        for r in OPS["dedup_simhash"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_simhash_accuracy_threshold_separates_jaccard(spark, sf_dir):
    """The calibration claim: pairs the hamming<=3 threshold KEEPS have
    systematically higher exact token-set Jaccard than candidates it
    REJECTS. If this separation collapses, the signature width or band
    radius is mis-sized — exactly what the op exists to measure."""
    rows = [
        r
        for r in OPS["dedup_simhash_accuracy"].fn(spark, sf_dir).collect()
        if r["token_jaccard"] is not None
    ]
    kept = [r["token_jaccard"] for r in rows if r["flagged"]]
    rejected = [r["token_jaccard"] for r in rows if not r["flagged"]]
    assert kept, "threshold keeps at least the true near-dup pairs"
    if rejected:  # tiny SFs may band-bucket only true dups together
        mean_kept = sum(kept) / len(kept)
        mean_rej = sum(rejected) / len(rejected)
        assert mean_kept > mean_rej, (mean_kept, mean_rej)


def test_keep_best_one_survivor_per_cluster_max_tokens(spark, sf_dir):
    """Exactly one keeper per cluster; it is the max-token (doc_id
    tiebreak) member; kept_doc points at it from every member; and the
    cluster partition matches dedup_cluster's."""
    rows = OPS["dedup_keep_best"].fn(spark, sf_dir).collect()
    assert rows
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r["keep"]]
        assert len(keepers) == 1
        best = max(members, key=lambda r: (r["n_tokens"], -r["doc_id"]))
        assert keepers[0]["doc_id"] == best["doc_id"]
        assert all(r["kept_doc"] == best["doc_id"] for r in members)
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in OPS["dedup_cluster"].fn(spark, sf_dir).collect()
    }
    assert {(r["doc_id"], r["cluster_id"]) for r in rows} == want


def test_dedup_rate_by_source_consistent_with_exact(spark, sf_dir):
    """Summed redundant copies equal the rows dedup_exact would drop
    corpus-wide, and every rate is a valid fraction."""
    rows = OPS["corpus_dedup_rate_by_source"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_redundant"] <= r["n_in_dup_groups"] <= r["n_docs"]
        assert abs(r["dup_rate"] - r["n_redundant"] / r["n_docs"]) < 1e-12
    from slowlog2clickhouse_spark.io import load_table

    total_docs = load_table(spark, sf_dir, "documents").count()
    distinct_texts = (
        load_table(spark, sf_dir, "documents")
        .select(F.md5(F.coalesce("text", F.lit(""))))
        .distinct()
        .count()
    )
    assert sum(r["n_redundant"] for r in rows) == total_docs - distinct_texts
    assert sum(r["n_docs"] for r in rows) == total_docs


def test_lsh_band_sweep_frontier_invariants(spark, sf_dir):
    """The banding S-curve made measurable: more bands of fewer rows
    can only ADD candidates (a (b,r) band match implies every
    half-band of it matches in the 2b-band arm — candidate sets are
    nested along the arm ladder), so n_candidates and n_true are
    monotone non-decreasing in bands while precision falls; the
    production 4x4 config must reach full pooled recall (the measured
    knee this sweep exists to justify)."""
    from slowlog2clickhouse_spark.registry import all_ops

    rows = {r["bands"]: r for r in all_ops()["dedup_lsh_band_sweep"].fn(spark, sf_dir).collect()}
    assert set(rows) == {2, 4, 8, 16}
    for lo, hi in ((2, 4), (4, 8), (8, 16)):
        assert rows[hi]["n_candidates"] >= rows[lo]["n_candidates"]
        assert rows[hi]["n_true"] >= rows[lo]["n_true"]
    assert rows[16]["n_true"] == rows[16]["pool_true"]  # pool definition
    assert rows[4]["recall_vs_pool"] == 1.0  # the production config's knee
    assert rows[2]["precision_cand"] >= rows[16]["precision_cand"]
    for r in rows.values():
        assert r["n_true"] <= r["n_candidates"]
        assert 0.0 < r["s_curve_p_at_theta"] < 1.0


def test_simhash_radius_sweep_monotone_tradeoff(spark, sf_dir):
    """Radius arms are nested filters over one spectrum, so admitted
    and true-admitted counts are monotone non-decreasing in radius
    while precision is monotone non-increasing once pairs are
    admitted; radius 6 over 4x15-bit bands recovers every true pair
    the candidate set contains at this corpus's separation."""
    from slowlog2clickhouse_spark.registry import all_ops

    rows = {
        r["radius"]: r
        for r in all_ops()["dedup_simhash_radius_sweep"].fn(spark, sf_dir).collect()
    }
    radii = sorted(rows)
    assert radii == [0, 1, 2, 3, 4, 6]
    for lo, hi in zip(radii, radii[1:]):
        assert rows[hi]["n_admitted"] >= rows[lo]["n_admitted"]
        assert rows[hi]["n_true_admitted"] >= rows[lo]["n_true_admitted"]
    n_cand = {r["n_candidates"] for r in rows.values()}
    assert len(n_cand) == 1  # one shared spectrum
    for r in rows.values():
        assert r["n_true_admitted"] <= r["n_admitted"]
        assert r["cand_true"] <= r["n_candidates"]


class TestStarConnectedComponents:
    """VERDICT r10 #7: the giant-CHAIN catastrophe. Min-label
    propagation needs O(diameter) rounds — a 10^4-node path would need
    10^4. The large-star/small-star alternation (Kiveris et al.) must
    resolve it in O(log n) alternations with correct labels."""

    def _chain_edges(self, spark, n):
        from pyspark.sql import functions as F

        return (
            spark.range(n - 1)
            .select(
                F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
            )
        )

    def test_chain_10k_converges_log_rounds(self, spark):
        from slowlog2clickhouse_spark.operators.dedup import (
            connected_components_star,
        )

        n = 10_000
        labels = connected_components_star(
            self._chain_edges(spark, n), return_rounds=True
        )
        rows = labels.collect()
        rounds = rows[0]["rounds"]
        assert all(r["cluster_id"] == 0 for r in rows), "chain must be ONE cluster"
        assert len({r["doc_id"] for r in rows}) == n
        # log-round bound: generous 3x log2(n) ~ 40; label-prop would need 10^4
        assert rounds <= 40, f"star alternation took {rounds} rounds"

    def test_star_equals_labelprop_on_random_graph(self, spark):
        from pyspark.sql import functions as F

        from slowlog2clickhouse_spark.operators.dedup import (
            connected_components,
            connected_components_star,
        )

        # deterministic pseudo-random sparse graph: 500 nodes, 300 edges
        edges = spark.range(300).select(
            (F.xxhash64(F.col("id")) % 500).alias("doc_a"),
            (F.xxhash64(F.col("id") + 7919) % 500).alias("doc_b"),
        ).select(F.abs("doc_a").alias("doc_a"), F.abs("doc_b").alias("doc_b"))
        edges = edges.where(F.col("doc_a") != F.col("doc_b"))
        a = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(edges, max_iters=200).collect()
        }
        b = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components_star(edges).collect()
        }
        assert a == b

    def test_labelprop_raises_loud_on_deep_chain(self, spark):
        import pytest

        from slowlog2clickhouse_spark.operators.dedup import (
            connected_components,
        )

        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(self._chain_edges(spark, 400), max_iters=5)


@pytest.mark.slow  # r17 driver-budget deselection (VERDICT r16 #6); in the full suite via scripts/ptest.py
def test_incremental_cluster_equals_full_recompute(spark, sf_dir):
    """dedup_cluster_incremental (state-stars + new-batch edges) must
    produce byte-identical labels to the full recompute — the property
    that makes daily incremental resolution safe at 100 TB."""
    from slowlog2clickhouse_spark.operators.dedup import (
        dedup_cluster,
        dedup_cluster_incremental,
    )

    full = {
        (r["doc_id"], r["cluster_id"], r["keep"])
        for r in dedup_cluster(spark, sf_dir).collect()
    }
    inc = {
        (r["doc_id"], r["cluster_id"], r["keep"])
        for r in dedup_cluster_incremental(spark, sf_dir).collect()
    }
    assert inc == full


def test_star_conf_pin_restored_on_failure_and_success(spark):
    """The r12 scoped conf pin (AQE off + sized shuffle partitions
    inside the star loop) must restore the session values on BOTH
    exits: normal convergence and the max_iters RuntimeError."""
    import pytest
    from pyspark.sql import functions as F

    from slowlog2clickhouse_spark.operators.dedup import (
        connected_components_star,
    )

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")

    edges = spark.range(20).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    # success path
    assert connected_components_star(edges).count() == 21
    assert spark.conf.get("spark.sql.adaptive.enabled") == old_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == old_parts
    # failure path: a 21-node chain cannot star-contract in 0 rounds
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(edges, max_iters=0)
    assert spark.conf.get("spark.sql.adaptive.enabled") == old_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == old_parts


def test_star_empty_and_star_forest_inputs(spark):
    """Degenerate inputs for the r12 certificate loop: an EMPTY edge
    set converges immediately with empty labels; an input that is
    ALREADY a star forest (the incremental state-merge shape)
    converges in ZERO alternations with correct labels."""
    from pyspark.sql import functions as F

    from slowlog2clickhouse_spark.operators.dedup import (
        connected_components_star,
    )

    empty = spark.range(0).select(
        F.col("id").alias("doc_a"), F.col("id").alias("doc_b")
    )
    assert connected_components_star(empty).count() == 0

    # two stars rooted at their minima: {1,5,7} and {2,9}
    forest = spark.createDataFrame(
        [(5, 1), (7, 1), (9, 2)], "doc_a long, doc_b long"
    )
    lab = connected_components_star(forest, return_rounds=True)
    rows = {r["doc_id"]: r["cluster_id"] for r in lab.collect()}
    assert rows == {1: 1, 5: 1, 7: 1, 2: 2, 9: 2}
    assert lab.limit(1).collect()[0]["rounds"] == 0
