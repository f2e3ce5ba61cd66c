#!/usr/bin/env python
"""×10 scale stress probe: replicate sf0.1 into an ~sf1-equivalent
corpus under /tmp and time flagship ops against both.

The per-round scaling sweep measures 0.001→0.1 (100× growth while 32
cores are still underutilized — wall stays near-flat for healthy
plans). This probe pushes past core saturation: at ×10 the ideal wall
grows ≈ linearly with data, so the signal is the RATIO — a healthy op
lands near 10×/spindle-bound, a candidate explosion or bounded-domain
key lands at 50×+.

Replication keeps semantics realistic:
  * keys are shifted per replica (doc_id/event_id/user_id/orderkey/
    custkey) so uniqueness and per-key volumes are preserved;
  * document text gets a per-replica suffix token, so replicas are
    NEAR-duplicates of each other (shingle sets overlap heavily) —
    the dedup family sees a realistic 10-copy near-dup corpus, not a
    degenerate exact-dup one;
  * embeddings keep their values; probe panel (vec_id < 20) stays in
    replica 0, so ANN ops scan a 10× corpus for the same probes.

A second, HOT-KEY leg (--skew; VERDICT r8 #4): the uniform ×10 corpus
is Zipf-blind — every doc has exactly 9 near-copies. Real boilerplate
is one template with 10⁴+ copies, and THAT is the band-join
catastrophe shape: a single band bucket holding B docs emits B²/2
pairs (10⁴ copies → 2·10⁸ candidate pairs across 4 bands) unless the
hot-band guard drops it. The skew corpus = the ×10 corpus plus 10,000
exact copies of one template doc (fresh doc_ids); the gate is
dedup_minhash / dedup_cluster / dedup_keep_best at < 2× the
uniform-×10 wall — proving cap_band_buckets (MAX_BAND_BUCKET=1024)
absorbs the spike instead of letting the equi-join go quadratic.

Usage:
    python scripts/stress_probe.py [op ...]        # default flagships
    python scripts/stress_probe.py --skew [op ...]        # hot-doc leg
    python scripts/stress_probe.py --skew-events [op ...] # hot-user leg
    SPARK_GRAFT_STRESS_DIR=/tmp/... to relocate the generated corpus
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
DEST = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/tmp/spark_graft_stress_x10")
REPS = 10

DEFAULT_OPS = [
    "dedup_minhash",
    "dedup_cluster",
    "dedup_keep_best",
    "dedup_simhash_accuracy",
    "llm_curation_funnel",
    "text_tfidf",
    "events_journey_pattern",
    "agg_weighted_percentile",
    "win_rolling_median",
    "tpch_q9",
    "vec_knn_lsh_multiprobe",
    "corpus_dedup_rate_by_source",
]

# Every key column is shifted by replica_index * span, where span is
# max+1 of the REFERENCED table's primary key — so a foreign key moves
# in lockstep with the dimension it points at and replica i's facts
# join replica i's dimensions (r8 ADVICE: l_partkey/l_suppkey were
# previously unshifted and o_custkey used its own span, so replicas
# 1-9's dims dangled and all facts joined replica-0 dims). nation/
# region stay single-copy shared dims (nationkeys unshifted) — the
# realistic shape: tiny dims don't grow with fact volume.
#   table -> {column: (span_table, span_col)}
SHIFT_SPEC: dict[str, dict[str, tuple[str, str]]] = {
    "documents": {"doc_id": ("documents", "doc_id")},
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "nation": {},
    "region": {},
}


def build_corpus(spark) -> None:
    if os.path.exists(os.path.join(DEST, "_DONE")):
        return
    os.makedirs(DEST, exist_ok=True)
    from slowlog2clickhouse_spark.io import load_table

    # primary-key spans, computed ONCE from the owning tables so FK
    # columns shift identically to the keys they reference
    span_cache: dict[tuple[str, str], int] = {}

    def span(tbl: str, col: str) -> int:
        if (tbl, col) not in span_cache:
            v = load_table(spark, BASE, tbl).agg(F.max(col)).collect()[0][0]
            span_cache[(tbl, col)] = int(v or 0) + 1
        return span_cache[(tbl, col)]

    for t, keys in SHIFT_SPEC.items():
        df = load_table(spark, BASE, t)
        if not keys:  # tiny dims: copy once, no replication needed
            df.write.mode("overwrite").parquet(f"{DEST}/{t}.parquet")
            continue
        reps = []
        for i in range(REPS):
            r = df
            for k, (stbl, scol) in keys.items():
                r = r.withColumn(k, F.col(k) + F.lit(i * span(stbl, scol)))
            if t == "documents" and i > 0:
                # near-dup replicas: same text + one extra token
                r = r.withColumn(
                    "text", F.concat("text", F.lit(f" rep{i}"))
                )
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(f"{DEST}/{t}.parquet")
    open(os.path.join(DEST, "_DONE"), "w").write("ok\n")


DEST_SKEW = os.environ.get(
    "SPARK_GRAFT_STRESS_SKEW_DIR", "/tmp/spark_graft_stress_skew"
)
SKEW_COPIES = 10_000
SKEW_OPS = ["dedup_minhash", "dedup_cluster", "dedup_keep_best"]

DEST_SKEW_EV = os.environ.get(
    "SPARK_GRAFT_STRESS_SKEW_EV_DIR", "/tmp/spark_graft_stress_skew_ev"
)
HOT_USER_EVENTS = 100_000
SKEW_EV_OPS = [
    "events_journey_pattern",
    "win_sessionize",
    "events_user_lifetime",
    "events_markov_transitions",
]


def build_skew_events_corpus(spark) -> None:
    """The per-key skew corpus for the user-partitioned window/state
    family: ×10 events + ONE user with 100k events (a bot/scraper —
    the key that makes an uncapped per-user window or collect buffer
    the OOM task). Event ids fresh above the ×10 span; timestamps
    spread over one day so sessionization still has gaps to find."""
    if os.path.exists(os.path.join(DEST_SKEW_EV, "_DONE")):
        return
    build_corpus(spark)
    os.makedirs(DEST_SKEW_EV, exist_ok=True)
    from slowlog2clickhouse_spark.io import load_table

    ev = load_table(spark, DEST, "events")
    maxima = ev.agg(
        F.max("event_id").alias("me"), F.max("user_id").alias("mu")
    ).collect()[0]
    template = ev.orderBy("event_id").limit(1)
    hot = (
        spark.range(HOT_USER_EVENTS)
        .crossJoin(F.broadcast(template.drop("event_id", "user_id", "ts")))
        .select(
            (F.col("id") + F.lit(int(maxima["me"]) + 1)).alias("event_id"),
            F.lit(int(maxima["mu"]) + 1).alias("user_id"),
            # one event every ~0.86 s across one day
            (
                F.lit("2024-06-01 00:00:00").cast("timestamp")
                + F.make_dt_interval(secs=F.col("id") * 0.864)
            ).alias("ts"),
            *[
                c
                for c in ev.columns
                if c not in ("event_id", "user_id", "ts")
            ],
        )
        .select(*ev.columns)
    )
    ev.unionByName(hot).write.mode("overwrite").parquet(
        f"{DEST_SKEW_EV}/events.parquet"
    )
    for t in SHIFT_SPEC:
        if t == "events":
            continue
        link = os.path.join(DEST_SKEW_EV, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(DEST, f"{t}.parquet"), link)
    open(os.path.join(DEST_SKEW_EV, "_DONE"), "w").write("ok\n")


def build_skew_corpus(spark) -> None:
    """The hot-key corpus: ×10 documents + 10⁴ EXACT copies of one
    template (fresh doc_ids above the ×10 span — all 4 minhash bands
    collide for every pair of copies, the worst case for the band
    join). Non-document tables are symlinked to the ×10 corpus."""
    if os.path.exists(os.path.join(DEST_SKEW, "_DONE")):
        return
    build_corpus(spark)
    os.makedirs(DEST_SKEW, exist_ok=True)
    from slowlog2clickhouse_spark.io import load_table

    docs = load_table(spark, DEST, "documents")
    base_max = docs.agg(F.max("doc_id")).collect()[0][0]
    template = docs.orderBy("doc_id").limit(1)
    hot = (
        spark.range(SKEW_COPIES)
        .crossJoin(F.broadcast(template.drop("doc_id")))
        .withColumn("doc_id", F.col("id") + F.lit(int(base_max) + 1))
        .drop("id")
        .select(*docs.columns)
    )
    docs.unionByName(hot).write.mode("overwrite").parquet(
        f"{DEST_SKEW}/documents.parquet"
    )
    for t in SHIFT_SPEC:
        if t == "documents":
            continue
        link = os.path.join(DEST_SKEW, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(DEST, f"{t}.parquet"), link)
    open(os.path.join(DEST_SKEW, "_DONE"), "w").write("ok\n")


def main() -> None:
    from slowlog2clickhouse_spark.registry import all_ops
    from slowlog2clickhouse_spark.session import get_session

    argv = sys.argv[1:]
    skew = "--skew" in argv
    skew_ev = "--skew-events" in argv
    argv = [a for a in argv if a not in ("--skew", "--skew-events")]
    names = argv or (
        SKEW_EV_OPS if skew_ev else SKEW_OPS if skew else DEFAULT_OPS
    )
    spark = get_session(app_name="stress_probe")
    t0 = time.time()
    build_corpus(spark)
    if skew:
        build_skew_corpus(spark)
    if skew_ev:
        build_skew_events_corpus(spark)
    print(f"corpus ready in {time.time() - t0:.0f}s at {DEST}", flush=True)
    ops = all_ops()
    alt_label, alt_dir = (
        ("skew_ev", DEST_SKEW_EV)
        if skew_ev
        else ("skew", DEST_SKEW) if skew else ("x10", DEST)
    )
    base_label = "x10" if (skew or skew_ev) else "sf0.1"
    print(f"| op | {base_label} | {alt_label} | ratio |", flush=True)
    print("|---|---|---|---|", flush=True)
    for name in names:
        times = {}
        for label, d in (
            ("base", DEST if (skew or skew_ev) else BASE),
            ("x10", alt_dir),
        ):
            spark.catalog.clearCache()
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
            ops[name].fn(spark, d).count()  # warmup
            t0 = time.time()
            ops[name].fn(spark, d).count()
            times[label] = time.time() - t0
        ratio = times["x10"] / times["base"] if times["base"] else float("inf")
        print(
            f"| {name} | {times['base']:.2f} | {times['x10']:.2f} "
            f"| {ratio:.1f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
