"""Scaling-exponent sweep for the bench heavy tail (VERDICT r15 #2).

The five most expensive BENCH rows have scale-safe PLANS but, until
r16, only sf0.001→sf0.1 measurements. This harness synthesizes
distribution-matched corpora at 1×/3×/10×/30× the sf0.1 row counts
under /tmp and measures warm wall-clock per op per scale, then fits
the scaling exponent b in t = a·n^b by log-log least squares.

Distribution matching (probed from /root/testdata/sf0.1, seed fixed):
- documents: the REAL 31-word vocab (read from the testdata at gen
  time), length U[10,100] words, langs {en:.41, others:.1475},
  20 uniform sources, ~5% of docs are near-dup mutations of another
  doc (5 words replaced) — constant near-dup DENSITY so candidate
  pairs grow linearly, the same shape the testdata shows (233 shared-
  prefix groups per 5k docs).
- embeddings: 64-dim, 10 clusters with weak separation (0.3·center +
  N(0,1) noise — near-uniform, matching the testdata's low LSH
  recall), labels uniform.
- events: users scale WITH rows so the per-user chain stays ~66 hops
  (the testdata invariant graph_components_star documents); ts uniform
  over 30 days, event_id ordered by ts.
- slow-log fleet: 4 host files × {1k, 3k, 10k, 30k} records of synthetic
  records through the REAL slowlog_tail_multi datasource, availableNow
  drain to a memory sink (the stream_slowlog_tail_multi shape).

Usage:
    python scripts/heavy_tail_scaling.py [--runs 3] [--mults 1,3,10,30]

Prints one markdown row per (op, scale) plus a fitted-exponent table
for SCALING.md. Corpora are cached under /tmp/scale_x{m} and reused.
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REAL_SF01 = "/root/testdata/sf0.1"
BASE = {"documents": 5000, "embeddings": 2000, "events": 100_000, "users": 1500}
DIM, N_CLUSTERS, N_SOURCES = 64, 10, 20
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _vocab() -> list[str]:
    import duckdb

    rows = duckdb.sql(
        "SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM "
        f"read_parquet('{REAL_SF01}/documents.parquet') ORDER BY w"
    ).fetchall()
    return [r[0] for r in rows]


def gen_dir(mult: int, out_dir: str) -> None:
    """Write documents/embeddings/events.parquet at mult× sf0.1 counts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42 + mult)
    vocab = np.asarray(_vocab())

    # documents ---------------------------------------------------------
    n = BASE["documents"] * mult
    lens = rng.integers(10, 101, n)
    texts = [" ".join(rng.choice(vocab, k)) for k in lens]
    # near-dup mutations at constant density: victim copies a base doc
    # with 5 words replaced — pairs grow O(n), clusters stay O(1)
    n_mut = n // 20
    victims = rng.choice(n, n_mut, replace=False)
    for v in victims:
        src = int(rng.integers(0, n))
        words = texts[src].split(" ")
        for _ in range(min(5, len(words))):
            words[int(rng.integers(0, len(words)))] = str(rng.choice(vocab))
        texts[v] = " ".join(words)
    langs = rng.choice(LANGS, n, p=LANG_P)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array([f"src{i % N_SOURCES}" for i in range(n)]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{out_dir}/documents.parquet",
    )

    # embeddings --------------------------------------------------------
    m = BASE["embeddings"] * mult
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    labels = rng.integers(0, N_CLUSTERS, m)
    emb = (0.3 * centers[labels] + rng.standard_normal((m, DIM))).astype(
        "float32"
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(m), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )

    # events ------------------------------------------------------------
    k = BASE["events"] * mult
    users = BASE["users"] * mult  # chain length stays ~66 at every mult
    ts = np.sort(
        rng.integers(0, 30 * 24 * 3600 * 1_000_000, k)
    ) + np.datetime64("2024-01-01").astype("datetime64[us]").astype("int64")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(k), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, users, k), pa.int64()),
                "event_type": pa.array(
                    rng.choice(
                        ["view", "click", "purchase", "signup", "error"], k
                    )
                ),
                "value": pa.array(
                    np.round(rng.uniform(0, 200, k), 2), pa.float64()
                ),
                "props": pa.array(
                    [f'{{"k": {int(x)}}}' for x in rng.integers(0, 100, k)]
                ),
            }
        ),
        f"{out_dir}/events.parquet",
    )


def _measure(fn, runs: int) -> float:
    fn()  # warmup, unrecorded
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    return statistics.median(times)


def _fit_exponent(ns: list[int], ts: list[float]) -> float:
    """Least-squares slope of log t vs log n."""
    lx = [math.log(x) for x in ns]
    ly = [math.log(y) for y in ts]
    mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return num / den if den else float("nan")  # <2 scale points: no fit


def _tail_drain(spark, n_records: int, tmp: str) -> None:
    """One availableNow drain of 4 host files × n_records each through
    the real slowlog_tail_multi datasource (the
    stream_slowlog_tail_multi deployment shape)."""
    import shutil

    from slowlog2clickhouse_spark.sources.slowlog_datasource import register
    from slowlog2clickhouse_spark.streaming.slowlog_stream import _SENTINEL

    register(spark)
    base = f"{tmp}/tail_{n_records}_{time.monotonic_ns()}"
    os.makedirs(f"{base}/logs")
    rec = (
        "# Time: 2024-01-01T00:00:{s:02d}.000000Z\n"
        "# Query_time: 0.5  Lock_time: 0.0 Rows_sent: 1  Rows_examined: 1\n"
        "SELECT {i};\n"
    )
    for h in range(4):
        with open(f"{base}/logs/host_{h}.log", "w") as f:
            f.write(
                "".join(
                    rec.format(s=i % 60, i=h * n_records + i)
                    for i in range(n_records)
                )
                + _SENTINEL
            )
    name = f"scale_tail_{time.monotonic_ns()}"
    q = (
        spark.readStream.format("slowlog_tail_multi")
        .option("path", f"{base}/logs")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    assert spark.table(name).count() >= 4 * n_records - 4
    spark.catalog.dropTempView(name)  # returns False if absent
    shutil.rmtree(base, ignore_errors=True)


BATCH_OPS = {
    # op -> the table whose row count is its scaling n
    "graph_components_star": "events",
    "dedup_cluster": "documents",
    "dedup_lsh_band_sweep": "documents",
    "ann_recall_eval": "embeddings",
}


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    mults = [1, 3, 10, 30]
    while args:
        if args[0] == "--runs":
            runs = int(args[1])
            args = args[2:]
        elif args[0] == "--mults":
            mults = [int(x) for x in args[1].split(",")]
            args = args[2:]
        else:
            print(__doc__)
            sys.exit(2)

    from slowlog2clickhouse_spark.registry import all_ops
    from slowlog2clickhouse_spark.session import get_session

    for m in mults:
        d = f"/tmp/scale_x{m}"
        if not os.path.exists(f"{d}/events.parquet"):
            t0 = time.monotonic()
            gen_dir(m, d)
            print(f"# generated {d} in {time.monotonic() - t0:.1f}s", flush=True)

    spark = get_session()
    ops = all_ops()
    results: dict[str, tuple[list[int], list[float]]] = {}

    print("| op | n axis | " + " | ".join(f"x{m}" for m in mults) + " |")
    print("|---" * (len(mults) + 2) + "|")
    for name, table in BATCH_OPS.items():
        ns, meds = [], []
        for mlt in mults:
            spark.catalog.clearCache()
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
            d = f"/tmp/scale_x{mlt}"
            med = _measure(lambda: ops[name].fn(spark, d).count(), runs)
            ns.append(BASE[table] * mlt)
            meds.append(med)
        results[name] = (ns, meds)
        print(
            f"| {name} | {table} rows | "
            + " | ".join(f"{t:.2f}" for t in meds)
            + " |",
            flush=True,
        )

    # streaming tail: bytes axis at fixed 4-file width (the 30k point
    # exists to surface the linear parse term past the ~2.5s fixed
    # availableNow scheduling floor the first three points sit on)
    tail_ns = [1000, 3000, 10000, 30000]
    tail_meds = []
    for nr in tail_ns:
        med = _measure(lambda: _tail_drain(spark, nr, "/tmp"), runs)
        tail_meds.append(med)
    results["stream_slowlog_tail_multi(drain)"] = (
        [4 * x for x in tail_ns],
        tail_meds,
    )
    print(
        "| stream_slowlog_tail_multi(drain) | records (4 files) | "
        + " | ".join(f"{t:.2f}" for t in tail_meds)
        + " | (x-axis 4k/12k/40k/120k records) |",
        flush=True,
    )

    print("\n| op | fitted exponent b (t = a*n^b) | points |")
    print("|---|---|---|")
    for name, (ns, meds) in results.items():
        b = _fit_exponent(ns, meds)
        print(f"| {name} | {b:.2f} | {len(ns)} |", flush=True)


if __name__ == "__main__":
    main()
