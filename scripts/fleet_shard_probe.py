"""Fleet SHARDING probe (r14): measure what `.option("shard", "i/n")`
actually buys — per-stream offset size and checkpoint-log churn — and
what it costs in drain wall, on the same corpus.

Topologies compared, same N timestamp-shifted fixture copies:
  * unsharded — one slowlog_tail_multi stream over all N files;
  * sharded   — n_shards independent streams (own checkpoints, own
    sinks) over the md5(rotation-base) hash-slices, started together
    and drained concurrently (the production shape: separate jobs).

Reported per topology: drain wall (availableNow, one batch per
stream; a discarded warm-up drain runs first so both measured
topologies see a warm JVM and page cache), events drained (verified:
unsharded count == sum of shard counts — a silently unclaimed or
double-claimed slice fails loudly), per-stream offset JSON bytes (the payload
Spark rewrites into the checkpoint offset AND commit logs every
micro-batch), and the on-disk checkpoint bytes after the drain. The
headline number is bytes-per-trigger of checkpoint churn: sharding
divides it by n per stream, which at a 5 s trigger is the difference
between ~12 GB/day and ~12/n GB/day of log-churn per stream at 5k
files (SCALING.md fleet-width table).

Usage: python scripts/fleet_shard_probe.py [n_files] [n_shards]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from slowlog2clickhouse_spark.operators.slowlog_ops import FIXTURE_LOG
    from slowlog2clickhouse_spark.session import ensure_compat
    from slowlog2clickhouse_spark.sources.slowlog_datasource import (
        SlowlogMultiTailStreamReader,
        register,
    )
    from slowlog2clickhouse_spark.streaming.slowlog_stream import _SENTINEL

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("fleet_shard_probe")
        .getOrCreate()
    )
    ensure_compat(spark)
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)

    base = os.path.join("/tmp", f"fleet_shard_probe_{n_files}x{n_shards}")
    logs = os.path.join(base, "logs")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(logs)
    txt = open(FIXTURE_LOG).read()
    for i in range(n_files):
        with open(os.path.join(logs, f"host_{i:04d}.log"), "w") as f:
            f.write(
                re.sub(r"# Time: 20(\d\d)-", f"# Time: 21{i % 90:02d}-", txt)
            )
            f.write(_SENTINEL)

    def drain(shard: str | None, tag: str) -> dict:
        out = os.path.join(base, f"out_{tag}")
        ckpt = os.path.join(base, f"ckpt_{tag}")
        reader = spark.readStream.format("slowlog_tail_multi").option(
            "path", logs
        )
        if shard is not None:
            reader = reader.option("shard", shard)
        events = reader.load().where(F.col("query").isNotNull())

        def sink(batch_df, epoch_id):
            batch_df.groupBy().count().write.mode("overwrite").parquet(out)


        q = (
            events.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        return {"q": q, "out": out, "ckpt": ckpt, "shard": shard}

    # driver-side poll view of the offset payload per topology
    def offset_bytes(shard: str | None) -> int:
        opts = {"path": logs}
        if shard is not None:
            opts["shard"] = shard
        r = SlowlogMultiTailStreamReader(opts)
        return len(json.dumps(r.latestOffset()))

    def count_of(out: str) -> int:
        return spark.read.parquet(out).collect()[0][0]

    # discarded warm-up: both MEASURED topologies then run against a
    # warm JVM, warm streaming machinery, and a hot page cache — the
    # first streaming query of a session otherwise pays one-time costs
    # that land entirely on whichever topology runs first (r14 review)
    w = drain(None, "warmup")
    w["q"].awaitTermination()

    # unsharded drain
    t0 = time.time()
    d = drain(None, "full")
    d["q"].awaitTermination()
    full_wall = time.time() - t0
    full_ckpt = _du(d["ckpt"])
    full_off = offset_bytes(None)
    full_n = count_of(d["out"])

    # sharded drains, started together (concurrent streams)
    t0 = time.time()
    ds = [drain(f"{i}/{n_shards}", f"s{i}") for i in range(n_shards)]
    for d2 in ds:
        d2["q"].awaitTermination()
    shard_wall = time.time() - t0
    shard_ckpts = [_du(d2["ckpt"]) for d2 in ds]
    shard_offs = [offset_bytes(f"{i}/{n_shards}") for i in range(n_shards)]
    shard_ns = [count_of(d2["out"]) for d2 in ds]
    assert sum(shard_ns) == full_n, (shard_ns, full_n)  # disjoint cover

    print(
        json.dumps(
            {
                "n_files": n_files,
                "n_shards": n_shards,
                "unsharded": {
                    "drain_s": round(full_wall, 1),
                    "events": full_n,
                    "offset_json_bytes": full_off,
                    "ckpt_bytes_after_drain": full_ckpt,
                },
                "sharded": {
                    "drain_s_concurrent": round(shard_wall, 1),
                    "events_per_stream": shard_ns,
                    "offset_json_bytes_per_stream": shard_offs,
                    "ckpt_bytes_per_stream": shard_ckpts,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
