"""Behavior tests for the three round-7 snapshot ops (ADVICE r7):
independent Python recomputation, not just DuckDB parity — the oracle
and the op could share a misunderstanding; numpy/re can't.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import re

import numpy as np
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.registry import all_ops

OPS = all_ops()

SYM = {"view": "v", "click": "c", "signup": "s", "purchase": "p", "error": "e"}


def test_weighted_percentile_matches_numpy(spark, sf_dir):
    """Inverse-CDF weighted percentile recomputed row-for-row in numpy
    over the same (value, weight, tiebreak) order."""
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")
        .collect()
    )
    rows.sort(key=lambda r: (r[0], r[2], r[3]))
    v = np.array([r[0] for r in rows], dtype=np.float64)
    w = np.array([int(r[1]) for r in rows], dtype=np.int64)
    cw = np.cumsum(w)
    tot = int(cw[-1])

    def pct(p: float) -> float:
        return float(v[np.searchsorted(cw, p * tot, side="left")])

    got = OPS["agg_weighted_percentile"].fn(spark, sf_dir).collect()[0]
    assert got["total_weight"] == tot
    assert got["p50"] == pct(0.50)
    assert got["p90"] == pct(0.90)
    assert got["p99"] == pct(0.99)
    # the definitional invariants a quantile must satisfy
    assert got["p50"] <= got["p90"] <= got["p99"]


def _python_journeys(rows) -> dict[int, str]:
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], SYM.get(r["event_type"], "x"))
        )
    return {
        u: "".join(s for _, _, s in sorted(evs)) for u, evs in by_user.items()
    }


def test_journey_pattern_matches_python_re(spark, sf_dir):
    journeys = _python_journeys(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    got = {
        r["user_id"]: r
        for r in OPS["events_journey_pattern"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(journeys)
    for u, j in journeys.items():
        r = got[u]
        assert r["n_events"] == len(j)
        assert not r["truncated"]  # no sf user has >10k events
        assert r["n_conversions"] == len(re.findall("vc+p", j))
        assert r["n_error_loops"] == len(re.findall("ec*e", j))
        assert r["journey_md5"] == hashlib.md5(j.encode()).hexdigest()


def test_journey_truncation_keeps_last_10k_with_flag(spark, tmp_path):
    """Power-user cap (VERDICT r7 #6): >10k events → journey is the
    LAST 10k symbols, truncated=True, n_events stays the total."""
    n_big = 10_050
    t0 = dt.datetime(2025, 1, 1)
    rows = [
        # user 1: n_big views, then ends with c,p so a conversion
        # survives only if the TAIL is kept
        (i, t0 + dt.timedelta(seconds=i), 1,
         "view" if i < n_big - 2 else ("click" if i == n_big - 2 else "purchase"),
         1.0, "{}")
        for i in range(n_big)
    ] + [
        (100000 + i, t0 + dt.timedelta(seconds=i), 2, "error", 1.0, "{}")
        for i in range(3)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["user_id"]: r
        for r in OPS["events_journey_pattern"].fn(spark, str(tmp_path)).collect()
    }
    big = got[1]
    assert big["n_events"] == n_big and big["truncated"]
    tail = "v" * 9998 + "cp"  # last 10k symbols of the full journey
    assert big["journey_md5"] == hashlib.md5(tail.encode()).hexdigest()
    assert big["n_conversions"] == 1  # the tail-spanning vc+p survives
    small = got[2]
    assert small["n_events"] == 3 and not small["truncated"]
    # "eee" → non-overlapping left-to-right: "ee" consumed, lone "e" left
    assert small["n_error_loops"] == len(re.findall("ec*e", "eee")) == 1


def test_contamination_probe_matches_bruteforce_pandas(spark, sf_dir):
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    probes = {k: v for k, v in emb.items() if k < 20}
    got = {
        r["vec_id"]: r
        for r in OPS["vec_contamination_probe"].fn(spark, sf_dir).collect()
    }
    assert set(got) == {k for k in emb if k >= 20}
    for vid, r in got.items():
        cv = emb[vid]
        best = min(
            (
                (-round(float(np.dot(cv, pv) / (np.linalg.norm(cv) * np.linalg.norm(pv))), 6), pid)
                for pid, pv in probes.items()
            ),
        )
        assert r["best_probe"] == best[1]
        assert abs(r["best_cos"] - (-best[0])) < 1e-9
        assert r["contaminated"] == (r["best_cos"] >= 0.35)
