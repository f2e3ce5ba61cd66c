"""OPQ rotation on the WORST-CASE (near-uniform) corpus — r14 VERDICT #5.

ann_opq_rotation proves the rotation's geometry win on the planted-
cluster corpus (recall@3 at 4-bit/64x: 0.85 -> 0.9167), where the IVF
residuals are strongly anisotropic (spectrum 4.16 vs 0.06). The
production-shaped question this probe answers: does the SAME frozen-
rotation construction buy anything when the residuals are nearly
isotropic — the `embeddings` table's uniform regime, where
vec_knn_ivf_pq sits at recall 0.42-0.50? The hypothesis (and the
honest calibration the family needs either way): PCA of an isotropic
cloud is arbitrary, the snake allocation balances nothing because
every direction already carries the same variance, so rotation should
be ~a NULL RESULT. Every approximation ships its knob as a measured
curve; this knob's curve had one (favorable) point before this probe.

Three arms over ONE shared index build (cells / residuals / probe
fan-out identical; only the space the 4-bit Lloyd chains see differs):

  identity      — the un-rotated baseline (= ann_pq_bits_clustered's
                  4-bit arm, but on the uniform corpus);
  opq_matched   — OPQ-P re-derived from THIS corpus's residuals by the
                  exact shared construction
                  (scripts/gen_opq_rotation.opq_p_from_residuals);
  opq_clustered — the committed clustered-corpus matrix applied
                  unchanged (the "one global rotation shipped
                  fleet-wide" deployment mistake, measured).

adc_rows is identical across arms by construction (rotation is
probe/candidate-symmetric and never touches cell assignment), so any
recall delta is pure geometry — same argument as ann_opq_rotation.

Output: one JSON line per (rot, shortlist) grid cell + a spectrum
summary (top eigenvalue / median eigenvalue for both corpora — the
isotropy evidence). Recorded as the r15 grid row in SCALING.md.

Usage: [SPARK_GRAFT_SF_DIR=...] python scripts/opq_uniform_probe.py
Default corpus: /root/testdata/sf0.01 (the driver-parity scale).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import numpy as np

    from gen_opq_rotation import opq_p_from_residuals
    from slowlog2clickhouse_spark.operators._opq_rotation import (
        OPQ_ROT,
        OPQ_SPECTRUM,
    )
    from slowlog2clickhouse_spark.operators.vector import (
        _OPQ_SHORTLISTS,
        _PQBITS_NPROBE,
        PQ_K,
        PQ_M,
        PQ_SUB,
        _arm_adc_recall_grid,
        _ivfpq_adc_scored,
        _ivfpq_build_index,
        _opq_rotate,
    )
    from slowlog2clickhouse_spark.session import get_session
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_session(app_name="opq_uniform_probe")

    # ONE shared index build on the UNIFORM corpus (e=None -> the
    # embeddings table), cells wide open so quantization loss is the
    # only variable — the same discipline as ann_pq_bits_clustered.
    index = _ivfpq_build_index(spark, sf_dir, _PQBITS_NPROBE)
    with_e, cand_res, probe_cells = index
    cand_res = cand_res.localCheckpoint()
    probe_cells = probe_cells.localCheckpoint()
    index = (with_e, cand_res, probe_cells)

    R = np.asarray(
        [r["ed"] for r in cand_res.orderBy("vec_id").select("ed").collect()],
        dtype=np.float64,
    )
    mat_u, spec_u = opq_p_from_residuals(R, PQ_M, PQ_SUB)

    def _top_over_median(spec) -> float:
        # degenerate/low-rank residuals (tiny or constant corpus) can
        # zero the median eigenvalue; report inf rather than crash so
        # the spectrum summary still prints (ADVICE r15 #5)
        med = spec[len(spec) // 2]
        return spec[0] / med if med else float("inf")

    iso_u = _top_over_median(spec_u)
    iso_c = _top_over_median(OPQ_SPECTRUM)
    print(
        json.dumps(
            {
                "probe": "opq_uniform_spectrum",
                "n_residuals": int(R.shape[0]),
                "uniform_top4": spec_u[:4],
                "uniform_top_over_median": (
                    round(iso_u, 3) if np.isfinite(iso_u) else "inf"
                ),
                "clustered_top4": list(OPQ_SPECTRUM[:4]),
                "clustered_top_over_median": (
                    round(iso_c, 3) if np.isfinite(iso_c) else "inf"
                ),
            }
        )
    )

    arms_spec = (
        ("identity", None),
        ("opq_matched", mat_u),
        ("opq_clustered", OPQ_ROT),
    )
    arms = None
    for rot, mat in arms_spec:
        idx = (
            index
            if mat is None
            else (
                with_e,
                _opq_rotate(cand_res, "ed", mat=mat).localCheckpoint(
                    eager=False
                ),
                _opq_rotate(probe_cells, "rp", mat=mat).localCheckpoint(
                    eager=False
                ),
            )
        )
        _, scored = _ivfpq_adc_scored(
            spark, sf_dir, _PQBITS_NPROBE, pq_k=PQ_K, index=idx
        )
        if scored is None:
            print(json.dumps({"error": "empty corpus"}))
            return 1
        b = scored.drop("rnc").withColumn("rot", F.lit(rot))
        arms = b if arms is None else arms.unionByName(b)

    grid = _arm_adc_recall_grid(
        spark,
        with_e,
        arms,
        "rot",
        [r for r, _ in arms_spec],
        "string",
        _OPQ_SHORTLISTS,
    )
    rows = sorted(
        (
            (r["rot"], r["shortlist"], r["adc_rows"], r["hits"], r["truth_n"],
             r["recall"])
            for r in grid.collect()
        ),
        key=lambda t: (t[1], t[0]),
    )
    for rot, sl, adc, hits, tn, rec in rows:
        print(
            json.dumps(
                {
                    "probe": "opq_uniform_grid",
                    "rot": rot,
                    "shortlist": sl,
                    "adc_rows": adc,
                    "hits": hits,
                    "truth_n": tn,
                    "recall": rec,
                }
            )
        )
    # adc_rows equality across arms — the "pure geometry" invariant
    by_sl: dict = {}
    for rot, sl, adc, *_ in rows:
        by_sl.setdefault(sl, set()).add(adc)
    assert all(len(v) == 1 for v in by_sl.values()), (
        f"adc_rows diverged across arms: {by_sl}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
