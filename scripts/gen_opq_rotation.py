"""Generate the frozen OPQ-style rotation for ann_opq_rotation.

The rotation is PCA + snake-balanced subspace allocation over the
planted-cluster corpus's IVF residuals (the OPQ-P shape: rotate into
the residual covariance's eigenbasis, then deal the eigen-directions
snake-wise into the m=8 PQ subspaces so each subspace carries a
balanced share of the variance). Everything upstream is
deterministic — the corpus is md5-generated, the IVF index build is
hash-seeded — so the rotation is a CONSTANT of the repo, computed
once here and frozen (rounded to 6 dp) into
``slowlog2clickhouse_spark/operators/_opq_rotation.py``.

Why frozen rather than trained at run time: the DuckDB oracle must
apply the SAME rotation, and SQL cannot eigendecompose — a committed
literal matrix keeps the op fully value-oracled. Why 6 dp is enough:
the rotation is a fixed linear preprocessing of the ADC space only
(truth and the exact re-rank stay in the ORIGINAL embedding space),
so it does not need to be exactly orthogonal, only identical on both
engines — and a 6-dp literal parses to the identical double
everywhere. tests/test_vector.py re-derives the matrix from the live
index and pins it against the frozen constant, so corpus or index
drift fails loudly at test time instead of silently skewing recall.

Eigenvector sign is canonicalized (largest-|component| positive) so
the decomposition is reproducible across LAPACK builds up to
eigenvalue degeneracy (none here: the spectrum is well separated,
4.16 vs 0.06 at the top).

Usage: python scripts/gen_opq_rotation.py [--check]
  --check: recompute and compare against the committed constant
           (exit 1 on drift) instead of rewriting it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "slowlog2clickhouse_spark",
    "operators",
    "_opq_rotation.py",
)


def opq_p_from_residuals(R, m: int, sub: int):
    """The OPQ-P construction, shared by the frozen clustered-corpus
    derivation below and scripts/opq_uniform_probe.py (r14 VERDICT #5
    — SAME construction on the uniform corpus, so the two arms differ
    only in the residuals they saw). (matrix, spectrum): rows of
    `matrix` are the snake-allocated, sign-canonicalized
    eigen-directions, rounded to 6 dp;
    rotated[i] = sum_j matrix[i][j] * residual[j]."""
    import numpy as np

    w, V = np.linalg.eigh(np.cov(R.T))
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    # canonical sign: largest-|component| of each eigenvector positive
    for c in range(V.shape[1]):
        k = int(np.abs(V[:, c]).argmax())
        if V[k, c] < 0:
            V[:, c] = -V[:, c]
    # snake-deal the eigen-directions (descending variance) into the
    # m subspaces: direction 0 -> subspace 0, ... direction m-1 ->
    # subspace m-1, direction m -> subspace m-1 again, and so on —
    # each subspace ends up with a balanced share of the spectrum
    groups: list[list[int]] = [[] for _ in range(m)]
    d, fwd = 0, True
    for _ in range(sub):
        for g in range(m) if fwd else range(m - 1, -1, -1):
            groups[g].append(d)
            d += 1
        fwd = not fwd
    perm = [i for g in groups for i in g]
    # rotated[i] = x . V[:, perm[i]]  =>  matrix[i][j] = V[j, perm[i]]
    mat = [[round(float(V[j, p]), 6) for j in range(V.shape[0])] for p in perm]
    return mat, [round(float(x), 6) for x in w]


def derive_rotation():
    """(matrix, spectrum) for the FROZEN committed constant: OPQ-P over
    the planted-cluster corpus's IVF residuals."""
    import numpy as np

    from slowlog2clickhouse_spark.operators.vector import (
        _PQBITS_NPROBE,
        PQ_M,
        PQ_SUB,
        _clustered_embeddings,
        _ivfpq_build_index,
    )
    from slowlog2clickhouse_spark.session import get_session

    spark = get_session(app_name="gen_opq_rotation")
    # sf_dir is DEAD here: e= supplies the fully synthetic corpus, so
    # the rotation does not depend on any on-disk test data — the
    # sentinel makes that explicit (and fails loudly if it ever would)
    _, cand_res, _ = _ivfpq_build_index(
        spark, "<unused-synthetic-corpus>", _PQBITS_NPROBE,
        e=_clustered_embeddings(spark),
    )
    R = np.asarray(
        [r["ed"] for r in cand_res.orderBy("vec_id").select("ed").collect()],
        dtype=np.float64,
    )
    return opq_p_from_residuals(R, PQ_M, PQ_SUB)


def render(mat, spectrum) -> str:
    rows = ",\n".join(
        "    (" + ", ".join(repr(x) for x in row) + ")" for row in mat
    )
    return (
        '"""FROZEN OPQ-style rotation (generated — do not hand-edit).\n'
        "\n"
        "Regenerate / verify: python scripts/gen_opq_rotation.py [--check]\n"
        "See that script for the derivation (PCA of the planted-cluster\n"
        "IVF residuals + snake-balanced subspace allocation, 6-dp\n"
        "rounded so Spark and the DuckDB oracle parse identical\n"
        'doubles). rotated[i] = sum_j OPQ_ROT[i][j] * residual[j].\n"""\n'
        "\n"
        f"OPQ_SPECTRUM = {tuple(spectrum)!r}\n"
        "\n"
        "OPQ_ROT = (\n" + rows + ",\n)\n"
    )


def main() -> int:
    mat, spectrum = derive_rotation()
    text = render(mat, spectrum)
    if "--check" in sys.argv:
        committed = open(OUT, encoding="utf-8").read()
        if committed != text:
            print("OPQ rotation DRIFT: committed constant != re-derived")
            return 1
        print("OPQ rotation check: committed constant matches re-derivation")
        return 0
    with open(OUT, "w", encoding="utf-8") as f:
        f.write(text)
    print(f"wrote {OUT}: 64x64 rotation, spectrum head {spectrum[:4]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
