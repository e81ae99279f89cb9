"""sf10 closure for q_dedup_embedding (r11 verdict-task-1 tail).

The registered DuckDB oracle is the n² inequality self-join with
``list_cosine_similarity`` per pair — 2e10 interpreted list evals at
sf10's 200k vectors, far past the sweep's 5400 s budget (the r11
oracle-cost audit's one surviving infeasible). The engine side is the
blocked float64-BLAS GEMM (pipeline/dedup.py::embedding_near_dup_pairs),
whose grid-independence is bit-asserted in tests/test_scale.py.

This closure follows the knn_sf1_check.py precedent but swaps DuckDB
for a dense numpy float64 oracle — the SAME arithmetic contract as the
engine kernel (float32 parquet values widened to float64, per-row L2
normalization, dgemm dot products), computed from the raw parquet with
none of the engine's code paths: tiled dense matmul over the full
200k×200k score matrix (5.1 TFLOP, ~1-2 min on 32 cores). Verified
row-exactly, not just aggregates: pair ids exact, cos compared after
the engine's own 4-dp shortest-repr HALF_UP rounding (dround parity).

Usage: python tools/embedding_sf10_check.py [--sf DIR] [--json OUT]
Prints one JSON line; exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

THRESHOLD = 0.45  # the declared query's cut (pipeline/dedup.py)
TILE = 8192  # oracle GEMM tile: 8192x8192 doubles = 512 MB score slab


def _dround4(v: float) -> float:
    # Spark's dround: double -> DECIMAL(38,12) via shortest repr
    # (Double.toString), round HALF_UP to 4 dp, back to double
    return float(
        Decimal(repr(float(v))).quantize(Decimal("0.0001"), ROUND_HALF_UP)
    )


def numpy_pairs(sf: str):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        str(Path(sf) / "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t.column("vec_id").to_numpy()
    n = len(ids)
    emb = t.column("embedding")
    flat = emb.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    d = len(flat) // n
    M = flat.astype(np.float64).reshape(n, d)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    out = []
    for alo in range(0, n, TILE):
        A = M[alo : alo + TILE]
        ia = ids[alo : alo + TILE]
        # upper triangle only: b tiles start at the a tile
        for blo in range(alo, n, TILE):
            S = A @ M[blo : blo + TILE].T
            ib = ids[blo : blo + TILE]
            mask = (S >= THRESHOLD) & (ia[:, None] < ib[None, :])
            xi, yi = mask.nonzero()
            for x, y in zip(xi.tolist(), yi.tolist()):
                out.append((int(ia[x]), int(ib[y]), _dround4(S[x, y])))
    out.sort()
    return out, n, d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata_sf10")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    t0 = time.time()
    oracle, n, d = numpy_pairs(args.sf)
    t_oracle = time.time() - t0

    from spark_clustering_spark.session import get_spark  # noqa: E402

    import __spark_entry__ as entrymod

    spark = get_spark()
    t1 = time.time()
    sdf = entrymod.queries()["q_dedup_embedding"](spark, args.sf)
    srows = sorted(
        (int(r["a_id"]), int(r["b_id"]), float(r["cos"]))
        for r in sdf.collect()
    )
    t_spark = time.time() - t1

    id_match = [(a, b) for a, b, _ in srows] == [(a, b) for a, b, _ in oracle]
    cos_diffs = [
        (sa, oa)
        for sa, oa in zip(srows, oracle)
        if sa[:2] == oa[:2] and sa[2] != oa[2]
    ]
    ok = id_match and not cos_diffs and len(srows) == len(oracle)
    rec = {
        "key": "q_dedup_embedding",
        "sf": args.sf,
        "status": "pass" if ok else "fail",
        "match": ok,
        "contract": "numpy-float64-dense-oracle, row-exact ids + 4dp cos",
        "n_vectors": n,
        "dim": d,
        "spark_pairs": len(srows),
        "oracle_pairs": len(oracle),
        "cos_diffs": len(cos_diffs),
        "first_diff": repr(cos_diffs[0]) if cos_diffs else None,
        "oracle_sec": round(t_oracle, 1),
        "spark_sec": round(t_spark, 1),
    }
    line = json.dumps(rec)
    print(line)
    if args.json:
        Path(args.json).write_text(line + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
