"""Gate-crossover measurement for embedding_near_dup_pairs (VERDICT r8
task 7): the blocked cogroup path that exists for 100 TB must be the
path that gets MEASURED, not just gated away.

Three configurations on the sf10 embeddings (200k x 64 = 12.8M elems,
just under the 2^24 broadcast gate):

1. broadcast  — the gate-covered path, as every committed tier runs it;
2. blocked-forced — SAME corpus, broadcast_elems=0: the count-derived
   grid engages (cap-derived n_blocks, sub-tile emission) and the pair
   set must be IDENTICAL to (1);
3. blocked-by-gate — 2x replicated corpus (400k x 64 = 25.6M elems):
   the gate itself flips, nothing is forced — the exact configuration
   where the old fixed n_blocks=8 would have built a ~(400k/8)^2-double
   score tile (~20 GB/task); the derived grid holds every tile at
   GEMM_TILE_BYTES.

Prints one JSON line; exit 1 if the two same-corpus paths disagree.
Run ALONE (bench isolation).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata_sf10")
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--json", help="also write the JSON line here")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_clustering_spark.functions.distance import as_double_array
    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.dedup import (
        _gemm_row_cap,
        embedding_near_dup_pairs,
    )
    from spark_clustering_spark.pipeline.similarity import GEMM_TILE_BYTES
    from spark_clustering_spark.session import get_spark

    spark = get_spark("near-dup-gate")
    ve = table(spark, args.sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("vec")
    ).persist()
    n = ve.count()
    d = 64
    cap = _gemm_row_cap(d)

    def run(df, **kw):
        t0 = time.monotonic()
        out = embedding_near_dup_pairs(df, threshold=args.threshold, **kw)
        rows = out.count()
        return round(time.monotonic() - t0, 1), rows

    w_b, r_b = run(ve)                          # broadcast (gate-covered)
    w_f, r_f = run(ve, broadcast_elems=0)       # blocked, forced

    rep = ve.unionByName(
        ve.select((F.col("vec_id") + F.lit(n)).alias("vec_id"), "vec")
    ).persist()
    n2 = rep.count()
    assert n2 * d > 2**24, "replication did not cross the gate"
    w_g, r_g = run(rep)                         # blocked, by the gate itself

    nb2 = max(1, -(-n2 // cap))
    out = {
        "check": "embedding_near_dup_pairs gate crossover",
        "sf": args.sf,
        "threshold": args.threshold,
        "n": n,
        "gemm_tile_bytes": GEMM_TILE_BYTES,
        "row_cap": cap,
        "broadcast": {"wall_s": w_b, "pairs": r_b},
        "blocked_forced": {
            "wall_s": w_f,
            "pairs": r_f,
            "n_blocks": max(1, -(-n // cap)),
        },
        "blocked_by_gate_2x": {
            "wall_s": w_g,
            "pairs": r_g,
            "n_corpus": n2,
            "n_blocks": nb2,
            "tile_bytes_at_cap": 8 * (cap * cap + 2 * cap * d),
            "fixed8_tile_bytes_would_be": 8 * ((n2 // 8) ** 2),
        },
        "paths_agree": r_b == r_f,
        # every original pairs with its replica at cos 1.0, so the 2x
        # corpus must contain >= n such pairs on top of 4x the base set
        "replica_pairs_floor_ok": r_g >= n + 4 * r_b,
    }
    line = json.dumps(out)
    print(line)
    if args.json:
        Path(args.json).write_text(line + "\n")
    if not out["paths_agree"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
