"""Measure IVF recall@k vs brute-force cosine top-k.

Sweeps nprobe for both the trained quantizer (``ivf_train``: seeded
init + Lloyd refinement) and the untrained round-3 stand-in (the raw
seed vectors, n_iter=0), so the table shows what the training buys.

Usage: python tools/ivf_recall.py [--sf DIR] [--probes 50] [--k 10]
Prints one markdown row per (quantizer, nprobe) plus a JSON line.
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
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--probes", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobes", default="1,2,4,8")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_clustering_spark.functions.distance import as_double_array
    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.similarity import (
        cosine_topk_fast,
        ivf_nlist,
        ivf_topk,
        ivf_train,
    )
    from spark_clustering_spark.session import get_spark

    spark = get_spark()
    ve = (
        table(spark, args.sf, "embeddings")
        .select("vec_id", as_double_array("embedding").alias("vec"))
        .persist()
    )
    probes = ve.filter(F.col("vec_id") < args.probes).select(
        F.col("vec_id").alias("probe_id"), F.col("vec").alias("pvec")
    )
    probes_vt = probes.select(
        F.col("probe_id").alias("vec_id"), F.col("pvec").alias("vec")
    )

    exact: dict[int, set[int]] = {}
    for r in cosine_topk_fast(ve, probes_vt, k=args.k).collect():
        exact.setdefault(r["probe_id"], set()).add(r["cand_id"])

    quantizers = {
        "untrained (seeds)": ivf_train(ve, n_iter=0).persist(),
        "trained (2 Lloyd)": ivf_train(ve).persist(),
    }
    n_vec = ve.count()
    results: dict[str, dict[int, float]] = {}
    print(f"sf={args.sf} n={n_vec} nlist={ivf_nlist(n_vec)} "
          f"probes={args.probes} k={args.k}\n")
    print("| quantizer | nprobe | recall@k | wall s |")
    print("|---|---|---|---|")
    for qname, coarse in quantizers.items():
        results[qname] = {}
        for nprobe in (int(x) for x in args.nprobes.split(",")):
            t0 = time.monotonic()
            approx: dict[int, set[int]] = {}
            for r in ivf_topk(ve, coarse, probes, nprobe=nprobe, k=args.k).collect():
                approx.setdefault(r["probe_id"], set()).add(r["cand_id"])
            recalls = [
                len(exact[p] & approx.get(p, set())) / len(exact[p]) for p in exact
            ]
            rec = sum(recalls) / len(recalls)
            wall = time.monotonic() - t0
            results[qname][nprobe] = round(rec, 4)
            print(f"| {qname} | {nprobe} | {rec:.4f} | {wall:.2f} |")
    print()
    print(json.dumps({"sf": args.sf, "n": n_vec, "recall": results}))


if __name__ == "__main__":
    main()
