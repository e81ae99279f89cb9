"""Scale-growth measurement: wall time vs corpus multiple.

Extends PERF.md's MinHash 4x protocol to the blocked GEMM
(embedding near-dup, broadcast path disabled so the cogroup scale path
is what's measured) and IVF search. The corpus is replicated via
vec_id shift — identical replicas are the worst case for the
pair-emission stage (every vector pairs with its replicas at
threshold), exercised deliberately, same as the MinHash measurement.

Usage: python tools/scale_growth.py [--sf DIR] [--multiples 1,4,16]
       [--n-blocks 8] [--runs 2]
Prints one markdown row per (query, multiple) plus a JSON line.

Protocol notes: warm min-of-N wall via the no-op sink; run ALONE
(bench isolation — concurrent Spark sessions corrupt the numbers).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import reduce
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--multiples", default="1,4,16")
    ap.add_argument("--n-blocks", type=int, default=8)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from spark_clustering_spark.functions.distance import as_double_array
    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.dedup import embedding_near_dup_pairs
    from spark_clustering_spark.pipeline.similarity import ivf_topk, ivf_train
    from spark_clustering_spark.session import get_spark

    spark = get_spark("scale_growth")
    ve = table(spark, args.sf, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("vec")
    )
    n = ve.count()

    def replicated(times: int) -> DataFrame:
        parts = [
            ve.select((F.col("vec_id") + F.lit(i * n)).alias("vec_id"), "vec")
            for i in range(times)
        ]
        return reduce(DataFrame.unionByName, parts)

    def wall(df_fn) -> tuple[float, int]:
        best, rows = -1.0, -1
        for _ in range(args.runs):
            t0 = time.monotonic()
            df = df_fn()
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best < 0 else min(best, dt)
        rows = df_fn().count()
        return best, rows

    multiples = [int(x) for x in args.multiples.split(",")]
    results: dict[str, dict[int, dict[str, float]]] = {"gemm": {}, "ivf": {}}
    print(f"sf={args.sf} base_n={n} n_blocks={args.n_blocks} "
          f"runs={args.runs} (min)\n")
    print("| query | corpus | rows_out | wall s | growth |")
    print("|---|---|---|---|---|")
    for mult in multiples:
        rep = replicated(mult).persist()
        rep.count()  # materialize outside the timed region

        w, rows = wall(
            lambda: embedding_near_dup_pairs(
                rep, threshold=0.99, n_blocks=args.n_blocks, broadcast_elems=0
            )
        )
        base = results["gemm"].get(multiples[0], {}).get("wall", w)
        results["gemm"][mult] = {"wall": round(w, 3), "rows": rows}
        print(f"| gemm blocked | {mult}x ({mult * n}) | {rows} | {w:.2f} "
              f"| {w / base:.2f}x |")

        probes = rep.filter(F.col("vec_id") < 50).select(
            F.col("vec_id").alias("probe_id"), F.col("vec").alias("pvec")
        )
        coarse = ivf_train(rep).persist()
        coarse.count()
        w2, rows2 = wall(lambda: ivf_topk(rep, coarse, probes, nprobe=4, k=10))
        base2 = results["ivf"].get(multiples[0], {}).get("wall", w2)
        results["ivf"][mult] = {"wall": round(w2, 3), "rows": rows2}
        print(f"| ivf nprobe=4 | {mult}x ({mult * n}) | {rows2} | {w2:.2f} "
              f"| {w2 / base2:.2f}x |")

        # SemDeDup scale path: assign to the (pretrained, persisted)
        # quantizer + within-cluster pair scan. Identical replicas all
        # land in one cluster AND pair at cosine 1.0 -- worst case for
        # the in-cluster expansion, same spirit as the gemm row.
        from pyspark.sql.window import Window
        from spark_clustering_spark.functions.distance import cosine, euclidean

        def semdedup_pairs():
            pairs = rep.crossJoin(F.broadcast(coarse)).withColumn(
                "cdist", euclidean(F.col("vec"), F.col("cvec"))
            )
            wa = Window.partitionBy("vec_id").orderBy("cdist", "cid")
            assign = (
                pairs.withColumn("rn", F.row_number().over(wa))
                .filter(F.col("rn") == 1)
                .select("vec_id", "vec", "cid")
            )
            a = assign.select(
                "cid", F.col("vec_id").alias("ka"), F.col("vec").alias("va")
            )
            b = assign.select(
                "cid", F.col("vec_id").alias("kb"), F.col("vec").alias("vb")
            )
            return (
                a.join(b, "cid")
                .filter(F.col("ka") < F.col("kb"))
                .filter(cosine(F.col("va"), F.col("vb")) >= 0.99)
                .select("ka", "kb")
            )

        results.setdefault("semdedup", {})
        w3, rows3 = wall(semdedup_pairs)
        base3 = results["semdedup"].get(multiples[0], {}).get("wall", w3)
        results["semdedup"][mult] = {"wall": round(w3, 3), "rows": rows3}
        print(f"| semdedup pairs | {mult}x ({mult * n}) | {rows3} | {w3:.2f} "
              f"| {w3 / base3:.2f}x |")

        # ... and the BLAS per-cluster scale path of the same scan
        from spark_clustering_spark.pipeline.similarity import (
            semdedup_pairs_gemm,
        )

        def semdedup_gemm():
            pairs = rep.crossJoin(F.broadcast(coarse)).withColumn(
                "cdist", euclidean(F.col("vec"), F.col("cvec"))
            )
            wa = Window.partitionBy("vec_id").orderBy("cdist", "cid")
            assign = (
                pairs.withColumn("rn", F.row_number().over(wa))
                .filter(F.col("rn") == 1)
                .select("vec_id", "vec", "cid")
            )
            return semdedup_pairs_gemm(assign, threshold=0.99)

        results.setdefault("semdedup_gemm", {})
        w4, rows4 = wall(semdedup_gemm)
        base4 = results["semdedup_gemm"].get(multiples[0], {}).get("wall", w4)
        results["semdedup_gemm"][mult] = {"wall": round(w4, 3), "rows": rows4}
        print(f"| semdedup gemm | {mult}x ({mult * n}) | {rows4} | {w4:.2f} "
              f"| {w4 / base4:.2f}x |")

        # ... and the DECLARED q_dedup_semantic path end-to-end
        # (in-query ivf_train + literal-centroid assignment + GEMM pair
        # scan + representative join) — VERDICT r4 task 5's done
        # criterion is this key, not just the helper, growing ~linearly
        from spark_clustering_spark.pipeline.similarity import semdedup

        results.setdefault("semdedup_declared", {})
        w5, rows5 = wall(lambda: semdedup(rep, threshold=0.99))
        base5 = results["semdedup_declared"].get(multiples[0], {}).get("wall", w5)
        results["semdedup_declared"][mult] = {"wall": round(w5, 3), "rows": rows5}
        print(f"| semdedup DECLARED | {mult}x ({mult * n}) | {rows5} | {w5:.2f} "
              f"| {w5 / base5:.2f}x |")
        coarse.unpersist()
        rep.unpersist()
    print()
    print(json.dumps({"sf": args.sf, "base_n": n, "results": results}))


if __name__ == "__main__":
    main()
