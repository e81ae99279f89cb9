"""Scale-growth measurement for the round-5d data-heavy operators.

Protocol follows tools/scale_growth.py: replicate the input via a key
shift (worst case for the dedup — every segment collides with its
replicas, so the champion groups grow linearly with the multiple),
warm min-of-N wall, run ALONE.

- paragraph dedup: documents x{1,4,16} via doc_id shift. Duplicated
  replicas mean every segment beyond the first copy is dropped — the
  first-occurrence champion aggregation carries the full collision
  load, which is exactly the stage whose map-side combine we claim
  scales.
- ALS half-step: lineitem x{1,4,16} via orderkey shift joined against
  an equally replicated orders side, so per-customer group sizes grow
  linearly (the per-entity sufficient-statistics aggregation is the
  claimed-scalable stage).

Usage: python tools/round5d_growth.py [--sf DIR] [--multiples 1,4,16]
       [--runs 2]
Prints one markdown row per (query, multiple) plus a JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def _wall(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--multiples", default="1,4,16")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    multiples = [int(m) for m in args.multiples.split(",")]

    from pyspark.sql import functions as F

    from spark_clustering_spark.functions.rng import lcg_uniform
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.clustering import ALS_LAMBDA
    from spark_clustering_spark.pipeline.dedup import PARA_W
    from spark_clustering_spark.session import get_spark

    spark = get_spark("round5d_growth")
    results = []

    docs = table(spark, args.sf, "documents").select("doc_id", "text")
    n_docs = docs.count()
    li0 = table(spark, args.sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o0 = table(spark, args.sf, "orders").select("o_orderkey", "o_custkey")
    max_ok = o0.agg(F.max("o_orderkey")).collect()[0][0]

    def replicate(df, key, shift, m):
        parts = [
            df.withColumn(key, F.col(key) + F.lit(int(i * shift)))
            for i in range(m)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    print("| query | multiple | rows in | wall |")
    print("|---|---|---|---|")
    for m in multiples:
        d = replicate(docs, "doc_id", n_docs, m)

        def para():
            toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
            starts = F.sequence(
                F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(PARA_W)
            )
            seg = (
                d.select("doc_id", toks.alias("toks"))
                .filter(F.size("toks") > 0)
                .select("doc_id", "toks", F.explode(starts).alias("start"))
                .select(
                    "doc_id",
                    (F.col("start") / PARA_W).cast("bigint").alias("seg_id"),
                    F.md5(
                        F.concat_ws(
                            " ",
                            F.slice("toks", F.col("start") + 1, F.lit(PARA_W)),
                        )
                    ).alias("h"),
                )
            )
            firsts = seg.groupBy("h").agg(
                F.min(F.struct("doc_id", "seg_id")).alias("first")
            )
            kept = seg.join(firsts, "h").filter(
                (F.col("first.doc_id") == F.col("doc_id"))
                & (F.col("first.seg_id") == F.col("seg_id"))
            )
            kept.groupBy().count().collect()

        w = _wall(para, args.runs)
        print(f"| q_text_dedup_paragraph | {m}x | {n_docs * m} docs | {w:.2f} s |")
        results.append(
            {"query": "q_text_dedup_paragraph", "multiple": m, "wall_s": round(w, 2)}
        )

    for m in multiples:
        li = replicate(li0, "l_orderkey", max_ok + 1, m)
        o = replicate(
            o0.withColumnRenamed("o_orderkey", "l_orderkey"),
            "l_orderkey",
            max_ok + 1,
            m,
        )
        n_li = None

        def als():
            pts = li.select(
                "l_orderkey",
                F.col("l_quantity").cast("double").alias("r"),
                (1.0 + lcg_uniform("l_partkey", seed=101)).alias("v1"),
                (1.0 + lcg_uniform("l_partkey", seed=202)).alias("v2"),
            ).join(o, "l_orderkey")
            DEC = "decimal(38,8)"
            s = pts.groupBy("o_custkey").agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum((F.col("v1") * F.col("v1")).cast(DEC)).cast("double").alias("s11"),
                F.sum((F.col("v1") * F.col("v2")).cast(DEC)).cast("double").alias("s12"),
                F.sum((F.col("v2") * F.col("v2")).cast(DEC)).cast("double").alias("s22"),
                F.sum((F.col("r") * F.col("v1")).cast(DEC)).cast("double").alias("b1"),
                F.sum((F.col("r") * F.col("v2")).cast(DEC)).cast("double").alias("b2"),
            )
            lam = F.lit(ALS_LAMBDA)
            det = (F.col("s11") + lam) * (F.col("s22") + lam) - F.col("s12") ** 2
            s.select(
                (((F.col("s22") + lam) * F.col("b1") - F.col("s12") * F.col("b2")) / det).alias("u1")
            ).groupBy().count().collect()

        w = _wall(als, args.runs)
        n_li = li.count()
        print(f"| q_ml_als_step | {m}x | {n_li} lineitems | {w:.2f} s |")
        results.append(
            {"query": "q_ml_als_step", "multiple": m, "wall_s": round(w, 2)}
        )

    print(json.dumps({"sf": args.sf, "rows": results}))


if __name__ == "__main__":
    main()
