"""Scale-growth measurement for the grid radius join.

Replicates the 2-D point cloud as DISJOINT plane tiles (each copy
shifted by 2 units in x — far beyond any radius), so the qualifying
pair count scales exactly linearly with the multiple and any
superlinear wall is plan waste, same protocol as
tools/triangle_growth.py.

Usage: python tools/spatial_growth.py [--sf DIR] [--multiples 1,4,16]
Run ALONE (bench isolation).
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
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.spatial import RADIUS
    from spark_clustering_spark.session import get_spark

    spark = get_spark("spatial_growth")
    base = table(spark, args.sf, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    n_base = base.count()
    r = float(RADIUS)

    def grid_pairs(p):
        cells = p.select(
            "vec_id", "x", "y",
            F.floor(F.col("x") / r).alias("gx"),
            F.floor(F.col("y") / r).alias("gy"),
        )
        offs = F.array(*[F.lit(d) for d in (-1, 0, 1)])
        probe = (
            cells.select(
                F.col("vec_id").alias("id_a"),
                F.col("x").alias("xa"),
                F.col("y").alias("ya"),
                F.explode(offs).alias("dx"),
                "gx",
                "gy",
            )
            .select(
                "id_a", "xa", "ya",
                (F.col("gx") + F.col("dx")).alias("gx"),
                F.explode(offs).alias("dy"),
                "gy",
            )
            .select("id_a", "xa", "ya", "gx", (F.col("gy") + F.col("dy")).alias("gy"))
        )
        build = cells.select(
            F.col("vec_id").alias("id_b"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            "gx",
            "gy",
        )
        d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
            F.col("ya") - F.col("yb")
        ) * (F.col("ya") - F.col("yb"))
        return (
            probe.join(build, ["gx", "gy"])
            .filter((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(r * r)))
        )

    results = []
    for m in [int(x) for x in args.multiples.split(",")]:
        copies = [
            base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                (F.col("x") + F.lit(2.0 * i)).alias("x"),
                F.col("y"),
            )
            for i in range(m)
        ]
        p = reduce(lambda a, b: a.unionByName(b), copies).localCheckpoint(
            eager=True
        )
        walls = []
        n_pairs = None
        for _ in range(args.runs):
            t0 = time.time()
            n_pairs = grid_pairs(p).count()
            walls.append(round(time.time() - t0, 2))
        results.append(
            {
                "multiple": m,
                "n_points": n_base * m,
                "n_pairs": n_pairs,
                "wall_s": min(walls),
            }
        )
        print(
            f"| {m}x ({n_base * m:,} pts) | {n_pairs:,} pairs "
            f"| {min(walls):.2f} s |",
            flush=True,
        )
    base_w = results[0]["wall_s"]
    for row in results:
        row["growth"] = round(row["wall_s"] / max(base_w, 1e-9), 2)
    print(json.dumps({"query": "q_join_spatial_grid", "rows": results}))


if __name__ == "__main__":
    main()
