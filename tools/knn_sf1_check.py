"""sf1 closure checks for the two exact-kNN deferrals (r6 verdict
task 3): q_vec_knn_graph and q_ml_knn_classify.

Both keys are hash-verified at sf0.001/0.01/0.1; at sf1 their DuckDB
oracles are O(n²·d) over the full subset (75+ minutes / 4e8 exploded
rows with per-term string-pivot decimal casts). Following the
theta-join precedent, this check shrinks the ORACLE side to a
deterministic probe sample P = {vec_id % SAMPLE_MOD == 0} and verifies
row-exactly — not just aggregates — everything the declared Spark
plans produce that touches P:

- q_vec_knn_graph: the declared FULL-graph Spark output, filtered to
  mutual edges incident to P, against a DuckDB oracle that computes
  exact-decimal top-k lists for P and for every neighbour that appears
  in a P top-k (mutuality means any edge incident to p∈P pairs p with
  a member of p's own top-k, so those two list sets determine every
  incident edge, including both ranks).
- q_ml_knn_classify: per-probe predictions (src, true_label,
  predicted) from the SAME data plane the declared key aggregates
  (pipeline.similarity.knn_predictions — since the r7 GEMM swap the
  src filter does NOT push through the Arrow cogroup kernels, so the
  Spark side runs the full blocked GEMM pair pass, seconds at sf1,
  and the sample filter applies on its output), against a DuckDB
  leave-one-out vote over P × full corpus.

Sample volumes at sf1 (n=20000, d=64): graph oracle ≤ (100+500)·2500·64
≈ 96M exploded terms; classify oracle 100·20000·64 = 128M — both well
inside DuckDB's envelope once the full-subset quadratics are gone.

Usage: python tools/knn_sf1_check.py [--sf DIR] [--sample-mod 200]
Prints one JSON line; exit 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

DEC_SUM = "cast(cast(sum((CASE WHEN abs({t}) < 5e-9 THEN cast(0 AS DECIMAL(38,8)) ELSE cast(cast({t} AS VARCHAR) AS DECIMAL(38,8)) END)) AS VARCHAR) AS DOUBLE)"
ROUND4 = "cast(cast(round(cast(cast(({c}) AS VARCHAR) AS DECIMAL(38,12)), 4) AS VARCHAR) AS DOUBLE)"


def check_knn_graph(spark, con, sf: str, sample_mod: int) -> dict:
    import __spark_entry__ as entrymod
    from spark_clustering_spark.pipeline.similarity import KNN_K, KNN_MOD

    t0 = time.time()
    # persist: the filtered collect and the full count below otherwise
    # recompute the whole n² pair pass twice
    sdf = entrymod.queries()["q_vec_knn_graph"](spark, sf).persist()
    from pyspark.sql import functions as F

    srows = sorted(
        (int(r["id_a"]), int(r["id_b"]), float(r["cos"]),
         int(r["rank_ab"]), int(r["rank_ba"]))
        for r in sdf.filter(
            (F.col("id_a") % sample_mod == 0) | (F.col("id_b") % sample_mod == 0)
        ).collect()
    )
    n_full = sdf.count()
    sdf.unpersist()
    t_spark = round(time.time() - t0, 1)

    t0 = time.time()
    con.execute(
        f"""CREATE OR REPLACE TEMP TABLE g_sub AS
        SELECT vec_id, embedding::DOUBLE[] AS vec
        FROM read_parquet('{sf}/embeddings.parquet')
        WHERE vec_id % {KNN_MOD} = 0"""
    )
    con.execute(
        """CREATE OR REPLACE TEMP TABLE g_unn AS
        SELECT vec_id, unnest(vec) AS v, generate_subscripts(vec, 1) AS pos
        FROM g_sub"""
    )
    con.execute(
        f"""CREATE OR REPLACE TEMP TABLE g_norms AS
        SELECT vec_id, sqrt({DEC_SUM.format(t='v * v')}) AS nrm
        FROM g_unn GROUP BY vec_id"""
    )

    def topk_for(src_pred: str, table: str) -> None:
        con.execute(
            f"""CREATE OR REPLACE TEMP TABLE {table} AS
            WITH dots AS (
              SELECT a.vec_id AS src, b.vec_id AS dst,
                     {DEC_SUM.format(t='a.v * b.v')} AS dot
              FROM g_unn a JOIN g_unn b
                ON a.pos = b.pos AND a.vec_id <> b.vec_id
              WHERE {src_pred}
              GROUP BY 1, 2
            ),
            scored AS (
              SELECT d.src, d.dst, d.dot / (na.nrm * nb.nrm) AS cos
              FROM dots d
              JOIN g_norms na ON na.vec_id = d.src
              JOIN g_norms nb ON nb.vec_id = d.dst
            )
            SELECT src, dst, cos,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY cos DESC, dst) AS rn
            FROM scored QUALIFY rn <= {KNN_K}"""
        )

    topk_for(f"a.vec_id % {sample_mod} = 0", "g_topk_p")
    topk_for("a.vec_id IN (SELECT DISTINCT dst FROM g_topk_p)", "g_topk_s1")
    drows = sorted(
        (int(a), int(b), float(c), int(ra), int(rb))
        for a, b, c, ra, rb in con.execute(
            f"""WITH topk AS (
              SELECT * FROM g_topk_p
              UNION SELECT * FROM g_topk_s1
            )
            SELECT t1.src AS id_a, t1.dst AS id_b,
                   {ROUND4.format(c='t1.cos')} AS cos,
                   t1.rn AS rank_ab, t2.rn AS rank_ba
            FROM topk t1 JOIN topk t2
              ON t2.src = t1.dst AND t2.dst = t1.src
            WHERE t1.src < t1.dst
              AND (t1.src % {sample_mod} = 0 OR t1.dst % {sample_mod} = 0)"""
        ).fetchall()
    )
    t_duck = round(time.time() - t0, 1)
    return {
        "query": "q_vec_knn_graph",
        "check": f"row-exact mutual edges incident to vec_id%{sample_mod}==0",
        "match": srows == drows,
        "n_checked": len(srows),
        "n_oracle": len(drows),
        "spark_rows_full": int(n_full),
        "sec_spark": t_spark,
        "sec_duck": t_duck,
        "first_diff": next(
            (
                {"spark": s, "duck": d}
                for s, d in zip(srows, drows)
                if s != d
            ),
            None,
        )
        if srows != drows
        else None,
    }


def check_knn_classify(spark, con, sf: str, sample_mod: int) -> dict:
    from pyspark.sql import functions as F

    from spark_clustering_spark.pipeline.similarity import (
        KNN_K,
        knn_predictions,
    )

    t0 = time.time()
    srows = sorted(
        (int(r["src"]), str(r["true_label"]), str(r["lbl"]))
        for r in knn_predictions(spark, sf)
        .filter(F.col("src") % sample_mod == 0)
        .collect()
    )
    t_spark = round(time.time() - t0, 1)

    t0 = time.time()
    drows = sorted(
        (int(s), str(tl), str(pl))
        for s, tl, pl in con.execute(
            f"""WITH ve AS (
              SELECT vec_id, label, embedding::DOUBLE[] AS vec
              FROM read_parquet('{sf}/embeddings.parquet')
            ),
            unn_all AS (
              SELECT vec_id, unnest(vec) AS v,
                     generate_subscripts(vec, 1) AS pos FROM ve
            ),
            unn_p AS (
              SELECT vec_id, v, pos FROM unn_all
              WHERE vec_id % {sample_mod} = 0
            ),
            norms AS (
              SELECT vec_id, sqrt({DEC_SUM.format(t='v * v')}) AS nrm
              FROM unn_all GROUP BY vec_id
            ),
            dots AS (
              SELECT a.vec_id AS src, b.vec_id AS dst,
                     {DEC_SUM.format(t='a.v * b.v')} AS dot
              FROM unn_p a JOIN unn_all b
                ON a.pos = b.pos AND a.vec_id <> b.vec_id
              GROUP BY 1, 2
            ),
            scored AS (
              SELECT d.src, d.dst, d.dot / (na.nrm * nb.nrm) AS cos
              FROM dots d
              JOIN norms na ON na.vec_id = d.src
              JOIN norms nb ON nb.vec_id = d.dst
            ),
            topk AS (
              SELECT src, dst,
                     row_number() OVER (PARTITION BY src
                                        ORDER BY cos DESC, dst) AS rn
              FROM scored QUALIFY rn <= {KNN_K}
            ),
            votes AS (
              SELECT t.src, v.label AS lbl, count(*) AS nv
              FROM topk t JOIN ve v ON v.vec_id = t.dst
              GROUP BY 1, 2
            ),
            pred AS (
              SELECT src, lbl,
                     row_number() OVER (PARTITION BY src
                                        ORDER BY nv DESC, lbl) AS pr
              FROM votes QUALIFY pr = 1
            )
            SELECT p.src, v.label AS true_label, p.lbl
            FROM pred p JOIN ve v ON v.vec_id = p.src"""
        ).fetchall()
    )
    t_duck = round(time.time() - t0, 1)
    return {
        "query": "q_ml_knn_classify",
        "check": f"row-exact LOO predictions for vec_id%{sample_mod}==0",
        "match": srows == drows,
        "n_checked": len(srows),
        "n_oracle": len(drows),
        "sec_spark": t_spark,
        "sec_duck": t_duck,
        "first_diff": next(
            (
                {"spark": s, "duck": d}
                for s, d in zip(srows, drows)
                if s != d
            ),
            None,
        )
        if srows != drows
        else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata_sf1")
    ap.add_argument("--sample-mod", type=int, default=200)
    ap.add_argument("--json", help="write results to this JSON file")
    args = ap.parse_args()

    import duckdb

    from spark_clustering_spark.session import get_spark

    spark = get_spark("knn-sf1-check")
    con = duckdb.connect()
    out = {
        "sf": args.sf,
        "sample_mod": args.sample_mod,
        "checks": [
            check_knn_graph(spark, con, args.sf, args.sample_mod),
            check_knn_classify(spark, con, args.sf, args.sample_mod),
        ],
    }
    print(json.dumps(out))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))
    sys.exit(0 if all(c["match"] for c in out["checks"]) else 1)


if __name__ == "__main__":
    main()
