"""Full-graph sf1 parity for q_graph_kcore (r6 verdict task 3).

The unrolled one-statement oracle in operators/graph.py::_kcore_sql is
what failed at sf1 — each round's CTE is referenced several times
(degree union, edge filter, two count subqueries), and DuckDB
re-evaluates the 12M-pair basket-edge join once per reference, so the
sweep spilled >77 GB. The peel itself is cheap; the blowup was pure
CTE re-materialization. This check runs the SAME peel round-by-round
with materialized temp tables (each intermediate computed exactly
once) and compares the declared Spark query's 3 output rows
(round, n_alive, n_edges) exactly — closing the one deferral that
needed no sampling at all.

Usage: python tools/kcore_sf1_check.py [--sf DIR]
Prints one JSON line; exit 1 on mismatch.
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
    ap.add_argument("--sf", default="/root/repo/testdata_sf1")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from spark_clustering_spark.operators.graph import KCORE_K, KCORE_ROUNDS
    from spark_clustering_spark.session import get_spark

    spark = get_spark("kcore-check")
    t0 = time.time()
    srows = sorted(
        (int(r["round"]), int(r["n_alive"]), int(r["n_edges"]))
        for r in entrymod.queries()["q_graph_kcore"](spark, args.sf).collect()
    )
    t_spark = round(time.time() - t0, 1)

    con = duckdb.connect()
    t0 = time.time()
    con.execute(
        "CREATE TEMP TABLE e0 AS "
        "WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        f"FROM read_parquet('{args.sf}/lineitem.parquet')) "
        "SELECT DISTINCT a.p AS u, b.p AS v "
        "FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p"
    )
    drows = []
    for t in range(1, KCORE_ROUNDS + 1):
        con.execute(
            f"CREATE TEMP TABLE a{t} AS SELECT node FROM ("
            f"  SELECT node, count(*) AS d FROM ("
            f"    SELECT u AS node FROM e{t - 1}"
            f"    UNION ALL SELECT v FROM e{t - 1}) GROUP BY node"
            f") WHERE d >= {KCORE_K}"
        )
        con.execute(
            f"CREATE TEMP TABLE e{t} AS "
            f"SELECT e.u, e.v FROM e{t - 1} e "
            f"JOIN a{t} au ON au.node = e.u "
            f"JOIN a{t} av ON av.node = e.v"
        )
        n_alive = con.execute(f"SELECT count(*) FROM a{t}").fetchone()[0]
        n_edges = con.execute(f"SELECT count(*) FROM e{t}").fetchone()[0]
        drows.append((t, int(n_alive), int(n_edges)))
    t_duck = round(time.time() - t0, 1)

    ok = srows == drows
    print(
        json.dumps(
            {
                "query": "q_graph_kcore",
                "check": "full-graph peel, materialized per-round temp tables",
                "sf": args.sf,
                "match": ok,
                "spark": srows,
                "duck": drows,
                "sec_spark": t_spark,
                "sec_duck": t_duck,
            }
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
