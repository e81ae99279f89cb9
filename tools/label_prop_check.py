"""At-scale parity for q_graph_label_prop (sf1 / sf10).

The declared one-statement oracle (operators/graph.py::_label_prop_sql)
hash-passes at the driver's gate scale (sf0.01), but at sf1 DuckDB's
plan for it spilled >78 GB and hit disk-full — each round's label CTE
is referenced twice (vote join + NOT IN anti filter) on top of the
basket-edge CTE, the exact re-materialization blowup the k-core oracle
hit in round 6 (tools/kcore_sf1_check.py). Following that precedent,
this check runs the SAME two synchronous rounds with materialized temp
tables (every intermediate computed exactly once) and compares the
declared Spark query's full bounded output (round, label, n_assigned)
exactly — no sampling needed, the output is round x brand sized.

Usage: python tools/label_prop_check.py [--sf DIR] [--json FILE]
Prints one JSON line; exit 1 on mismatch.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from itertools import zip_longest
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata_sf1")
    ap.add_argument("--json", help="write results to this JSON file")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from spark_clustering_spark.operators.graph import LP_ROUNDS, LP_SEED_MOD
    from spark_clustering_spark.session import get_spark

    spark = get_spark("label-prop-check")
    t0 = time.time()
    srows = sorted(
        (int(r["round"]), str(r["label"]), int(r["n_assigned"]))
        for r in entrymod.queries()["q_graph_label_prop"](
            spark, args.sf
        ).collect()
    )
    t_spark = round(time.time() - t0, 1)

    con = duckdb.connect()
    t0 = time.time()
    con.execute(
        "CREATE TEMP TABLE e AS "
        "WITH lp0 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
        f"FROM read_parquet('{args.sf}/lineitem.parquet')), "
        "small AS (SELECT o FROM lp0 GROUP BY o HAVING count(*) <= 5), "
        "lp AS (SELECT lp0.o, lp0.p FROM lp0 JOIN small USING (o)) "
        "SELECT DISTINCT a.p AS u, b.p AS v "
        "FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p"
    )
    con.execute(
        "CREATE TEMP TABLE adj AS "
        "SELECT u AS node, v AS nbr FROM e "
        "UNION ALL SELECT v AS node, u AS nbr FROM e"
    )
    con.execute(
        "CREATE TEMP TABLE l0 AS "
        "SELECT n.node, p.p_brand AS label "
        "FROM (SELECT DISTINCT node FROM adj) n "
        f"JOIN read_parquet('{args.sf}/part.parquet') p "
        "  ON p.p_partkey = n.node "
        f"WHERE n.node % {LP_SEED_MOD} = 0"
    )
    drows = [
        (0, str(lbl), int(c))
        for lbl, c in con.execute(
            "SELECT label, count(*) FROM l0 GROUP BY label"
        ).fetchall()
    ]
    for t in range(1, LP_ROUNDS + 1):
        prev = f"l{t - 1}"
        con.execute(
            f"CREATE TEMP TABLE new{t} AS "
            "SELECT node, label FROM ("
            "  SELECT a.node, l.label, count(*) AS c,"
            "         row_number() OVER (PARTITION BY a.node"
            "                            ORDER BY count(*) DESC, l.label)"
            "           AS rn"
            f"  FROM adj a JOIN {prev} l ON l.node = a.nbr"
            f"  ANTI JOIN {prev} done ON done.node = a.node"
            "  GROUP BY a.node, l.label"
            ") WHERE rn = 1"
        )
        con.execute(
            f"CREATE TEMP TABLE l{t} AS "
            f"SELECT node, label FROM {prev} "
            f"UNION ALL SELECT node, label FROM new{t}"
        )
        drows.extend(
            (t, str(lbl), int(c))
            for lbl, c in con.execute(
                f"SELECT label, count(*) FROM new{t} GROUP BY label"
            ).fetchall()
        )
    drows.sort()
    t_duck = round(time.time() - t0, 1)

    ok = srows == drows
    out = {
        "query": "q_graph_label_prop",
        "sf": args.sf,
        "check": "full bounded output (round, label, n_assigned), "
        "materialized-temp-table oracle",
        "match": ok,
        "n_rows": len(srows),
        "n_oracle_rows": len(drows),
        "sec_spark": t_spark,
        "sec_duck": t_duck,
        # zip_longest (ADVICE r8): a strict-prefix mismatch (extra or
        # missing trailing rows) must surface its first divergent row
        # instead of reporting match=false with first_diff=null
        "first_diff": next(
            (
                {"spark": s, "duck": d}
                for s, d in zip_longest(srows, drows, fillvalue="<missing>")
                if s != d
            ),
            None,
        )
        if not ok
        else None,
    }
    print(json.dumps(out))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
