"""Aggregate-parity check for q_join_nullsafe at large scale.

The key's output is quadratic in the nation-group sizes: every
customer×supplier pair sharing a (null-coalesced) nation key — ~60M
rows at sf1 (the full-output compare that ran in PARITY_r8_sf1_main)
and ~6B at sf10, where row materialization is infeasible in either
engine's client (the attempt OOMed the comparator JVM). Both output
columns are integers, so COUNT(*) plus exact integer SUMs and
distinct-counts of both key columns — computed in-engine on both
sides, nothing driver-materialized — give an order-proof equality
check of the full result (the theta_check protocol; sums ~1e16 « 2^63,
DuckDB accumulates in int128).

Usage: python tools/nullsafe_check.py [--sf DIR] [--json OUT]
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

COLS = ("n", "sc", "ss", "dc", "ds")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata_sf10")
    ap.add_argument("--json", help="also write the JSON line here")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from spark_clustering_spark.session import get_spark
    from tools.parity import duck_conn

    spark = get_spark("nullsafe-check")
    t0 = time.time()
    sdf = entrymod.queries()["q_join_nullsafe"](spark, args.sf)
    srow = sdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c_custkey").alias("sc"),
        F.sum("s_suppkey").alias("ss"),
        F.count_distinct("c_custkey").alias("dc"),
        F.count_distinct("s_suppkey").alias("ds"),
    ).collect()[0]
    spark_agg = {k: int(srow[k]) for k in COLS}
    t_spark = round(time.time() - t0, 1)

    con = duck_conn(args.sf)
    t0 = time.time()
    drow = con.execute(
        "SELECT count(*) AS n, sum(c_custkey) AS sc, sum(s_suppkey) AS ss, "
        "count(DISTINCT c_custkey) AS dc, count(DISTINCT s_suppkey) AS ds "
        "FROM (" + entrymod.oracle_sql()["q_join_nullsafe"] + ")"
    ).fetchone()
    duck_agg = dict(zip(COLS, (int(x) for x in drow)))
    t_duck = round(time.time() - t0, 1)

    ok = spark_agg == duck_agg
    line = json.dumps(
        {
            "query": "q_join_nullsafe",
            "check": "count + exact-int-sums + per-side distinct keys, in-engine",
            "sf": args.sf,
            "match": ok,
            "spark": spark_agg,
            "duck": duck_agg,
            "sec_spark": t_spark,
            "sec_duck": t_duck,
        }
    )
    print(line)
    if args.json:
        Path(args.json).write_text(line + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
