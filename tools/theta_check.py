"""Aggregate-parity check for q_join_theta_range at large scale.

The query's output is quadratic-ish in sf (~7.8M rows at sf0.1,
~780M at sf1), so the row-materializing pandas compare in
tools/parity.py is infeasible there. Three output columns are
integers and one a 25-value brand string, so COUNT(*), exact integer
SUMs of the key/gap columns, and brand length-sum + cardinality —
computed in-engine on BOTH sides, nothing driver-materialized — give
an order-proof, overflow-free (int64 magnitudes ~1e15 « 2^63; DuckDB
accumulates in int128) equality check of the full result.

Usage: python tools/theta_check.py [--sf DIR]
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
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from spark_clustering_spark.session import get_spark
    from tools.parity import TABLES, duck_conn

    spark = get_spark("theta-check")
    t0 = time.time()
    sdf = entrymod.queries()["q_join_theta_range"](spark, args.sf)
    srow = sdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("key_small").alias("sa"),
        F.sum("key_big").alias("sb"),
        F.sum("size_gap").alias("sg"),
        F.count_distinct("brand").alias("nb"),
        F.sum(F.length("brand")).alias("lb"),
    ).collect()[0]
    spark_agg = {k: int(srow[k]) for k in ("n", "sa", "sb", "sg", "nb", "lb")}
    t_spark = round(time.time() - t0, 1)

    con = duck_conn(args.sf)
    t0 = time.time()
    drow = con.execute(
        "SELECT count(*) AS n, sum(key_small) AS sa, sum(key_big) AS sb, "
        "sum(size_gap) AS sg, count(DISTINCT brand) AS nb, "
        "sum(length(brand)) AS lb FROM ("
        + entrymod.oracle_sql()["q_join_theta_range"]
        + ")"
    ).fetchone()
    duck_agg = dict(zip(("n", "sa", "sb", "sg", "nb", "lb"), (int(x) for x in drow)))
    t_duck = round(time.time() - t0, 1)

    ok = spark_agg == duck_agg
    print(
        json.dumps(
            {
                "query": "q_join_theta_range",
                "check": "count+exact-int-sums+brand-cardinality",
                "sf": args.sf,
                "match": ok,
                "spark": spark_agg,
                "duck": duck_agg,
                "sec_spark": t_spark,
                "sec_duck": t_duck,
            }
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
