"""Local DuckDB-oracle parity harness — mimics the driver's t2 check.

For each declared query: run the Spark callable and the oracle SQL on
the same sf dir, sort columns by name, sort rows, compare exactly.

Usage: python tools/parity.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pd) != len(duck_pd):
        problems.append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
    sc, dc = sorted(spark_pd.columns), sorted(duck_pd.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    a, b = canon(spark_pd), canon(duck_pd)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
                bv.dtype, np.floating
            ):
                av = av.astype(float)
                bv = bv.astype(float)
                both_nan = pd.isna(av) & pd.isna(bv)
                eq = (av == bv) | both_nan
                if not eq.all():
                    i = int(np.argmin(eq))
                    problems.append(
                        f"col {c}: {int((~eq).sum())} diffs, first@{i}: "
                        f"spark={av[i]!r} duck={bv[i]!r}"
                    )
            else:
                eq = (pd.isna(av) & pd.isna(bv)) | (av == bv)
                if not eq.all():
                    i = int(np.argmin(eq))
                    problems.append(
                        f"col {c}: {int((~eq).sum())} diffs, first@{i}: "
                        f"spark={av[i]!r} duck={bv[i]!r}"
                    )
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", help="write per-query results to this JSON file")
    ap.add_argument(
        "--max-result",
        default=None,
        help="spark.driver.maxResultSize for the comparator session "
        "(e.g. 8g). This sizes the harness's collect-and-compare step, "
        "not the engine: detail-shaped keys (q_join_broadcast returns "
        "the full lineitem fanout) exceed the 1g default at sf10 purely "
        "because parity materializes BOTH engines' full outputs driver-"
        "side to value-compare them",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from spark_clustering_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(qs)

    extra = (
        {"spark.driver.maxResultSize": args.max_result}
        if args.max_result
        else None
    )
    spark = get_spark("parity", extra_conf=extra)
    con = duck_conn(args.sf)

    results: dict[str, dict] = {}
    n_pass = n_fail = n_rowsonly = 0

    def _flush():
        if args.json:
            import json

            Path(args.json).write_text(
                json.dumps(
                    {
                        "sf": args.sf,
                        "n_pass": n_pass,
                        "n_fail": n_fail,
                        "n_rows_only": n_rowsonly,
                        "queries": results,
                    },
                    indent=1,
                )
            )

    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            spark_pd = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "err": "spark error"}
            n_fail += 1
            _flush()
            continue
        if name not in oracles:
            print(f"rows {name}: {len(spark_pd)} rows ({time.time()-t0:.1f}s) [rows-only]")
            results[name] = {"status": "rows_only", "spark_rows": len(spark_pd)}
            n_rowsonly += 1
            _flush()
            continue
        try:
            duck_pd = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "err": "duckdb error"}
            n_fail += 1
            _flush()
            continue
        problems = compare(name, spark_pd, duck_pd)
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s): " + "; ".join(problems))
            results[name] = {"status": "fail", "err": "; ".join(problems)}
            n_fail += 1
            _flush()
        else:
            print(f"PASS {name}: {len(spark_pd)} rows ({time.time()-t0:.1f}s)")
            results[name] = {
                "status": "pass",
                "spark_rows": len(spark_pd),
                "sec": round(time.time() - t0, 2),
            }
            n_pass += 1
            _flush()
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    _flush()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
