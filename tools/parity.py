"""Local DuckDB-oracle parity harness — mimics the driver's t2 check.

For each declared query: run the Spark callable and the oracle SQL on
the same sf dir, sort columns by name, sort rows, compare exactly.

Two escape hatches for at-scale runs (sf1/sf10), where some outputs are
too large to materialize driver-side (q_join_nullsafe is ~6B rows at
sf10 — the full-output compare OOMed round 9's comparator JVM):

- ``--max-rows N``: probe the Spark output count first; above N the key
  routes through *aggregate parity* — a schema-derived contract of
  order-proof, overflow-free aggregates (exact decimal sums of integer
  columns, length-sums + distinct counts of strings, min/max + distinct
  counts of floats/timestamps) computed IN-ENGINE on both sides, so
  nothing row-sized ever crosses a driver. This generalizes the bespoke
  round-8/9 closure tools (theta_check.py, nullsafe_check.py).
- ``--agg``: force the aggregate contract for every named key.

Usage: python tools/parity.py [--sf /root/testdata/sf0.01]
           [--max-rows N] [--agg] [--json OUT] [names...]
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


def _default_duck_mem() -> str:
    """40% of detected RAM (ADVICE r10): a fixed 48GB default is a
    no-op guard on smaller hosts — DuckDB could still OOM-race the
    Spark JVM, the exact failure the pragma exists to prevent."""
    import os

    try:
        gib = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) / (
            1 << 30
        )
        return f"{max(1, int(gib * 0.4))}GB"
    except (ValueError, OSError):
        return "48GB"


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    # bound the oracle's footprint so an sf10 aggregate spills to disk
    # instead of OOM-racing the Spark JVM for the box (defaults to 80%
    # of RAM otherwise); override via DUCK_MEM
    import os

    con.execute(
        f"PRAGMA memory_limit='{os.environ.get('DUCK_MEM', _default_duck_mem())}'"
    )
    # per-process spill dir, removed at exit: round 10's kcore/modularity
    # oracle deaths were "No space left on device" in a SHARED spill dir
    # that had accumulated leftovers across earlier keys/processes
    spill = f"/tmp/duck_parity_spill_{os.getpid()}"
    con.execute(f"PRAGMA temp_directory='{spill}'")
    import atexit
    import shutil

    atexit.register(shutil.rmtree, spill, ignore_errors=True)
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


def agg_contract(schema, distinct: bool = True) -> list[tuple[str, object, str]]:
    """Schema-derived aggregate-parity contract: (alias, spark Column,
    duckdb SQL expr) triples, all order-proof and overflow-free.

    - integral / decimal columns: exact SUM(CAST AS DECIMAL(38,0|s)) —
      both engines accumulate exactly (DuckDB int128, Spark decimal),
      plus COUNT(DISTINCT).
    - string: SUM(LENGTH) + COUNT(DISTINCT).
    - float/double: COUNT(DISTINCT) + MIN + MAX (each exact given
      identical value sets; float SUMs are order-dependent, so never
      summed).
    - boolean: SUM(CAST AS INT).
    - date/timestamp: COUNT(DISTINCT) + MIN/MAX (compared as strings).
    - nested/binary: non-null COUNT only.
    Every contract includes COUNT(*).

    ``distinct=False`` drops every COUNT(DISTINCT) column (keeping the
    exact sums / lensums / min-max / counts): Spark plans k distinct
    aggregates as an Expand that multiplies the input by k+1, so on a
    multi-billion-row join output the DCs — not the join — dominate the
    pass. Callers on that scale (the theta closure) swap the DCs for
    map-side-combinable moment sums instead.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    specs: list[tuple[str, object, str]] = [
        ("n_rows", F.count(F.lit(1)), "count(*)")
    ]
    for f in schema.fields:
        c, q = f.name, f'"{f.name}"'
        dt = f.dataType
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            specs.append(
                (f"sum_{c}",
                 F.sum(F.col(c).cast(T.DecimalType(38, 0))),
                 f"sum(cast({q} AS DECIMAL(38,0)))"))
            specs.append((f"dc_{c}", F.count_distinct(F.col(c)),
                          f"count(DISTINCT {q})"))
        elif isinstance(dt, T.DecimalType):
            specs.append(
                (f"sum_{c}",
                 F.sum(F.col(c).cast(T.DecimalType(38, dt.scale))),
                 f"sum(cast({q} AS DECIMAL(38,{dt.scale})))"))
            specs.append((f"dc_{c}", F.count_distinct(F.col(c)),
                          f"count(DISTINCT {q})"))
        elif isinstance(dt, T.StringType):
            specs.append((f"lensum_{c}", F.sum(F.length(F.col(c))),
                          f"sum(length({q}))"))
            specs.append((f"dc_{c}", F.count_distinct(F.col(c)),
                          f"count(DISTINCT {q})"))
        elif isinstance(dt, (T.FloatType, T.DoubleType)):
            specs.append((f"dc_{c}", F.count_distinct(F.col(c)),
                          f"count(DISTINCT {q})"))
            specs.append((f"min_{c}", F.min(F.col(c)), f"min({q})"))
            specs.append((f"max_{c}", F.max(F.col(c)), f"max({q})"))
        elif isinstance(dt, T.BooleanType):
            specs.append((f"sum_{c}", F.sum(F.col(c).cast("int")),
                          f"sum(cast({q} AS INT))"))
        elif isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            specs.append((f"dc_{c}", F.count_distinct(F.col(c)),
                          f"count(DISTINCT {q})"))
            specs.append((f"min_{c}", F.min(F.col(c)), f"min({q})"))
            specs.append((f"max_{c}", F.max(F.col(c)), f"max({q})"))
        else:  # array/map/struct/binary — membership only
            specs.append((f"nn_{c}", F.count(F.col(c)), f"count({q})"))
    if not distinct:
        specs = [s for s in specs if not s[0].startswith("dc_")]
    return specs


def _agg_norm(v):
    """Normalize one aggregate value for cross-engine comparison."""
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, (decimal.Decimal, np.integer)):
        # decimal sums of integer-valued columns compare as ints;
        # fractional decimals compare on the exact string form
        d = decimal.Decimal(v)
        return int(d) if d == d.to_integral_value() else str(d.normalize())
    if isinstance(v, (datetime.datetime, datetime.date, pd.Timestamp)):
        return str(v)
    if isinstance(v, np.floating):
        return float(v)
    return v


def agg_compare(name: str, spark, sdf, con, oracle: str) -> dict:
    """In-engine aggregate parity: run the schema-derived contract on
    both engines, compare the (tiny) summary rows exactly."""
    specs = agg_contract(sdf.schema)
    srow = sdf.agg(*[col.alias(a) for a, col, _ in specs]).collect()[0]
    spark_agg = {a: _agg_norm(srow[a]) for a, _, _ in specs}
    duck_sql = (
        "SELECT " + ", ".join(f'{expr} AS "{a}"' for a, _, expr in specs)
        + " FROM (" + oracle + ")"
    )
    drow = con.execute(duck_sql).fetchone()
    duck_agg = {a: _agg_norm(v) for (a, _, _), v in zip(specs, drow)}
    mism = {
        a: {"spark": spark_agg[a], "duck": duck_agg[a]}
        for a in spark_agg
        if spark_agg[a] != duck_agg[a]
    }
    return {"spark": spark_agg, "duck": duck_agg, "mismatch": mism}


# Oracles whose leading CTEs are materialized as DuckDB temp tables
# before execution (same rows by construction — the temp table IS the
# CTE body). The graph family's shared lineitem-pair edge build is
# re-evaluated once per reference when left as a CTE; at sf10 that
# meant >60 GB of spill and a disk-full abort on q_graph_assortativity
# (r10 sweep). Identical bodies are materialized once per session and
# reused across keys.
MAT_CTES = {
    "q_graph_assortativity": ("lp", "e"),
    # triangles: also materialize deg and the degree-oriented edge
    # table o — o is referenced three times in the triangle join, and
    # as a CTE each reference can re-evaluate the e⋈deg⋈deg build at
    # sf10 edge counts (~1e8 rows)
    "q_graph_triangles": ("lp", "e", "deg", "o"),
    # kcore: materialize the ENTIRE peel chain, not just lp/e0 — the
    # three chained join+aggregate levels (e1..e3, each referenced by
    # the next level, its degree count, and the final scalar counts)
    # are what spilled >60 GB and filled the disk at sf10 (r10 driver
    # re-sweep); one-at-a-time temp tables bound the live working set
    # to a single level, which is how the r8/r9 bespoke closures ran
    # the same peel in 10-37 s.
    "q_graph_kcore": (
        "lp", "e0", "d1", "a1", "e1", "d2", "a2", "e2", "d3", "a3", "e3",
    ),
    "q_graph_degree_stats": ("e",),
    "q_graph_jaccard_linkpred": ("lp0", "small", "lp", "e"),
    "q_graph_modularity": ("lp0", "small", "lp", "e", "lab", "el"),
    "q_graph_adamic_adar": ("lp0", "small", "lp", "e"),
    "q_graph_clustering_coeff": ("lp0", "small", "lp", "e"),
    "q_graph_label_prop": ("lp0", "small", "lp", "e"),
    "q_multimodal_phash_dedup": ("raster", "px", "agg", "fp"),
    "q_multimodal_phash_pairs": ("raster", "px", "agg", "fp"),
}

_MAT_DONE: dict[str, str] = {}


def _split_ctes(sql: str):
    """Split a (non-recursive) top-level WITH clause into
    ([(name, body), ...], tail_sql). Handles single-quoted strings and
    ``-- ...\\n`` line comments (ADVICE r10: an unbalanced paren or
    apostrophe inside a comment must not desync the depth scanner);
    returns ([], sql) when there is no WITH prefix."""
    s = sql.lstrip()
    low = s.lower()
    if not low.startswith("with") or low.startswith("with recursive"):
        return [], sql
    i = 4
    ctes = []
    n = len(s)
    while True:
        while i < n and s[i] in " \t\r\n,":
            i += 1
        j = i
        while j < n and (s[j].isalnum() or s[j] == "_"):
            j += 1
        name = s[i:j]
        k = j
        while k < n and s[k] in " \t\r\n":
            k += 1
        if s[k : k + 2].lower() != "as":
            break
        k += 2
        while k < n and s[k] in " \t\r\n":
            k += 1
        if s[k] != "(":
            break
        depth, p = 0, k
        in_str = False
        while p < n:
            ch = s[p]
            if in_str:
                if ch == "'":
                    in_str = False
            elif ch == "-" and s[p : p + 2] == "--":
                nl = s.find("\n", p)
                p = n if nl == -1 else nl
                continue
            elif ch == "'":
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            p += 1
        body = s[k + 1 : p]
        ctes.append((name, body))
        i = p + 1
        while i < n and s[i] in " \t\r\n":
            i += 1
        if i < n and s[i] == ",":
            i += 1
            continue
        return ctes, s[i:]
    return [], sql


def materialized_oracle(con, name: str, sql: str) -> str:
    """For keys in MAT_CTES: CREATE TEMP TABLE for each listed leading
    CTE (cached per (name, body) within the session), returning the
    oracle with those CTEs stripped."""
    want = MAT_CTES.get(name)
    if not want:
        return sql
    ctes, tail = _split_ctes(sql)
    if not ctes:
        return sql
    # only a PREFIX of the CTE list can be materialized: a later CTE
    # may reference an earlier one, which exists as a temp table only
    # if it was materialized too
    keep = []
    for cname, body in ctes:
        if cname in want and not keep:
            import hashlib
            import re as _re

            # chain-hash: include the current hash of every upstream
            # materialized table the body references — two keys can
            # share the IDENTICAL body text 'FROM lp a JOIN lp b ...'
            # while their lp tables hold different rows (capped vs
            # full), so body text alone would serve stale rows (found
            # by q_graph_triangles inheriting the lp0-family's capped
            # edge set)
            deps = "|".join(
                f"{n}={_MAT_DONE[n]}"
                for n in sorted(_MAT_DONE)
                if _re.search(rf"\b{n}\b", body)
            )
            h = hashlib.sha1(f"{body}|{deps}".encode()).hexdigest()[:10]
            # track the CURRENT body per table name: two keys may use
            # the same CTE name with different bodies, and a
            # (name, hash) set would serve stale rows
            if _MAT_DONE.get(cname) != h:
                con.execute(
                    f'CREATE OR REPLACE TEMP TABLE "{cname}" AS {body}'
                )
                _MAT_DONE[cname] = h
        else:
            keep.append((cname, body))
    if keep:
        heads = ", ".join(f"{c} AS ({b})" for c, b in keep)
        return f"WITH {heads} {tail}"
    return tail


def _die_if_jvm_dead(spark, name: str) -> None:
    """After a per-key exception, probe the session: if the JVM itself
    is gone (OOM-killed, gateway dead), every later key would 'fail'
    too — round 9 committed 223 such cascade rows. Exit immediately
    instead, leaving later keys UNRECORDED so the sweep wrapper retries
    each in a fresh process."""
    try:
        spark.range(1).count()
    except Exception:
        print(f"FATAL: session dead after {name}; aborting so later keys "
              "stay unrecorded (sweep retries them in fresh processes)")
        sys.exit(3)


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
    ap.add_argument(
        "--agg",
        action="store_true",
        help="force schema-derived aggregate parity for every named key "
        "(in-engine summaries, no row materialization)",
    )
    ap.add_argument(
        "--max-rows",
        type=int,
        default=None,
        help="probe the Spark output count first; above this, route the "
        "key through aggregate parity instead of full materialization",
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
        use_agg = args.agg and name in oracles
        try:
            sdf = qs[name](spark, args.sf)
            if args.max_rows is not None and not use_agg:
                # probe with limit(N+1).count(), not count(): LocalLimit
                # is pipelined, so a quadratic-output join short-circuits
                # after N+1 rows instead of paying a full extra pass;
                # small-output keys cost the same either way
                n_out = sdf.limit(args.max_rows + 1).count()
                if n_out > args.max_rows:
                    if name in oracles:
                        use_agg = True
                    else:
                        print(
                            f"rows {name}: >{args.max_rows} rows "
                            f"({time.time()-t0:.1f}s) [rows-only, uncollected]"
                        )
                        results[name] = {
                            "status": "rows_only",
                            "spark_rows_min": int(n_out),
                        }
                        n_rowsonly += 1
                        _flush()
                        continue
            if use_agg:
                try:
                    rep = agg_compare(
                        name,
                        spark,
                        sdf,
                        con,
                        materialized_oracle(con, name, oracles[name]),
                    )
                except Exception:
                    print(f"FAIL {name}: agg error\n{traceback.format_exc()}")
                    _die_if_jvm_dead(spark, name)
                    results[name] = {"status": "fail", "err": "agg error"}
                    n_fail += 1
                    _flush()
                    continue
                ok = not rep["mismatch"]
                sec = round(time.time() - t0, 2)
                if ok:
                    print(
                        f"PASS {name}: aggregate parity, "
                        f"{rep['spark']['n_rows']} rows in-engine ({sec}s)"
                    )
                    results[name] = {
                        "status": "agg_pass",
                        "spark_rows": rep["spark"]["n_rows"],
                        "agg": rep["spark"],
                        "sec": sec,
                    }
                    n_pass += 1
                else:
                    print(f"FAIL {name}: agg mismatch {rep['mismatch']}")
                    results[name] = {
                        "status": "fail",
                        "err": f"agg mismatch: {rep['mismatch']}",
                    }
                    n_fail += 1
                _flush()
                continue
            spark_pd = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            _die_if_jvm_dead(spark, name)
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
            duck_pd = con.execute(
                materialized_oracle(con, name, oracles[name])
            ).fetchdf()
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
