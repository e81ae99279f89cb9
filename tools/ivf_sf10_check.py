"""Materialized-temp-table parity for the 6 IVF-family keys at sf10.

At sf10 the declared oracles' inline training CTEs make DuckDB
re-evaluate the n×nlist (200k × 447 ≈ 89M-row) distance/argmin pipeline
once per reference and spill >70 GB — the same CTE-rematerialization
blowup tools/kcore_sf1_check.py closed for q_graph_kcore at sf1. This
tool runs the IDENTICAL computation with each expensive intermediate
materialized exactly once:

1. ve (vec_id, vec), the seeded cent0, and each Lloyd step's assignment
   → means → centN become temp tables (the same decimal-exact SQL text
   as ``_ivf_train_ctes``, executed stepwise);
2. the final nearest-cell assignment (vec_id → cid) is materialized
   once as ``assign_tmp``;
3. each declared oracle string is transformed by TWO exact-match
   substitutions — the shared training prefix (the verbatim
   ``_ivf_train_ctes`` output) becomes ``coarse AS (SELECT … FROM
   coarse_tmp)``, and the shared assignment pattern (CROSS JOIN coarse
   + QUALIFY argmin) becomes a join against ``assign_tmp`` — then runs
   against the SAME Spark output the driver's check would compare.

Every substitution asserts it matched (a drifted oracle fails loudly
rather than silently checking something else). Estimates, rounding,
and tiebreaks are untouched: assign_tmp is produced by the same
QUALIFY argmin text, done once.

Usage: python tools/ivf_sf10_check.py [--sf DIR] [--json OUT] [names…]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

IVF_KEYS = [
    "q_sim_topk_ivf",
    "q_sim_ivfpq_topk",
    "q_dedup_semantic",
    "q_sample_cluster_balanced",
    "q_sim_ivf_recall",
    "q_vec_residual_energy",
]

ASSIGN_PAT = re.compile(
    r"CROSS JOIN coarse c\s+QUALIFY row_number\(\) OVER \(PARTITION BY "
    r"v\.vec_id\s+ORDER BY list_distance\(v\.vec, c\.cvec\), c\.cid\) = 1"
)
ASSIGN_SUB = "JOIN assign_tmp t ON t.vec_id = v.vec_id JOIN coarse c ON c.cid = t.cid"


def build_temp_tables(con, sf_dir: str) -> dict:
    from spark_clustering_spark.pipeline.similarity import (
        IVF_NLIST_MAX,
        IVF_NLIST_MIN,
        IVF_TRAIN_ITERS,
    )

    t0 = time.time()
    con.execute(
        f"CREATE TABLE ve_tmp AS SELECT vec_id, embedding::DOUBLE[] AS vec "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    (nlist,) = con.execute(
        f"SELECT greatest({IVF_NLIST_MIN}, least({IVF_NLIST_MAX}, "
        f"cast(floor(sqrt(count(*))) AS BIGINT))) FROM ve_tmp"
    ).fetchone()
    con.execute(
        f"CREATE TABLE cent_0 AS SELECT vec_id AS cid, vec AS cvec "
        f"FROM ve_tmp QUALIFY row_number() OVER (ORDER BY vec_id) <= {nlist}"
    )
    # the same per-step computation as _ivf_train_ctes, one temp table
    # per stage so nothing is ever evaluated twice. The argmin runs on
    # a PRE-MATERIALIZED narrow (vec_id, cid, d) table via two hash
    # aggregates — DuckDB's window operator evaluates its ORDER BY
    # expression inside the sort, so a QUALIFY form keeps both 64-dim
    # vectors alive through the 89M-row sort (~91 GB spill, the
    # failure of the first two cuts). min(cid) among rows at the
    # per-vector min distance IS the (distance, cid) tiebreak.
    def materialize_argmin(out: str, cent: str) -> None:
        con.execute(
            f"""CREATE TABLE dist_x AS
            SELECT v.vec_id, c.cid, list_distance(v.vec, c.cvec) AS d
            FROM ve_tmp v CROSS JOIN {cent} c"""
        )
        con.execute(
            f"""CREATE TABLE {out} AS
            SELECT d.vec_id, min(d.cid) AS cid
            FROM dist_x d
            JOIN (SELECT vec_id, min(d) AS md FROM dist_x GROUP BY vec_id) b
              ON b.vec_id = d.vec_id AND d.d = b.md
            GROUP BY d.vec_id"""
        )
        con.execute("DROP TABLE dist_x")

    for t in range(1, IVF_TRAIN_ITERS + 1):
        materialize_argmin(f"assign_{t}", f"cent_{t - 1}")
        con.execute(
            f"""CREATE TABLE means_{t} AS
            SELECT cid, list(m ORDER BY pos) AS mvec FROM (
              SELECT cid, pos,
                     cast(cast(sum(cast(cast(v AS VARCHAR) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) / count(*) AS m
              FROM (SELECT a.cid, unnest(e.vec) AS v,
                           generate_subscripts(e.vec, 1) AS pos
                    FROM assign_{t} a JOIN ve_tmp e USING (vec_id))
              GROUP BY cid, pos) GROUP BY cid"""
        )
        con.execute(
            f"""CREATE TABLE cent_{t} AS
            SELECT c.cid, coalesce(m.mvec, c.cvec) AS cvec
            FROM cent_{t - 1} c LEFT JOIN means_{t} m ON m.cid = c.cid"""
        )
        con.execute(f"DROP TABLE assign_{t}")
        con.execute(f"DROP TABLE means_{t}")
    con.execute(
        f"CREATE TABLE coarse_tmp AS SELECT cid, cvec FROM cent_{IVF_TRAIN_ITERS}"
    )
    materialize_argmin("assign_tmp", "coarse_tmp")
    # per-vector coarse residuals, materialized once for the IVFPQ key:
    # the declared rex CTE unnests 12.8M rows each carrying the 64-dim
    # lvec — the in-query form is what pushed DuckDB past its limit.
    # unnesting both lists in one SELECT zips them positionally, so
    # v - c at pos ≡ the declared v - lvec[pos].
    con.execute(
        """CREATE TABLE resid_tmp AS
        SELECT vec_id, list(v - c ORDER BY pos) AS vec FROM (
          SELECT a.vec_id, unnest(e.vec) AS v, unnest(cc.cvec) AS c,
                 generate_subscripts(e.vec, 1) AS pos
          FROM assign_tmp a JOIN ve_tmp e USING (vec_id)
          JOIN coarse_tmp cc ON cc.cid = a.cid)
        GROUP BY vec_id"""
    )
    return {"nlist": int(nlist), "sec_train": round(time.time() - t0, 1)}


RESID_SNIPPET = """rex AS (SELECT vec_id, unnest(vec) AS v,
                   generate_subscripts(vec, 1) AS pos, lvec FROM ivlists),
    resid AS (
      SELECT vec_id, list(v - lvec[pos] ORDER BY pos) AS vec
      FROM rex GROUP BY vec_id
    ),"""


def transform(sql: str, prefix: str) -> str:
    replaced = sql.replace(
        prefix, "coarse AS (SELECT cid, cvec FROM coarse_tmp)"
    )
    assert replaced != sql, "training prefix not found — oracle drifted"
    out, n = ASSIGN_PAT.subn(ASSIGN_SUB, replaced)
    assert n >= 1, "assignment pattern not found — oracle drifted"
    if RESID_SNIPPET in out:  # the IVFPQ key only
        out = out.replace(
            RESID_SNIPPET, "resid AS (SELECT vec_id, vec FROM resid_tmp),"
        )
    # the bare `ve` CTE stays (it is one cheap scan); every post-prefix
    # reference to coarse now reads the materialized table
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata_sf10")
    ap.add_argument("--json", help="write PARITY-style JSON here")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from spark_clustering_spark.pipeline.similarity import (
        IVF_TRAIN_ITERS,
        _ivf_train_ctes,
    )
    from spark_clustering_spark.session import get_spark
    from tools.parity import TABLES, compare

    names = args.names or IVF_KEYS
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    prefix = _ivf_train_ctes(IVF_TRAIN_ITERS)

    # file-backed db: the shared training tables are built ONCE and
    # survive per-key connections (a key whose oracle OOMs DuckDB can
    # then fail alone instead of taking the whole run down); the name
    # derives from a STABLE digest of the sf dir — Python's hash() is
    # per-process randomized, which silently defeated cross-run cache
    # reuse and leaked stale /tmp files (ADVICE r9)
    import hashlib

    dbfile = (
        "/tmp/duck_ivf_cache_"
        + hashlib.sha1(args.sf.encode()).hexdigest()[:8]
        + ".db"
    )

    def connect():
        c = duckdb.connect(dbfile)
        c.execute("PRAGMA memory_limit='80GB'")
        c.execute("PRAGMA temp_directory='/tmp/duck_ivf_spill'")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW IF NOT EXISTS {t} AS SELECT * FROM "
                f"read_parquet('{args.sf}/{t}.parquet')"
            )
        return c

    con = connect()
    have = {r[0] for r in con.execute("SHOW TABLES").fetchall()}
    if "resid_tmp" not in have:
        meta = build_temp_tables(con, args.sf)
    else:
        nl = con.execute("SELECT count(*) FROM coarse_tmp").fetchone()[0]
        meta = {"nlist": int(nl), "sec_train": 0.0}
    con.close()
    print(f"# shared tables ready: nlist={meta['nlist']} "
          f"in {meta['sec_train']}s", flush=True)

    spark = get_spark("ivf-sf10-check")
    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            spark_pd = qs[name](spark, args.sf).toPandas()
            t_spark = round(time.time() - t0, 1)
            t0 = time.time()
            kcon = connect()
            try:
                duck_pd = kcon.execute(transform(osql[name], prefix)).df()
            finally:
                kcon.close()
            t_duck = round(time.time() - t0, 1)
            problems = compare(name, spark_pd, duck_pd)
        except Exception as exc:  # noqa: BLE001
            problems = [f"ERROR {type(exc).__name__}: {exc}"]
            t_spark = t_duck = -1.0
        ok = not problems
        n_pass += ok
        n_fail += not ok
        results[name] = {
            "status": "pass" if ok else "fail",
            "problems": problems[:3],
            "sec_spark": t_spark,
            "sec_duck": t_duck,
        }
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"(spark {t_spark}s, duck {t_duck}s) "
              f"{problems[:1] if problems else ''}", flush=True)
        out = {
            "sf": args.sf,
            "check": "IVF family, materialized temp-table oracle "
            "(kcore/label_prop precedent)",
            **meta,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "queries": results,
        }
        if args.json:  # per-key flush: a crash leaves a valid partial
            Path(args.json).write_text(json.dumps(out, indent=1))

    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
