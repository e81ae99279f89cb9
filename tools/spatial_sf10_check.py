"""q_join_spatial_grid at-scale closure (VERDICT r10 task 3).

The registered oracle is the O(n²) cross join — semantically the
clearest statement of "every pair within distance r", and fine at the
driver's sf0.01 gate, but it TIMED OUT at sf10 (600k points → 1.8e11
candidate pairs). The engine side is grid-blocked and fast; what's
missing is an oracle DuckDB can actually evaluate at scale.

Two-step closure, so the tractable oracle inherits the n² form's
authority instead of replacing it:

1. **Oracle-identity step (DuckDB vs DuckDB, small scales):** evaluate
   the registered n² oracle AND a grid-decomposed oracle (same uniform
   grid argument as the engine: cell side = r, 3×3 neighbourhood — a
   lossless candidate filter, so the two forms are provably the same
   set) at sf0.01 and sf0.1; compare full sorted outputs exactly.
   This establishes grid-form ≡ n²-form on real data in the SAME
   engine, independent of Spark.

2. **At-scale step (Spark vs DuckDB grid-form, sf10):** run the
   engine query and the grid-form oracle under the generic
   schema-derived aggregate contract from tools/parity.py (count +
   exact id sums + distinct counts + dist min/max — order-proof,
   nothing row-sized crosses a driver).

Usage:
  python tools/spatial_sf10_check.py --json PARITY_r11_spatial_sf10.json
      [--sf10 /root/repo/testdata_sf10]
      [--skip-identity]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from tools import parity  # noqa: E402


def grid_oracle() -> str:
    """Grid-decomposed form of the q_join_spatial_grid oracle. The
    SELECT list (including the dround'd distance expression) is
    byte-identical to the registered n² oracle's — only the candidate
    generation differs."""
    from spark_clustering_spark.functions.detagg import sql_dround
    from spark_clustering_spark.operators.spatial import RADIUS

    r = RADIUS
    dist = sql_dround(
        "sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y))", 6
    )
    return f"""
    WITH p AS (
      SELECT vec_id,
             cast(embedding[1] AS DOUBLE) AS x,
             cast(embedding[2] AS DOUBLE) AS y
      FROM embeddings
    ),
    c AS (
      SELECT vec_id, x, y,
             floor(x / {r}) AS gx, floor(y / {r}) AS gy
      FROM p
    ),
    probe AS (
      SELECT c.vec_id, c.x, c.y,
             c.gx + dx.d AS gx, c.gy + dy.d AS gy
      FROM c,
           (VALUES (-1.0), (0.0), (1.0)) dx(d),
           (VALUES (-1.0), (0.0), (1.0)) dy(d)
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {dist} AS dist
    FROM probe a JOIN c b
      ON a.gx = b.gx AND a.gy = b.gy AND a.vec_id < b.vec_id
    WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
          <= {r} * {r}
    """


def identity_check(sf_dir: str) -> dict:
    """DuckDB n²-form vs DuckDB grid-form, full sorted row compare."""
    import __spark_entry__ as entrymod

    n2_sql = entrymod.oracle_sql()["q_join_spatial_grid"]
    con = parity.duck_conn(sf_dir)
    t0 = time.time()
    a = con.execute(
        f"SELECT * FROM ({n2_sql}) ORDER BY id_a, id_b"
    ).fetchdf()
    t_n2 = round(time.time() - t0, 1)
    t0 = time.time()
    b = con.execute(
        f"SELECT * FROM ({grid_oracle()}) ORDER BY id_a, id_b"
    ).fetchdf()
    t_grid = round(time.time() - t0, 1)
    con.close()
    match = a.equals(b)
    rec = {
        "sf": sf_dir,
        "n_rows_n2": len(a),
        "n_rows_grid": len(b),
        "match": bool(match),
        "sec_n2": t_n2,
        "sec_grid": t_grid,
    }
    if not match and len(a) == len(b):
        neq = (a != b).any(axis=1)
        rec["first_diff"] = {
            "n2": a[neq].head(3).to_dict("records"),
            "grid": b[neq].head(3).to_dict("records"),
        }
    print(f"identity {sf_dir}: match={match} "
          f"(n² {t_n2}s / grid {t_grid}s, {len(a)} rows)")
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", required=True)
    ap.add_argument("--sf10", default="/root/repo/testdata_sf10")
    ap.add_argument(
        "--identity-sfs",
        default="/root/testdata/sf0.01,/root/testdata/sf0.1",
    )
    ap.add_argument("--skip-identity", action="store_true")
    args = ap.parse_args()

    out: dict = {"query": "q_join_spatial_grid", "sf": args.sf10,
                 "check": "grid-form oracle (proven ≡ n²-form at small "
                          "sf, DuckDB-vs-DuckDB full rows) vs engine, "
                          "in-engine aggregate contract"}

    if not args.skip_identity:
        out["identity"] = [
            identity_check(sf) for sf in args.identity_sfs.split(",")
        ]
        if not all(r["match"] for r in out["identity"]):
            Path(args.json).write_text(json.dumps(out, indent=1))
            sys.exit("grid-form ≢ n²-form at small sf — aborting")

    import __spark_entry__ as entrymod
    from spark_clustering_spark.session import get_spark

    spark = get_spark("spatial-closure")
    con = parity.duck_conn(args.sf10)
    sdf = entrymod.queries()["q_join_spatial_grid"](spark, args.sf10)
    t0 = time.time()
    rep = parity.agg_compare(
        "q_join_spatial_grid", spark, sdf, con, grid_oracle()
    )
    out["sec"] = round(time.time() - t0, 1)
    out["match"] = not rep["mismatch"]
    out["agg_both_engines"] = rep["spark"]
    if rep["mismatch"]:
        out["mismatch"] = rep["mismatch"]
    Path(args.json).write_text(json.dumps(out, indent=1))
    print(f"sf10 agg parity: match={out['match']} in {out['sec']}s "
          f"({rep['spark']['n_rows']} pairs in-engine)")
    sys.exit(0 if out["match"] else 1)


if __name__ == "__main__":
    main()
