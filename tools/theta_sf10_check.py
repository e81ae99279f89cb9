"""q_join_theta_range at-scale closure (VERDICT r10 task 4).

The sf10 output is ~39B pairs (2M parts, ~25 brands, size-range
predicate) — never materializable. The contract is per-brand
stratified aggregate parity: for each brand, both engines compute the
schema-derived summary (count + exact decimal sums + distinct counts)
over that brand's slice of the join output, and the 25 summary rows
are compared exactly. The union of the 25 brand slices IS the full
output (brand is an equi-join key: every output row carries exactly
one brand), so per-brand parity over all brands = full-output
aggregate parity, delivered in resumable chunks.

Both sides push the brand predicate down: Spark propagates the filter
through the join's brand equality into both part scans (constraint
propagation), DuckDB pushes it into the subquery — so a k-brand chunk
costs ~k/25 of the full pass and a crash loses one chunk, not the run.

Usage:
  python tools/theta_sf10_check.py --json PARITY_r11_theta_sf10.json \
      [--sf /root/repo/testdata_sf10] [--chunk 5] [--brands "Brand#11,..."]
Resumable: brands already recorded in --json are skipped.
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

QUERY = "q_join_theta_range"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", required=True)
    ap.add_argument("--sf", default="/root/repo/testdata_sf10")
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--brands", help="comma-separated subset (default all)")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from spark_clustering_spark.io import table
    from spark_clustering_spark.session import get_spark

    spark = get_spark("theta-closure")
    con = parity.duck_conn(args.sf)
    oracle = entrymod.oracle_sql()[QUERY]

    if args.brands:
        brands = [b.strip() for b in args.brands.split(",")]
    else:
        brands = [
            r.p_brand
            for r in table(spark, args.sf, "part")
            .select("p_brand").distinct().orderBy("p_brand").collect()
        ]

    out_path = Path(args.json)
    state = (
        json.loads(out_path.read_text())
        if out_path.exists()
        else {"query": QUERY, "sf": args.sf,
              "check": "per-brand stratified aggregate parity "
                       "(brand slices partition the full output)",
              "n_brands_total": len(brands), "brands": {}}
    )
    done = state["brands"]
    todo = [b for b in brands if b not in done
            or not done[b].get("match")]
    print(f"theta closure: {len(todo)} brands to run, "
          f"{len(brands) - len(todo)} already recorded")

    def _flush():
        ok = [b for b, r in done.items() if r.get("match")]
        state["n_brands_pass"] = len(ok)
        state["n_rows_total"] = sum(
            r["agg"]["n_rows"] for r in done.values() if r.get("match")
        )
        state["complete"] = len(ok) == len(brands)
        out_path.write_text(json.dumps(state, indent=1))

    qfn = entrymod.queries()[QUERY]
    for i in range(0, len(todo), args.chunk):
        chunk = todo[i : i + args.chunk]
        t0 = time.time()
        sdf = qfn(spark, args.sf).filter(F.col("brand").isin(chunk))
        specs = parity.agg_contract(sdf.schema)
        srows = (
            sdf.groupBy("brand")
            .agg(*[col.alias(a) for a, col, _ in specs])
            .collect()
        )
        sec_spark = round(time.time() - t0, 1)
        t0 = time.time()
        in_list = ", ".join("'" + b.replace("'", "''") + "'" for b in chunk)
        duck_sql = (
            "SELECT brand, "
            + ", ".join(f'{expr} AS "{a}"' for a, _, expr in specs)
            + f" FROM ({oracle}) WHERE brand IN ({in_list}) GROUP BY brand"
        )
        drows = {r[0]: r[1:] for r in con.execute(duck_sql).fetchall()}
        sec_duck = round(time.time() - t0, 1)
        for row in srows:
            b = row["brand"]
            sagg = {a: parity._agg_norm(row[a]) for a, _, _ in specs}
            dagg = {
                a: parity._agg_norm(v)
                for (a, _, _), v in zip(specs, drows.get(b, ()))
            }
            mism = {
                a: {"spark": sagg[a], "duck": dagg.get(a)}
                for a in sagg
                if sagg[a] != dagg.get(a)
            }
            done[b] = {
                "match": not mism,
                "agg": sagg,
                "sec_spark": sec_spark,
                "sec_duck": sec_duck,
            }
            if mism:
                done[b]["mismatch"] = mism
        missing_spark = [b for b in chunk if b not in {r["brand"] for r in srows}]
        for b in missing_spark:
            # brand present in neither side is vacuously consistent only
            # if DuckDB also lacks it
            done[b] = {"match": b not in drows, "agg": {"n_rows": 0}}
        _flush()
        n_ok = sum(1 for b in chunk if done[b]["match"])
        print(
            f"  chunk {chunk[0]}..{chunk[-1]}: {n_ok}/{len(chunk)} match "
            f"(spark {sec_spark}s, duck {sec_duck}s)",
            flush=True,
        )

    _flush()
    ok = state["n_brands_pass"]
    print(f"\n{ok}/{len(brands)} brands match; "
          f"{state.get('n_rows_total', 0)} total rows, "
          f"complete={state['complete']}")
    sys.exit(0 if state["complete"] else 1)


if __name__ == "__main__":
    main()
