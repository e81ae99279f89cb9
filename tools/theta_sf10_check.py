"""q_join_theta_range at-scale closure (VERDICT r10 task 4).

The sf10 output is ~39B pairs (2M parts, ~25 brands, size-range
predicate) — never materializable. The contract is per-brand
stratified aggregate parity: for each brand, both engines compute the
schema-derived summary (count + exact decimal sums + lensums, NO
count-distincts — Spark's multi-DC Expand multiplies the 39B-row input
x4 — strengthened instead with exact cross-moment sums
sum(key_small*key_big) and sum(size_gap²), which are pair-sensitive)
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

# Closed-form oracle: the per-brand aggregate of the size-range join
# decomposes over per-(brand, size) sufficient statistics — for sizes
# s < t with n_s parts / key-sum S_s at size s:
#   n_rows        = Σ n_s·n_t          sum_key_small = Σ S_s·n_t
#   sum_key_big   = Σ n_s·S_t          sum_size_gap  = Σ n_s·n_t·(t-s)
#   xsum_keys     = Σ S_s·S_t          sqsum_gap     = Σ n_s·n_t·(t-s)²
#   lensum_brand  = length(brand)·n_rows
# This is an algebraic identity of the SAME aggregate (not an
# approximation): the oracle becomes O(parts + brands·sizes²) — ~50
# sizes → ≤1225 (s,t) combos per brand — instead of materializing the
# O(n²) pair stream the ENGINE still computes for real. The identity
# is machine-checked against the brute-force pair-form oracle at small
# sf via --verify-closed (and both forms ran equal at sf0.01/sf1 when
# this landed). Decimal widths: every factor is sized so DuckDB
# products stay ≤ width 38 (counts ≤ 1e9 → DECIMAL(9,0); key sums
# ≤ 1e15 → DECIMAL(15,0); gaps ≤ 1e4 → DECIMAL(7,0)). One duck quirk
# found at sf10: w1+w2 ≤ 18 products are computed AND range-checked in
# int64 as DECIMAL(18) — ska·skb ≈ 2.6e18 overflowed the CHECK even
# though int64 holds it — so the key-sum product upcasts both operands
# to DECIMAL(19,0), forcing the int128 path.
CLOSED_FORM_SQL = """
WITH m AS (
  SELECT p_brand AS brand, p_size AS s,
         cast(count(*) AS DECIMAL(9,0)) AS n,
         cast(sum(cast(p_partkey AS DECIMAL(15,0))) AS DECIMAL(15,0)) AS sk
  FROM part GROUP BY 1, 2
),
pr AS (
  SELECT a.brand,
         a.n AS na, b.n AS nb, a.sk AS ska, b.sk AS skb,
         cast(b.s - a.s AS DECIMAL(7,0)) AS g
  FROM m a JOIN m b ON a.brand = b.brand AND a.s < b.s
)
SELECT brand,
  cast(sum(na * nb) AS DECIMAL(38,0))                    AS n_rows_d,
  cast(sum(ska * nb) AS DECIMAL(38,0))                   AS sum_key_small,
  cast(sum(na * skb) AS DECIMAL(38,0))                   AS sum_key_big,
  cast(length(brand) * sum(na * nb) AS DECIMAL(38,0))    AS lensum_brand,
  cast(sum((na * nb) * g) AS DECIMAL(38,0))              AS sum_size_gap,
  cast(sum(cast(ska AS DECIMAL(19,0)) * cast(skb AS DECIMAL(19,0)))
       AS DECIMAL(38,0))                                 AS xsum_keys,
  cast(sum((na * nb) * (g * g)) AS DECIMAL(38,0))        AS sqsum_gap
FROM pr
GROUP BY brand
"""

# maps contract alias -> closed-form column (n_rows is a bigint count
# in the generic contract; the closed form emits it as decimal and the
# comparator normalizes both through _agg_norm's int path)
CLOSED_COLS = {
    "n_rows": "n_rows_d",
    "sum_key_small": "sum_key_small",
    "sum_key_big": "sum_key_big",
    "lensum_brand": "lensum_brand",
    "sum_size_gap": "sum_size_gap",
    "xsum_keys": "xsum_keys",
    "sqsum_gap": "sqsum_gap",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", required=True)
    ap.add_argument("--sf", default="/root/repo/testdata_sf10")
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--brands", help="comma-separated subset (default all)")
    ap.add_argument(
        "--oracle-form", choices=["pair", "closed"], default="pair",
        help="pair = brute-force join oracle (default, use <= sf1); "
        "closed = sufficient-statistics closed form (sf10)")
    ap.add_argument(
        "--verify-closed", action="store_true",
        help="run BOTH oracle forms and require them identical "
        "(the machine check of the closed-form identity; cheap <= sf1)")
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
              "check": "per-brand stratified aggregate parity: exact "
                       "sums/lensums + cross-moment sums, no DCs "
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
        # distinct=False: Spark plans the generic contract's 3
        # COUNT(DISTINCT)s as an Expand x4 — 156B rows through the
        # aggregate at sf10 (the first r11 attempt was on pace for
        # ~7 h). The DCs are replaced by exact decimal MOMENT sums:
        # sum(key_small*key_big) and sum(size_gap^2) are order-proof,
        # map-side-combinable, overflow-free (4e12 x 39B ~ 1.6e23 <
        # 1e38), and pair-sensitive — a join that matched the wrong
        # rows preserves the marginal sums but not the cross-moment.
        specs = parity.agg_contract(sdf.schema, distinct=False)
        specs = specs + [
            (
                "xsum_keys",
                F.sum(
                    (
                        F.col("key_small").cast("decimal(19,0)")
                        * F.col("key_big").cast("decimal(19,0)")
                    ).cast("decimal(38,0)")
                ),
                'sum(cast("key_small" AS DECIMAL(19,0))'
                ' * cast("key_big" AS DECIMAL(19,0)))',
            ),
            (
                "sqsum_gap",
                F.sum(
                    (
                        F.col("size_gap").cast("decimal(19,0)")
                        * F.col("size_gap").cast("decimal(19,0)")
                    ).cast("decimal(38,0)")
                ),
                'sum(cast("size_gap" AS DECIMAL(19,0))'
                ' * cast("size_gap" AS DECIMAL(19,0)))',
            ),
        ]
        srows = (
            sdf.groupBy("brand")
            .agg(*[col.alias(a) for a, col, _ in specs])
            .collect()
        )
        sec_spark = round(time.time() - t0, 1)
        t0 = time.time()
        in_list = ", ".join("'" + b.replace("'", "''") + "'" for b in chunk)
        duck_pair_sql = (
            "SELECT brand, "
            + ", ".join(f'{expr} AS "{a}"' for a, _, expr in specs)
            + f" FROM ({oracle}) WHERE brand IN ({in_list}) GROUP BY brand"
        )
        duck_closed_sql = (
            "SELECT brand, "
            + ", ".join(f'{CLOSED_COLS[a]} AS "{a}"' for a, _, _ in specs)
            + f" FROM ({CLOSED_FORM_SQL}) WHERE brand IN ({in_list})"
        )
        duck_sql = (
            duck_closed_sql if args.oracle_form == "closed" else duck_pair_sql
        )
        drows = {r[0]: r[1:] for r in con.execute(duck_sql).fetchall()}
        sec_duck = round(time.time() - t0, 1)
        if args.verify_closed:
            other_sql = (
                duck_pair_sql if args.oracle_form == "closed"
                else duck_closed_sql
            )
            orows = {r[0]: r[1:] for r in con.execute(other_sql).fetchall()}
            forms_diff = {
                b: {"used": [parity._agg_norm(x) for x in drows.get(b, ())],
                    "other": [parity._agg_norm(x) for x in orows.get(b, ())]}
                for b in set(drows) | set(orows)
                if [parity._agg_norm(x) for x in drows.get(b, ())]
                != [parity._agg_norm(x) for x in orows.get(b, ())]
            }
            if forms_diff:
                print(f"  CLOSED-FORM IDENTITY VIOLATION: {forms_diff}")
                sys.exit(2)
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
                "oracle_form": args.oracle_form,
                "identity_checked": bool(args.verify_closed),
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
