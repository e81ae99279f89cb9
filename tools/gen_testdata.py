"""Synthetic testdata generator — reproduces the driver's sf* tree shape.

The driver ships read-only trees at /root/testdata/sf{0.001,0.01,0.1}
(TESTDATA.md) but no generator, so scale factors beyond sf0.1 cannot be
obtained from it.  This script regenerates the same star schema with the
same schemas, key relationships, value ranges, and categorical weights
(profiled from the shipped trees with DuckDB — see docstrings per table),
at any scale factor.  It is NOT bit-identical to the driver's trees — it
is used for at-scale parity (Spark vs DuckDB on the SAME generated files,
so the oracle gate stays valid) and growth benching at sf1+.

Row counts scale as profiled (sf0.1 -> shown):
  region 5, nation 25 (fixed); customer 150k*sf, supplier 10k*sf,
  part 200k*sf, orders 1.5M*sf, lineitem ~ orders*Poisson(4),
  events 1M*sf with 15k*sf users, documents max(500, 50k*sf),
  embeddings max(500, 20k*sf).

Usage: python tools/gen_testdata.py --sf 1 --out /root/repo/testdata_sf1
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()

DAY_US = 86_400_000_000  # microseconds per day


def _ts_days(rng_days: np.ndarray, epoch_day: int) -> pa.Array:
    """Day-granularity timestamps (stored as timestamp[us] like the driver's)."""
    return pa.array((rng_days.astype(np.int64) + epoch_day) * DAY_US,
                    type=pa.timestamp("us"))


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


def gen(sf: float, out: Path) -> None:
    rng = np.random.default_rng(SEED)
    out.mkdir(parents=True, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_user = int(15_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    # region / nation: fixed tiny dims (profiled verbatim)
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), type=pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), type=pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
    }))

    # customer: acctbal ~ U(-1000, 10000) 2dp, uniform segment/nation
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), type=pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), type=pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # part: name = adj + noun, retailprice = 900 + 0.1*k (1000 distinct)
    adj = np.array(ADJS)[rng.integers(0, 8, n_part)]
    noun = np.array(NOUNS)[rng.integers(0, 8, n_part)]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), type=pa.int64()),
        "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(900.0 + 0.1 * rng.integers(0, 1000, n_part), 1),
    }))

    # orders: orderdate uniform day over 1995-01-01 .. 2001-08-01 (2405 days)
    epoch_95 = (np.datetime64("1995-01-01") - np.datetime64("1970-01-01")).astype(int)
    odays = rng.integers(0, 2405, n_ord)
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), type=pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), type=pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_days(odays, epoch_95),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: per-order line count ~ Poisson(4) (zeros -> childless orders);
    # shipdate independent uniform over 1995-01-02 .. 2001-11-04 (+~48d mean lag)
    counts = rng.poisson(4.0, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), counts)
    n_li = len(l_orderkey)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, type=pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), type=pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), type=pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), type=pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_days(rng.integers(1, 2500, n_li), epoch_95),
    }))

    # events: 30 days of Jan-2024, microsecond ts, value ~ Exp(50) 2dp,
    # props = {"k": 0..99} JSON
    epoch_24_us = ((np.datetime64("2024-01-01") - np.datetime64("1970-01-01"))
                   .astype(int)) * DAY_US
    ts_us = np.sort(rng.integers(0, 30 * DAY_US, n_evt)) + epoch_24_us
    _write(out, "events", pa.table({
        "event_id": pa.array(range(n_evt), type=pa.int64()),
        "ts": pa.array(ts_us, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_user, n_evt), type=pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)],
    }))

    # documents: 10..100 words from the 31-word vocab, lang weighted
    # (en 0.41), 20 sources, ~0.16% exact-dup pairs injected
    nwords = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in nwords]
    n_dup = max(1, n_doc // 625)
    dup_src = rng.integers(0, n_doc, n_dup)
    dup_dst = rng.integers(0, n_doc, n_dup)
    for s, d in zip(dup_src, dup_dst):
        if s != d:
            texts[d] = texts[s]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), type=pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)]),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }))

    # embeddings: 64-dim unit vectors = weak label-cluster center + noise
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = 0.5 * centers[labels] + rng.normal(0, 1, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), type=pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = Path(args.out or f"/root/repo/testdata_sf{args.sf:g}")
    print(f"generating sf={args.sf:g} -> {out}")
    gen(args.sf, out)


if __name__ == "__main__":
    main()
