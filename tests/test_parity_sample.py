"""Fast in-pytest oracle parity over a representative query sample.

The full inventory runs through tools/parity.py (and the driver's own
t2 check); this keeps a canary in the unit suite so a regression in the
detagg/rounding discipline fails CI immediately.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_SMALL

SAMPLE = [
    "q_agg_hash",
    "q_proj_expr",
    "q_join_smj",
    "q_window_running",
    "q_assign_nearest",
    "q_sse_objective",
    "q_stream_session",
    "q_dedup_exact",
    "q_text_fingerprint",
    "q_text_tfidf",
    # round-5 machinery canaries
    "q_window_running_global",   # global_running_agg two-pass
    "q_olap_abc_pareto",         # decimal carry-in + driver-total literal
    "q_graph_triangles",         # degree-oriented closure + scaled width
    "q_cdc_scd2",                # gaps-and-islands SCD2
    "q_ab_lift",                 # hash bucketing + guarded z-test
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_weighted_sample_ties_at_rounding_boundary(spark, tmp_path):
    """Regression for the 14c6aba bug class: the q_sample_weighted
    oracle must ORDER BY the RAW Efraimidis–Spirakis key — DuckDB
    resolves an ORDER BY on the output alias to the 6dp-ROUNDED value,
    and under LIMIT a tie group at the boundary selects different rows
    than Spark's raw-key TakeOrdered. At the shipped scale factors the
    keys happen not to collide; this fixture forces the sf1 collision
    shape (huge n_chars → keys ≪ 1e-6, one rounded tie group) so a
    revert of the oracle fix fails here instead of in a 75-minute sf1
    sweep."""
    import duckdb
    import numpy as np

    import __spark_entry__ as e
    from spark_clustering_spark.pipeline.sampling import (
        _ES_A,
        _ES_C,
        _ES_M,
        ES_K,
        ES_SEED,
    )

    n_docs, n_chars = 200, 50_000_000
    doc = np.arange(1, n_docs + 1, dtype=np.int64)
    pd.DataFrame(
        {
            "doc_id": doc,
            "text": ["x"] * n_docs,
            "lang": [("en", "fr", "zh")[i % 3] for i in range(n_docs)],
            "source": ["tie-fixture"] * n_docs,
            "n_chars": np.full(n_docs, n_chars, dtype=np.int64),
        }
    ).to_parquet(tmp_path / "documents.parquet")

    # the fixture must actually put the LIMIT boundary inside a
    # rounded tie group AND make rounded-order pick a different set —
    # otherwise this test is vacuous
    u = ((doc * _ES_A + _ES_C + ES_SEED) % _ES_M + 0.5) / _ES_M
    raw = -np.log(u) / n_chars
    r6 = np.round(raw, 6)
    by_raw = np.lexsort((doc, raw))
    assert r6[by_raw][ES_K - 1] == r6[by_raw][ES_K], "boundary not tied"
    assert set(doc[by_raw][:ES_K]) != set(
        doc[np.lexsort((doc, r6))][:ES_K]
    ), "rounded-order selects the same rows; fixture lost its teeth"

    spark_pd = canon(
        e.queries()["q_sample_weighted"](spark, str(tmp_path)).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    duck_pd = canon(con.execute(e.oracle_sql()["q_sample_weighted"]).fetchdf())
    assert sorted(spark_pd["doc_id"]) == sorted(duck_pd["doc_id"])
    assert (spark_pd["ekey"].astype(float) == duck_pd["ekey"].astype(float)).all()


def _outer_order_by(sql: str) -> str:
    """The final top-level ORDER BY clause of an oracle (not window
    ORDER BYs inside OVER(...)): scan at parenthesis depth 0."""
    depth, last = 0, -1
    upper = sql.upper()
    for i, ch in enumerate(sql):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and upper.startswith("ORDER BY", i):
            last = i
    return sql[last:] if last >= 0 else ""


# Oracles whose outer ORDER BY references a rounded alias ON PURPOSE:
# their Spark side applies dround BEFORE orderBy, so BOTH engines rank
# the identical rounded value and the unique trailing tiebreak keys
# make the order total. Safe; listed so the audit flags staleness if
# the Spark side ever changes to raw-key ordering.
ROUNDED_ORDER_ALLOWLIST = {
    "q_graph_jaccard_linkpred": "Spark dround(jaccard) before orderBy; ties broken by unique (u, v)",
    "q_graph_clustering_coeff": "Spark dround(lcc) before orderBy; ties broken by (triangles, node)",
}


def test_no_oracle_orders_by_rounded_alias():
    """Audit for the whole 14c6aba bug class: any oracle with a
    top-level LIMIT must not ORDER BY an alias whose SELECT item
    rounds/quantizes a value — ties introduced by the rounding make
    the LIMIT pick different rows than the raw-key Spark plan (unless
    the Spark side ranks the same rounded value: see allowlist).
    First real catch beyond q_sample_weighted:
    q_vec_outlier_mahalanobis ordered by its rounded output alias
    while Spark TakeOrders the raw score."""
    import re

    import __spark_entry__ as e

    offenders = []
    for name, sql in e.oracle_sql().items():
        order = _outer_order_by(sql)
        if not order or "LIMIT" not in order.upper():
            continue
        # aliases produced by a rounding expression anywhere in the query
        rounded_aliases = {
            m.group(1)
            for m in re.finditer(
                r"round\([^;]*?\bAS\s+(\w+)\s*(?:,|\n|FROM)", sql, re.I
            )
        }
        order_keys = {
            k.strip().split()[0]
            for k in order[len("ORDER BY"):].split("LIMIT")[0].split(",")
            if k.strip()
        }
        hit = order_keys & rounded_aliases
        if hit:
            offenders.append((name, sorted(hit)))
    bad = [o for o in offenders if o[0] not in ROUNDED_ORDER_ALLOWLIST]
    assert not bad, (
        "oracles ordering a LIMIT by a rounded alias (14c6aba class): "
        f"{bad}"
    )
    stale = set(ROUNDED_ORDER_ALLOWLIST) - {o[0] for o in offenders}
    assert not stale, f"allowlist entries no longer rounded-ordered: {stale}"


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_duckdb_oracle(spark, duck, name):
    import __spark_entry__ as e

    spark_pd = canon(e.queries()[name](spark, SF_SMALL).toPandas())
    duck_pd = canon(duck.execute(e.oracle_sql()[name]).fetchdf())
    assert list(spark_pd.columns) == list(duck_pd.columns)
    assert len(spark_pd) == len(duck_pd)
    for c in spark_pd.columns:
        a, b = spark_pd[c], duck_pd[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            aa = a.astype(float)
            bb = b.astype(float)
            assert ((aa == bb) | (aa.isna() & bb.isna())).all(), c
        else:
            assert (
                (a == b) | (pd.isna(a) & pd.isna(b))
            ).all(), c


def test_split_ctes_handles_line_comments():
    """ADVICE r10: an unbalanced paren or apostrophe inside a `--`
    comment must not desync the CTE body scanner."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "parity_tool", Path(__file__).parent.parent / "tools" / "parity.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    sql = (
        "WITH a AS (\n"
        "  SELECT 1 AS x -- don't mind the stray ) paren '\n"
        "  FROM t\n"
        "), b AS (SELECT x FROM a)\n"
        "SELECT * FROM b"
    )
    ctes, tail = mod._split_ctes(sql)
    assert [c[0] for c in ctes] == ["a", "b"]
    assert "FROM t" in ctes[0][1]
    assert tail.strip() == "SELECT * FROM b"

    # no-WITH and quoted-string round-trips stay intact
    assert mod._split_ctes("SELECT 1") == ([], "SELECT 1")
    ctes2, tail2 = mod._split_ctes(
        "WITH q AS (SELECT '(' AS p) SELECT * FROM q"
    )
    assert ctes2 == [("q", "SELECT '(' AS p")]
