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
