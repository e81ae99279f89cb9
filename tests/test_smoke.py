"""Driver-contract smoke tests (t1 analog)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def test_entry_runs_and_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "count_order" in df.columns


def test_every_query_has_matching_oracle_key(spark):
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs), "oracle keys must be a subset of queries"
    # the declared inventory should be mostly SQL-checked
    assert len(osql) >= 0.8 * len(qs)


@pytest.mark.parametrize("name", ["q_agg_hash", "q_join_broadcast", "q_vec_minmax"])
def test_sampled_queries_nonempty(spark, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, SF_SMALL)
    assert df.count() > 0
