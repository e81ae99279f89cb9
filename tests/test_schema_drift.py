"""Guard against driver-side testdata regeneration changing schemas.

Round 2 lost 4 queries + 4 tests when the driver regenerated
``events.parquet`` with ``ts`` as plain ``timestamp[us]`` (read as
TIMESTAMP_NTZ) instead of TIMESTAMP(NANOS).  This test pins every
assumption the engine makes about the testdata so the NEXT
regeneration fails one obvious test instead of N scattered ones.
"""

from __future__ import annotations

import os

import pytest

from spark_clustering_spark import io

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def tables(spark):
    return {name: io.table(spark, SF_DIR, name) for name in io.TABLES}


def test_events_ts_normalizes_to_timestamp(tables):
    # io.table() must hand every consumer a plain TIMESTAMP regardless of
    # whether the parquet file stores nanos-bigint, timestamp[us] (NTZ),
    # or tz-adjusted timestamp.
    assert dict(tables["events"].dtypes)["ts"] == "timestamp"


def test_events_required_columns(tables):
    cols = set(tables["events"].columns)
    assert {"ts", "user_id", "event_type"} <= cols


def test_embeddings_element_type(tables):
    dt = dict(tables["embeddings"].dtypes)
    assert "embedding" in dt and "vec_id" in dt, dt
    # vector kernels assume a numeric element type
    assert dt["embedding"] in ("array<float>", "array<double>"), dt


def test_documents_text_present_and_nonnull(tables):
    df = tables["documents"]
    assert "text" in df.columns and "doc_id" in df.columns
    assert df.filter(df["text"].isNull()).limit(1).count() == 0


def test_lineitem_core_columns(tables):
    cols = set(tables["lineitem"].columns)
    assert {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
        "l_returnflag",
    } <= cols


def test_all_tables_readable_nonempty(tables):
    for name, df in tables.items():
        assert len(df.columns) > 0, name
        assert df.limit(1).count() == 1, f"{name} is empty"
