"""global_running_agg property tests: the two-pass range-partitioned
running aggregate must agree EXACTLY with the naive single-reducer
window on randomized inputs — duplicates in the order prefix, skewed
key distributions, empty slices, negative values, and every supported
kind (sum / max / count) at once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _naive(df, order_cols):
    w = Window.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.select(
        "id",
        F.sum("v").over(w).alias("run_sum"),
        F.max("v").over(w).alias("run_max"),
        F.row_number().over(Window.orderBy(*order_cols)).alias("run_rn"),
    )


def _scalable(df, order_cols, num_partitions):
    from spark_clustering_spark.operators.windows import global_running_agg

    out, totals = global_running_agg(
        df,
        order_cols,
        {
            "run_sum": ("sum", F.col("v")),
            "run_max": ("max", F.col("v")),
            "run_rn": ("count", None),
        },
        num_partitions=num_partitions,
    )
    return out.select("id", "run_sum", "run_max", "run_rn"), totals


@pytest.mark.parametrize("seed,n,num_partitions", [(7, 200, 8), (11, 37, 16)])
def test_matches_naive_window_on_random_data(spark, seed, n, num_partitions):
    import random

    rng = random.Random(seed)
    # duplicate-heavy sort key (k) exercises tie handling across slice
    # boundaries; id is the unique tiebreaker making the order total
    rows = [(i, rng.randint(0, 9), rng.randint(-50, 50)) for i in range(n)]
    df = spark.createDataFrame(rows, "id bigint, k int, v bigint")
    order_cols = [F.col("k"), F.col("id")]
    got, totals = _scalable(df, order_cols, num_partitions)
    want = _naive(df, order_cols)
    g = {r["id"]: (r["run_sum"], r["run_max"], r["run_rn"]) for r in got.collect()}
    w = {r["id"]: (r["run_sum"], r["run_max"], r["run_rn"]) for r in want.collect()}
    assert g == w
    assert totals["run_sum"] == sum(v for _, _, v in rows)
    assert totals["run_max"] == max(v for _, _, v in rows)
    assert totals["run_rn"] == n


def test_desc_order_and_skew(spark):
    # one dominant key value: most rows land in one range slice
    rows = [(i, 5 if i % 10 else i, i * 3 - 40) for i in range(120)]
    df = spark.createDataFrame(rows, "id bigint, k int, v bigint")
    order_cols = [F.col("k").desc(), F.col("id")]
    got, _ = _scalable(df, order_cols, 8)
    want = _naive(df, order_cols)
    assert sorted(got.collect()) == sorted(want.collect())


def test_empty_input(spark):
    df = spark.createDataFrame([], "id bigint, k int, v bigint")
    got, totals = _scalable(df, [F.col("k"), F.col("id")], 4)
    assert got.count() == 0
    assert totals == {"run_sum": None, "run_max": None, "run_rn": None}


def test_more_partitions_than_rows(spark):
    rows = [(0, 1, 10), (1, 1, -5), (2, 0, 7)]
    df = spark.createDataFrame(rows, "id bigint, k int, v bigint")
    got, totals = _scalable(df, [F.col("k"), F.col("id")], 16)
    want = _naive(df, [F.col("k"), F.col("id")])
    assert sorted(got.collect()) == sorted(want.collect())
    assert totals["run_rn"] == 3
