"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the orders⋈lineitem join dominates unless both sides are
bucketed on the join key at write time: each bucket pair joins locally
with NO exchange. This module materializes bucketed copies of the
driver tables into a managed warehouse and exposes the co-located join;
tests/test_scale.py asserts the plan contains zero Exchange nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_clustering_spark.io import table

N_BUCKETS = 8


def _clear_stale_location(spark: SparkSession, name: str) -> None:
    """A crashed prior run can leave the managed location on disk with
    no catalog entry — saveAsTable then refuses. Drop both."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)


def create_bucketed_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = N_BUCKETS
) -> None:
    """Write orders + lineitem bucketed (and sorted) by the order key.
    Idempotent: skips tables that already exist in the session catalog."""
    existing = {t.name for t in spark.catalog.listTables()}
    if "orders_b" not in existing:
        _clear_stale_location(spark, "orders_b")
        table(spark, sf_dir, "orders").write.bucketBy(
            n_buckets, "o_orderkey"
        ).sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
    if "lineitem_b" not in existing:
        _clear_stale_location(spark, "lineitem_b")
        table(spark, sf_dir, "lineitem").write.bucketBy(
            n_buckets, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")


class no_broadcast:
    """Context manager forcing the large-large join path (the realistic
    100 TB case — neither side broadcastable). At test scale Spark would
    otherwise broadcast the small side and skip the bucketed scan."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


def colocated_order_join(spark: SparkSession) -> DataFrame:
    """orders_b ⋈ lineitem_b on the bucket key: bucket-to-bucket local
    sort-merge join — zero shuffle exchanges on either side (both are
    pre-partitioned and pre-sorted by the key at write time)."""
    from pyspark.sql import functions as F

    o = spark.table("orders_b")
    li = spark.table("lineitem_b")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,8)")), 4)
            .cast("double")
            .alias("order_total"),
        )
    )
