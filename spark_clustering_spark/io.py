"""Table loading for the driver-generated TPC-H-ish parquet tables.

At 100 TB these reads are partitioned parquet scans; everything here is
a thin, lazily-planned ``spark.read.parquet`` so Catalyst keeps column
pruning and predicate pushdown (``.explain`` shows ``PushedFilters`` /
``ReadSchema`` reaching the scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table.

    ``events.ts`` is stored as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` it
    arrives as a nanos bigint and is converted here to a microsecond
    timestamp (truncation — matching DuckDB's ns→us read behavior).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # deterministic timestamp rendering even on a caller-provided session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) parquet read via nanosAsLong
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # plain timestamp[us] (no tz) parquet arrives as TIMESTAMP_NTZ;
            # session tz is pinned UTC above, so this cast is value-preserving
            # and restores unix_micros()/window() compatibility.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql access."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition a WORK-AMPLIFYING input up to cluster parallelism —
    only when the scan under-parallelizes it.

    Operators like shingling explode each row into ~10-100x its bytes
    before the first shuffle, so their map stage's parallelism is fixed
    by the SCAN's split count. Spark sizes splits by input bytes
    (maxPartitionBytes / openCostInBytes), which is right for scans but
    wrong for amplifying maps: a single small file becomes ONE task
    doing 100x work. At 100 TB the table has thousands of row groups
    and this gate never fires; on a small/compacted input it buys the
    full core count for the expensive stage at the cost of one narrow
    shuffle of the raw rows.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
