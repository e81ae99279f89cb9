"""Set operators (SURVEY.md §2B "Set operations")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_clustering_spark.io import table
from spark_clustering_spark.registry import query


@query(
    "q_set_union_all",
    oracle="""
    SELECT c_custkey, c_mktsegment, 'machinery' AS src
    FROM customer WHERE c_mktsegment = 'MACHINERY'
    UNION ALL
    SELECT c_custkey, c_mktsegment, 'building' AS src
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two tagged customer segment slices."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "c_custkey", "c_mktsegment", F.lit("machinery").alias("src")
    )
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_mktsegment", F.lit("building").alias("src")
    )
    return a.unionByName(b)


@query(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of customer vs supplier nation keys."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each nation key appears
    min(count_customer, count_supplier) times."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@query(
    "q_set_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics: each nation key appears
    max(count_customer − count_supplier, 0) times."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@query(
    "q_set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) of customer-minus-supplier nation keys."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)
