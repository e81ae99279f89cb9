"""Filter / projection operators (SURVEY.md §2B "Projections / filters").

All pure Catalyst expressions — predicates are pushdown-eligible (the
range filter reaches the parquet scan as PushedFilters) and projections
stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_clustering_spark.functions.detagg import dround, sql_dround
from spark_clustering_spark.io import table
from spark_clustering_spark.registry import query


@query(
    "q_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
      AND l_quantity < 25
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range + numeric predicate; both push down to the scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 25)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


@query(
    "q_proj_expr",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_dround('l_extendedprice * (1 - l_discount)')} AS net_price,
           {sql_dround('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS charge
    FROM lineitem
    """,
)
def q_proj_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expression projection. The per-row IEEE products are
    bit-identical across engines; rounding goes through the decimal
    pivot (detagg.dround) so both engines round identically."""
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(net).alias("net_price"),
        dround(net * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


@query(
    "q_filter_in_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_name LIKE '%widget%'
      AND NOT (p_type LIKE 'PROMO%')
    """,
)
def q_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE + negated LIKE predicates."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_name").like("%widget%")
        & ~F.col("p_type").like("PROMO%")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "q_proj_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS price_bucket
    FROM orders
    """,
)
def q_proj_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
        .alias("price_bucket"),
    )
