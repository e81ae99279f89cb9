"""Vector-statistics operators (SURVEY.md §2B R2/R3/R17 rows).

The reference computes per-dimension min/max during its CSV parse
(kmeans.java:219-230) and derives PSO velocity bounds from them
(pso.java:199-205). Spark-first: posexplode + one hash aggregation —
partial aggregation makes this a single narrow pass + tiny shuffle
regardless of data size (64·k groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_clustering_spark.functions.detagg import dround
from spark_clustering_spark.functions.distance import as_double_array, euclidean
from spark_clustering_spark.io import table
from spark_clustering_spark.registry import query

SQL_DIMS = """dims AS (
      SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
             generate_subscripts(embedding, 1) - 1 AS pos
      FROM embeddings
    )"""


@query(
    "q_vec_minmax",
    oracle=f"""
    WITH {SQL_DIMS}
    SELECT pos::INT AS pos,
           cast(round(cast(cast((min(v)) AS VARCHAR) AS DECIMAL(38,12)), 4) AS DOUBLE) AS dim_min,
           cast(round(cast(cast((max(v)) AS VARCHAR) AS DECIMAL(38,12)), 4) AS DOUBLE) AS dim_max
    FROM dims GROUP BY pos
    """,
)
def q_vec_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: per-dimension min/max (min/max are order-insensitive — no
    decimal trick needed)."""
    e = table(spark, sf_dir, "embeddings")
    dims = e.select(F.posexplode(as_double_array("embedding")).alias("pos", "v"))
    return dims.groupBy("pos").agg(
        dround(F.min("v")).alias("dim_min"),
        dround(F.max("v")).alias("dim_max"),
    )


@query(
    "q_vec_vbounds",
    oracle=f"""
    WITH {SQL_DIMS}
    SELECT pos::INT AS pos,
           cast(round(cast(cast(((max(v) - min(v)) / 100) AS VARCHAR) AS DECIMAL(38,12)), 4) AS DOUBLE) AS v_max,
           cast(round(cast(cast((-((max(v) - min(v)) / 100)) AS VARCHAR) AS DECIMAL(38,12)), 4) AS DOUBLE) AS v_min
    FROM dims GROUP BY pos
    """,
)
def q_vec_vbounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R17: PSO velocity bounds = (max-min)/100 per dimension
    (pso.java:199-205)."""
    e = table(spark, sf_dir, "embeddings")
    dims = e.select(F.posexplode(as_double_array("embedding")).alias("pos", "v"))
    span = (F.max("v") - F.min("v")) / 100
    return dims.groupBy("pos").agg(
        dround(span).alias("v_max"),
        dround(-span).alias("v_min"),
    )


@query(
    "q_dist_euclidean",
    oracle="""
    WITH sample AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings WHERE vec_id < 20
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           cast(round(cast(cast((list_distance(a.vec, b.vec)) AS VARCHAR) AS DECIMAL(38,12)), 4) AS DOUBLE) AS dist
    FROM sample a JOIN sample b ON a.vec_id < b.vec_id
    """,
)
def q_dist_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: pairwise L2 distances for a keyed sample — the zip_with/
    aggregate expression form of the reference's compute_dist
    (kmeans.java:254-260); stays fully inside codegen."""
    e = table(spark, sf_dir, "embeddings")
    s = e.filter(F.col("vec_id") < 20).select(
        "vec_id", as_double_array("embedding").alias("vec")
    )
    a = s.select(F.col("vec_id").alias("a_id"), F.col("vec").alias("va"))
    b = s.select(F.col("vec_id").alias("b_id"), F.col("vec").alias("vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            dround(euclidean(F.col("va"), F.col("vb"))).alias("dist"),
        )
    )
