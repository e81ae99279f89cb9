"""queries() entries for the full clustering fits (SURVEY.md §2B
`fit_kmeans` / `fit_gka` / `fit_pso`).

Non-SQL-expressible (iterative driver loops) → rows-only driver checks
by contract; each returns its metrics history in the reference's R20
sink shape, with the behavioral invariants covered by
tests/test_clustering.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_clustering_spark.operators.clustering import points_df
from spark_clustering_spark.registry import query


@query("fit_kmeans")  # rows-only: iterative, validated by invariants
def q_fit_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Lloyd's k-means (k=8, 5 iters, 2 restarts, seed 42) — R20 metrics history."""
    from spark_clustering_spark.ml.kmeans import fit_kmeans

    res = fit_kmeans(
        spark, points_df(spark, sf_dir), k=8, num_iter=5, num_run=2, seed=42
    )
    return res.metrics


@query("fit_gka")  # rows-only: iterative, validated by invariants
def q_fit_gka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genetic k-means (pop 6, 3 generations, Pm=0.6, Cm=0.9) — metrics history."""
    from spark_clustering_spark.ml.gka import fit_gka

    res = fit_gka(
        spark, points_df(spark, sf_dir), k=8, pop=6, num_gen=3, seed=42
    )
    return res.metrics


@query("fit_pso")  # rows-only: iterative, validated by invariants
def q_fit_pso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSO clustering (6 particles, 3 iterations, canonical inertia) — metrics history."""
    from spark_clustering_spark.ml.pso import fit_pso

    res = fit_pso(
        spark,
        points_df(spark, sf_dir),
        k=8,
        num_particles=6,
        num_iter=3,
        seed=42,
    )
    return res.metrics
