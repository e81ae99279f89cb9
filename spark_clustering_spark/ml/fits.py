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


@query("fit_kmeans_mllib")  # rows-only: iterative, validated by invariants
def q_fit_kmeans_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production/scale k-means: MLlib k-means|| (JVM Lloyd's, k=8,
    10 iters, seed 42) — the path a real 100 TB fit would run. Output
    is one row per cluster (size + unsquared within-cluster cost per
    Q4) so the surface is deterministic under label permutation up to
    row order; assignment agreement vs the DF-native Lloyd loop is
    asserted in tests/test_clustering.py."""
    from pyspark.sql import functions as F

    from spark_clustering_spark.functions.distance import euclidean
    from spark_clustering_spark.ml.kmeans import fit_kmeans_mllib

    pts = points_df(spark, sf_dir)
    model, pred = fit_kmeans_mllib(spark, pts, k=8, num_iter=10, seed=42)
    centers = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cdf = spark.createDataFrame(centers, "cluster_id int, center array<double>")
    # Q4: the reference's objective is the UNSQUARED distance sum.
    return (
        pred.join(pts, "vec_id")
        .join(F.broadcast(cdf), "cluster_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(euclidean(F.col("vec"), F.col("center"))).alias("cost"),
        )
    )


@query("fit_gka_ref_config")  # rows-only: iterative, validated by invariants
def q_fit_gka_ref_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-scale GKA (pop=20 per the reference README config,
    5 generations, seed 42) — promoted from an unverified bench extra
    to a declared key (VERDICT r5 task 3) so the P·k·d state-growth
    path carries the same invariant suite (monotone best, R20 metrics
    schema) as the toy-hyperparam fit_gka."""
    from spark_clustering_spark.ml.gka import fit_gka

    res = fit_gka(
        spark, points_df(spark, sf_dir), k=8, pop=20, num_gen=5, seed=42
    )
    return res.metrics


@query("fit_pso_ref_config")  # rows-only: iterative, validated by invariants
def q_fit_pso_ref_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-scale PSO (20 particles per the reference README
    config — `README.md:90`, `pso.java:56-66`: c1=c2=2, inertia
    0.9→0.4 — 5 iterations, seed 42): promoted from an unverified
    bench extra to a declared key (VERDICT r7 task 5, the same
    promotion fit_gka_ref_config got in r5) so the P·k·d state-growth
    path carries the invariant suite — monotone gbest, R20 metrics
    schema, and the R17/R14 velocity clamp |v| ≤ v_max asserted from
    per-iteration clamp evidence (tests/test_clustering.py)."""
    from spark_clustering_spark.ml.pso import fit_pso

    res = fit_pso(
        spark,
        points_df(spark, sf_dir),
        k=8,
        num_particles=20,
        num_iter=5,
        seed=42,
    )
    return res.metrics


@query("fit_gmm_mllib")  # rows-only: iterative, validated by invariants
def q_fit_gmm_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production/scale GMM: MLlib GaussianMixture (JVM full-covariance
    EM, k=8, 20 iters, seed 42) — the MLlib mapping the north star
    names ("Approach: MLlib clustering algorithms"), completing the
    fit_kmeans_mllib pattern. Output is one row per component
    (hard-assignment size + mixture weight + soft responsibility
    mass), deterministic for the fixed seed; co-membership agreement
    vs the kernel EM loop is asserted in tests/test_clustering.py."""
    from pyspark.sql import functions as F

    from spark_clustering_spark.ml.gmm import fit_gmm_mllib

    pts = points_df(spark, sf_dir)
    model, pred = fit_gmm_mllib(spark, pts, k=8, num_iter=20, seed=42)
    weights = [(int(i), float(w)) for i, w in enumerate(model.weights)]
    wdf = spark.createDataFrame(weights, "cluster_id int, weight double")
    from pyspark.ml.functions import vector_to_array

    soft = pred.select(
        "cluster_id", vector_to_array(F.col("probability")).alias("resp")
    )
    hard = soft.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.element_at(F.col("resp"), F.col("cluster_id") + 1)).alias(
            "resp_mass"
        ),
    )
    # left join from the weight table so components with zero hard
    # assignments still appear (weights must sum to 1 over ALL k rows)
    return wdf.join(F.broadcast(hard), "cluster_id", "left").select(
        "cluster_id",
        F.coalesce(F.col("n_points"), F.lit(0)).alias("n_points"),
        F.coalesce(F.col("resp_mass"), F.lit(0.0)).alias("resp_mass"),
        "weight",
    )


@query("fit_gmm")  # rows-only: iterative, validated by invariants
def q_fit_gmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical-GMM EM (k=8, 3 iterations, sigma2=4, free means +
    mixture weights) — metrics history (iteration, loglik,
    avg_loglik). EM's monotone-loglik guarantee is the invariant
    test; the single-step E/M/loglik surfaces are hash-verified
    separately (q_ml_gmm_estep / _mstep / _loglik)."""
    from spark_clustering_spark.ml.gmm import fit_gmm

    res = fit_gmm(spark, points_df(spark, sf_dir), k=8, num_iter=3, sigma2=4.0)
    return res.metrics


@query("fit_kmeans_stream")  # rows-only: true streaming, validated by replay test
def q_fit_kmeans_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mini-batch k-means: the embeddings corpus replayed as
    a vec_id-ordered file stream (mtime-pinned arrival order), one
    Lloyd assignment pass per micro-batch (the SAME kernel the batch
    fit uses), decay-weighted center folds on O(k·d) driver state —
    the MLlib StreamingKMeans update rule exactly, asserted against
    both a numpy replay and
    pyspark.mllib.clustering.StreamingKMeansModel.update in
    tests/test_streaming.py."""
    from spark_clustering_spark.streaming.kmeans import fit_kmeans_stream

    return fit_kmeans_stream(spark, sf_dir, k=8, n_chunks=4, decay=1.0)
