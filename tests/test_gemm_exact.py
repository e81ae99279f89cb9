"""Equivalence proof for the staged GEMM-prefilter exact-kNN path
(pipeline.similarity.knn_topk_gemm_exact): bit-identical to scoring
EVERY pair with the declared dot_dec expression, across scales. This
is the verification pass that gates the round-8 swap into
q_vec_knn_graph / q_ml_knn_classify."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _declared_topk(spark, sf_dir, knn_mod, k):
    """The declared keys' all-pairs exact top-k (the _blocked_cross +
    dot_dec + window path), re-derived here as the ground truth."""
    from spark_clustering_spark.functions.distance import as_double_array, dot_dec
    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.similarity import _blocked_cross

    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % knn_mod == 0)
        .select("vec_id", as_double_array("embedding").alias("vec"))
    )
    n = e.select(
        "vec_id", "vec",
        F.sqrt(dot_dec(F.col("vec"), F.col("vec")).cast("double")).alias("nrm"),
    )
    a = n.select(
        F.col("vec_id").alias("src"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("dst"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    scored = (
        _blocked_cross(a, b, "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src", "dst",
            (
                dot_dec(F.col("va"), F.col("vb")).cast("double")
                / (F.col("na") * F.col("nb"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    topk = scored.select(
        "src", "dst", "cos", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= k)
    return a, b, topk


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_gemm_exact_equals_declared_all_pairs(spark, sf_dir):
    from spark_clustering_spark.pipeline.similarity import (
        KNN_K,
        KNN_MOD,
        knn_topk_gemm_exact,
    )

    a, b, declared = _declared_topk(spark, sf_dir, KNN_MOD, KNN_K)
    got = knn_topk_gemm_exact(a, b, KNN_K)
    d = {(r["src"], r["rn"]): (r["dst"], r["cos"]) for r in declared.collect()}
    g = {(r["src"], r["rn"]): (r["dst"], r["cos"]) for r in got.collect()}
    assert d == g  # same neighbours, same ranks, bit-identical cosines


@pytest.mark.slow
def test_gemm_exact_equals_declared_all_pairs_sf01(spark):
    from spark_clustering_spark.pipeline.similarity import (
        KNN_K,
        KNN_MOD,
        knn_topk_gemm_exact,
    )

    a, b, declared = _declared_topk(spark, "/root/testdata/sf0.1", KNN_MOD, KNN_K)
    got = knn_topk_gemm_exact(a, b, KNN_K)
    d = {(r["src"], r["rn"]): (r["dst"], r["cos"]) for r in declared.collect()}
    g = {(r["src"], r["rn"]): (r["dst"], r["cos"]) for r in got.collect()}
    assert d == g
