"""Full spherical-GMM EM fit (fixed sigma², free means + mixture
weights) — the iterative driver loop behind the declared
q_ml_gmm_estep / q_ml_gmm_mstep / q_ml_gmm_loglik single-step
surfaces, structured like fit_kmeans (reference kmeans.java:58-201
generalized to soft assignment):

- data stays partitioned and cached; only k·d weighted sums, k
  responsibility masses, and one log-likelihood scalar cross the
  driver per iteration (the R19 inversion — never the points);
- every order-ambiguous sum accumulates in exact DECIMAL, so a fit is
  bit-reproducible under any partitioning;
- EM guarantee kept testable: the per-iteration observed-data
  log-likelihood (computed on the CURRENT parameters, before the
  update) is non-decreasing (tests/test_round5c_ops.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_clustering_spark.functions.distance import euclidean


@dataclass
class GMMResult:
    means: list          # k rows of d floats
    weights: list        # k mixture weights
    logliks: list        # per-iteration observed-data loglik (pre-update)
    metrics: DataFrame   # (iteration, loglik, avg_loglik)


def _ctr_df(spark: SparkSession, means: list, weights: list) -> DataFrame:
    rows = [
        (int(cid), [float(x) for x in mu], float(w))
        for cid, (mu, w) in enumerate(zip(means, weights))
    ]
    return spark.createDataFrame(
        rows, "cid int, cvec array<double>, w double"
    )


def fit_gmm(
    spark: SparkSession,
    points: DataFrame,
    k: int = 8,
    num_iter: int = 3,
    sigma2: float = 4.0,
    seed: int = 42,
) -> GMMResult:
    """EM for a spherical equal-variance GMM over (vec_id, vec) points.

    Init: means = the k lowest-vec_id points (the deterministic init
    shared with centroids_df / FIXTURES.md §3), weights uniform.
    Each iteration runs TWO narrow passes over the cached points:
    one for the loglik of the current parameters, one producing the
    (cid, pos) weighted-sum partials the driver folds into new means
    and weights. Both shuffles carry k·d-bounded aggregate state.
    """
    if k < 1 or num_iter < 1:
        raise ValueError("k and num_iter must be >= 1")
    points = points.persist()
    n_pts = points.count()
    init = points.orderBy("vec_id").limit(k).collect()
    means = [list(r.vec) for r in init]
    weights = [1.0 / k] * k

    logliks: list[float] = []
    hist = []
    for it in range(num_iter):
        ctr = _ctr_df(spark, means, weights)
        lik = points.crossJoin(F.broadcast(ctr)).select(
            "vec_id",
            "cid",
            "vec",
            (
                F.col("w")
                * F.exp(
                    -F.pow(euclidean(F.col("vec"), F.col("cvec")), F.lit(2))
                    / F.lit(2.0 * sigma2)
                )
            ).alias("l"),
        )
        # lik feeds the loglik denominator AND the E-step join; without
        # the persist each consumer re-runs the n·k likelihood
        # cross-join, recompiling the d-wide distance codegen each time.
        # The cache is n·k rows of (ids, vec, l) — spillable
        # (MEMORY_AND_DISK default), dropped before the next iteration;
        # at extreme scale a caller can trade the cache for recompute by
        # unpersisting, the semantics don't change.
        lik = lik.persist()
        den = lik.groupBy("vec_id").agg(
            F.sum(F.col("l").cast("decimal(38,18)")).cast("double").alias("z")
        )
        ll = den.agg(
            F.sum(F.log("z").cast("decimal(38,8)")).cast("double").alias("ll")
        ).collect()[0]["ll"]
        logliks.append(float(ll))
        hist.append((it, float(ll), float(ll) / n_pts))

        # M-step sums: k·d rows of (cid, pos, wx, rsum) cross the driver.
        # (An in-row d+1-buffer aggregate was measured SLOWER here —
        # d=64 decimal aggregation states blow up codegen; the exploded
        # shuffle is n·k·d rows but map-side combined to k·d.)
        resp = lik.join(den, "vec_id").select(
            "cid", "vec", (F.col("l") / F.col("z")).alias("r")
        )
        dims = resp.select("cid", "r", F.posexplode("vec").alias("pos", "x"))
        agg = (
            dims.groupBy("cid", "pos")
            .agg(
                F.sum((F.col("r") * F.col("x")).cast("decimal(38,12)")).alias("wx"),
                F.sum(F.col("r").cast("decimal(38,12)")).alias("rsum"),
            )
            .collect()
        )
        lik.unpersist()
        d = len(means[0])
        new_means = [[0.0] * d for _ in range(k)]
        rmass = [0.0] * k
        for row in agg:
            if row.pos == 0:
                rmass[row.cid] = float(row.rsum)
            new_means[row.cid][row.pos] = float(row.wx) / float(row.rsum)
        means = new_means
        weights = [m / n_pts for m in rmass]

    metrics = spark.createDataFrame(
        hist, "iteration int, loglik double, avg_loglik double"
    )
    return GMMResult(means=means, weights=weights, logliks=logliks, metrics=metrics)
