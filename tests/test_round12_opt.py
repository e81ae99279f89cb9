"""Round-12 optimization invariants.

Round-12 changes must be plan-only: the scale-adaptive small-path edge
partitioning, the packed-key id guard, and the trained-quantizer cache
eviction may change HOW results are computed, never WHAT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_wedge_spread_widens_probe_to_cluster_parallelism(spark):
    """The wedge queries' small paths spread their probe stream across
    the cluster (VERDICT r11 item 1: the fused map-side wedge build ran
    on the shared checkpoint's 4-10 partitions) WITHOUT touching the
    shared edge checkpoint layout (widening it regressed cheap
    consumers: kcore 3.0->4.7 s). The helper must hit exactly
    defaultParallelism, and the small-path plan must carry its
    round-robin exchange."""
    from spark_clustering_spark.operators import graph

    par = spark.sparkContext.defaultParallelism
    df = spark.range(100).select(F.col("id").alias("u"))
    assert graph._wedge_spread(df).rdd.getNumPartitions() == par

    plan = (
        graph.q_graph_jaccard_linkpred(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "roundrobin" in plan.lower()


def test_packed_key_guard_routes_large_ids_to_shuffle_path(spark):
    """The broadcast small path packs (u,v) into one BIGINT, lossless
    only for ids in [0, 2^31). ADVICE r11: the gate must enforce that
    bound. An edge set whose ids exceed it must (a) fail the gate and
    (b) still return rows identical to the same graph at small ids,
    shifted — proving the fallback path computes the same thing."""
    from spark_clustering_spark.operators import graph

    shift = 1 << 31
    base_edges = [(i, j) for i in range(1, 12) for j in range(i + 1, 13)
                  if (i * 7 + j) % 3 != 0]

    def _mk(offset):
        df = (
            spark.createDataFrame(
                [(u + offset, v + offset) for u, v in base_edges],
                "u bigint, v bigint",
            )
            .localCheckpoint(eager=False)
        )
        return df

    small_e = _mk(0)
    big_e = _mk(shift)
    assert graph._bcast_path_ok(small_e)
    assert not graph._bcast_path_ok(big_e)

    orig = graph.basket_edges
    try:
        graph.basket_edges = lambda s, d, cap=None: small_e
        r_small = _rows(graph.q_graph_jaccard_linkpred(spark, SF_SMALL))
        aa_small = _rows(graph.q_graph_adamic_adar(spark, SF_SMALL))
        graph.basket_edges = lambda s, d, cap=None: big_e
        r_big = _rows(graph.q_graph_jaccard_linkpred(spark, SF_SMALL))
        aa_big = _rows(graph.q_graph_adamic_adar(spark, SF_SMALL))
    finally:
        graph.basket_edges = orig

    assert len(r_small) > 0 and len(aa_small) > 0
    # same graph, ids shifted: every (u, v, ...) row must match 1:1
    assert r_big == [(u + shift, v + shift, *rest) for u, v, *rest in r_small]
    assert aa_big == [
        (u + shift, v + shift, *rest) for u, v, *rest in aa_small
    ]


def test_train_cache_evicts_other_scopes(spark):
    """_TRAIN_CACHE must not grow without bound across sf_dirs
    (ADVICE r11): inserting an artifact for a new (app, sf_dir) scope
    evicts pinned artifacts of other scopes."""
    from spark_clustering_spark.pipeline import similarity as s

    app = spark.sparkContext.applicationId
    marker_df = spark.range(1)
    s._TRAIN_CACHE.clear()
    s._train_cache_put((app, "/fake/sf_a", "ivf"), marker_df)
    s._train_cache_put((app, "/fake/sf_a", "pq"), marker_df)
    assert len(s._TRAIN_CACHE) == 2
    s._train_cache_put((app, "/fake/sf_b", "ivf"), marker_df)
    assert set(s._TRAIN_CACHE) == {(app, "/fake/sf_b", "ivf")}
    s._TRAIN_CACHE.clear()


def test_ivfpq_residual_codebook_cache_is_result_identical(spark):
    """The residual-PQ codebook is trained once per (app, sf_dir) and
    served from _TRAIN_CACHE on re-execution (round-12: the same
    sharing discipline as table_ivf_train). Cached-serve and
    fresh-train runs must return byte-identical rows."""
    from spark_clustering_spark.pipeline import similarity as s

    s._TRAIN_CACHE.clear()
    fresh = _rows(s.q_sim_ivfpq_topk(spark, SF_SMALL))
    app = spark.sparkContext.applicationId
    assert (app, SF_SMALL, "pq_resid") in s._TRAIN_CACHE
    cached = _rows(s.q_sim_ivfpq_topk(spark, SF_SMALL))
    assert fresh == cached and len(fresh) > 0
    s._TRAIN_CACHE.clear()
