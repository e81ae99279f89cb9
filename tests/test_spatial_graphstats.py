"""Round-5b operators: spatial grid join + degree distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_spatial_grid_matches_brute_force(spark):
    """The grid join is a lossless candidate filter: its output must be
    IDENTICAL to the n² cross join at tiny SF."""
    from spark_clustering_spark.operators.spatial import (
        RADIUS,
        q_join_spatial_grid,
    )
    from spark_clustering_spark.io import table

    got = q_join_spatial_grid(spark, SF_SMALL)
    p = table(spark, SF_SMALL, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    a = p.select(
        F.col("vec_id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = p.select(
        F.col("vec_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(d2 <= RADIUS * RADIUS)
        .select("id_a", "id_b")
    )
    got_pairs = {(r.id_a, r.id_b) for r in got.select("id_a", "id_b").collect()}
    brute_pairs = {(r.id_a, r.id_b) for r in brute.collect()}
    assert got_pairs == brute_pairs
    assert len(got_pairs) > 0
    rows = got.collect()
    assert all(r.id_a < r.id_b for r in rows)
    assert all(0.0 <= r.dist <= RADIUS for r in rows)


def test_degree_stats_invariants(spark):
    from spark_clustering_spark.operators.graph import q_graph_degree_stats
    from spark_clustering_spark.io import table

    rows = q_graph_degree_stats(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.min_deg <= r.avg_deg <= r.max_deg
        assert len(str(r.min_deg)) == r.bucket == len(str(r.max_deg))
        assert r.n_nodes >= 1
    # per-side node totals must equal the distinct node counts of the
    # bipartite edge set
    li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    e = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_custkey", "l_partkey"
    )
    n_cust = e.select("o_custkey").distinct().count()
    n_part = e.select("l_partkey").distinct().count()
    got = {
        side: sum(r.n_nodes for r in rows if r.side == side)
        for side in ("customer", "part")
    }
    assert got == {"customer": n_cust, "part": n_part}


def test_assortativity_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.graph import q_graph_assortativity

    row = q_graph_assortativity(spark, SF_SMALL).collect()
    assert len(row) == 1
    got = row[0]
    li = (
        table(spark, SF_SMALL, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = li.select("o", F.col("p").alias("u"))
    b = li.select("o", F.col("p").alias("v"))
    edges = [
        (r.u, r.v)
        for r in a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .collect()
    ]
    assert got.n_edges == len(edges)
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs = [deg[u] for u, v in edges] + [deg[v] for u, v in edges]
    ys = [deg[v] for u, v in edges] + [deg[u] for u, v in edges]
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(got.assortativity - want) < 1e-4
    assert -1.0 <= got.assortativity <= 1.0
