"""Spatial analytics — grid-bucketed radius joins over point data.

The reference's datasets are literally 2-D point clouds (its Finland
benchmark, ``User-locations-Finland_N13467-D2.txt``, is lat/lon pairs
fed to kmeans.java), so a radius self-join ("every pair of points
within distance r") is the natural spatial companion to the clustering
surface: it is the candidate-generation step for DBSCAN-style density
clustering, geo dedup, and point-of-interest conflation.

The naive formulation is an n² cross join — the same all-pairs trap as
embedding dedup. The scalable shape is the classic uniform-grid
partitioner: hash each point to a cell of side r; every pair within
distance r must then lie in the same or an 8-neighbouring cell, so
expanding ONE side to its 3×3 cell neighbourhood and equi-joining on
the cell key turns the cross join into a hash join whose fan-in is
bounded by local point density. This is exactly how Sedona/Magellan
shape their distance joins — expressed here with nothing but built-in
DataFrame ops, so Catalyst runs it as a plain shuffled hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_clustering_spark.functions.detagg import dround, sql_dround
from spark_clustering_spark.io import table
from spark_clustering_spark.registry import query

RADIUS = 0.05  # cell side == join radius: neighbours span ≤ 3×3 cells


@query(
    "q_join_spatial_grid",
    oracle=f"""
    WITH p AS (
      SELECT vec_id,
             cast(embedding[1] AS DOUBLE) AS x,
             cast(embedding[2] AS DOUBLE) AS y
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {sql_dround("sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y))", 6)}
             AS dist
    FROM p a JOIN p b ON a.vec_id < b.vec_id
    WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
          <= {RADIUS} * {RADIUS}
    """,
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within euclidean distance {RADIUS}, via the
    uniform-grid partitioner (cell side = r, 3×3 neighbourhood probe).

    Semantics: project each embedding to its first two dimensions (the
    2-D point-cloud case the reference's Finland dataset exercises) and
    emit every unordered pair (id_a < id_b) with distance ≤ r, plus the
    distance itself.

    Exactness: a pair at distance ≤ r differs by ≤ r per axis, so b's
    cell is one of the 9 cells centred on a's — the grid join is a
    lossless candidate filter, and the output is IDENTICAL to the n²
    cross join the oracle runs (no approximation to tune).

    Determinism: cell ids use floor(x/r) — double division and floor
    are bit-identical cross-engine; the distance filter and emitted
    sqrt are single IEEE expressions evaluated in the same order both
    sides, and the emitted value goes through dround.

    Scale: the probe side replicates 9×, but both sides then meet in a
    plain equi hash join keyed on (gx, gy) — shuffle volume is 10× the
    POINT table (tiny rows: id + 2 doubles), never pairs², and per-task
    work is bounded by the densest cell (≈ density·r² points). At
    100 TB: salt mega-cells (urban cores) by splitting them into
    sub-cells on a second key, and pre-partition both sides by cell so
    repeated radius queries reuse the layout. Each candidate pair is
    generated exactly once (the probe expansion matches b's one true
    cell), so no distinct() pass is needed — the plan stays
    scan→exchange→join→filter with zero wide dedup."""
    r = float(RADIUS)
    p = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    cells = p.select(
        "vec_id", "x", "y",
        F.floor(F.col("x") / r).alias("gx"),
        F.floor(F.col("y") / r).alias("gy"),
    )
    # Probe side: each point visits its 3×3 cell neighbourhood; the
    # build side keeps its one true cell, so every qualifying pair
    # meets exactly once.
    offs = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    probe = (
        cells.select(
            F.col("vec_id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            F.explode(offs).alias("dx"),
            F.col("gx"),
            F.col("gy"),
        )
        .select(
            "id_a", "xa", "ya",
            (F.col("gx") + F.col("dx")).alias("gx"),
            F.explode(offs).alias("dy"),
            F.col("gy"),
        )
        .select(
            "id_a", "xa", "ya", "gx", (F.col("gy") + F.col("dy")).alias("gy")
        )
    )
    build = cells.select(
        F.col("vec_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "gx",
        "gy",
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(build, ["gx", "gy"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(r * r)))
        .select("id_a", "id_b", dround(F.sqrt(d2), 6).alias("dist"))
    )
