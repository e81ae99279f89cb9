"""Deduplication operators for large-scale training-data pipelines.

Five dedup families, all shuffle-disciplined for 100 TB:

- exact: one hash-groupBy on md5(text) — the shuffle key is the digest,
  so payload text never shuffles (project the hash first).
- MinHash-LSH: shingle → minhash signature → band buckets → candidate
  pairs via a groupBy on (band, band_hash). Only signatures (fixed
  ~H*8 bytes/doc) shuffle; the O(n²) pair explosion is confined inside
  buckets.
- SimHash: 64-bit fingerprint from token hashes; near-dup candidates by
  matching any of 4 16-bit chunks (hamming ≤ 3 guaranteed recall when
  differing bits spread across ≥1 intact chunk).
- n-gram Jaccard: exact pairwise verification on a bounded candidate
  slice (SQL-oracle-checkable).
- embedding cosine: near-dup pairs above a cosine threshold.

MinHash permutations use fixed LCG coefficient tables (seeded) — no
unseeded randomness anywhere (SURVEY.md Q5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_clustering_spark.functions.detagg import dround
from spark_clustering_spark.functions.porthash import md5_int32, sql_hex_int
from spark_clustering_spark.io import table
from spark_clustering_spark.registry import query

# 16 minhash permutations in 4 bands of 4 rows; coefficients from a
# fixed seeded LCG stream (public-recipe universal hashing: (a*x+b) % p).
_P = 4_294_967_311  # smallest prime > 2^32
_NUM_HASHES = 16
_BAND_ROWS = 4


def _coeffs(seed: int = 42) -> list[tuple[int, int]]:
    # a is capped at 2^30 so a*h stays < 2^62 — no bigint overflow under
    # Spark's ANSI arithmetic.
    out, state = [], seed
    for _ in range(_NUM_HASHES):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = state % (2**30 - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % _P
        out.append((a, b))
    return out


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    Docs with fewer than ``n`` tokens emit no shingles (matching the SQL
    oracle, which generates an empty gram list for them — without the
    guard the sequence() lower bound would emit one partial shingle).

    The input is ``spread()`` first: shingling amplifies each document
    ~token-count-fold before the first shuffle, so its parallelism is
    pinned by the scan's split count, not its cost — a compacted input
    would otherwise run the whole explode on a handful of cores."""
    from spark_clustering_spark.io import spread

    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        spread(df, "doc_id")
        .filter(F.size(toks) >= n)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, sig array<bigint>[16]) — min over md5_int32(shingle)
    under each of the 16 affine permutations. The base hash is computed
    ONCE per shingle (projected before the aggregation — Catalyst does
    not CSE duplicated expressions across aggregate functions); each
    permutation is then two integer ops. One groupBy(doc_id) shuffle of
    (doc_id, 16×8B) — shingle strings never shuffle. The md5-derived
    base hash is DuckDB-reproducible (functions/porthash.py) so the
    whole LSH pipeline is oracle-checkable; swap in xxhash64 for
    cheaper hashing when cross-engine verification isn't needed."""
    hashed = sh.select("doc_id", md5_int32(F.col("shingle")).alias("h"))
    mins = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_P))).alias(f"h{i}")
        for i, (a, b) in enumerate(_coeffs())
    ]
    sig = hashed.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"h{i}" for i in range(_NUM_HASHES)]).alias("sig")
    )


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Banding: docs sharing any band of 4 consecutive minhashes become
    candidate pairs. Returns (doc_a, doc_b, n_bands) with doc_a < doc_b.

    The signature table is materialized (localCheckpoint) before the
    self-join — without it both join sides would recompute the whole
    shingle→hash→min pipeline (signatures are 16 longs/doc, so the
    blocks are tiny). localCheckpoint rather than persist(): checkpoint
    blocks are released by the ContextCleaner when the DF is GC'd, so a
    long session running many queries doesn't accumulate cached blocks."""
    sig = sig.localCheckpoint(eager=True)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", bi * _BAND_ROWS + r + 1).cast("string")
                                for r in range(_BAND_ROWS)
                            ],
                        ).alias("key"),
                    )
                    for bi in range(_NUM_HASHES // _BAND_ROWS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def _sql_minhash_ctes() -> str:
    """DuckDB CTE chain ``docs → grams → hx → hh → sig → bands → pairs``
    mirroring shingles() → minhash_signatures() → lsh_candidate_pairs()
    byte-for-byte: same 3-gram construction as the q_dedup_ngram_jaccard
    oracle, md5-derived base hash (porthash), identical LCG permutation
    coefficients inlined as integer literals."""
    mins = ",\n             ".join(
        f"min((h * {a} + {b}) % {_P}) AS h{i}" for i, (a, b) in enumerate(_coeffs())
    )
    bands = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {bi} AS band, "
        f"concat_ws(',', h{4 * bi}, h{4 * bi + 1}, h{4 * bi + 2}, h{4 * bi + 3}) AS key "
        f"FROM sig"
        for bi in range(_NUM_HASHES // _BAND_ROWS)
    )
    return f"""
    docs AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                   for i in range(1, greatest(len(ws) - 1, 1))])) AS shingle
      FROM docs WHERE len(ws) >= 3
    ),
    hx AS (SELECT doc_id, md5(shingle) AS hs FROM grams WHERE len(shingle) > 0),
    hh AS (SELECT doc_id, {sql_hex_int('hs')} AS h FROM hx),
    sig AS (
      SELECT doc_id,
             {mins}
      FROM hh GROUP BY doc_id
    ),
    bands AS (
      {bands}
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )"""


def _sql_simhash() -> str:
    """DuckDB twin of q_dedup_simhash: 64 per-bit ±1 sums from the two
    md5 32-bit halves, fingerprint with the sign-bit handled in BIGINT
    two's complement, chunk keys re-summed from the bit columns."""

    def bit(i: int) -> str:
        col, sh = ("lo", i) if i < 32 else ("hi", i - 32)
        return f"sum(CASE WHEN ({col} >> {sh}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"

    bits = ",\n             ".join(bit(i) for i in range(64))
    fp_terms = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(63)
    )
    fp = f"CAST({fp_terms} + (CASE WHEN b63 > 0 THEN -9223372036854775807 - 1 ELSE 0 END) AS BIGINT)"
    chunks = ",\n           ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN b{16 * c + j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16)
        )
        + f" AS BIGINT) AS chunk{c}"
        for c in range(4)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    hx AS (SELECT doc_id, md5(tok) AS hs FROM toks WHERE len(tok) > 0),
    th AS (
      SELECT doc_id, {sql_hex_int('hs')} AS lo, {sql_hex_int('hs', 9, 8)} AS hi
      FROM hx
    ),
    bs AS (
      SELECT doc_id,
             {bits}
      FROM th GROUP BY doc_id
    )
    SELECT doc_id,
           {fp} AS simhash,
           {chunks}
    FROM bs
    """


@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content digest, keep the lowest doc_id.
    Only (digest, doc_id) shuffles — never the text payload."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.col("text").cast("binary")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "q_dedup_minhash",
    oracle="WITH " + _sql_minhash_ctes() + "\n    SELECT doc_a, doc_b, n_bands FROM pairs",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates (16 hashes, 4 bands × 4 rows)
    over word 3-gram shingles. Deterministic: fixed coefficient table,
    md5-derived base hash — the full shingle→signature→band→pair
    pipeline is reproduced in the DuckDB oracle (hash-verified, not
    rows-only). Invariants additionally tested in tests/test_pipeline.py."""
    d = table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(minhash_signatures(shingles(d)))


@query("q_dedup_simhash", oracle=_sql_simhash())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc: bit i of the fingerprint is the sign of
    sum(±1 over tokens' bit i). Token bits come from the two md5 32-bit
    halves (functions/porthash.py) so the DuckDB oracle reproduces the
    fingerprint exactly. Emitted with the 4 16-bit chunk keys used for
    banded near-dup search (chunks re-summed from the bit-sign columns —
    identical to slicing the fingerprint, but avoids engine-specific
    unsigned-shift semantics)."""
    from spark_clustering_spark.io import spread

    d = table(spark, sf_dir, "documents")
    # spread before the explode: 2 md5s/token + 64 conditional partial
    # sums make this the most compute-amplified map in the repo — its
    # parallelism must not be pinned to the scan's split count
    toks = spread(d.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    th = toks.select(
        "doc_id",
        md5_int32(F.col("tok")).alias("lo"),
        md5_int32(F.col("tok"), hi=True).alias("hi"),
    )
    bit_sums = th.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.col("lo" if i < 32 else "hi").bitwiseAND(
                        F.lit(1 << (i if i < 32 else i - 32))
                    )
                    != 0,
                    1,
                ).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    # bit 63 is the sign bit: add -2^63 (two's complement) instead of 2^63,
    # which would overflow bigint under ANSI arithmetic.
    fp = sum(
        [
            F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(63)
        ],
        F.when(F.col("b63") > 0, F.lit(-(2**63))).otherwise(F.lit(0)).cast("bigint"),
    )
    chunks = [
        sum(
            [
                F.when(F.col(f"b{16 * c + j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
                for j in range(1, 16)
            ],
            F.when(F.col(f"b{16 * c}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint"),
        ).alias(f"chunk{c}")
        for c in range(4)
    ]
    return bit_sums.select("doc_id", fp.alias("simhash"), *chunks)


def connected_components(
    pairs: DataFrame, max_iter: int = 15, small_graph_threshold: int = 100_000
) -> DataFrame:
    """Min-label propagation over an undirected pair graph:
    every node ends up labeled with the smallest doc_id reachable from
    it — the canonical representative of its near-dup cluster.

    Hybrid execution: candidate-pair graphs are usually tiny relative
    to the corpus (LSH already pruned), so below
    ``small_graph_threshold`` pairs the exact union-find runs on the
    driver — identical result, none of the per-round job overhead.
    Larger graphs use iterative min-label joins (O(diameter) rounds,
    one shuffle each, lineage cut per round); near-dup clusters are
    near-cliques so this converges in 2-3 rounds. ``pairs``:
    (doc_a, doc_b). Returns (doc_id, component) for every node
    appearing in any pair."""
    spark = pairs.sparkSession
    # one pass decides the path AND feeds the small-graph solver: the
    # limited collect IS the size probe (a separate count() would
    # recompute the candidate-pair pipeline twice)
    sample = pairs.select("doc_a", "doc_b").limit(small_graph_threshold + 1).collect()
    if len(sample) <= small_graph_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in sample:
            a, b = int(r["doc_a"]), int(r["doc_b"])
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        rows = [(n, find(n)) for n in sorted(parent)]
        return spark.createDataFrame(rows, "doc_id BIGINT, component BIGINT")

    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("doc_id")).distinct().withColumn(
        "component", F.col("doc_id")
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("component").alias("n_comp")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("n_comp").alias("neighbor_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    "component", F.coalesce("neighbor_comp", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if not changed:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # Component chains with diameter > max_iter would silently come
        # back split; make that loud instead.
        import warnings

        warnings.warn(
            f"connected_components: min-label propagation did not reach a "
            f"fixpoint within max_iter={max_iter}; labels may be split",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


@query(
    "q_dedup_clusters",
    oracle="WITH RECURSIVE "
    + _sql_minhash_ctes()
    + """,
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION
      SELECT doc_b AS s, doc_a AS d FROM pairs
    ),
    reach(doc_id, comp) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.s, r.comp FROM edges e JOIN reach r ON e.d = r.doc_id
    )
    SELECT doc_id, min(comp) AS component FROM reach GROUP BY doc_id
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH candidate pairs → connected
    components → (doc_id, component-representative). Downstream dedup
    keeps rows where doc_id == component. Spark runs hybrid union-find /
    min-label propagation; the oracle computes the same min-reachable
    label as a DuckDB recursive CTE over the symmetric edge closure —
    so even this iterative fixpoint is hash-verified, not rows-only.
    Invariants (exact-duplicate clustering, idempotence) in
    tests/test_pipeline.py."""
    d = table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(shingles(d)))
    return connected_components(pairs.select("doc_a", "doc_b"))


@query(
    "q_dedup_ngram_jaccard",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws
      FROM documents WHERE doc_id < 200
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                   for i in range(1, greatest(len(ws) - 1, 1))])) AS shingle
      FROM docs
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           cast(round(cast(cast((cast(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter)) AS VARCHAR) AS DECIMAL(38,12)), 4) AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE cast(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.01
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity on a bounded doc slice — the
    verification stage behind MinHash candidates (integer set math, so
    fully SQL-oracle-checkable). Slice/threshold chosen so the check
    produces a few hundred pairs at the driver's sf0.01 gate scale
    (doc_id < 60 @ 0.1 matched zero rows there — a vacuous pass)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    g = shingles(d)
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = g.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = g.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, ["shingle"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_inter").cast("double") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.01)
        .select("doc_a", "doc_b", dround(jac).alias("jaccard"))
    )


def embedding_near_dup_pairs(
    e: DataFrame, threshold: float = 0.99, n_blocks: int = 8
) -> DataFrame:
    """Exact all-pairs cosine ≥ ``threshold`` via blocked GEMM.

    Both sides are hash-partitioned into ``n_blocks`` row blocks
    (``vec_id % n_blocks``); each of the B·(B+1)/2 unordered block pairs
    is cogrouped into one Arrow task that multiplies the two normalized
    blocks (BLAS dgemm) and emits only pairs above threshold. Nothing is
    collected on the driver and no full-table broadcast exists: shuffle
    volume is n·B rows per side and each task holds two n/B-row blocks —
    pick n_blocks so a block fits executor memory at the target SF. The
    per-pair dot product is the same float64 BLAS reduction regardless
    of blocking, so results are bit-identical to a dense matmul.

    ``e``: (vec_id bigint, vec array<double>). Returns
    (a_id, b_id, cos_raw) with a_id < b_id, cos_raw unrounded.
    """
    import numpy as np
    import pandas as pd

    spark = e.sparkSession
    meta = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "ba INT, bb INT",
    )
    def replicate(side: str, key: str) -> DataFrame:
        # alias both inputs so the two derivations of the same e/meta
        # DataFrames don't trip the ambiguous-self-join analyzer check
        ee, mm = e.alias(f"e_{side}"), meta.alias(f"m_{side}")
        blk = F.pmod(F.col(f"e_{side}.vec_id"), F.lit(n_blocks)).cast("int")
        return ee.join(F.broadcast(mm), blk == F.col(f"m_{side}.{key}")).select(
            F.col(f"m_{side}.ba").alias("ba"),
            F.col(f"m_{side}.bb").alias("bb"),
            F.col(f"e_{side}.vec_id").alias("vec_id"),
            F.col(f"e_{side}.vec").alias("vec"),
        )

    left = replicate("l", "ba")
    right = replicate("r", "bb")

    def gemm(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a_id": [], "b_id": [], "cos_raw": []})
        if not len(l) or not len(r):
            return empty
        ids_a = l["vec_id"].to_numpy(dtype=np.int64)
        ids_b = r["vec_id"].to_numpy(dtype=np.int64)
        A = np.array(list(l["vec"]), dtype=np.float64)
        B = np.array(list(r["vec"]), dtype=np.float64)
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        S = A @ B.T  # BLAS block matmul
        # each unordered block pair is processed exactly once, so emit
        # each vector pair canonically as (min, max); within a diagonal
        # block the `<` mask alone prevents the mirrored duplicate
        mask = (S >= threshold) & (ids_a[:, None] != ids_b[None, :])
        if int(l["ba"].iat[0]) == int(l["bb"].iat[0]):
            mask &= ids_a[:, None] < ids_b[None, :]
        ai, bi = np.nonzero(mask)
        xa, xb = ids_a[ai], ids_b[bi]
        return pd.DataFrame(
            {
                "a_id": np.minimum(xa, xb),
                "b_id": np.maximum(xa, xb),
                "cos_raw": S[ai, bi],
            }
        )

    return (
        left.groupby("ba", "bb")
        .cogroup(right.groupby("ba", "bb"))
        .applyInPandas(gemm, "a_id bigint, b_id bigint, cos_raw double")
    )


@query(
    "q_dedup_embedding",
    oracle="""
    WITH ve AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           cast(round(cast(cast((list_cosine_similarity(a.vec, b.vec)) AS VARCHAR) AS DECIMAL(38,12)), 4) AS DOUBLE) AS cos
    FROM ve a JOIN ve b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.vec, b.vec) >= 0.45
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Production near-dup uses a ~0.9+ threshold; the synthetic
    embeddings are i.i.d. random (max pairwise cos ≈ 0.51), so the
    declared query uses 0.45 — 14 pairs at sf0.01, a few hundred at
    sf0.1, with a ≥1e-4 gap around the cut so the float filter can't
    flap between engines — to keep the oracle check non-vacuous.

    Dense all-pairs cosine is a matrix multiply — the one place where
    Spark's array HOFs (interpreted, not codegen'd) lose badly to an
    Arrow-batched Pandas path. The engine path is
    ``embedding_near_dup_pairs``: blocked cogroup GEMM with no driver
    collect and no full-table broadcast, so the same plan survives a
    100 TB table (n_blocks scales the per-task block size). For even
    larger n where exact all-pairs is off the table, LSH bucketing
    (pipeline/similarity.py::cosine_lsh_buckets) bounds the candidate
    set and the same GEMM kernel runs per bucket."""
    from spark_clustering_spark.functions.distance import as_double_array

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("vec")
    )
    pairs = embedding_near_dup_pairs(e, threshold=0.45, n_blocks=8)
    return pairs.select("a_id", "b_id", dround("cos_raw").alias("cos"))
