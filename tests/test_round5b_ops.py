"""Round-5b operators: CUSUM changepoint, ES weighted sampling,
token-budget corpus selection."""

from __future__ import annotations

import math

from tests.conftest import SF_SMALL


def test_changepoint_matches_recursive_definition(spark):
    """The prefix-sum closed form must equal the textbook recursion
    S_t = max(0, S_{t-1} + y_t) replayed sequentially."""
    from spark_clustering_spark.operators.timeseries import (
        CUSUM_H,
        CUSUM_K,
        q_ts_changepoint,
    )

    rows = sorted(
        q_ts_changepoint(spark, SF_SMALL).collect(), key=lambda r: r.day
    )
    assert len(rows) >= 25
    sp = sn = 0.0
    for r in rows:
        sp = max(0.0, sp + r.zscore - CUSUM_K)
        sn = max(0.0, sn - r.zscore - CUSUM_K)
        assert abs(r.s_pos - sp) < 1e-6, r
        assert abs(r.s_neg - sn) < 1e-6, r
        assert r.is_change == (r.s_pos > CUSUM_H or r.s_neg > CUSUM_H)
    # the standardized series must be roughly centered
    zs = [r.zscore for r in rows]
    assert abs(sum(zs) / len(zs)) < 0.2


def test_weighted_sample_is_exact_topk(spark):
    from spark_clustering_spark.pipeline.sampling import (
        ES_K,
        ES_SEED,
        _ES_A,
        _ES_C,
        _ES_M,
        q_sample_weighted,
    )
    from spark_clustering_spark.io import table

    got = q_sample_weighted(spark, SF_SMALL).collect()
    assert len(got) == ES_K
    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    keys = []
    for d in docs:
        if d.n_chars <= 0:
            continue
        u = ((d.doc_id * _ES_A + _ES_C + ES_SEED) % _ES_M + 0.5) / float(
            _ES_M
        )
        keys.append((-math.log(u) / d.n_chars, d.doc_id))
    expect = {doc for _, doc in sorted(keys)[:ES_K]}
    assert {r.doc_id for r in got} == expect
    assert all(r.ekey >= 0 for r in got)


def test_token_budget_greedy_maximal(spark):
    from spark_clustering_spark.pipeline.sampling import (
        TOKEN_BUDGET,
        q_pipeline_token_budget,
    )

    rows = sorted(
        q_pipeline_token_budget(spark, SF_SMALL).collect(),
        key=lambda r: r.cum_tokens,
    )
    assert rows
    # running sums are internally consistent and within budget
    acc = 0
    for r in rows:
        acc += r.n_tokens
        assert r.cum_tokens == acc
        assert r.cum_tokens <= TOKEN_BUDGET
    # quality is non-increasing along the selection order
    quals = [r.quality for r in rows]
    assert all(a >= b for a, b in zip(quals, quals[1:]))
    # greedy maximality: the selection stopped because the budget is
    # nearly exhausted (no average-sized doc would still fit)
    avg = acc / len(rows)
    assert TOKEN_BUDGET - acc < 3 * avg


def test_blocked_editdist_matches_brute_force(spark):
    """Length-grid blocking must be lossless for the threshold."""
    from spark_clustering_spark.pipeline.dedup import (
        EDITDIST_MAX,
        q_dedup_blocked_editdist,
    )
    from spark_clustering_spark.io import table
    from pyspark.sql import functions as F

    got = q_dedup_blocked_editdist(spark, SF_SMALL)
    names = (
        table(spark, SF_SMALL, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = names.select(F.col("p_name").alias("na"), F.col("n").alias("ca"))
    b = names.select(F.col("p_name").alias("nb"), F.col("n").alias("cb"))
    brute = (
        a.join(b, F.col("na") < F.col("nb"))
        .filter(F.levenshtein("na", "nb") <= EDITDIST_MAX)
        .collect()
    )
    got_rows = got.collect()
    assert {(r.name_a, r.name_b) for r in got_rows} == {
        (r.na, r.nb) for r in brute
    }
    assert len(got_rows) > 0
    counts = dict(names.collect())
    for r in got_rows:
        assert 1 <= r.dist <= EDITDIST_MAX
        assert r.n_a == counts[r.name_a] and r.n_b == counts[r.name_b]


def test_zipf_slope_and_totals(spark):
    from spark_clustering_spark.pipeline.textstats import q_text_zipf
    from spark_clustering_spark.io import table
    from pyspark.sql import functions as F

    row = q_text_zipf(spark, SF_SMALL).collect()
    assert len(row) == 1
    r = row[0]
    d = table(spark, SF_SMALL, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
        ).alias("tok")
    )
    assert r.n_tokens == toks.count()
    assert r.n_terms == toks.distinct().count()
    top = (
        toks.groupBy("tok")
        .count()
        .orderBy(F.col("count").desc(), "tok")
        .first()
    )
    assert (r.top_term, r.top_count) == (top.tok, top["count"])
    # frequency is non-increasing in rank, so the fitted slope is < 0
    assert r.zipf_slope < 0


def test_referential_audit_all_edges_ok(spark):
    from spark_clustering_spark.operators.aggregates import (
        _FK_EDGES,
        q_dq_referential,
    )

    rows = q_dq_referential(spark, SF_SMALL).collect()
    assert len(rows) == len(_FK_EDGES)
    # the synthetic star schema is referentially intact
    for r in rows:
        assert r.ref_ok == 1 and r.n_orphans == 0
        assert r.n_child > 0


def test_referential_audit_detects_injected_orphans(spark):
    """Corrupt one FK and the edge must flip to failing."""
    from pyspark.sql import functions as F
    from spark_clustering_spark.io import table

    c = table(spark, SF_SMALL, "customer").select(
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_custkey") + 10_000_000)
        .otherwise(F.col("c_custkey"))
        .alias("_fk")
    )
    p = (
        table(spark, SF_SMALL, "customer")
        .select(F.col("c_custkey").alias("_pk"))
        .distinct()
    )
    joined = c.join(p, c["_fk"] == p["_pk"], "left")
    n_orphans = joined.filter(
        F.col("_fk").isNotNull() & F.col("_pk").isNull()
    ).count()
    assert n_orphans == c.filter(F.col("_fk") >= 10_000_000).count() > 0


def test_ngram_novelty_bounds_and_first_doc(spark):
    from spark_clustering_spark.pipeline.dedup import q_text_ngram_novelty

    rows = q_text_ngram_novelty(spark, SF_SMALL).collect()
    assert rows
    by_id = {r.doc_id: r for r in rows}
    # every ratio in [0,1], counts consistent
    for r in rows:
        assert 0 <= r.n_dup <= r.n_shingles
        assert abs(r.novelty - (1 - r.n_dup / r.n_shingles)) < 1e-6
    # the earliest doc can have no earlier source: novelty exactly 1
    first = min(by_id)
    assert by_id[first].novelty == 1.0


def test_knn_graph_mutuality(spark):
    from pyspark.sql import functions as F
    from spark_clustering_spark.pipeline.similarity import (
        KNN_K,
        KNN_MOD,
        q_vec_knn_graph,
    )

    rows = q_vec_knn_graph(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.id_a < r.id_b
        assert r.id_a % KNN_MOD == 0 and r.id_b % KNN_MOD == 0
        assert 1 <= r.rank_ab <= KNN_K and 1 <= r.rank_ba <= KNN_K
        assert -1.0001 <= r.cos <= 1.0001


def test_price_elasticity_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.olap import q_olap_price_elasticity

    got = {r.p_brand: r for r in q_olap_price_elasticity(spark, SF_SMALL).collect()}
    assert got
    li = table(spark, SF_SMALL, "lineitem")
    p = table(spark, SF_SMALL, "part").select("p_partkey", "p_brand")
    pts = (
        li.filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(p, li["l_partkey"] == p["p_partkey"])
        .select("p_brand", "l_extendedprice", "l_quantity")
        .collect()
    )
    brands = {r.p_brand for r in pts}
    assert set(got) == brands
    brand = sorted(brands)[0]
    x = np.log(
        np.array(
            [r.l_extendedprice / r.l_quantity for r in pts if r.p_brand == brand]
        )
    )
    y = np.log(np.array([r.l_quantity for r in pts if r.p_brand == brand], float))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(got[brand].elasticity - slope) < 1e-3
    assert abs(got[brand].intercept - intercept) < 1e-3
    assert got[brand].n == len(x)


def test_ivf_recall_bounds(spark):
    from spark_clustering_spark.pipeline.similarity import (
        N_PROBES,
        TOP_K,
        q_sim_ivf_recall,
    )

    rows = q_sim_ivf_recall(spark, SF_SMALL).collect()
    assert len(rows) == N_PROBES
    for r in rows:
        assert 0 <= r.n_hits <= TOP_K
        assert abs(r.recall - r.n_hits / TOP_K) < 1e-9
    # the index must be doing its job on the tiny fixture: mean recall
    # comfortably above chance
    assert sum(r.recall for r in rows) / len(rows) >= 0.5


def test_winsorize_bounds(spark):
    from spark_clustering_spark.operators.aggregates import q_agg_winsorize

    rows = q_agg_winsorize(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # capping shrinks the spread but keeps the mean in range
        assert r.n_capped_lo + r.n_capped_hi < r.n
        # ~10% of rows are capped (5% each tail), give or take fixture noise
        assert 0 < r.n_capped_lo + r.n_capped_hi <= 0.25 * r.n
        assert r.winsor_mean is not None and r.raw_mean is not None


def test_cohort_revenue_triangle(spark):
    from pyspark.sql import functions as F
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.olap import q_olap_cohort_revenue

    rows = q_olap_cohort_revenue(spark, SF_SMALL).collect()
    assert rows
    o = table(spark, SF_SMALL, "orders")
    total = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    # offset-0 cells must cover every customer exactly once
    zero = [r for r in rows if r.month_offset == 0]
    assert sum(r.n_customers for r in zero) == n_cust
    for r in rows:
        assert r.month_offset >= 0
        assert 1 <= r.cohort_month <= 12
        assert r.n_customers >= 1
    # revenue triangle total equals the table total
    got_rev = sum(r.revenue for r in rows)
    want_rev = o.agg(F.sum("o_totalprice")).first()[0]
    assert abs(got_rev - want_rev) / want_rev < 1e-6


def test_logreg_step_matches_sklearn_free_newton(spark):
    """Replay the closed-form Newton step in numpy and compare."""
    import numpy as np
    from pyspark.sql import functions as F
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.clustering import q_ml_logreg_step

    row = q_ml_logreg_step(spark, SF_SMALL).collect()
    assert len(row) == 1
    got = row[0]
    li = (
        table(spark, SF_SMALL, "lineitem")
        .filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    y = np.array([1.0 if r.l_returnflag == "R" else 0.0 for r in li])
    z = np.log(np.array([r.l_extendedprice / r.l_quantity for r in li]))
    X = np.column_stack([np.ones_like(z), z])
    beta = 4.0 * np.linalg.solve(X.T @ X, X.T @ (y - 0.5))
    assert abs(got.beta0 - beta[0]) < 1e-4
    assert abs(got.beta1 - beta[1]) < 1e-4
    pred = (X @ beta > 0).astype(float)
    assert abs(got.train_acc - (pred == y).mean()) < 1e-6
    assert got.n == len(y) and got.n_pos == int(y.sum())
    # a single step from zero must already beat the majority baseline's
    # complement (sanity that the sign structure is right)
    assert 0.0 <= got.train_acc <= 1.0


def test_acf_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.timeseries import (
        ACF_MAX_LAG,
        q_ts_acf,
    )

    rows = {r.lag: r for r in q_ts_acf(spark, SF_SMALL).collect()}
    assert set(rows) == set(range(1, ACF_MAX_LAG + 1))
    e = table(spark, SF_SMALL, "events")
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("x"))
        .orderBy("day")
        .collect()
    )
    x = np.array([r.x for r in daily])
    mu = x.mean()
    denom = ((x - mu) ** 2).sum()
    for lag in range(1, ACF_MAX_LAG + 1):
        want = ((x[:-lag] - mu) * (x[lag:] - mu)).sum() / denom
        assert abs(rows[lag].acf - want) < 1e-3, lag
        assert rows[lag].n_pairs == len(x) - lag
        assert -1.0 <= rows[lag].acf <= 1.0


def test_kcore_monotone_cascade(spark):
    from pyspark.sql import functions as F
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.graph import (
        KCORE_K,
        KCORE_ROUNDS,
        q_graph_kcore,
    )

    rows = sorted(q_graph_kcore(spark, SF_SMALL).collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == list(range(1, KCORE_ROUNDS + 1))
    # peeling only shrinks the graph
    for a, b in zip(rows, rows[1:]):
        assert b.n_alive <= a.n_alive
        assert b.n_edges <= a.n_edges
    # round 1 must match a direct degree count
    li = (
        table(spark, SF_SMALL, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a_ = li.select("o", F.col("p").alias("u"))
    b_ = li.select("o", F.col("p").alias("v"))
    e = (
        a_.join(b_, "o")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .count()
    )
    n_alive_1 = deg.filter(F.col("count") >= KCORE_K).count()
    assert rows[0].n_alive == n_alive_1


def test_jackknife_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.aggregates import q_agg_jackknife

    row = q_agg_jackknife(spark, SF_SMALL).collect()
    assert len(row) == 1
    got = row[0]
    e = table(spark, SF_SMALL, "events").select(
        F.date_trunc("day", "ts").alias("day"), "value"
    )
    per_day = {
        r.day: (r.n, r.s)
        for r in e.groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    n_tot = sum(n for n, _ in per_day.values())
    s_tot = sum(s for _, s in per_day.values())
    ests = np.array(
        [(s_tot - s) / (n_tot - n) for n, s in per_day.values()]
    )
    g = len(ests)
    want_se = float(np.sqrt((g - 1) / g * ((ests - ests.mean()) ** 2).sum()))
    assert got.n_groups == g
    assert abs(got.mean_value - s_tot / n_tot) < 1e-4
    assert abs(got.jackknife_se - want_se) < 1e-4
    assert got.jackknife_se > 0


def test_wilson_ci_properties(spark):
    from spark_clustering_spark.operators.aggregates import q_agg_wilson_ci

    rows = q_agg_wilson_ci(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0
        assert abs(r.rate - r.n_returned / r.n) < 1e-5
        # the interval shrinks as ~1/sqrt(n): it must be non-degenerate
        # but far narrower than [0,1] at these group sizes
        assert 0 < r.wilson_hi - r.wilson_lo < 0.6
