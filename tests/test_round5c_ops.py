"""Round-5c operators: RFM, Gini, Welch t-test, naive Bayes, JL sign
projection, Kaplan-Meier survival, Jaccard link prediction, chi-squared."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from tests.conftest import SF_SMALL


def test_rfm_tiles_are_balanced_quintiles(spark):
    from spark_clustering_spark.operators.olap import q_olap_rfm

    rows = q_olap_rfm(spark, SF_SMALL).collect()
    n = len(rows)
    assert n > 50
    for tile_col in ("r_tile", "f_tile", "m_tile"):
        c = Counter(getattr(r, tile_col) for r in rows)
        assert sorted(c) == [1, 2, 3, 4, 5]
        # exact ntile: sizes differ by at most 1
        assert max(c.values()) - min(c.values()) <= 1
    for r in rows:
        assert r.rfm_code == r.r_tile * 100 + r.f_tile * 10 + r.m_tile
    # monetary quintile 1 must dominate quintile 5 in revenue
    m1 = [r.monetary for r in rows if r.m_tile == 1]
    m5 = [r.monetary for r in rows if r.m_tile == 5]
    assert min(m1) >= max(m5)


def test_gini_matches_sequential_formula(spark):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.olap import q_olap_gini

    got = q_olap_gini(spark, SF_SMALL).collect()[0]
    o = table(spark, SF_SMALL, "orders").select("o_custkey", "o_totalprice").collect()
    rev = defaultdict(float)
    for r in o:
        rev[r.o_custkey] += r.o_totalprice
    xs = sorted(rev.values())
    n = len(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    g = 2 * s1 / (n * sum(xs)) - (n + 1) / n
    assert got.n_customers == n
    assert abs(got.gini - g) < 1e-4
    assert 0.0 <= got.gini <= 1.0


def test_welch_ttest_matches_numpy(spark):
    import numpy as np

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.aggregates import q_agg_welch_ttest

    got = q_agg_welch_ttest(spark, SF_SMALL).collect()[0]
    ev = table(spark, SF_SMALL, "events").select("event_type", "value").collect()
    a = np.array([r.value for r in ev if r.event_type == "click"])
    b = np.array([r.value for r in ev if r.event_type == "view"])
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert got.n_a == len(a) and got.n_b == len(b)
    assert abs(got.mean_a - a.mean()) < 1e-4
    assert abs(got.t_stat - t) < 1e-4
    assert abs(got.df_welch - df) < 1e-2
    # df bounded by min-1 and n_a+n_b-2
    assert min(len(a), len(b)) - 1 <= got.df_welch <= len(a) + len(b) - 2


def test_naive_bayes_matches_sklearn_free_reference(spark):
    """Replay multinomial NB with add-one smoothing in pure Python."""
    import re

    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.textstats import q_ml_naive_bayes

    got = {r.doc_id: r for r in q_ml_naive_bayes(spark, SF_SMALL).collect()}
    docs = table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    cnt: dict = defaultdict(Counter)
    nd = Counter()
    vocab = set()
    toks_by_doc = {}
    for d in docs:
        toks = [t for t in re.split(r"\s+", d.text.lower()) if t]
        toks_by_doc[d.doc_id] = toks
        nd[d.lang] += 1
        cnt[d.lang].update(toks)
        vocab.update(toks)
    v = len(vocab)
    langs = sorted(nd)
    n_docs = sum(nd.values())
    tot = {lg: sum(cnt[lg].values()) for lg in langs}
    correct = 0
    for d in docs:
        scores = {}
        for lg in langs:
            s = math.log(nd[lg] / n_docs)
            for t in toks_by_doc[d.doc_id]:
                s += math.log((cnt[lg][t] + 1) / (tot[lg] + v))
            scores[lg] = s
        pred = min(langs, key=lambda lg: (-scores[lg], lg))
        g = got[d.doc_id]
        assert g.pred_lang == pred, (d.doc_id, g.pred_lang, pred)
        assert abs(g.score - scores[pred]) < 1e-3
        assert g.true_lang == d.lang
        correct += g.correct
    assert correct == sum(1 for d in docs if got[d.doc_id].pred_lang == d.lang)


def test_random_projection_matches_numpy(spark):
    import numpy as np

    from spark_clustering_spark.functions.rng import py_lcg_uniform
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.vectors import (
        RP_K,
        RP_SEED,
        q_vec_random_projection,
    )

    got = {(r.vec_id, r.k): r.proj for r in q_vec_random_projection(spark, SF_SMALL).collect()}
    embs = table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding").collect()
    d = len(embs[0].embedding)
    signs = np.array(
        [
            [1.0 if py_lcg_uniform(j * 8 + k, RP_SEED) < 0.5 else -1.0 for k in range(RP_K)]
            for j in range(d)
        ]
    )
    for e in embs[:50]:
        v = np.array(e.embedding, dtype=np.float64)
        proj = v @ signs
        for k in range(RP_K):
            assert abs(got[(e.vec_id, k)] - proj[k]) < 1e-3
    # JL property sanity: projected norms concentrate around original norms
    r0 = np.array([got[(embs[0].vec_id, k)] for k in range(RP_K)])
    assert np.linalg.norm(r0) > 0


def test_survival_km_sequential_replay(spark):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.olap import q_olap_survival

    rows = sorted(q_olap_survival(spark, SF_SMALL).collect(), key=lambda r: r.t_days)
    assert rows, "empty KM curve"
    o = table(spark, SF_SMALL, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).collect()
    by_c = defaultdict(list)
    for r in o:
        by_c[r.o_custkey].append((r.o_orderdate, r.o_orderkey))
    import datetime

    anchor = datetime.date(1998, 12, 31)
    durs = []
    for c, lst in by_c.items():
        lst.sort()
        for a, b in zip(lst, lst[1:]):
            durs.append(((b[0].date() - a[0].date()).days, 1))
        durs.append(((anchor - lst[-1][0].date()).days, 0))
    at_t = defaultdict(lambda: [0, 0])
    for t, obs in durs:
        at_t[t][0] += 1
        at_t[t][1] += obs
    n_at_risk = len(durs)
    S = 1.0
    exp = {}
    for t in sorted(at_t):
        m, d = at_t[t]
        if d > 0:
            S *= 1 - d / n_at_risk
            exp[t] = (n_at_risk, d, S)
        n_at_risk -= m
    assert len(rows) == len(exp)
    prev = 1.0 + 1e-12
    for r in rows:
        n_risk, d, s = exp[r.t_days]
        assert r.n_risk == n_risk
        assert r.d_events == d
        assert abs(r.survival - s) < 1e-4
        assert r.survival <= prev  # monotone non-increasing
        prev = r.survival


def test_linkpred_jaccard_verified_against_neighbor_sets(spark):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.graph import q_graph_jaccard_linkpred

    got = q_graph_jaccard_linkpred(spark, SF_SMALL).collect()
    assert got
    li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey").distinct().collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    nbrs = defaultdict(set)
    for parts in baskets.values():
        if len(parts) > 5:
            continue
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                nbrs[u].add(v)
                nbrs[v].add(u)
    prev_score = None
    for r in got:
        inter = nbrs[r.u] & nbrs[r.v]
        assert r.v not in nbrs[r.u], "predicted pair already adjacent"
        assert r.common == len(inter) and r.common >= 2
        jac = len(inter) / len(nbrs[r.u] | nbrs[r.v])
        assert abs(r.jaccard - jac) < 1e-4
        if prev_score is not None:
            assert r.jaccard <= prev_score + 1e-12
        prev_score = r.jaccard


def test_chisq_matches_scipy_free_reference(spark):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.aggregates import q_agg_chisq

    got = q_agg_chisq(spark, SF_SMALL).collect()[0]
    c = {r.c_custkey: r.c_mktsegment for r in table(spark, SF_SMALL, "customer").collect()}
    o = table(spark, SF_SMALL, "orders").select("o_custkey", "o_orderpriority").collect()
    cells = Counter((c[r.o_custkey], r.o_orderpriority) for r in o)
    segs = sorted({k[0] for k in cells})
    prios = sorted({k[1] for k in cells})
    t = sum(cells.values())
    chi2 = 0.0
    for s in segs:
        rn = sum(v for (a, _), v in cells.items() if a == s)
        for p in prios:
            cn = sum(v for (_, b), v in cells.items() if b == p)
            n = cells.get((s, p), 0)
            if n == 0:
                continue  # engine only sums observed cells
            e = rn * cn / t
            chi2 += (n - e) ** 2 / e
    assert got.n_segments == len(segs)
    assert got.n_priorities == len(prios)
    assert got.df == (len(segs) - 1) * (len(prios) - 1)
    assert abs(got.chi2 - chi2) < 1e-2


def test_markov_rows_normalize_and_match_sequential_replay(spark):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.timeseries import q_ts_markov

    got = q_ts_markov(spark, SF_SMALL).collect()
    by_prev = defaultdict(float)
    for r in got:
        by_prev[r.prev_type] += r.prob
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-4, (prev, s)
    ev = table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    seqs = defaultdict(list)
    for r in ev:
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    pairs = Counter()
    for lst in seqs.values():
        lst.sort()
        for a, b in zip(lst, lst[1:]):
            pairs[(a[2], b[2])] += 1
    assert {(r.prev_type, r.next_type): r.n for r in got} == dict(pairs)


def test_repeat_rate_conservation(spark):
    from spark_clustering_spark.operators.olap import q_olap_repeat_rate

    rows = sorted(q_olap_repeat_rate(spark, SF_SMALL).collect(),
                  key=lambda r: (r.year, r.month))
    assert rows
    # first month has zero repeats; every month: new + repeat = active
    assert rows[0].n_repeat == 0
    total_new = 0
    for r in rows:
        assert r.n_new + r.n_repeat == r.n_active
        assert r.n_orders >= r.n_active
        assert abs(r.repeat_share - r.n_repeat / r.n_active) < 1e-4
        total_new += r.n_new
    # every customer is new exactly once
    from spark_clustering_spark.io import table

    n_cust = (
        table(spark, SF_SMALL, "orders").select("o_custkey").distinct().count()
    )
    assert total_new == n_cust


def test_gmm_mstep_consistent_with_estep(spark):
    """M-step means/weights must equal the numpy-replayed weighted
    averages of the E-step responsibilities."""
    import numpy as np

    from spark_clustering_spark.operators.clustering import (
        GMM_SAMPLE,
        q_ml_gmm_estep,
        q_ml_gmm_mstep,
        points_df,
    )

    resp = q_ml_gmm_estep(spark, SF_SMALL).collect()
    pts = {
        r.vec_id: np.array(r.vec)
        for r in points_df(spark, SF_SMALL)
        .filter(f"vec_id < {GMM_SAMPLE}")
        .collect()
    }
    got = {(r.cid, r.pos): r for r in q_ml_gmm_mstep(spark, SF_SMALL).collect()}
    by_cid = defaultdict(list)
    for r in resp:
        by_cid[r.cid].append((r.vec_id, r.resp))
    n = len(pts)
    w_sum = 0.0
    for cid, lst in by_cid.items():
        rs = sum(r for _, r in lst)
        mu = sum(r * pts[v] for v, r in lst) / rs
        w = rs / n
        w_sum += w
        for pos in range(len(mu)):
            g = got[(cid, pos)]
            # estep responsibilities are rounded to 6dp -> loose tol
            assert abs(g.mu_new - mu[pos]) < 5e-3
            assert abs(g.weight_new - w) < 1e-3
    assert abs(w_sum - 1.0) < 1e-2  # mixture weights sum to ~1


def test_gmm_loglik_numpy_replay_and_em_monotonicity_anchor(spark):
    import numpy as np

    from spark_clustering_spark.operators.clustering import (
        GMM_SAMPLE,
        GMM_SIGMA2,
        K_DEFAULT,
        centroids_df,
        points_df,
        q_ml_gmm_loglik,
    )

    got = q_ml_gmm_loglik(spark, SF_SMALL).collect()[0]
    pts = np.array(
        [
            r.vec
            for r in points_df(spark, SF_SMALL)
            .filter(f"vec_id < {GMM_SAMPLE}")
            .collect()
        ]
    )
    ctr = np.array([r.cvec for r in centroids_df(spark, SF_SMALL).collect()])
    d2 = ((pts[:, None, :] - ctr[None, :, :]) ** 2).sum(-1)
    ll = np.log(np.exp(-d2 / (2 * GMM_SIGMA2)).sum(1) / K_DEFAULT).sum()
    assert got.n_points == len(pts)
    assert abs(got.loglik - ll) < 1e-2
    assert abs(got.avg_loglik - ll / len(pts)) < 1e-4
    assert got.loglik < 0  # densities < 1 here -> negative ll


def test_fit_gmm_loglik_monotone_and_weights_normalized(spark):
    from spark_clustering_spark.ml.gmm import fit_gmm
    from spark_clustering_spark.operators.clustering import points_df

    res = fit_gmm(spark, points_df(spark, SF_SMALL), k=4, num_iter=3)
    assert len(res.logliks) == 3
    for a, b in zip(res.logliks, res.logliks[1:]):
        assert b >= a - 1e-6, res.logliks  # EM monotonicity
    assert abs(sum(res.weights) - 1.0) < 1e-9
    assert all(w > 0 for w in res.weights)
    rows = res.metrics.collect()
    assert [r.iteration for r in rows] == [0, 1, 2]
    # means stay inside the data's bounding box
    import numpy as np

    pts = np.array([r.vec for r in points_df(spark, SF_SMALL).collect()])
    lo, hi = pts.min(0), pts.max(0)
    m = np.array(res.means)
    assert (m >= lo - 1e-9).all() and (m <= hi + 1e-9).all()


def test_lsh_tuning_monotone_tradeoff(spark):
    """Fewer rows per band (more permissive S-curve) must never find
    FEWER candidates, and recall must be monotone non-increasing in r
    while precision is non-decreasing (the banding trade-off)."""
    from spark_clustering_spark.pipeline.dedup import q_dedup_lsh_tuning

    rows = {r.rows_per_band: r for r in q_dedup_lsh_tuning(spark, SF_SMALL).collect()}
    assert set(rows) == {2, 4, 8}
    assert rows[2].n_candidates >= rows[4].n_candidates >= rows[8].n_candidates
    assert rows[2].recall_vs_union >= rows[4].recall_vs_union >= rows[8].recall_vs_union
    assert rows[2].precision_ <= rows[4].precision_ <= rows[8].precision_ + 1e-12
    for r in rows.values():
        assert r.n_bands * r.rows_per_band == 16
        assert 0 <= r.n_true <= r.n_candidates
