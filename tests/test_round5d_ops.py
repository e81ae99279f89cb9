"""Round-5d operators: ridge regression, OHLC resample, paragraph dedup."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_SMALL


def test_ridge_matches_numpy_closed_form(spark):
    import numpy as np

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.clustering import (
        RIDGE_LAMBDA,
        q_ml_ridge,
    )

    got = q_ml_ridge(spark, SF_SMALL).collect()[0]
    li = table(spark, SF_SMALL, "lineitem").select(
        "l_quantity", "l_extendedprice"
    ).collect()
    x = np.array([float(r.l_quantity) for r in li])
    y = np.array([float(r.l_extendedprice) for r in li])
    n = len(x)
    assert got.n == n
    cov = n * (x * y).sum() - x.sum() * y.sum()
    var = n * (x * x).sum() - x.sum() ** 2
    b_ols = cov / var
    b_ridge = cov / (var + n * n * RIDGE_LAMBDA)
    assert abs(got.slope_ols - b_ols) < 1e-4
    assert abs(got.slope_ridge - b_ridge) < 1e-4
    # ridge always shrinks toward zero, and λ>0 makes it strict
    assert abs(got.slope_ridge) < abs(got.slope_ols)
    a_ols = (y.sum() - b_ols * x.sum()) / n
    assert abs(got.intercept_ols - a_ols) < 1e-2
    assert 0.0 <= got.r2 <= 1.0


def test_ohlc_bars_match_sequential_resample(spark):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.timeseries import (
        HOUR_US,
        q_ts_resample_ohlc,
    )

    got = {r.hour_id: r for r in q_ts_resample_ohlc(spark, SF_SMALL).collect()}
    ev = table(spark, SF_SMALL, "events").selectExpr(
        "unix_micros(ts) as us", "event_id", "value"
    ).collect()
    bars = defaultdict(list)
    for r in ev:
        bars[r.us // HOUR_US].append((r.us, r.event_id, r.value))
    assert set(got) == set(bars)
    for h, ticks in bars.items():
        ticks.sort()
        b = got[h]
        assert b.n_events == len(ticks)
        assert b.open == ticks[0][2]
        assert b.close == ticks[-1][2]
        vals = [t[2] for t in ticks]
        assert b.high == max(vals) and b.low == min(vals)
        assert abs(b.volume - sum(vals)) < 1e-3
        # bar invariants
        assert b.low <= b.open <= b.high
        assert b.low <= b.close <= b.high


def test_paragraph_dedup_keeps_first_occurrence_only(spark):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.dedup import (
        PARA_W,
        q_text_dedup_paragraph,
    )

    got = {r.doc_id: r for r in q_text_dedup_paragraph(spark, SF_SMALL).collect()}
    docs = table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    seen: set[str] = set()
    kept = defaultdict(lambda: [0, 0, 0, 0])  # n_segs, n_kept, tot, kept_toks
    for r in sorted(docs, key=lambda r: r.doc_id):
        toks = [t for t in r.text.split() if t]
        if not toks:
            continue
        for s in range(0, max(len(toks), 1), PARA_W):
            seg = " ".join(toks[s : s + PARA_W])
            st = kept[r.doc_id]
            st[0] += 1
            st[2] += len(toks[s : s + PARA_W])
            if seg not in seen:
                seen.add(seg)
                st[1] += 1
                st[3] += len(toks[s : s + PARA_W])
    assert set(got) == set(kept)
    n_dropped = 0
    for doc_id, (n_segs, n_kept, tot, ktoks) in kept.items():
        g = got[doc_id]
        assert (g.n_segs, g.n_kept, g.total_toks, g.kept_toks) == (
            n_segs,
            n_kept,
            tot,
            ktoks,
        ), doc_id
        n_dropped += n_segs - n_kept
        assert abs(g.retained_frac - ktoks / tot) < 1e-5
    # the corpus is built with duplicated docs, so the pass must bite
    assert n_dropped > 0


def test_new_ops_plan_contracts(spark):
    """q_ml_ridge: no shuffle wider than the 1-row aggregate exchange;
    q_ts_resample_ohlc: single hash aggregate, no WindowExec;
    q_text_dedup_paragraph: no window (champion via objectHashAgg)."""
    from spark_clustering_spark.operators.clustering import q_ml_ridge
    from spark_clustering_spark.operators.timeseries import q_ts_resample_ohlc
    from spark_clustering_spark.pipeline.dedup import q_text_dedup_paragraph

    ridge = q_ml_ridge(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in ridge

    ohlc = (
        q_ts_resample_ohlc(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in ohlc
    # open/close ride the aggregate (min_by/max_by), not a per-bucket sort
    assert "min_by" in ohlc or "ObjectHashAggregate" in ohlc

    para = (
        q_text_dedup_paragraph(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in para


def test_bootstrap_se_brackets_analytic(spark):
    from spark_clustering_spark.pipeline.sampling import q_sample_bootstrap

    r = q_sample_bootstrap(spark, SF_SMALL).collect()[0]
    assert r.n_replicates == 32
    assert r.se_analytic > 0
    # Poisson bootstrap SE is a consistent estimator of the analytic SE;
    # with B=32 replicates it should land well within a factor of two.
    assert 0.5 * r.se_analytic < r.se_boot < 2.0 * r.se_analytic
    # the mean itself must match the plain aggregate
    from spark_clustering_spark.io import table
    import math

    xs = [
        float(row.o_totalprice)
        for row in table(spark, SF_SMALL, "orders").select("o_totalprice").collect()
    ]
    assert abs(r.mean - sum(xs) / len(xs)) < 1e-2
    var = sum((x - sum(xs) / len(xs)) ** 2 for x in xs) / (len(xs) - 1)
    assert abs(r.se_analytic - math.sqrt(var / len(xs))) < 1e-2

    plan = (
        q_sample_bootstrap(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_modularity_contributions_sum_to_q(spark):
    from collections import Counter

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.graph import (
        MODULARITY_BASKET_CAP,
        q_graph_modularity,
    )

    rows = q_graph_modularity(spark, SF_SMALL).collect()
    assert len(rows) > 1
    # sequential reference: rebuild the capped co-purchase graph
    li = table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    basket = Counter(r.l_orderkey for r in li)
    by_order = {}
    for r in li:
        if basket[r.l_orderkey] <= MODULARITY_BASKET_CAP:
            by_order.setdefault(r.l_orderkey, []).append(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    brand = {
        r.p_partkey: r.p_brand
        for r in table(spark, SF_SMALL, "part").select(
            "p_partkey", "p_brand"
        ).collect()
    }
    m = len(edges)
    m_c: Counter = Counter()
    d_c: Counter = Counter()
    for u, v in edges:
        if brand[u] == brand[v]:
            m_c[brand[u]] += 1
        d_c[brand[u]] += 1
        d_c[brand[v]] += 1
    q_ref = sum(
        m_c[c] / m - (d_c[c] / (2 * m)) ** 2 for c in d_c
    )
    got_q = sum(r.q_contrib for r in rows)
    assert abs(got_q - q_ref) < 1e-4
    for r in rows:
        assert r.m_within <= r.degree_sum  # within edges bounded by stubs
    # modularity of any partition lies in [-1, 1]
    assert -1.0 <= got_q <= 1.0


def test_als_step_solves_per_user_normal_equations(spark):
    import numpy as np

    from spark_clustering_spark.functions.rng import py_lcg_uniform
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.clustering import (
        ALS_LAMBDA,
        q_ml_als_step,
    )

    got = {r.custkey: r for r in q_ml_als_step(spark, SF_SMALL).collect()}
    li = table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).collect()
    cust = {
        r.o_orderkey: r.o_custkey
        for r in table(spark, SF_SMALL, "orders").select(
            "o_orderkey", "o_custkey"
        ).collect()
    }
    by_user: dict = {}
    for r in li:
        c = cust[r.l_orderkey]
        v = np.array(
            [
                1.0 + py_lcg_uniform(r.l_partkey, seed=101),
                1.0 + py_lcg_uniform(r.l_partkey, seed=202),
            ]
        )
        A, b, n = by_user.setdefault(c, [np.zeros((2, 2)), np.zeros(2), 0])
        A += np.outer(v, v)
        b += float(r.l_quantity) * v
        by_user[c][2] = n + 1
    assert set(got) == set(by_user)
    for c, (A, b, n) in by_user.items():
        u = np.linalg.solve(A + ALS_LAMBDA * np.eye(2), b)
        g = got[c]
        assert g.n_items == n
        assert abs(g.u1 - u[0]) < 1e-3, c
        assert abs(g.u2 - u[1]) < 1e-3, c
    # reconstruction sanity: predicted ratings are positive where
    # factors are positive, and the solve is regularized (finite)
    assert all(np.isfinite((r.u1, r.u2)).all() for r in got.values())


def test_rolling_median_matches_sequential(spark):
    import statistics

    from spark_clustering_spark.operators.timeseries import (
        MED_W,
        q_ts_rolling_median,
    )

    rows = sorted(
        q_ts_rolling_median(spark, SF_SMALL).collect(), key=lambda r: r.day_id
    )
    assert len(rows) > MED_W  # enough days to exercise full frames
    xs = [r.x for r in rows]
    for i, r in enumerate(rows):
        frame = xs[max(0, i - (MED_W - 1)) : i + 1]
        assert abs(getattr(r, f"med{MED_W}") - statistics.median(frame)) < 1e-3


def test_scalable_quantiles_match_sorted_reference(spark):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.aggregates import (
        QUANTILE_TARGETS,
        q_agg_quantiles_scalable,
    )

    rows = {r.quantile: r for r in q_agg_quantiles_scalable(spark, SF_SMALL).collect()}
    vals = sorted(
        (float(r.o_totalprice), r.o_orderkey)
        for r in table(spark, SF_SMALL, "orders").select(
            "o_totalprice", "o_orderkey"
        ).collect()
    )
    n = len(vals)
    assert set(rows) == {q for q, _, _ in QUANTILE_TARGETS}
    for q, num, den in QUANTILE_TARGETS:
        tgt = (num * n + den - 1) // den
        got = rows[q]
        assert got.rank == tgt
        assert abs(float(got.value) - vals[tgt - 1][0]) < 1e-9
    # quantiles are monotone in q
    assert float(rows[0.5].value) <= float(rows[0.9].value) <= float(rows[0.99].value)

    # plan contract: no data-proportional single-partition exchange —
    # the only window is per-slice (partitioned by _pid)
    plan = (
        q_agg_quantiles_scalable(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_benford_audit_shares_and_expectations(spark):
    import math
    from collections import Counter

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.aggregates import q_dq_benford

    rows = {r.digit: r for r in q_dq_benford(spark, SF_SMALL).collect()}
    assert set(rows) == set(range(1, 10))  # all nine digits present
    counts = Counter(
        int(str(r.o_totalprice)[0])
        for r in table(spark, SF_SMALL, "orders").select("o_totalprice").collect()
        if r.o_totalprice > 0
    )
    tot = sum(counts.values())
    assert sum(r.n for r in rows.values()) == tot
    for d in range(1, 10):
        r = rows[d]
        assert r.n == counts.get(d, 0)
        assert abs(r.share - counts.get(d, 0) / tot) < 1e-5
        assert abs(r.expected - round(math.log10(1 + 1 / d), 6)) < 1e-9
        assert abs(r.abs_dev - abs(r.share - r.expected)) < 1e-5
    # shares form a distribution
    assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-3


def test_xcorr_matches_numpy_and_lag_zero_symmetry(spark):
    import numpy as np

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.timeseries import (
        DAY_US,
        XCORR_MAX_LAG,
        XCORR_X,
        XCORR_Y,
        q_ts_xcorr,
    )

    got = {r.lag: r for r in q_ts_xcorr(spark, SF_SMALL).collect()}
    assert set(got) == set(range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1))
    ev = table(spark, SF_SMALL, "events").selectExpr(
        f"unix_micros(ts) div {DAY_US} as day", "event_type"
    ).collect()
    from collections import Counter

    cx = Counter(r.day for r in ev if r.event_type == XCORR_X)
    cy = Counter(r.day for r in ev if r.event_type == XCORR_Y)
    for lag in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1):
        days = sorted(d for d in cx if (d + lag) in cy)
        x = np.array([cx[d] for d in days], dtype=float)
        y = np.array([cy[d + lag] for d in days], dtype=float)
        r = got[lag]
        assert r.n_days == len(days)
        ref = np.corrcoef(x, y)[0, 1]
        assert abs(r.xcorr - ref) < 1e-4, lag
        assert -1.0 <= r.xcorr <= 1.0


def test_customer_migration_matrix_invariants(spark):
    from spark_clustering_spark.operators.olap import q_olap_customer_migration

    rows = q_olap_customer_migration(spark, SF_SMALL).collect()
    assert rows
    tiles = {(r.tile_a, r.tile_b) for r in rows}
    assert all(1 <= a <= 5 and 1 <= b <= 5 for a, b in tiles)
    # within-row shares form a distribution per tile_a
    from collections import defaultdict

    by_row = defaultdict(list)
    for r in rows:
        by_row[r.tile_a].append(r)
    for a, rs in by_row.items():
        assert abs(sum(r.row_share for r in rs) - 1.0) < 1e-3, a
        for r in rs:
            n_row = sum(x.n_customers for x in rs)
            assert abs(r.row_share - r.n_customers / n_row) < 1e-5
    # the diagonal should carry real mass (segments are sticky-ish):
    # every tile_a row has at least one customer somewhere
    assert set(by_row) == {r.tile_a for r in rows}


def test_skyline_is_exactly_the_nondominated_set(spark):
    from collections import Counter

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.olap import q_olap_skyline

    got = {(r.freq, r.monetary) for r in q_olap_skyline(spark, SF_SMALL).collect()}
    orders = table(spark, SF_SMALL, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    freq: Counter = Counter()
    mon: Counter = Counter()
    for r in orders:
        freq[r.o_custkey] += 1
        mon[r.o_custkey] += float(r.o_totalprice)
    pairs = {(freq[c], round(mon[c], 4)) for c in freq}
    sky = {
        p
        for p in pairs
        if not any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pairs
        )
    }
    assert got == sky
    # frontier is strictly decreasing in mon as freq increases
    s = sorted(got)
    for (f1, m1), (f2, m2) in zip(s, s[1:]):
        assert f1 < f2 and m1 > m2


def test_mahalanobis_outliers_match_numpy(spark):
    import numpy as np

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.vectors import (
        OUTLIER_TOPK,
        q_vec_outlier_mahalanobis,
    )

    got = q_vec_outlier_mahalanobis(spark, SF_SMALL).collect()
    assert len(got) == OUTLIER_TOPK
    X = np.array(
        [
            r.embedding
            for r in table(spark, SF_SMALL, "embeddings")
            .select("embedding")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=float,
    )
    ids = [
        r.vec_id
        for r in table(spark, SF_SMALL, "embeddings")
        .select("vec_id")
        .orderBy("vec_id")
        .collect()
    ]
    mu = X.mean(axis=0)
    var = X.var(axis=0)  # population variance, matching sxx/n - mu^2
    m2 = (((X - mu) ** 2) / var).sum(axis=1)
    order = sorted(zip(m2, ids), key=lambda t: (-t[0], t[1]))[:OUTLIER_TOPK]
    ref_ids = [i for _, i in order]
    assert [r.vec_id for r in got] != []  # non-degenerate
    assert {r.vec_id for r in got} == set(ref_ids)
    for r, (ref_m2, ref_id) in zip(got, order):
        assert abs(r.m2 - ref_m2) < 1e-2


def test_peaks_are_strict_local_maxima(spark):
    from spark_clustering_spark.operators.timeseries import (
        DAY_US,
        q_ts_peaks,
    )
    from spark_clustering_spark.io import table
    from pyspark.sql import functions as F
    from spark_clustering_spark.functions.detagg import DEC
    from spark_clustering_spark.functions.detagg import dround

    peaks = q_ts_peaks(spark, SF_SMALL).collect()
    daily = dict(
        (r.day_id, r.x)
        for r in table(spark, SF_SMALL, "events")
        .select(F.expr(f"unix_micros(ts) div {DAY_US}").alias("day_id"), "value")
        .groupBy("day_id")
        .agg(dround(F.sum(F.col("value").cast(DEC)).cast("double"), 4).alias("x"))
        .collect()
    )
    days = sorted(daily)
    ref = {
        d
        for i, d in enumerate(days[1:-1], 1)
        if daily[d] > daily[days[i - 1]] and daily[d] > daily[days[i + 1]]
    }
    assert {r.day_id for r in peaks} == ref
    assert ref  # the synthetic series must have at least one peak


def test_canonical_rep_is_longest_member(spark):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.dedup import (
        q_dedup_canonical,
        q_dedup_clusters,
    )

    manifest = {r.component: r for r in q_dedup_canonical(spark, SF_SMALL).collect()}
    comp = {
        r.doc_id: r.component for r in q_dedup_clusters(spark, SF_SMALL).collect()
    }
    chars = {
        r.doc_id: r.n_chars
        for r in table(spark, SF_SMALL, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    # every document appears in exactly one manifest row's member count
    assert sum(r.n_members for r in manifest.values()) == len(chars)
    from collections import defaultdict

    members = defaultdict(list)
    for doc_id in chars:
        members[comp.get(doc_id, doc_id)].append(doc_id)
    for c, docs in members.items():
        m = manifest[c]
        assert m.n_members == len(docs)
        assert m.total_chars == sum(chars[d] for d in docs)
        best = sorted(docs, key=lambda d: (-chars[d], d))[0]
        assert m.rep_doc == best, c
        assert m.rep_chars == chars[best]
    # multi-member clusters exist in the duplicated synthetic corpus
    assert any(r.n_members > 1 for r in manifest.values())


def test_supplier_hhi_matches_sequential(spark):
    from collections import defaultdict

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.olap import q_olap_supplier_hhi

    got = {r.nation: r for r in q_olap_supplier_hhi(spark, SF_SMALL).collect()}
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in table(spark, SF_SMALL, "supplier").collect()
    }
    nations = {
        r.n_nationkey: r.n_name for r in table(spark, SF_SMALL, "nation").collect()
    }
    rev: dict = defaultdict(lambda: defaultdict(float))
    for r in table(spark, SF_SMALL, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    ).collect():
        rev[sup[r.l_suppkey]][r.l_suppkey] += float(r.l_extendedprice)
    for nk, by_sup in rev.items():
        g = got[nations[nk]]
        tot = sum(by_sup.values())
        hhi = sum((v / tot) ** 2 for v in by_sup.values())
        assert g.n_suppliers == len(by_sup)
        assert abs(g.hhi - hhi) < 1e-4
        assert abs(g.top_share - max(by_sup.values()) / tot) < 1e-4
        # HHI bounds: 1/n (uniform) .. 1 (monopoly)
        assert 1.0 / len(by_sup) - 1e-9 <= g.hhi <= 1.0


def test_collocations_pmi_matches_sequential(spark):
    import math
    from collections import Counter

    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.textstats import (
        PMI_MIN_COUNT,
        q_text_collocations,
    )

    got = q_text_collocations(spark, SF_SMALL).collect()
    assert got
    uni: Counter = Counter()
    big: Counter = Counter()
    for r in table(spark, SF_SMALL, "documents").select("text").collect():
        ws = [w for w in r.text.lower().split() if w]
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    T = sum(uni.values())
    B = sum(big.values())
    ref = {}
    for (a, b), cab in big.items():
        if cab >= PMI_MIN_COUNT:
            ref[f"{a} {b}"] = math.log(cab * T * T / (B * uni[a] * uni[b]))
    for r in got:
        assert r.bigram in ref
        assert r.n == big[tuple(r.bigram.split(" "))]
        assert abs(r.pmi - ref[r.bigram]) < 1e-3
    # the returned set is the true top-k by PMI
    topk = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert {r.bigram for r in got} == {k for k, _ in topk}


def test_mad_anomaly_matches_sequential(spark):
    import statistics

    from pyspark.sql import functions as F

    from spark_clustering_spark.functions.detagg import DEC, dround
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.timeseries import (
        DAY_US,
        MAD_C,
        MAD_K,
        q_ts_anomaly_mad,
    )

    got = {r.day_id: r for r in q_ts_anomaly_mad(spark, SF_SMALL).collect()}
    daily = dict(
        (r.day_id, r.x)
        for r in table(spark, SF_SMALL, "events")
        .select(F.expr(f"unix_micros(ts) div {DAY_US}").alias("day_id"), "value")
        .groupBy("day_id")
        .agg(dround(F.sum(F.col("value").cast(DEC)).cast("double"), 4).alias("x"))
        .collect()
    )
    m = statistics.median(daily.values())
    mad = round(statistics.median(abs(x - m) for x in daily.values()), 4)
    ref = {
        d: MAD_C * (x - m) / mad
        for d, x in daily.items()
        if abs(round(MAD_C * (x - m) / mad, 4)) > MAD_K
    }
    assert set(got) == set(ref)
    for d, r in got.items():
        assert abs(r.mz - ref[d]) < 1e-3


def test_calibration_bins_are_honest(spark):
    from spark_clustering_spark.operators.clustering import (
        CALIB_BINS,
        q_ml_calibration,
    )

    rows = q_ml_calibration(spark, SF_SMALL).collect()
    assert rows
    assert all(0 <= r.bin < CALIB_BINS for r in rows)
    total = sum(r.n for r in rows)
    assert total > 1000  # every lineitem row lands in exactly one bin
    for r in rows:
        assert 0.0 <= r.mean_predicted <= 1.0
        assert 0.0 <= r.observed_rate <= 1.0
        # mean predicted must fall inside (or at the edge of) its bin
        assert r.bin / CALIB_BINS - 1e-6 <= r.mean_predicted
        assert r.mean_predicted <= (r.bin + 1) / CALIB_BINS + 1e-6
    # the model has signal: bins are not all identical in observed rate
    rates = [r.observed_rate for r in rows if r.n > 50]
    assert max(rates) - min(rates) >= 0.0


def test_kfold_leave_out_identity_matches_numpy(spark):
    import numpy as np

    from spark_clustering_spark.functions.rng import py_lcg_uniform
    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.clustering import (
        KFOLD_K,
        KFOLD_SEED,
        q_ml_kfold,
    )

    got = {r.fold: r for r in q_ml_kfold(spark, SF_SMALL).collect()}
    assert set(got) == set(range(KFOLD_K))
    li = table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    ).collect()
    data = [
        (
            int(
                py_lcg_uniform(r.l_orderkey * 8 + r.l_linenumber, seed=KFOLD_SEED)
                * KFOLD_K
            ),
            float(r.l_quantity),
            float(r.l_extendedprice),
        )
        for r in li
    ]
    n_total = len(data)
    assert sum(g.n_test for g in got.values()) == n_total
    for f in range(KFOLD_K):
        train = [(x, y) for k, x, y in data if k != f]
        test = [(x, y) for k, x, y in data if k == f]
        g = got[f]
        assert g.n_train == len(train) and g.n_test == len(test)
        x = np.array([t[0] for t in train])
        y = np.array([t[1] for t in train])
        n = len(x)
        b = (n * (x * y).sum() - x.sum() * y.sum()) / (
            n * (x * x).sum() - x.sum() ** 2
        )
        a = (y.sum() - b * x.sum()) / n
        assert abs(g.slope - b) < 1e-4
        assert abs(g.intercept - a) < 1e-1
        xt = np.array([t[0] for t in test])
        yt = np.array([t[1] for t in test])
        mse = ((yt - (a + b * xt)) ** 2).mean()
        assert abs(g.test_mse - mse) / mse < 1e-4


def test_burstiness_fano_matches_sequential(spark):
    from collections import Counter, defaultdict

    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.textstats import q_text_burstiness

    got = {r.word: r for r in q_text_burstiness(spark, SF_SMALL).collect()}
    assert got
    docs = table(spark, SF_SMALL, "documents").select("text").collect()
    n_docs = len(docs)
    per_word = defaultdict(list)
    for r in docs:
        c = Counter(w for w in r.text.lower().split() if w)
        for w, k in c.items():
            per_word[w].append(k)
    for w, r in got.items():
        counts = per_word[w] + [0] * (n_docs - len(per_word[w]))
        mean = sum(counts) / n_docs
        var = sum((c - mean) ** 2 for c in counts) / n_docs
        assert r.total == sum(counts)
        assert r.n_docs_with == len(per_word[w])
        assert abs(r.fano - var / mean) < 1e-3, w


def test_log2_histogram_buckets_are_exact(spark):
    from collections import Counter

    from spark_clustering_spark.io import table
    from spark_clustering_spark.operators.aggregates import q_agg_histogram_log2

    got = {r.bucket: r for r in q_agg_histogram_log2(spark, SF_SMALL).collect()}
    cents = [
        round(float(r.o_totalprice) * 100)
        for r in table(spark, SF_SMALL, "orders").select("o_totalprice").collect()
        if r.o_totalprice > 0
    ]
    ref = Counter(c.bit_length() - 1 for c in cents)
    assert {b: r.n for b, r in got.items()} == dict(ref)
    tot = len(cents)
    for b, r in got.items():
        assert 2 ** b <= r.min_cents <= r.max_cents < 2 ** (b + 1)
        assert abs(r.share - r.n / tot) < 1e-5


def test_revenue_decomp_telescopes(spark):
    from spark_clustering_spark.operators.olap import q_olap_revenue_decomp

    r = q_olap_revenue_decomp(spark, SF_SMALL).collect()[0]
    assert r.n_common_parts > 0
    # the volume + price effects telescope to exactly the common-part
    # revenue delta (up to the 2dp quantization of the three outputs)
    assert abs((r.volume_effect + r.price_effect) - r.delta_common) < 0.5
    assert r.new_parts_rev >= 0.0 and r.lost_parts_rev >= 0.0
