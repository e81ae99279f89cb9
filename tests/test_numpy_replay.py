"""Seeded numpy replays of the two hardest rows-only fit surfaces
(VERDICT r6 task 5): fit_gka and fit_pso.

fit_kmeans_stream set the bar (exact replay against numpy AND MLlib,
tests/test_streaming.py); these tests give GKA and PSO the same
treatment: an independent driver-side numpy implementation of the full
generation/iteration math — init, kernel distance matrices, mutation
roulette, Q7/Q9 patches, selection, velocity/position updates — run on
the same fixture with the same seeds, asserted equal to fp tolerance
against the distributed kernel path. The replay recomputes everything
from the collected points; the only shared code is the LCG helper
(functions/rng.py), which is the seeded-draw CONTRACT, not the code
under test.

fp envelope: the engine accumulates partial sums in partition/collect
order and window-sums objectives through DECIMAL(28,8) (each distance
rounded to 8dp, then exact); the replay uses whole-array numpy sums and
np.round(·, 8). Differences are ~1e-12 relative — tolerances 1e-6
absolute / 1e-9 relative, far below any behavioral divergence.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _dm(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    # same expanded-dot-product identity as ml/kernels._dist_matrix so
    # BLAS produces bit-comparable distances
    sq = (V * V).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (V @ C.T)
    np.maximum(sq, 0.0, out=sq)
    return np.sqrt(sq)


def _collect_points(spark):
    from spark_clustering_spark.operators.clustering import points_df

    pts = sorted(
        (r.vec_id, np.array(list(r.vec), dtype=np.float64))
        for r in points_df(spark, SF).collect()
    )
    ids = np.array([i for i, _ in pts], dtype=np.int64)
    mat = np.stack([v for _, v in pts])
    return ids, mat


@pytest.mark.parametrize("reference_compat", [False, True])
def test_pso_matches_numpy_replay(spark, reference_compat):
    """Both velocity rules replayed: canonical inertia AND the Q2
    reference_compat flavor (pso.java:139-141 overwrites the inertia
    term, so V = social only)."""
    from spark_clustering_spark.ml.pso import fit_pso
    from spark_clustering_spark.operators.clustering import points_df

    k, P, iters, seed = 4, 6, 3, 7
    res = fit_pso(
        spark, points_df(spark, SF), k=k, num_particles=P,
        num_iter=iters, seed=seed, reference_compat=reference_compat,
    )

    ids, mat = _collect_points(spark)
    d = mat.shape[1]
    lo, hi = mat.min(axis=0), mat.max(axis=0)
    v_max = (hi - lo) / 100.0

    def ev(X):
        return np.array(
            [_dm(mat, X[p]).min(axis=1).sum() for p in range(P)]
        )

    rng = np.random.default_rng(seed)
    X = rng.uniform(lo, hi, size=(P, k, d))
    V = np.zeros((P, k, d))
    pbest = X.copy()
    pbest_obj = ev(X)
    g_idx = int(np.argmin(pbest_obj))
    gbest, gbest_obj = pbest[g_idx].copy(), float(pbest_obj[g_idx])

    c1 = c2 = 2.0
    w_max, w_min = 0.9, 0.4
    for it in range(iters):
        w_now = w_max - (w_max - w_min) * it / iters
        r1 = rng.random((P, k, d))
        r2 = rng.random((P, k, d))
        social = c1 * r1 * (pbest - X) + c2 * r2 * (gbest[None, :, :] - X)
        V = social if reference_compat else w_now * V + social
        V = np.clip(V, -v_max, v_max)
        X = X + V
        obj = ev(X)
        improved = obj < pbest_obj
        pbest[improved] = X[improved]
        pbest_obj[improved] = obj[improved]
        g_idx = int(np.argmin(pbest_obj))
        if pbest_obj[g_idx] < gbest_obj:
            gbest, gbest_obj = pbest[g_idx].copy(), float(pbest_obj[g_idx])

        h = res.history[it]
        assert h["iter"] == it
        np.testing.assert_allclose(
            np.array(h["objs"]), obj, rtol=1e-9, atol=1e-6
        )
        assert math.isclose(
            h["gbest"], gbest_obj, rel_tol=1e-9, abs_tol=1e-6
        )

    assert math.isclose(
        res.best_objective, gbest_obj, rel_tol=1e-9, abs_tol=1e-6
    )
    np.testing.assert_allclose(res.gbest, gbest, rtol=1e-9, atol=1e-8)


def test_kmeans_matches_numpy_replay(spark):
    """Two lockstep Lloyd restarts × four iterations replayed: the
    seeded LCG init draw per run, nearest-center assignment (ties →
    lower cid), Q4 unsquared objectives measured against PRE-update
    centers (Q7), the Q1 empty-cluster reseed draw, the Q9 stale-center
    guard, and run-major best tracking."""
    from spark_clustering_spark.functions.rng import py_lcg_uniform
    from spark_clustering_spark.ml.kmeans import fit_kmeans
    from spark_clustering_spark.operators.clustering import points_df

    k, iters, runs, seed = 6, 4, 2, 42
    res = fit_kmeans(
        spark, points_df(spark, SF), k=k, num_iter=iters, num_run=runs,
        seed=seed,
    )

    ids, mat = _collect_points(spark)
    n = len(ids)

    def lcg_pick(draw_seed: int, count: int) -> np.ndarray:
        u = np.array([py_lcg_uniform(int(i), draw_seed) for i in ids])
        return np.lexsort((ids, u))[:count]  # (u, vec_id) order

    centers = {
        run: mat[lcg_pick(seed + 1000 * run, k)].copy()
        for run in range(runs)
    }
    hist = []
    for it in range(iters):
        stats = {}
        for run in range(runs):
            D = _dm(mat, centers[run])
            lab = D.argmin(axis=1)
            md = D[np.arange(n), lab]
            stats[run] = (lab, md)
        n_needed = max(
            k - len(np.unique(stats[run][0])) for run in range(runs)
        )
        fresh = mat[lcg_pick(seed + 7000 + it, n_needed)] if n_needed else None
        for run in range(runs):
            lab, md = stats[run]
            obj = float(md.sum())
            obj_sq = float((md * md).sum())
            hist.append(
                {"run": run, "iter": it, "objective": obj,
                 "objective_sq": obj_sq}
            )
            empty = [c for c in range(k) if not (lab == c).any()]
            new_c = centers[run].copy()
            for c in range(k):
                sel = lab == c
                if sel.any():
                    new_c[c] = mat[sel].mean(axis=0)
            for j, c in enumerate(empty):
                new_c[c] = fresh[j]
            centers[run] = new_c

    # fit history is run-major; the replay loop is iter-major
    hist.sort(key=lambda h: (h["run"], h["iter"]))
    assert len(res.history) == len(hist)
    for got, exp in zip(res.history, hist):
        assert (got["run"], got["iter"]) == (exp["run"], exp["iter"])
        assert math.isclose(
            got["objective"], exp["objective"], rel_tol=1e-9, abs_tol=1e-6
        ), (got, exp)
        assert math.isclose(
            got["objective_sq"], exp["objective_sq"],
            rel_tol=1e-9, abs_tol=1e-6,
        )
    assert math.isclose(
        res.best_objective,
        min(h["objective"] for h in hist),
        rel_tol=1e-9, abs_tol=1e-6,
    )


def test_gmm_matches_numpy_replay(spark):
    """Three spherical-GMM EM iterations replayed: deterministic
    lowest-vec_id init, log-sum-exp responsibilities with the per-row
    max shift, weighted-sum M-step with the starved-component guard —
    asserted against the gmm_soft_stats kernel loop per iteration
    (loglik) and at the end (means, weights)."""
    from spark_clustering_spark.ml.gmm import fit_gmm
    from spark_clustering_spark.operators.clustering import points_df

    k, iters, sigma2 = 5, 3, 4.0
    res = fit_gmm(
        spark, points_df(spark, SF), k=k, num_iter=iters, sigma2=sigma2
    )

    ids, mat = _collect_points(spark)
    n = len(ids)
    means = mat[:k].copy()  # init: k lowest vec_ids
    weights = np.full(k, 1.0 / k)
    for it in range(iters):
        D = _dm(mat, means)
        with np.errstate(divide="ignore"):
            logw = np.log(weights)
        logL = logw[None, :] - (D * D) / (2.0 * sigma2)
        m = logL.max(axis=1)
        E = np.exp(logL - m[:, None])
        z = E.sum(axis=1)
        ll = float((m + np.log(z)).sum())
        R = E / z[:, None]
        rsum = R.sum(axis=0)
        WX = R.T @ mat
        assert math.isclose(
            res.logliks[it], ll, rel_tol=1e-9, abs_tol=1e-6
        ), (it, res.logliks[it], ll)
        means = np.array(
            [
                WX[c] / rsum[c] if rsum[c] > 1e-12 else means[c]
                for c in range(k)
            ]
        )
        weights = rsum / n

    np.testing.assert_allclose(
        np.array(res.means), means, rtol=1e-9, atol=1e-8
    )
    np.testing.assert_allclose(
        np.array(res.weights), weights, rtol=1e-9, atol=1e-10
    )


def test_gka_matches_numpy_replay(spark):
    """Two full GKA generations replayed: seeded init labels, KMO
    (member centers → argmin reassignment with the Q9 missing-center
    guard), the Cm-weighted roulette gene pick with first-interval-wins
    scan, the Q7 pre-mutation-centroid objective patch, best tracking,
    and the 1/obj roulette selection remap feeding generation 1."""
    from spark_clustering_spark.functions.rng import py_lcg_uniform
    from spark_clustering_spark.ml.gka import fit_gka
    from spark_clustering_spark.operators.clustering import points_df

    k, pop, gens, pm, cm, seed = 4, 6, 2, 0.6, 0.9, 11
    res = fit_gka(
        spark, points_df(spark, SF), k=k, pop=pop, num_gen=gens,
        pm=pm, cm=cm, seed=seed,
    )

    ids, mat = _collect_points(spark)
    n = len(ids)

    # _init_labels: label = floor(k * u(member*1000003 + vec_id))
    labels = np.zeros((pop, n), dtype=np.int64)
    for m in range(pop):
        key = m * 1_000_003 + ids
        u = ((key * 1103515245 + 12345 + seed) % 2**31) / float(2**31)
        labels[m] = np.floor(u * k).astype(np.int64)

    best, best_member = float("inf"), -1
    for gen in range(gens):
        u1 = {m: py_lcg_uniform(m * 7919 + gen, seed + 1) for m in range(pop)}
        mutating = [m for m in range(pop) if u1[m] < pm]
        u2 = {m: py_lcg_uniform(m * 104729 + gen, seed + 2) for m in mutating}
        u3 = {m: py_lcg_uniform(m * 1299709 + gen, seed + 3) for m in mutating}
        targets = {m: int(u3[m] * k) for m in mutating}

        objs = {}
        for m in range(pop):
            cids = np.unique(labels[m])
            C = np.stack([mat[labels[m] == c].mean(axis=0) for c in cids])
            D = _dm(mat, C)
            idx = D.argmin(axis=1)  # first min: lowest existing label
            new_lab = cids[idx]
            dist = D[np.arange(n), idx]
            objs[m] = float(np.round(dist, 8).sum())

            if m in targets:
                t = targets[m]
                tpos = int(np.searchsorted(cids, t))
                has_target = tpos < len(cids) and cids[tpos] == t
                # roulette pick over vec_id order (mat is vec_id-sorted)
                w = cm * dist.max() - dist
                cum = np.cumsum(w)
                hi = cum / cum[-1]
                lo_b = np.concatenate(([0.0], hi[:-1]))
                q = np.nonzero((u2[m] >= lo_b) & (u2[m] < hi))[0]
                if len(q):
                    i = int(q[0])
                    new_dist = D[i, tpos] if has_target else dist[i]
                    objs[m] += new_dist - dist[i]
                    new_lab = new_lab.copy()
                    new_lab[i] = t
            labels[m] = new_lab

        gen_best_m = min(objs, key=lambda m: (objs[m], m))
        if objs[gen_best_m] < best:
            best, best_member = objs[gen_best_m], gen_best_m

        h = res.history[gen]
        assert h["gen"] == gen
        assert set(h["objs"]) == set(range(pop))
        for m in range(pop):
            assert math.isclose(
                h["objs"][m], objs[m], rel_tol=1e-9, abs_tol=1e-6
            ), (gen, m, h["objs"][m], objs[m])
        assert math.isclose(h["best"], best, rel_tol=1e-9, abs_tol=1e-6)

        # selection (R10/Q8): 1/obj roulette in member order
        fits = [(m, 1.0 / objs[m]) for m in sorted(objs)]
        total = sum(f for _, f in fits)
        cdf, acc = [], 0.0
        for m, f in fits:
            acc += f / total
            cdf.append((m, acc))
        chosen = []
        for slot in range(pop):
            u = py_lcg_uniform(slot * 15485863 + gen, seed + 4)
            chosen.append(next((m for m, hi_ in cdf if u <= hi_), cdf[-1][0]))
        labels = labels[np.array(chosen)]

    assert res.best_member == best_member
    assert math.isclose(
        res.best_objective, best, rel_tol=1e-9, abs_tol=1e-6
    )
