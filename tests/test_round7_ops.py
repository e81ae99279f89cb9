"""Semantic invariants for the round-7 inventory additions — the
driver's oracle parity proves value equality; these pin the properties
a refactor could silently break while still hash-matching a similarly
refactored oracle."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def qs(spark):
    import __spark_entry__ as e

    return e.queries()


def test_coreset_size_weights_and_sensitivities(spark, qs):
    from spark_clustering_spark.pipeline.sampling import CORESET_M

    rows = qs["q_sample_coreset"](spark, SF_SMALL).collect()
    assert len(rows) == CORESET_M
    assert len({r["vec_id"] for r in rows}) == CORESET_M  # no replacement
    for r in rows:
        assert r["q"] > 0 and r["w"] > 0 and r["d2"] >= 0
        # w = 1/(M*q) up to the two roundings
        assert abs(r["w"] * CORESET_M * r["q"] - 1.0) < 1e-2, r


def test_coreset_weighted_mass_is_calibrated(spark, qs):
    """Σ w over the coreset estimates n (E[Σ 1/(M·q)] = n): a coarse
    calibration check that the sensitivity normalization is right."""
    from spark_clustering_spark.operators.clustering import points_df

    n = points_df(spark, SF_SMALL).count()
    rows = qs["q_sample_coreset"](spark, SF_SMALL).collect()
    mass = sum(r["w"] for r in rows)
    assert 0.3 * n < mass < 3.0 * n, (mass, n)


def test_hard_negatives_band_and_label_disagreement(spark, qs):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.similarity import HN_HI, HN_LO

    labels = {
        r["vec_id"]: r["label"]
        for r in table(spark, SF_SMALL, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    rows = qs["q_sim_hard_negatives"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert HN_LO <= r["rn"] <= HN_HI
        assert r["cand_label"] == labels[r["cand_id"]]
        assert r["cand_label"] != labels[r["probe_id"]]
        assert -1.0 - 1e-9 <= r["cos"] <= 1.0 + 1e-9
    # ranks are dense per probe: each probe contributes the full band
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], set()).add(r["rn"])
    for pid, rns in by_probe.items():
        assert rns == set(range(HN_LO, HN_HI + 1)), (pid, sorted(rns))


def test_survivorship_groups_are_real_dup_groups(spark, qs):
    from pyspark.sql import functions as F

    from spark_clustering_spark.io import table

    rows = qs["q_pipeline_survivorship"](spark, SF_SMALL).collect()
    assert rows
    d = table(spark, SF_SMALL, "documents")
    prefix = F.concat_ws(
        " ", F.slice(F.split(F.lower(F.col("text")), r"\s+"), 1, 10)
    )
    members = {}
    for r in d.select(
        F.md5(prefix.cast("binary")).alias("h"), "doc_id", "n_chars", "lang"
    ).collect():
        members.setdefault(r["h"], []).append(r)
    for r in rows:
        grp = members[r["h"]]
        assert r["n_members"] == len(grp) > 1
        assert r["canonical_doc_id"] == min(m["doc_id"] for m in grp)
        assert r["max_n_chars"] == max(m["n_chars"] for m in grp)
        longest = min(grp, key=lambda m: (-m["n_chars"], m["doc_id"]))
        assert r["survivor_lang"] == longest["lang"]


def test_residual_energy_partitions_the_corpus(spark, qs):
    from spark_clustering_spark.io import table
    from spark_clustering_spark.pipeline.similarity import ivf_nlist

    rows = qs["q_vec_residual_energy"](spark, SF_SMALL).collect()
    n_total = table(spark, SF_SMALL, "embeddings").count()
    assert 0 < len(rows) <= ivf_nlist(n_total)
    assert sum(r["n_vecs"] for r in rows) == n_total  # every vector listed once
    for r in rows:
        assert r["e_res"] >= 0 and r["e_tot"] > 0
        assert r["residual_ratio"] >= 0
        # nearest-centroid residual can't exceed the energy against the
        # zero vector's alternative... it CAN exceed 1 only if every
        # centroid is farther than the origin — not with trained means
        assert r["residual_ratio"] < 1.0, r


def test_kmv_shard_merge_mergeability_holds(spark, qs):
    """THE theorem the key audits: merged-of-shard-sketches equals the
    direct global sketch, and both estimates are within the standard
    KMV error envelope of the exact count."""
    rows = qs["q_agg_kmv_shard_merge"](spark, SF_SMALL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["merged_equals_direct"] is True
    assert r["kmv_direct"] == r["kmv_merged"]
    # ~1/sqrt(K) relative error envelope, generous factor
    assert abs(r["kmv_direct"] - r["n_exact"]) < 0.8 * r["n_exact"], r
