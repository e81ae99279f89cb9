"""Semantic invariants for the round-8 inventory additions
(q_graph_label_prop, q_pipeline_dataset_card) — oracle parity proves
value equality; these pin the properties a refactor could silently
break while still hash-matching a similarly refactored oracle."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def qs(spark):
    import __spark_entry__ as e

    return e.queries()


def test_label_prop_round_structure_and_monotonicity(spark, qs):
    from pyspark.sql import functions as F

    from spark_clustering_spark.operators.graph import (
        LP_ROUNDS,
        LP_SEED_MOD,
        basket_edges,
    )

    rows = qs["q_graph_label_prop"](spark, SF_SMALL).collect()
    rounds = {r["round"] for r in rows}
    assert rounds <= set(range(LP_ROUNDS + 1))
    assert 0 in rounds  # the seed census is always present
    assert all(r["n_assigned"] > 0 for r in rows)  # censuses never pad zeros

    # round-0 total == seed nodes actually present in the graph
    e = basket_edges(spark, SF_SMALL, cap=5)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    n_seeds = nodes.filter(F.col("node") % LP_SEED_MOD == 0).count()
    assert sum(r["n_assigned"] for r in rows if r["round"] == 0) == n_seeds

    # hard clamping: labels only ever accumulate, so the total assigned
    # across ALL rounds can never exceed the node count
    assert sum(r["n_assigned"] for r in rows) <= nodes.count()


def test_label_prop_labels_are_brands_and_deterministic(spark, qs):
    from spark_clustering_spark.io import table

    brands = {
        r["p_brand"]
        for r in table(spark, SF_SMALL, "part").select("p_brand").distinct().collect()
    }
    a = sorted(map(tuple, qs["q_graph_label_prop"](spark, SF_SMALL).collect()))
    assert {lbl for _, lbl, _ in a} <= brands
    b = sorted(map(tuple, qs["q_graph_label_prop"](spark, SF_SMALL).collect()))
    assert a == b  # integer votes + min-label tiebreak: no run-to-run drift


def test_dataset_card_rollup_structure(spark, qs):
    from spark_clustering_spark.io import table

    rows = qs["q_pipeline_dataset_card"](spark, SF_SMALL).collect()
    d = table(spark, SF_SMALL, "documents")
    groups = {
        (r["lang"], r["source"])
        for r in d.select("lang", "source").distinct().collect()
    }
    langs = {g[0] for g in groups}
    # ROLLUP = finest + per-lang + grand total, exactly once each
    assert len(rows) == len(groups) + len(langs) + 1

    total = [r for r in rows if r["lang"] is None and r["source"] is None]
    assert len(total) == 1
    assert total[0]["n_docs"] == d.count()

    for r in rows:
        assert 0 < r["n_unique_texts"] <= r["n_docs"]
        assert 0.0 <= r["dup_rate"] < 1.0
        assert r["n_tokens"] > 0 and r["n_chars"] > 0


def test_dataset_card_levels_are_additive(spark, qs):
    """Additive metrics re-aggregate exactly across rollup levels —
    the property that lets a 100 TB run compute the finest level once
    and derive the coarser card rows without a second scan."""
    rows = qs["q_pipeline_dataset_card"](spark, SF_SMALL).collect()
    finest = [r for r in rows if r["lang"] is not None and r["source"] is not None]
    per_lang = {r["lang"]: r for r in rows if r["lang"] is not None and r["source"] is None}
    total = next(r for r in rows if r["lang"] is None and r["source"] is None)
    for col in ("n_docs", "n_tokens", "n_chars"):
        assert sum(r[col] for r in finest) == total[col]
        for lang, lr in per_lang.items():
            assert sum(r[col] for r in finest if r["lang"] == lang) == lr[col]
    # distinct counts are NOT additive (cross-source duplicates):
    # subadditivity is the sanity bound
    for lang, lr in per_lang.items():
        assert lr["n_unique_texts"] <= sum(
            r["n_unique_texts"] for r in finest if r["lang"] == lang
        )
