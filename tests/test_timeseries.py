"""Semantic invariants for the funnel / retention / TF-IDF / CDC
operators (value parity runs through tools/parity.py and the driver's
oracle check; these pin the invariants a hash can't express)."""

from __future__ import annotations

import __spark_entry__ as e
from tests.conftest import SF_SMALL


class TestFunnel:
    def test_funnel_stages_are_monotone(self, spark):
        """Each funnel stage can only lose users, never gain them."""
        row = e.queries()["q_ts_funnel"](spark, SF_SMALL).collect()[0]
        assert row["n_view"] >= row["n_click_after_view"]
        assert row["n_click_after_view"] >= row["n_purchase_after_click"]
        assert row["n_view"] > 0


class TestRetention:
    def test_week_zero_dominates_every_cohort(self, spark):
        """Every user is active in their own cohort week, so offset 0
        is the max count per cohort; offsets are non-negative."""
        rows = e.queries()["q_ts_retention"](spark, SF_SMALL).collect()
        assert rows
        by_cohort: dict[int, dict[int, int]] = {}
        for r in rows:
            assert r["week_offset"] >= 0
            by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r[
                "n_users"
            ]
        for offs in by_cohort.values():
            assert 0 in offs
            assert offs[0] == max(offs.values())


class TestTfidf:
    def test_topk_shape_and_nonnegative(self, spark):
        """At most 3 ranked terms per doc, ranks dense from 1, and
        tf*ln(N/df) is non-negative (df <= N always)."""
        rows = e.queries()["q_text_tfidf"](spark, SF_SMALL).collect()
        per_doc: dict[int, list[int]] = {}
        for r in rows:
            assert r["tfidf"] >= 0.0
            per_doc.setdefault(r["doc_id"], []).append(r["rnk"])
        for rnks in per_doc.values():
            assert sorted(rnks) == list(range(1, len(rnks) + 1))
            assert len(rnks) <= 3


class TestCdcDiff:
    def test_change_types_partition_the_key_mutations(self, spark):
        """Inserts are exactly the %11==3 keys surviving v2's delete
        filter; deletes the %13==5 keys present in v1; updates carry
        old != new status."""
        rows = e.queries()["q_cdc_snapshot_diff"](spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            k = r["o_orderkey"]
            if r["change_type"] == "insert":
                assert k % 11 == 3 and k % 13 != 5
                assert r["old_status"] is None
            elif r["change_type"] == "delete":
                assert k % 13 == 5 and k % 11 != 3
                assert r["new_status"] is None
            else:
                assert r["change_type"] == "update"
                assert r["old_status"] != r["new_status"]
                assert r["new_status"] == "X"


def test_concurrency_sweep_invariants(spark):
    """Concurrency is non-negative everywhere, returns to zero at the
    end, and its peak equals a brute-force interval-overlap count."""
    from tests.conftest import SF_SMALL
    import __spark_entry__ as e

    rows = sorted(
        e.queries()["q_ts_concurrency"](spark, SF_SMALL).collect(),
        key=lambda r: (r["t_us"], r["delta"]),
    )
    assert all(r["concurrent"] >= 0 for r in rows)
    assert rows[-1]["concurrent"] == 0
    assert sum(r["delta"] for r in rows) == 0
    peak = max(r["concurrent"] for r in rows)
    # brute force: reconstruct intervals from the +1 rows and their
    # matching -1 rows, then count overlaps at each start point
    starts = [r["t_us"] for r in rows if r["delta"] == 1]
    ends = sorted(r["t_us"] for r in rows if r["delta"] == -1)
    import bisect

    brute = 0
    sorted_starts = sorted(starts)
    for s in sorted_starts:
        opened = bisect.bisect_right(sorted_starts, s)
        closed = bisect.bisect_right(ends, s)  # end==start closes first
        brute = max(brute, opened - closed)
    assert peak == brute
