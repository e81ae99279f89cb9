"""Global-window regression gate (VERDICT r5 task 7): every declared
query whose plan contains an unpartitioned window must be in
bench.WINDOW_ALLOWLIST with a bounded-input reason; a new global
window over data-proportional input fails here instead of hiding in
the bench tail's WindowExec warnings."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.mark.slow
def test_global_windows_are_allowlisted(spark):
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    import __spark_entry__ as e
    from window_audit import global_windows_in_plan

    from bench import WINDOW_ALLOWLIST

    flagged = set()
    for name, fn in sorted(e.queries().items()):
        if name.startswith("fit_"):
            continue
        try:
            # optimizedPlan: constant partition keys fold away there,
            # exposing truly-global windows the analyzed plan hides
            # (ADVICE r6)
            plan = (
                fn(spark, SF_SMALL)._jdf.queryExecution().optimizedPlan().toString()
            )
        except Exception:
            continue
        if global_windows_in_plan(plan):
            flagged.add(name)
    assert flagged <= set(WINDOW_ALLOWLIST), (
        f"NEW global-window queries (bound the input or partition the "
        f"window): {sorted(flagged - set(WINDOW_ALLOWLIST))}"
    )
    stale = set(WINDOW_ALLOWLIST) - flagged
    assert not stale, f"allowlist entries no longer global: {sorted(stale)}"
