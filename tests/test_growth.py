"""Growth linearity gate (VERDICT r5 task 6): the heaviest declared
queries must stay within their wall-ratio budget on REAL 10x data
growth (sf0.01 -> sf0.1), so quadratic regressions fail CI instead of
waiting for someone to run a script."""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_heavy_queries_grow_linearly():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from growth import run_growth

    rows = run_growth(runs=2)
    over = [r for r in rows if not r["ok"]]
    assert not over, f"superlinear growth: {over}"
