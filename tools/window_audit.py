"""Audit declared queries for GLOBAL (unpartitioned) window operators.

A Window with no PARTITION BY is a single-reducer funnel — fine over
provably bounded inputs (top-k results, iteration histories, ≤P-row
population tables, distinct-day series), fatal over data-proportional
ones. The r5 verdict audited every such site by hand; this tool makes
the audit mechanical: walk each declared query's ANALYZED plan for
``windowspecdefinition`` with an empty partition clause and report the
query names. bench.py embeds the allowlist (query -> bounded-reason)
in BENCH_DETAIL.json and flags any NEW global-window query as a
regression (VERDICT r5 task 7).

Usage: python tools/window_audit.py  [--sf DIR]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def global_windows_in_plan(plan: str) -> list[str]:
    """windowspecdefinition(part..., order..., frame) — a global window
    has no partition columns, i.e. the spec starts with the ordering
    expression list directly. Spark prints partition exprs first;
    detect specs whose argument list starts with an ORDER-direction
    expression ('x ASC NULLS FIRST' etc.) with no preceding plain
    partition expressions."""
    specs = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        depth, i = 1, m.end()
        while i < len(plan) and depth:
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                depth -= 1
            i += 1
        spec = plan[m.end() : i - 1]
        # split top-level args
        args, d, cur = [], 0, []
        for ch in spec:
            if ch == "(":
                d += 1
            elif ch == ")":
                d -= 1
            if ch == "," and d == 0:
                args.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if cur:
            args.append("".join(cur).strip())
        first = args[0] if args else ""
        if (
            re.search(r"\b(ASC|DESC) NULLS (FIRST|LAST)$", first)
            or first.startswith("specifiedwindowframe")
        ):
            specs.append(first)
            continue
        # a window partitioned only by LITERALS is global at runtime —
        # the optimizer folds the constant away into a true
        # single-partition WindowExec (ADVICE r6; the hazard behind
        # [[constant-partition-key-folds]]). Partition exprs are the
        # args before the first ORDER-direction arg; flag the spec if
        # every one of them is a bare literal.
        part = []
        for a in args:
            if (
                re.search(r"\b(ASC|DESC) NULLS (FIRST|LAST)$", a)
                or a.startswith("specifiedwindowframe")
            ):
                break
            part.append(a)
        if part and all(
            re.fullmatch(r"-?\d+(\.\d+)?[A-Za-z]*|\"[^\"]*\"|''|'[^']*'", p)
            for p in part
        ):
            specs.append(f"literal-partition: {', '.join(part)}")
    return specs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from spark_clustering_spark.session import get_spark

    spark = get_spark("window-audit")
    qs = entrymod.queries()
    flagged: dict[str, int] = {}
    for name in sorted(qs):
        if name.startswith("fit_"):
            continue  # iterative fits: audited via their kernel design
        try:
            df = qs[name](spark, args.sf)
            # optimizedPlan, not analyzed(): constant partition keys
            # survive analysis but fold away in optimization, leaving
            # a truly global WindowExec the analyzed-plan audit would
            # miss (ADVICE r6)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as ex:
            print(f"skip {name}: {type(ex).__name__}")
            continue
        g = global_windows_in_plan(plan)
        if g:
            flagged[name] = len(g)
            print(f"GLOBAL-WINDOW {name}: {len(g)} spec(s)")
    print("\nflagged:", sorted(flagged))


if __name__ == "__main__":
    main()
