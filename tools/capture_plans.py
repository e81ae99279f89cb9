"""Capture .explain("formatted") output for named queries to files.

Optimization-round evidence tool: writes plans/<round>/<key>_<suffix>.txt
for every requested key so plan claims ("2 Exchange -> 1",
"SortMergeJoin -> BroadcastHashJoin") are reviewable without running
Spark.

Usage:
  python tools/capture_plans.py --out plans/r11 --suffix before \
      [--sf /root/testdata/sf0.1] key [key ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r11")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from spark_clustering_spark.session import get_spark

    spark = get_spark("capture_plans")
    qs = entrymod.queries()
    unknown = sorted(set(args.names) - set(qs))
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    out_dir = _REPO / args.out
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
