"""Benchmark harness — times every declared query at the bench scale.

Prints ONE JSON line:
  {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).

Each query executes fully via the no-op sink (measures scan + compute +
shuffle, excludes driver-side result transfer). Timing starts after one
warmup query so JVM/codegen startup isn't charged to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod
    from spark_clustering_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warmup: JVM + codegen + parquet footer caches
    qs["q_agg_hash"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as ex:  # keep the harness alive; surface the failure
            timings[name] = -1.0
            print(f"# bench error {name}: {ex}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
