"""Time individual declared keys solo (warm JVM, min-of-N, noop sink).

Optimization-round measurement helper (guide §1): isolates one key's
computation cost from the full-bench interleaving so a change's effect
is visible in seconds, not a 25-minute full run.

Usage:
  python tools/profile_keys.py [--sf DIR] [--n 2] key [key ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from spark_clustering_spark.session import get_spark

    spark = get_spark("profile_keys")
    qs = entrymod.queries()
    unknown = sorted(set(args.names) - set(qs))
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")

    # same warmups as bench.py: JVM/codegen + Arrow python workers
    qs["q_agg_hash"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def _warm_kernel(batches):
        import numpy as np

        _ = np.ones((8, 8)) @ np.ones((8, 8))
        yield from batches

    n_workers = max(int(spark.sparkContext.defaultParallelism), 8)
    spark.range(n_workers * 4, numPartitions=n_workers).mapInPandas(
        _warm_kernel, "id bigint"
    ).write.format("noop").mode("overwrite").save()

    for name in args.names:
        runs = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        print(f"PROFILE {name}: min={min(runs)} runs={runs}", flush=True)


if __name__ == "__main__":
    main()
