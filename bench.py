"""Benchmark harness — times every declared query at the bench scale.

Prints ONE compact JSON line (kept small so log tail windows never
truncate it mid-object):
  {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
   "queries": {5 slowest: sec}, "sf": 0.1, "n_queries": N,
   "detail": "BENCH_DETAIL.json"}
The full per-query timing map goes to BENCH_DETAIL.json next to this
script.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).

sf1 mode (VERDICT r6 task 4 — carry real-10x-data walls round over
round, not as one-off parity observations):
  python bench.py --sf /root/repo/testdata_sf1 --top 40 \
      --detail BENCH_r07_sf1.json
benches the N heaviest declared keys (ranked by the committed sf0.1
BENCH_DETAIL.json) plus every fit_* surface, same min-of-2/escalate-
on-2x-spread protocol and canary. The driver's no-arg invocation is
unchanged.

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


# Queries whose plans contain a GLOBAL (unpartitioned) window — the
# WindowExec warnings visible in the bench tail. Every entry is over a
# provably BOUNDED input (audited r5, re-derived mechanically by
# tools/window_audit.py in r6); a query appearing in the audit but NOT
# here is a regression introducing a real data-proportional global
# window (VERDICT r5 task 7).
WINDOW_ALLOWLIST = {
    "q_best_tracking": "iteration history: num_run*num_iter rows",
    "q_diag_key_skew": "top-k skewed keys after aggregation",
    "q_join_cdf_lookup": "<=P-member roulette CDF table",
    "q_ml_decision_stump": "distinct candidate thresholds (<=50 quantities)",
    "q_ml_gains_curve": "decile curve: percentile grid rows",
    "q_olap_survival": "KM risk set: distinct day series",
    "q_pipeline_dataset_card_kmv": "top-level KMV merge: <=n_langs*K sketch rows",
    "q_roulette_cdf": "<=P-member population fitness table",
    "q_sample_reservoir": "top-k reservoir winners",
    "q_ts_anomaly": "distinct day series",
    "q_ts_changepoint": "distinct day series",
    "q_ts_gapfill": "distinct day grid",
    "q_ts_peaks": "distinct day series",
    "q_ts_rolling_median": "distinct day series",
}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", help="override SPARK_GRAFT_SF_DIR")
    ap.add_argument(
        "--top",
        type=int,
        help="bench only the N heaviest keys (by the committed sf0.1 "
        "BENCH_DETAIL.json) plus every fit_* surface",
    )
    ap.add_argument(
        "--detail",
        default="BENCH_DETAIL.json",
        help="per-query detail output file (relative to the repo root)",
    )
    ap.add_argument(
        "--keys",
        help="bench only this comma-separated key list (exact names). "
        "Unlike --top, nothing else is added — used for scale tiers "
        "(sf10) where the top-N ranking would pull in keys whose cost "
        "is OUTPUT volume (e.g. q_join_theta_range's quadratic pair "
        "stream), which measures the sink, not the engine",
    )
    args = ap.parse_args()
    if args.keys and args.top:
        # the if/elif below would silently ignore --top (ADVICE r8)
        raise SystemExit("--keys and --top are mutually exclusive")
    if args.keys and args.detail == "BENCH_DETAIL.json":
        raise SystemExit("--keys requires an explicit --detail name")
    if args.top and args.detail == "BENCH_DETAIL.json":
        # --top ranks queries FROM the committed BENCH_DETAIL.json;
        # letting it also write there would overwrite the full ranking
        # artifact with the N-key subset and silently corrupt every
        # subsequent --top run (ADVICE r7). Derive a distinct name.
        args.detail = f"BENCH_DETAIL_top{args.top}.json"
        print(
            f"# --top without --detail: writing {args.detail} to keep "
            "the full ranking artifact intact",
            file=sys.stderr,
        )

    sf_dir = args.sf or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod
    from spark_clustering_spark.session import get_spark

    spark = get_spark("bench")
    # preamble conf check (VERDICT r11 task 6; NOT in any timed path):
    # the codegen class cache is a static conf — if a pre-existing
    # session swallowed it, every re-execution pays Janino
    # recompilation and the whole run is measuring the wrong engine.
    # Surface the effective value so the detail artifact's reader can
    # tell (get_spark also warns on a mismatch).
    _cg = spark.conf.get("spark.sql.codegen.cache.maxEntries", "unknown")
    print(f"# codegen.cache.maxEntries={_cg}", file=sys.stderr)
    qs = entrymod.queries()
    if args.keys:
        wanted = [k.strip() for k in args.keys.split(",") if k.strip()]
        unknown = sorted(set(wanted) - set(qs))
        if unknown:
            raise SystemExit(f"--keys not in registry: {unknown}")
        qs = {n: qs[n] for n in wanted}
    elif args.top:
        ranked = json.loads((_REPO / "BENCH_DETAIL.json").read_text())[
            "queries"
        ]
        heavy = sorted(
            (n for n in qs if not n.startswith("fit_")),
            key=lambda n: -ranked.get(n, 0.0),
        )[: args.top]
        qs = {n: qs[n] for n in qs if n in set(heavy) or n.startswith("fit_")}

    # warmup: JVM + codegen + parquet footer caches (from the full
    # registry — --top mode may have filtered the warmup key out)
    entrymod.queries()["q_agg_hash"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warmup 2: spin up the Arrow Python workers (spark.python.worker.reuse
    # keeps them alive), so the first Pandas-kernel query — alphabetically
    # fit_gka — isn't charged the one-time worker fork/import cost
    def _warm_kernel(batches):
        # touch numpy + BLAS inside the worker so the heavy imports and
        # thread-pool init happen here, not inside the first fit kernel
        import numpy as np

        _ = np.ones((8, 8)) @ np.ones((8, 8))
        yield from batches

    n_workers = max(int(spark.sparkContext.defaultParallelism), 8)
    spark.range(n_workers * 4, numPartitions=n_workers).mapInPandas(
        _warm_kernel, "id bigint"
    ).write.format("noop").mode("overwrite").save()

    # min of 2 executions per query, escalating to 3 when the two
    # samples disagree by more than 2x: this host shows episodic
    # multi-second steal bursts, and when BOTH of two samples land in a
    # burst the min still misreports a query 3-5x (documented in
    # PERF.md — q_join_anti "benched" 3.1 s vs 0.2 s steady state). A
    # >2x spread between samples is the burst signature, so only then
    # is a third sample worth its cost. The min is the steady-state
    # number — the one that actually scales to cluster sizing.
    # The two samples are INTERLEAVED ACROSS FULL PASSES over the key
    # list (pass 2 rotated by half), not run back-to-back: a steal
    # burst lasts seconds while a pass lasts minutes, so correlated
    # contention can no longer land on both samples of the same key —
    # round 9's driver run showed 13x graph-key walls that min-of-2
    # back-to-back could not distinguish from a regression (VERDICT r9
    # task 6). Escalation reruns happen in a final pass.
    # Fixed scan-only canary, measured first / between passes / last:
    # identical work each time, so its spread (max/min) is a pure
    # host-contention gauge — it lets a reader of BENCH.json tell a
    # steal episode from a plan regression without re-running anything
    # (VERDICT r4 task 3).
    def _canary() -> float:
        t0 = time.time()
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).agg(
            {"o_totalprice": "sum"}
        ).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    canary_runs: list[float] = [_canary()]

    names = sorted(qs)
    runs_by_key: dict[str, list[float]] = {n: [] for n in names}
    errored: set[str] = set()
    # exception forensics (VERDICT r10 task 6): round 10's driver run
    # recorded three keys as a bare -1.0 with no cause; all three passed
    # full parity on re-run. Record the exception text so a transient is
    # distinguishable from a real break, and retry errored keys once at
    # end-of-run — a host-noise casualty then shows as error→ok.
    error_texts: dict[str, str] = {}

    def _run_once(name: str) -> None:
        try:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs_by_key[name].append(round(time.time() - t0, 3))
        except Exception as ex:  # keep the harness alive; surface it
            errored.add(name)
            error_texts[name] = f"{type(ex).__name__}: {str(ex)[:500]}"
            print(f"# bench error {name}: {ex}", file=sys.stderr)

    half = len(names) // 2
    for order in (names, names[half:] + names[:half]):
        for name in order:
            if name not in errored:
                _run_once(name)
        canary_runs.append(_canary())
    # escalation pass: a >2x spread between the two (pass-separated)
    # samples is the burst signature — only then buy a third
    for name in names:
        runs = runs_by_key[name]
        if name not in errored and len(runs) == 2 and max(runs) > 2 * max(
            min(runs), 0.05
        ):
            _run_once(name)
    # end-of-run retry for errored keys: one fresh attempt after the
    # whole inventory has run (transient host/JVM pressure has passed by
    # then). A success clears the error; the original exception text is
    # kept in error_detail with recovered=true.
    recovered: list[str] = []
    for name in sorted(errored):
        errored.discard(name)
        _run_once(name)
        if runs_by_key[name]:
            recovered.append(name)
        else:
            errored.add(name)
    canary_runs.append(_canary())

    timings: dict[str, float] = {
        n: (min(r) if r and n not in errored else -1.0)
        for n, r in runs_by_key.items()
    }
    samples: dict[str, int] = {n: len(r) for n, r in runs_by_key.items()}

    # fit_gka_ref_config (r6) and fit_pso_ref_config (r8) — the two
    # reference-README-scale configs — are DECLARED keys and bench
    # through the normal inventory path above.

    canary_spread = round(max(canary_runs) / max(min(canary_runs), 1e-9), 3)

    # headline total covers the declared inventory only
    total = round(
        sum(t for n, t in timings.items() if t >= 0 and n in qs), 3
    )
    detail_path = _REPO / args.detail
    detail_path.write_text(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "samples": samples,
                "canary_runs": canary_runs,
                "canary_spread": canary_spread,
                "escalated": sorted(n for n, v in samples.items() if v > 2),
                "error_detail": {
                    n: {"exc": t, "recovered": n in recovered}
                    for n, t in sorted(error_texts.items())
                },
                "recovered": sorted(recovered),
                "global_window_allowlist": WINDOW_ALLOWLIST,
                "sf": sf,
            },
            indent=1,
            sort_keys=True,
        )
    )
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "sf": sf,
                "n_queries": len(timings),
                "canary_spread": canary_spread,
                "protocol": "interleaved_min_of_2_escalate_3_on_2x_spread",
                "n_escalated": sum(1 for v in samples.values() if v > 2),
                "escalated": sorted(n for n, v in samples.items() if v > 2),
                "errors": sorted(n for n, t in timings.items() if t < 0),
                "recovered": sorted(recovered),
                "detail": detail_path.name,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
