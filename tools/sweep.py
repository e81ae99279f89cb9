"""Crash-isolated full-inventory parity sweep.

Round 9's single-session sf10 sweep died when one key
(q_join_nullsafe's ~6B-row full-output compare) OOMed the comparator
JVM — every later key in that session was recorded as a cascade
"spark error" (the since-purged PARITY_r9_sf10_mainA2-A5). This
wrapper runs tools/parity.py in SUBPROCESS CHUNKS so a fatal JVM
death costs one key, not the rest of the inventory:

- keys are split into chunks of --chunk (default 8); each chunk runs
  in a fresh ``python tools/parity.py`` subprocess with --max-rows,
  so oversized outputs route through in-engine aggregate parity
  instead of driver materialization;
- parity.py flushes its JSON after every key, so when a chunk's
  process dies the completed keys are salvaged and the un-recorded
  remainder is retried ONE KEY PER SUBPROCESS; a key that kills its
  own dedicated process is recorded as status "crash";
- a per-subprocess --timeout (default 5400 s) turns a hang into a
  "timeout" record instead of a stalled sweep;
- the merged output is flushed after every chunk, and the sweep is
  RESUMABLE: keys already carrying a record in --json are skipped on
  restart (pass --retry-errors to re-run crash/timeout/error keys).

Usage:
  python tools/sweep.py --sf /root/repo/testdata_sf10 \
      --json PARITY_r10_sf10_main.json [--chunk 8] \
      [--max-rows 2000000] [--max-result 8g] [--timeout 5400] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

# fail records worth re-running after a harness fix (vs a real value
# mismatch, which re-running won't change). "duckdb error" is here
# because oracle-side OOM / spill-disk-full is environmental (ADVICE
# r10): a genuine value mismatch records as "agg mismatch" or a value
# diff, never as "duckdb error", so retrying these stays safe.
_TRANSIENT_ERRS = ("spark error", "agg error", "crash", "timeout", "duckdb error")

# keys whose output is quadratic in sf (full materialization is known
# infeasible at sf>=1): forced straight onto the aggregate contract in
# their own single-key subprocess, skipping even the limit-probe
AGG_FORCE = {"q_join_nullsafe", "q_join_theta_range"}


def _load(path: Path) -> dict:
    if path.exists():
        return json.loads(path.read_text())
    return {"sf": None, "queries": {}}


def _counts(queries: dict) -> dict:
    c = {"n_pass": 0, "n_fail": 0, "n_rows_only": 0}
    for v in queries.values():
        s = v.get("status")
        if s in ("pass", "agg_pass"):
            c["n_pass"] += 1
        elif s == "rows_only":
            c["n_rows_only"] += 1
        else:
            c["n_fail"] += 1
    return c


def _run_chunk(names: list[str], args, out: dict, agg: bool = False):
    """Run one parity subprocess over ``names``; merge whatever it
    recorded into ``out``; return the keys it did NOT record."""
    with tempfile.NamedTemporaryFile(
        suffix=".json", prefix="sweep_chunk_", delete=False
    ) as tf:
        tmp = Path(tf.name)
    cmd = [
        sys.executable,
        str(_REPO / "tools" / "parity.py"),
        "--sf", args.sf,
        "--json", str(tmp),
        "--max-rows", str(args.max_rows),
    ]
    if agg:
        cmd += ["--agg"]
    if args.max_result:
        cmd += ["--max-result", args.max_result]
    cmd += names
    t0 = time.time()
    timed_out = False
    try:
        proc = subprocess.run(
            cmd,
            timeout=args.timeout,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        rc = proc.returncode
        tail = "\n".join(proc.stdout.splitlines()[-30:])
    except subprocess.TimeoutExpired as e:
        timed_out = True
        rc = -1
        stdout = e.stdout or b""
        if isinstance(stdout, bytes):
            stdout = stdout.decode(errors="replace")
        tail = "\n".join(stdout.splitlines()[-30:])
    # keep every subprocess's full output for post-hoc diagnosis (the
    # per-key tracebacks live only here)
    logdir = Path("/tmp/sweep_logs")
    logdir.mkdir(exist_ok=True)
    (logdir / f"{names[0]}_{int(t0)}.log").write_text(tail if timed_out else proc.stdout)
    got: dict = {}
    try:
        got = json.loads(tmp.read_text()).get("queries", {})
    except Exception:
        pass
    tmp.unlink(missing_ok=True)
    for k, v in got.items():
        out[k] = v
    missing = [n for n in names if n not in got]
    status = "timeout" if timed_out else f"rc={rc}"
    print(
        f"  chunk[{names[0]}..{names[-1]}] {status} "
        f"{time.time()-t0:.0f}s: {len(got)} recorded, {len(missing)} missing",
        flush=True,
    )
    if missing and (timed_out or rc != 0) and len(names) > 1:
        # show the tail once per troubled chunk so the log explains itself
        print("  --- subprocess tail ---")
        print("  " + tail.replace("\n", "\n  "))
    return missing, timed_out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata_sf10")
    ap.add_argument("--json", required=True)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--max-rows", type=int, default=2_000_000)
    ap.add_argument("--max-result", default="8g")
    ap.add_argument("--timeout", type=int, default=5400)
    ap.add_argument(
        "--retry-errors",
        action="store_true",
        help="re-run keys whose existing record is a transient error "
        "(spark error / agg error / crash / timeout)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    all_names = sorted(entrymod.queries())
    names = args.names or all_names
    unknown = [n for n in names if n not in all_names]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    out_path = Path(args.json)
    state = _load(out_path)
    done = state["queries"]

    def _skip(n: str) -> bool:
        rec = done.get(n)
        if rec is None:
            return False
        if args.retry_errors and rec.get("err", "") in _TRANSIENT_ERRS:
            return False
        return True

    todo = [n for n in names if not _skip(n)]
    print(f"sweep: {len(todo)} to run, {len(names)-len(todo)} already recorded")

    def _flush():
        c = _counts(done)
        out_path.write_text(
            json.dumps(
                {"sf": args.sf, **c, "queries": dict(sorted(done.items()))},
                indent=1,
            )
        )

    # chunk plan: AGG_FORCE keys get their own single-key --agg
    # subprocess (quadratic output, heaviest by far); the rest chunk up
    chunks: list[tuple[list[str], bool]] = []
    acc: list[str] = []
    for n in todo:
        if n in AGG_FORCE:
            if acc:
                chunks.append((acc, False))
                acc = []
            chunks.append(([n], True))
        else:
            acc.append(n)
            if len(acc) == args.chunk:
                chunks.append((acc, False))
                acc = []
    if acc:
        chunks.append((acc, False))

    for chunk, agg in chunks:
        missing, _ = _run_chunk(chunk, args, done, agg=agg)
        _flush()
        # retry un-recorded keys one per fresh subprocess
        for n in missing:
            still, t_out = _run_chunk([n], args, done, agg=n in AGG_FORCE)
            if still:
                err = "timeout" if t_out else "crash"
                done[n] = {"status": "fail", "err": err}
                print(f"  {err.upper()} {n}: key killed its own dedicated process")
            _flush()

    c = _counts(done)
    print(
        f"\nsweep complete: {c['n_pass']} pass, {c['n_fail']} fail, "
        f"{c['n_rows_only']} rows-only -> {out_path}"
    )
    sys.exit(1 if c["n_fail"] else 0)


if __name__ == "__main__":
    main()
