"""Reference-parity CLI (R22 + R20 sink) + golden traces (SURVEY.md
§5.5): seeded runs on the committed csv_tiny fixture must reproduce
the committed objective traces."""

from __future__ import annotations

import os

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark_clustering_spark",
    "fixtures",
    "csv_tiny.csv",
)

# golden best_objectvalue traces, seed=42 (captured from a verified run;
# compared with tolerance to allow BLAS ulp differences across builds)
GOLDEN_KMEANS = [57.9642, 15.3904, 5.6081, 5.6081, 5.6081]
GOLDEN_GKA = [64.1237, 26.3083, 19.3791]
GOLDEN_PSO = [51.8231, 51.8231, 51.8231, 51.8231]


def _read_trace(path: str) -> tuple[list[float], str]:
    lines = open(path).read().strip().splitlines()
    assert lines[-1].endswith("ms"), "missing trailing total-ms line (R20)"
    vals = [float(ln.split(",")[1]) for ln in lines[:-1]]
    return vals, lines[-1]


def _run(args: list[str]) -> int:
    from spark_clustering_spark.cli import main

    return main(args)


def test_cli_kmeans_golden_trace(spark, tmp_path):
    out = str(tmp_path / "km.txt")
    assert _run(["kmeans", FIXTURE, "5", "3", out, "1"]) == 0
    vals, _ = _read_trace(out)
    assert len(vals) == 5
    for got, want in zip(vals, GOLDEN_KMEANS):
        assert abs(got - want) < 1e-2, (vals, GOLDEN_KMEANS)


def test_cli_gka_golden_trace(spark, tmp_path):
    out = str(tmp_path / "gka.txt")
    assert _run(["gka", FIXTURE, "3", "3", out, "1", "6", "0.6", "0.9"]) == 0
    vals, _ = _read_trace(out)
    for got, want in zip(vals, GOLDEN_GKA):
        assert abs(got - want) < 1e-2, (vals, GOLDEN_GKA)


def test_cli_pso_golden_trace(spark, tmp_path):
    out = str(tmp_path / "pso.txt")
    assert _run(
        ["pso", FIXTURE, "4", "3", out, "1", "6", "2", "2", "0.9", "0.4"]
    ) == 0
    vals, _ = _read_trace(out)
    for got, want in zip(vals, GOLDEN_PSO):
        assert abs(got - want) < 1e-2, (vals, GOLDEN_PSO)


def test_cli_reference_compat_flag(spark, tmp_path):
    """Q2: --reference-compat (inertia-overwrite PSO) is accepted and
    produces a well-formed R20 trace. (That the flag changes the swarm
    trajectory is asserted on richer data in test_clustering.py —
    best-objective traces can legitimately coincide on 12 points.)"""
    out_b = str(tmp_path / "b.txt")
    assert _run(
        ["pso", FIXTURE, "3", "3", out_b, "1", "4", "2", "2", "0.9", "0.4",
         "--reference-compat"]
    ) == 0
    vb, total = _read_trace(out_b)
    assert len(vb) == 3 and total.endswith("ms")
