"""Generate the committed CSV fixtures (FIXTURES.md §1; seed=42).

Run once: python tools/gen_fixtures.py
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "spark_clustering_spark", "fixtures")


def blobs(rng, centers, sigma, per):
    rows = []
    for c in centers:
        pts = rng.normal(loc=c, scale=sigma, size=(per, len(c)))
        rows.append(pts)
    return np.vstack(rows)


def write_csv(name, mat):
    path = os.path.join(OUT, name)
    with open(path, "w") as f:
        for row in mat:
            f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    print(f"wrote {path} ({mat.shape[0]}x{mat.shape[1]})")


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    # csv_tiny: 3 well-separated blobs of 4 points, 2-D (golden-checkable)
    write_csv(
        "csv_tiny.csv",
        blobs(rng, [(0.0, 0.0), (10.0, 10.0), (-10.0, 10.0)], 0.5, 4),
    )
    # csv_iris-like: 150x4, 3 blobs
    write_csv(
        "csv_iris_like.csv",
        blobs(rng, [(5.0, 3.4, 1.5, 0.2), (5.9, 2.8, 4.3, 1.3), (6.6, 3.0, 5.6, 2.0)], 0.35, 50),
    )
    # csv_degenerate: duplicate points; more clusters than distinct points
    dup = np.array([[1.0, 1.0, 1.0]] * 4 + [[2.0, 2.0, 2.0]] * 4)
    write_csv("csv_degenerate.csv", dup)


if __name__ == "__main__":
    main()
