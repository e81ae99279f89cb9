"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the declared operator inventory (SURVEY.md §2B)
from the package registry. See spark_clustering_spark/ for the engine.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from spark_clustering_spark import registry  # noqa: E402

registry.load_all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from spark_clustering_spark.operators.aggregates import q_agg_hash

    return q_agg_hash(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all_queries()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.load_all_queries()
    return dict(registry.ORACLE)
