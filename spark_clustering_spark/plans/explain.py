"""Physical-plan inspection helpers.

The scale contract (SURVEY.md §4) is enforced here, not hoped for:
filters must reach the parquet scan as PushedFilters, projections must
prune ReadSchema, small-side joins must be BroadcastHashJoin, and
aggregations must plan the partial/final HashAggregate pair. The test
suite (tests/test_plans.py) asserts these properties on the declared
queries so a regression in plan shape fails CI like a wrong result
would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached a parquet scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) parquet scan."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]


def has_node(df: DataFrame, node: str) -> bool:
    return node in formatted_plan(df)


def count_node(df: DataFrame, node: str) -> int:
    return formatted_plan(df).count(node)


def num_shuffles(df: DataFrame) -> int:
    return count_node(df, "Exchange")


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions — wider spans = more fused."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))
