"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running engagement state: event count, value sum, and last
event time, emitted as an update row per user per micro-batch. This is
the pattern the built-in windows can't express — arbitrary user-defined
state evolving across micro-batches with timeout-based finalization —
and the seam where a 100 TB pipeline keys state by user across
executors (state store partitioned on the groupBy key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events BIGINT, sum_value DOUBLE, last_ts_epoch BIGINT"
OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, sum_value DOUBLE, last_ts_epoch BIGINT"
)


def _update_user_state(key, pdfs, state: GroupState):
    import pandas as pd

    (user_id,) = key
    n, s, last = (state.get if state.exists else (0, 0.0, 0))
    if state.exists:
        n, s, last = state.get
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max() // 1_000_000_000))
    state.update((n, s, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "last_ts_epoch": [last],
        }
    )


def user_engagement_stream(events_stream: DataFrame) -> DataFrame:
    """Wire the stateful operator onto a streaming events DataFrame."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_user_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events through the stateful operator; returns the final
    per-user state rows (last update per user wins)."""
    from pyspark.sql import functions as F

    from spark_clustering_spark.streaming.harness import (
        _read_stream,
        _run_to_completion,
        replay_dir,
    )

    replay = replay_dir(spark, sf_dir)
    src = _read_stream(spark, replay)
    out = user_engagement_stream(src.select("user_id", "ts", "value"))
    res = _run_to_completion(out, "update", f"engage_{id(src)}")
    # update mode emits one row per user per batch: keep the final state
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        res.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
