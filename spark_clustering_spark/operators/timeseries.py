"""Time-series operators over the events table (SURVEY.md §2B
extensions): batch sessionization and gap-filled resampling — the two
patterns every event-log pipeline needs alongside the streaming
variants in streaming/windows.py.

Determinism notes: all gap/bucket math happens on integer microseconds
(Spark ``unix_micros`` ≡ DuckDB ``epoch_us`` — both engines read the
TIMESTAMP(NANOS) parquet with ns→us truncation, see io.table), so no
float time arithmetic can diverge; emitted floats go through the
detagg decimal pivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_clustering_spark.functions.detagg import dround, dsum, sql_dround, sql_dsum
from spark_clustering_spark.io import table
from spark_clustering_spark.registry import query

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap
HOUR_US = 3_600 * 1_000_000


@query(
    "q_window_sessionize",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts_us, value,
             CASE WHEN lag(ts_us) OVER w IS NULL
                    OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sess AS (
      SELECT user_id, ts_us, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::INT
               AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx, count(*) AS n_events,
           min(ts_us) AS start_us, max(ts_us) AS end_us,
           {sql_dsum('value', 'sum_value')}
    FROM sess GROUP BY user_id, session_idx
    """,
)
def q_window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per user, a new session starts after a
    30-minute inactivity gap; sessions are numbered by a running sum of
    the new-session flags. Scale shape: one hash shuffle on user_id
    (the window and the final aggregate share it), no global sort."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lag_us = F.lag("ts_us").over(w)
    is_new = F.when(
        lag_us.isNull() | (F.col("ts_us") - lag_us > SESSION_GAP_US), 1
    ).otherwise(0)
    sess = e.withColumn("is_new", is_new).withColumn(
        "session_idx", F.sum("is_new").over(w_run).cast("int")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        dsum("value", "sum_value"),
    )


@query(
    "q_ts_gapfill",
    oracle=f"""
    WITH e AS (
      SELECT epoch_us(ts) // {HOUR_US} AS hour_id, value FROM events
    ),
    hourly AS (
      SELECT hour_id, count(*) AS n_events,
             {sql_dround(f"cast(sum(cast(value AS DECIMAL(38,8))) AS DOUBLE) / count(*)")} AS avg_v
      FROM e GROUP BY hour_id
    ),
    b AS (SELECT min(hour_id) AS lo, max(hour_id) AS hi FROM hourly),
    hours AS (SELECT unnest(generate_series(lo, hi)) AS hour_id FROM b)
    SELECT h.hour_id,
           coalesce(n_events, 0) AS n_events,
           last_value(avg_v IGNORE NULLS) OVER (
             ORDER BY h.hour_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_v_ffill
    FROM hours h LEFT JOIN hourly USING (hour_id)
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample of the event stream: generate the
    full hour range between the observed min and max buckets, left-join
    the hourly aggregates, fill missing counts with 0 and forward-fill
    the hourly average (last non-null).

    Scale shape: the hour range is derived from a 1-row aggregate and
    exploded — never collected to the driver; the joined series has one
    row per hour of wall-clock coverage (small by construction — time
    ranges grow far slower than data), so the final ordered ffill
    window over it is bounded state, not a data-sized sort."""
    e = table(spark, sf_dir, "events").select(
        F.expr(f"unix_micros(ts) div {HOUR_US}").alias("hour_id"), "value"
    )
    from spark_clustering_spark.functions.detagg import DEC

    hourly = e.groupBy("hour_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dround(
            F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1))
        ).alias("avg_v"),
    )
    bounds = hourly.agg(F.min("hour_id").alias("lo"), F.max("hour_id").alias("hi"))
    hours = bounds.select(F.explode(F.sequence("lo", "hi")).alias("hour_id"))
    joined = hours.join(hourly, "hour_id", "left")
    w_ff = Window.orderBy("hour_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "hour_id",
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        F.last("avg_v", ignorenulls=True).over(w_ff).alias("avg_v_ffill"),
    )
