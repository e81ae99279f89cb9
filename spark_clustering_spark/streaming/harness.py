"""True Structured Streaming harness (SURVEY.md §5.6).

Replays the `events` table as a file-source stream in arrival order
(event_id), chunked so the watermark actually advances across
micro-batches, then runs the real streaming operators:

- ``stream_tumbling_counts``: withWatermark + 1h window aggregation
- ``stream_dedup``: dropDuplicatesWithinWatermark

Batch-equivalent queries in windows.py are the hash-checked surface;
this harness is where genuine late-data/watermark behavior is observed
(tests/test_streaming.py asserts the containment relations between the
streaming results and the strict batch emulations).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_clustering_spark.io import table

EVENT_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def write_replay_chunks(
    df: DataFrame, id_col: str, out: str, n_chunks: int
) -> None:
    """Write ``df`` as id-ranged single-file parquet chunks under
    ``out`` with strictly increasing mtimes (FileStreamSource orders by
    modification time, not path — stamping pins arrival order == chunk
    order).

    The per-chunk filter+coalesce(1) write jobs are INDEPENDENT, so
    they are submitted from a small driver thread pool (guide §2.6 —
    overlap independent jobs): serially, each job is one task (the
    coalesce) and the replay build runs single-threaded for n_chunks
    full passes; concurrently, the chunk writes back-fill the idle
    cores. Output files are byte-identical to the serial loop (same
    per-chunk plan, same single writer task per chunk); mtimes are
    stamped after ALL writes land, so completion order cannot leak
    into arrival order. ``df`` should be persisted by the caller — the
    max-id probe below populates the cache, so the concurrent chunk
    jobs read cached blocks instead of racing to recompute the scan."""
    max_id = df.agg(F.max(id_col).alias("m")).collect()[0]["m"]
    n = int(max_id) + 1
    chunk = max(1, n // n_chunks + (n % n_chunks > 0))

    def _write_one(ci_lo: tuple[int, int]) -> str:
        ci, lo = ci_lo
        cdir = os.path.join(out, f"chunk_{ci:04d}")
        (
            df.filter((F.col(id_col) >= lo) & (F.col(id_col) < lo + chunk))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(cdir)
        )
        return cdir

    from concurrent.futures import ThreadPoolExecutor

    jobs = list(enumerate(range(0, n, chunk)))
    with ThreadPoolExecutor(max_workers=min(len(jobs), 8)) as pool:
        dirs = list(pool.map(_write_one, jobs))
    base = time.time()
    for ci, cdir in enumerate(dirs):
        for root, _, files in os.walk(cdir):
            for f in files:
                os.utime(os.path.join(root, f), (base + ci, base + ci))


def replay_dir(spark: SparkSession, sf_dir: str, n_chunks: int = 8) -> str:
    """Materialize events as n_chunks parquet files in event_id order —
    a deterministic arrival-order replay source. Chunks are cut by
    event_id range and written distributed (only the 1-row max-id
    aggregate touches the driver), so the harness itself scales with
    the source instead of materializing it driver-side."""
    out = tempfile.mkdtemp(prefix="stream_replay_")
    ev = table(spark, sf_dir, "events").persist()
    write_replay_chunks(ev, "event_id", out, n_chunks)
    ev.unpersist()
    return out


def _read_stream(spark: SparkSession, replay: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(replay, "chunk_*"))
    )


def _run_to_completion(
    stream_df: DataFrame, output_mode: str, name: str, cleanup: str | None = None
) -> DataFrame:
    """Drain the stream into a memory sink; once drained, the replay
    dir (``cleanup``) is no longer read and is removed (ADVICE r5:
    harness tempdirs used to accumulate for the session lifetime)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    if cleanup:
        shutil.rmtree(cleanup, ignore_errors=True)
    return spark.table(name)


def _drain(q, timeout: int = 300) -> bool:
    """awaitTermination with the slow-drain guard (ADVICE r6, applied
    to EVERY harness drain in r8 — the q_stream_upsert path had its
    own unguarded copy): if the drain exceeds the timeout, stop the
    query BEFORE the caller touches its source dir — deleting a live
    FileStreamSource's input turns a benign partial-result timeout
    into a stream failure. Returns whether the query terminated on
    its own."""
    terminated = q.awaitTermination(timeout)
    if not terminated:
        q.stop()
        q.awaitTermination(30)
    return terminated


def stream_tumbling_counts(
    spark: SparkSession, sf_dir: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Real streaming: withWatermark + tumbling 1h counts per type.
    Returns (win_start bigint epoch, event_type, n_events) — the final
    (append-mode) result after the availableNow replay drains."""
    replay = replay_dir(spark, sf_dir)
    src = _read_stream(spark, replay)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    res = _run_to_completion(agg, "append", f"tumbling_{id(src)}", cleanup=replay)
    return res.select(
        F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start"),
        "event_type",
        "n_events",
    )


def stream_to_parquet(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
) -> int:
    """Real streaming sink: replayed events → watermarked tumbling
    aggregation → append-mode parquet files with a checkpoint (the
    exactly-once contract surface: re-running with the same checkpoint
    must not duplicate output). Returns the number of rows written."""
    replay = replay_dir(spark, sf_dir)
    src = _read_stream(spark, replay)
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.read.parquet(out_dir).count()


def stream_dedup(
    spark: SparkSession, sf_dir: str, watermark: str = "30 minutes"
) -> DataFrame:
    """Real streaming dropDuplicatesWithinWatermark on
    (user_id, event_type): emits one row per key per watermark window."""
    replay = replay_dir(spark, sf_dir)
    src = _read_stream(spark, replay)
    dedup = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    res = _run_to_completion(dedup, "append", f"dedup_{id(src)}", cleanup=replay)
    return res.select("user_id", "event_type", "event_id", "ts")


def stream_stream_join(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Real stream-stream inner join: two watermarked streams off the
    same replay (views and clicks), joined on user_id with a 4-hour
    time-range condition — the state-store-backed operator behind
    q_stream_join. The range bound plus both watermarks lets Spark
    prune join state; append mode emits each matched pair once.
    Returns (view_id, click_id, user_id, gap_s)."""
    replay = replay_dir(spark, sf_dir)
    v = (
        _read_stream(spark, replay)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    c = (
        _read_stream(spark, replay)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    j = v.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 4 HOURS")),
    )
    res = _run_to_completion(j, "append", f"ssjoin_{id(j)}", cleanup=replay)
    return res.select(
        "view_id",
        "click_id",
        "user_id",
        (F.unix_timestamp("c_ts") - F.unix_timestamp("v_ts"))
        .cast("bigint")
        .alias("gap_s"),
    )


def stream_cluster_volume(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Real streaming twin of q_stream_cluster_volume: the timed
    centroid assignments replay as an 8-chunk file stream, and the
    per-cluster hourly volume aggregates with a watermark in append
    mode. The trained model (centroid table) is the static side — it
    is evaluated per micro-batch exactly as a deployed classifier
    would. Returns (win_start epoch, cluster_id, n_vectors)."""
    from spark_clustering_spark.operators.clustering import (
        assign,
        centroids_df,
        points_df,
    )

    pts = points_df(spark, sf_dir)
    timed = assign(pts, centroids_df(spark, sf_dir)).select(
        "vec_id",
        "cluster_id",
        F.timestamp_seconds(
            (F.col("vec_id") / 100).cast("bigint") * 3600
        ).alias("ts"),
    )
    out = tempfile.mkdtemp(prefix="cluster_replay_")
    # persist: the assign pipeline would otherwise recompute once per
    # chunk write plus once for the max-id probe (9 full jobs)
    timed = timed.persist()
    write_replay_chunks(timed, "vec_id", out, n_chunks=8)
    timed.unpersist()
    src = (
        spark.readStream.schema("vec_id BIGINT, cluster_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(out, "chunk_*"))
    )
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "cluster_id")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    res = _run_to_completion(agg, "append", f"clustervol_{id(src)}", cleanup=out)
    return res.select(
        F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start"),
        "cluster_id",
        "n_vectors",
    )


def stream_topk(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Real streaming leaderboard: the tumbling aggregate runs as a
    Structured Streaming query (complete mode — the stateful stage),
    and the per-window rank is applied downstream of the sink, exactly
    as q_stream_topk's docstring prescribes (rank is not stateful, so
    it never enters the streaming plan). Returns
    (win_start, event_type, n_events, rn<=k) after the availableNow
    replay drains."""
    from pyspark.sql.window import Window

    replay = replay_dir(spark, sf_dir)
    src = _read_stream(spark, replay)
    agg = src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    res = _run_to_completion(agg, "complete", f"topk_{id(src)}", cleanup=replay)
    wr = Window.partitionBy("w").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        res.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= k)
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start"),
            "event_type",
            "n_events",
            "rn",
        )
    )


def stream_upsert(
    spark: SparkSession, sf_dir: str, n_chunks: int = 6
) -> DataFrame:
    """Real streaming CDC-apply: replay the event changelog as a file
    stream and fold each micro-batch into a copy-on-write parquet
    state table by LAST-WRITER-WINS on (ts, event_id) — the streaming
    twin of q_cdc_apply_changelog (and of the batch CoW sink
    q_sink_upsert). Because last-writer-wins is associative and the
    tiebreak is a total order, the final state is independent of how
    the changelog is chunked into batches — which is exactly why the
    declared surface can hash-verify a true foreachBatch run against
    the batch oracle.

    Scale: per batch, ONE key-partitioned reduction over
    (state ∪ batch) and one state rewrite — the merge-on-read
    compaction loop; state is one row per live key, and on a real
    lakehouse the rewrite narrows to the key-partitions the batch
    touched (Hudi/Delta merge semantics). Alternating state dirs
    avoid read-overwrite races."""
    import tempfile as _tf

    replay = replay_dir(spark, sf_dir, n_chunks=n_chunks)
    base = _tf.mkdtemp(prefix="stream_upsert_")
    dirs = [os.path.join(base, "a"), os.path.join(base, "b")]
    state = {"cur": None, "flip": 0}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        if state["cur"] is not None:
            new = new.unionByName(spark.read.parquet(state["cur"]))
        # last-writer-wins as ONE hash aggregate instead of a window
        # (sort + full-row shuffle): max_by on the (ts, event_id)
        # total order picks the same winner row as row_number()=1 over
        # (ts DESC, event_id DESC) — event_id is globally unique so no
        # ties exist — and the aggregate does PARTIAL map-side
        # combining, so each micro-batch shuffles at most one row per
        # (user × map task) instead of every (state ∪ batch) row
        # through a sort (guide §2.3 "aggregate before you shuffle").
        win = F.max_by(
            F.struct("ts", "event_id", "event_type", "k"),
            F.struct("ts", "event_id"),
        ).alias("w")
        merged = (
            new.groupBy("user_id")
            .agg(win)
            .select(
                "user_id", "w.ts", "w.event_id", "w.event_type", "w.k"
            )
        )
        nxt = dirs[state["flip"]]
        merged.write.mode("overwrite").parquet(nxt)
        state["cur"] = nxt
        state["flip"] = 1 - state["flip"]

    ck = _tf.mkdtemp(prefix="stream_upsert_ck_")
    # Scope the per-micro-batch shuffle to the state shard count (the
    # same scaling note as run_user_engagement in stateful.py): each
    # batch pays tasks × batches of scheduling + a state-file rewrite
    # per shard, and the merge's cost driver at this scale is shard
    # overhead, not rows. On a real deployment this rises with key
    # cardinality and input rate — never left at the batch default.
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = (
            _read_stream(spark, replay)
            .writeStream.foreachBatch(handle)
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        _drain(q)  # guarded: never rmtree under a live FileStreamSource
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    # the CURRENT state dir must survive (the returned df reads it
    # lazily); the drained query's checkpoint and the stale alternate
    # state dir are dead weight (ADVICE r5 tempdir hygiene)
    shutil.rmtree(replay, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    stale = dirs[1 - dirs.index(state["cur"])] if state["cur"] in dirs else None
    if stale:
        shutil.rmtree(stale, ignore_errors=True)
    final = spark.read.parquet(state["cur"])
    return final.filter(F.col("event_type") != "error").select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("k").alias("last_k"),
    )


def stream_sliding_counts(
    spark: SparkSession, sf_dir: str, n_chunks: int = 8
) -> DataFrame:
    """Real streaming twin of q_stream_sliding: 30-min windows sliding
    every 10 min, run as a Structured Streaming aggregation in complete
    mode so the drained replay emits EXACTLY the batch result (no
    append-mode unfinalized tail) — the equality the test asserts on
    two different chunkings. Production would run append+watermark;
    complete mode is the test harness's equality instrument."""
    replay = replay_dir(spark, sf_dir, n_chunks=n_chunks)
    src = _read_stream(spark, replay)
    agg = src.groupBy(
        F.window("ts", "30 minutes", "10 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    res = _run_to_completion(agg, "complete", f"sliding_{n_chunks}_{id(src)}", cleanup=replay)
    return res.select(
        F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start"),
        "event_type",
        "n_events",
    )


def stream_session_counts(
    spark: SparkSession, sf_dir: str, n_chunks: int = 8
) -> DataFrame:
    """Real streaming twin of q_stream_session: Spark's native
    session_window (30-min gap) per user as a streaming aggregation,
    complete mode so sessions spanning micro-batch boundaries merge in
    state and the drained replay emits EXACTLY the batch result on any
    chunking. Production would run append+watermark; complete mode is
    the test harness's equality instrument."""
    replay = replay_dir(spark, sf_dir, n_chunks=n_chunks)
    src = _read_stream(spark, replay)
    agg = src.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    res = _run_to_completion(agg, "complete", f"session_{n_chunks}_{id(src)}", cleanup=replay)
    return res.select(
        "user_id",
        F.unix_timestamp(F.col("w.start")).cast("bigint").alias("session_start"),
        "n_events",
    )


def stream_enrich_counts(
    spark: SparkSession, sf_dir: str, n_chunks: int = 8
) -> DataFrame:
    """Real streaming twin of q_stream_enrich: stream-static broadcast
    join (events stream x customer dim — no state store needed) feeding
    an hourly windowed aggregate, complete mode for drained-replay
    equality with the batch surface on any chunking."""
    replay = replay_dir(spark, sf_dir, n_chunks=n_chunks)
    src = _read_stream(spark, replay)
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = src.join(F.broadcast(c), F.col("c_custkey") == F.col("user_id") + 1)
    agg = j.groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    res = _run_to_completion(agg, "complete", f"enrich_{n_chunks}_{id(src)}", cleanup=replay)
    return res.select(
        F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start"),
        F.col("c_mktsegment").alias("segment"),
        "n_events",
    )
