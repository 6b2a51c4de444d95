"""Structured Streaming jobs over the events table.

Pattern: file source (schema pinned from a batch read) → event-time
transformations with watermarks → memory sink via Trigger.AvailableNow
→ return the sink table as a DataFrame. Fresh checkpoint per run makes
results reproducible (no resumed state).

Scale posture: the same plans run unchanged against a real stream
(Kafka source / parquet sink with exactly-once via checkpointing);
state size is bounded by the watermark — an unbounded-state streaming
agg is a bug, not a feature.

API note: custom stateful processing is exposed via
``applyInPandasWithState`` (q_stream_stateful). Spark 4's successor
API ``transformWithStateInPandas`` (StatefulProcessor + value/map/
list state + timers) is NOT used here because its driver worker
imports ``google.protobuf``, which this container lacks — verified
2026-08-14: the pre-init worker crashes with ImportError before the
first batch. When protobuf is available, q_stream_stateful's
processor ports directly (getValueState + handleInputRows).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register
from builder_spark.session import apply_runtime_confs


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream (schema pinned, ts normalized).

    The file stream source wants a directory to monitor, but the
    fixture is a single file — stage a symlink dir (no data copy).
    """
    apply_runtime_confs(spark)
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # md5, not hash(): Python string hashing is per-process salted, so
    # hash() would mint a new stage dir every process — md5 keeps one
    # stable dir per sf_dir across driver runs
    import hashlib

    stage = os.path.join(
        tempfile.gettempdir(),
        f"bs_stream_src_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}",
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    sdf = spark.readStream.schema(batch_schema).parquet(stage)
    ts_type = dict(sdf.dtypes).get("ts")
    if ts_type == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # fixture regenerated as parquet timestamp[us]; normalize to LTZ
        # exactly like catalog.load_table (session tz pinned UTC)
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def run_stream_to_df(
    spark: SparkSession, streaming_df: DataFrame, output_mode: str
) -> DataFrame:
    """Run to completion (availableNow) into a memory sink; return it."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"bs_ckpt_{name}")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # bounded wait: availableNow terminates on its own, but a hung
    # source must fail the one query, not wedge a whole grading run
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(f"streaming query {name} exceeded 600s under availableNow")
    return spark.table(name)


@register("q_stream_tumbling", oracle=None, category="streaming")
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 1-hour tumbling counts with a 10-minute watermark.
    Batch twin (graded): q_win_tumbling."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    return run_stream_to_df(spark, agg, "complete")


@register("q_stream_dedup", oracle=None, category="streaming")
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on event_id within the watermark window —
    state expires once the watermark passes (bounded memory)."""
    ev = stream_events(spark, sf_dir)
    deduped = ev.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return run_stream_to_df(spark, deduped.select("event_id", "ts", "user_id"), "append")


@register("q_stream_sliding", oracle=None, category="streaming")
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 1-hour windows sliding every 15 minutes (each event
    lands in 4 overlapping windows). Batch twin (graded): q_win_sliding."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(F.col("w.start").alias("win_start"), "n", "value_sum")
    )
    return run_stream_to_df(spark, agg, "complete")


@register("q_stream_session", oracle=None, category="streaming")
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user sessionization with F.session_window (30-min
    inactivity gap): state is one open session per user, closed and
    emitted when the watermark passes the gap. Batch twin (graded):
    q_win_session (lag + gap-flag + running sum)."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
    return run_stream_to_df(spark, agg, "complete")


@register("q_stream_stateful", oracle=None, category="streaming")
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, sum, max) maintained in explicit state
    across micro-batches, emitted as updates. This is the escape hatch
    for operators watermark+window can't express (per-key custom
    accumulators, CEP-ish logic); state lives in the state store
    (RocksDB at scale) keyed by user, so it shards with the shuffle."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = stream_events(spark, sf_dir).select("user_id", "value")

    def track(key, pdf_iter, state):
        import pandas as pd

        cnt, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdf_iter:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        state.update((cnt, total, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [cnt], "value_sum": [round(total, 4)], "value_max": [mx]}
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType="user_id bigint, n bigint, value_sum double, value_max double",
        stateStructType="cnt bigint, total double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_stream_to_df(spark, out, "update")


@register("q_stream_late", oracle=None, category="streaming")
def q_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data semantics demo: three ordered micro-batches (recent
    data, mid-range data, then day-1 stragglers). Append mode enforces
    the watermark, which empirically takes effect one batch after the
    max event time that produced it — so the day-1 stragglers in batch
    3 are dropped by the watermark batch 1 established. The emitted
    daily counts contain NO day-1 bucket, and the final (still-open)
    day is withheld. Complete mode would NOT show this: watermarks
    don't drop state there."""
    src = load_table(spark, sf_dir, "events")
    day1 = F.col("ts") < F.to_timestamp(F.lit("2024-01-02 00:00:00"))
    mid = ~day1 & (F.col("ts") < F.to_timestamp(F.lit("2024-01-15 00:00:00")))
    stage = os.path.join(tempfile.gettempdir(), "bs_late_demo")
    shutil.rmtree(stage, ignore_errors=True)
    # file names order the micro-batches: newest data first, stragglers last
    src.filter(~day1 & ~mid).coalesce(1).write.parquet(os.path.join(stage, "b0_recent"))
    src.filter(mid).coalesce(1).write.parquet(os.path.join(stage, "b1_mid"))
    src.filter(day1).coalesce(1).write.parquet(os.path.join(stage, "b2_late"))

    schema = spark.read.parquet(os.path.join(stage, "b0_recent")).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/*/")
    )
    if dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    agg = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("day_start"), "n")
    )
    return run_stream_to_df(spark, agg, "append")


@register("q_stream_static_join", oracle=None, category="streaming")
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment: the event stream joins the
    customer table (user_id = c_custkey) and counts per market segment.
    The static side is re-planned per micro-batch (so dim updates are
    picked up) and broadcast — stream-static inner joins need no
    watermark because the static side never ages out of state."""
    ev = stream_events(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
    )
    return run_stream_to_df(spark, agg, "complete")


@register("q_stream_stream_join", oracle=None, category="streaming")
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    each purchase pairs with the same user's clicks from the preceding
    hour. BOTH sides are watermarked and the range condition bounds the
    join state — Spark derives how long each side's rows must be
    retained (1h + watermark) and evicts behind it; without the time
    bound, stream-stream state grows forever (a bug at 100 TB/day)."""
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "30 minutes")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "30 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "inner",
    ).select("p_user", "purchase_id", "purchase_ts", "click_id", "click_ts", "purchase_value")
    return run_stream_to_df(spark, joined, "append")


@register("q_stream_foreach_batch", oracle=None, category="streaming")
def q_stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming→lakehouse sink via ``foreachBatch``:
    every micro-batch overwrites exactly the hourly partitions it
    touches (dynamic partition overwrite), so replaying a batch after
    a failure rewrites the same files instead of duplicating them —
    idempotence + checkpoint = effectively-once, the production
    pattern when the sink itself isn't transactional. Batch twin:
    q_win_tumbling (equivalence asserted in tests/test_streaming.py).
    Scale: each partition's files are rewritten whole; state is
    bounded by the watermark, sink work by |touched windows|."""
    sdf = stream_events(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total_value")
    )
    out = os.path.join(tempfile.gettempdir(), "bs_feb_sink")
    ckpt = os.path.join(tempfile.gettempdir(), "bs_feb_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("win_date", F.to_date("win_start"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("win_date")
            .parquet(out)
        )

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("q_stream_foreach_batch exceeded 600s under availableNow")
    # explicit schema + pre-created dir: an empty source produces no
    # micro-batch writes, and schema inference on the bare sink dir
    # fails (UNABLE_TO_INFER_SCHEMA) — degenerate audit
    os.makedirs(out, exist_ok=True)
    sink_schema = agg.withColumn("win_date", F.to_date("win_start")).schema
    return (
        spark.read.schema(sink_schema)
        .parquet(out)
        .select("win_start", "event_type", "n", "total_value")
    )
