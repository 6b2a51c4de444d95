"""Streaming semantics tests: batch-twin equivalence and watermark
late-drop behavior (SURVEY.md §5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from builder_spark.registry import load_all

REGISTRY = load_all()


def test_stream_tumbling_matches_batch_twin(spark, sf_dir):
    stream = REGISTRY["q_stream_tumbling"].fn(spark, sf_dir)
    batch = REGISTRY["q_win_tumbling"].fn(spark, sf_dir)
    s = {(str(r.win_start), r.event_type): r.n for r in stream.collect()}
    b = {(str(r.win_start), r.event_type): r.n for r in batch.collect()}
    assert s == b


def test_stream_sliding_matches_batch_twin(spark, sf_dir):
    # 1h windows sliding 15 min: stream counts per window start must
    # equal the batch F.window(…, slide) twin's (q_win_sliding emits
    # total_value, the stream emits value_sum — compare n per window)
    stream = REGISTRY["q_stream_sliding"].fn(spark, sf_dir)
    batch = REGISTRY["q_win_sliding"].fn(spark, sf_dir)
    s = {str(r.win_start): r.n for r in stream.collect()}
    b = {str(r.win_start): r.n for r in batch.collect()}
    assert s == b


def test_stream_dedup_keeps_every_unique_event(spark, sf_dir):
    out = REGISTRY["q_stream_dedup"].fn(spark, sf_dir)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    rows = out.collect()
    assert len(rows) == n_events  # event_ids are unique in the fixture
    assert len({r.event_id for r in rows}) == n_events


def test_stream_session_matches_batch_twin(spark, sf_dir):
    # session_window(30 min) must produce the same (user, start, n)
    # sessions as the batch lag + gap-flag + running-sum construction
    stream = REGISTRY["q_stream_session"].fn(spark, sf_dir)
    batch = REGISTRY["q_win_session"].fn(spark, sf_dir)
    s = {(r.user_id, str(r.session_start)): r.n_events for r in stream.collect()}
    b = {
        (r.user_id, str(r.session_start)): r.n_events
        for r in batch.collect()
    }
    assert s == b


def test_stream_stateful_matches_groupby(spark, sf_dir):
    # final per-user state (count/sum/max) == plain batch aggregation;
    # update-mode sink may emit one row per user per micro-batch, so
    # keep the LAST row per user (availableNow preserves batch order)
    out = REGISTRY["q_stream_stateful"].fn(spark, sf_dir)
    final = {}
    for r in out.collect():
        final[r.user_id] = (r.n, r.value_sum, r.value_max)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        r.user_id: (r.n, r.value_sum, r.value_max)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
            F.max("value").alias("value_max"),
        )
        .collect()
    }
    assert final.keys() == batch.keys()
    for u in final:
        assert final[u][0] == batch[u][0], u
        assert abs(final[u][1] - batch[u][1]) < 1e-6, u
        assert final[u][2] == batch[u][2], u


def test_stream_late_drops_day1(spark, sf_dir):
    out = REGISTRY["q_stream_late"].fn(spark, sf_dir)
    days = sorted(str(r.day_start) for r in out.collect())
    assert days, "late demo emitted nothing"
    # day-1 stragglers arrive after the watermark passed → dropped
    assert not days[0].startswith("2024-01-01")
    # the still-open final day is withheld in append mode
    assert not days[-1].startswith("2024-01-30")


def test_stream_stream_join_matches_batch(spark, sf_dir):
    # streaming purchase⟕click-within-1h inner join == the same join in batch
    out = REGISTRY["q_stream_stream_join"].fn(spark, sf_dir)
    s = {(r.purchase_id, r.click_id) for r in out.collect()}
    from builder_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
    )
    b = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert s == b


def test_stream_static_join_matches_batch(spark, sf_dir):
    out = REGISTRY["q_stream_static_join"].fn(spark, sf_dir)
    s = {(r.c_mktsegment, r.event_type): r.n for r in out.collect()}
    from builder_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    batch = (
        ev.join(c, ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    b = {(r.c_mktsegment, r.event_type): r.n for r in batch.collect()}
    assert s == b


def test_stream_foreach_batch_sink_matches_batch_twin(spark, sf_dir):
    """The foreachBatch dynamic-partition-overwrite sink must land
    exactly the batch twin's aggregate — and stay identical when the
    stream is replayed (idempotent overwrite, not append-duplicate)."""
    sink1 = REGISTRY["q_stream_foreach_batch"].fn(spark, sf_dir)
    batch = REGISTRY["q_win_tumbling"].fn(spark, sf_dir)
    key = lambda r: (str(r.win_start), r.event_type)
    s = {key(r): (r.n, r.total_value) for r in sink1.collect()}
    b = {key(r): (r.n, r.total_value) for r in batch.collect()}
    assert s == b
    # replay: rerun the whole stream job; sink contents must not grow
    sink2 = REGISTRY["q_stream_foreach_batch"].fn(spark, sf_dir)
    s2 = {key(r): (r.n, r.total_value) for r in sink2.collect()}
    assert s2 == s
