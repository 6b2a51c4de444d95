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


def test_stream_dedup_keeps_every_unique_event(spark, sf_dir):
    out = REGISTRY["q_stream_dedup"].fn(spark, sf_dir)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    rows = out.collect()
    assert len(rows) == n_events  # event_ids are unique in the fixture
    assert len({r.event_id for r in rows}) == n_events


def test_stream_late_drops_day1(spark, sf_dir):
    out = REGISTRY["q_stream_late"].fn(spark, sf_dir)
    days = sorted(str(r.day_start) for r in out.collect())
    assert days, "late demo emitted nothing"
    # day-1 stragglers arrive after the watermark passed → dropped
    assert not days[0].startswith("2024-01-01")
    # the still-open final day is withheld in append mode
    assert not days[-1].startswith("2024-01-30")
