"""Semantic invariants for the round-9 batch-16 operators: the
combo-MAE ≤ max(parent MAEs) convexity law, absorbing-time
monotone-lower-bound positivity, migration shares summing to 1 with
|corr| ≤ 1, and peak-alignment conservation (5 series accounted)."""

from __future__ import annotations

import os

import pytest

from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_combo_mae_convexity(spark):
    """|e_combo| ≤ (|e_naive| + |e_seasonal|)/2 per day (triangle
    inequality), so the combo MAE can never exceed the parents'
    average — and combo_wins must match the strict comparison."""
    r = REGISTRY["q_forecast_combo"].fn(spark, SF_DIR).collect()[0]
    assert r["mae_combo"] <= (r["mae_naive"] + r["mae_seasonal"]) / 2 + 0.001
    expect = 1 if r["mae_combo"] < min(r["mae_naive"], r["mae_seasonal"]) else 0
    assert r["combo_wins"] == expect
    assert r["n_days"] > 0


def test_absorbing_time_bounds(spark):
    """Four value-iteration rounds give 1 ≤ t ≤ 4 (each round adds at
    most one step of mass) — a monotone lower bound on the true
    expected absorption time."""
    rows = REGISTRY["q_absorbing_time"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["state"] != "purchase"
        assert 1.0 <= r["expected_steps_lb"] <= 4.0001


def test_migration_shares_and_corr(spark):
    r = REGISTRY["q_decile_migration"].fn(spark, SF_DIR).collect()[0]
    assert r["stay_rate"] + r["up_rate"] + r["down_rate"] == pytest.approx(
        1.0, abs=0.001
    )
    assert 0.0 <= r["mean_abs_move"] <= 9.0
    if r["decile_corr"] is not None:
        assert -1.0001 <= r["decile_corr"] <= 1.0001
    assert r["n_customers"] > 0


def test_peak_alignment_conservation(spark):
    rows = REGISTRY["q_peak_day_alignment"].fn(spark, SF_DIR).collect()
    assert sum(r["n_series"] for r in rows) == 5
    for r in rows:
        assert 0 <= r["peak_dow"] <= 6
        assert 0.0 < r["mass_share"] <= 1.0
