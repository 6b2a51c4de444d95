"""Semantic invariants for the round-9 batch-10 operators: CV board
ordering, dispersion/NB-r consistency, blocking pair-count bounds,
the W⁺ range law, feature-row conservation + internal consistency,
the CMS one-sided-error law (estimate ≥ truth, shrinking with width),
shift-function monotonicity, contribution shares summing to 1,
correlation range, and record-count laws.
"""

from __future__ import annotations

import os

import pytest

from builder_spark.catalog import load_table
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_price_dispersion_board(spark):
    rows = REGISTRY["q_price_dispersion"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 15
    cvs = [r["cv"] for r in rows]
    assert cvs == sorted(cvs, reverse=True)
    for r in rows:
        assert r["cv"] >= 0.0 and r["max_markup"] >= 0.0 and r["n"] >= 3


def test_nb_overdispersion_consistency(spark):
    rows = REGISTRY["q_nb_overdispersion"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["dispersion"] == pytest.approx(
            r["var_count"] / r["mean_count"], abs=0.01
        )
        if abs(r["dispersion"] - 1.0) > 0.001:
            # overdispersed ⇔ an NB shape is reported
            assert (r["nb_r"] is not None) == (r["dispersion"] > 1)
        if r["nb_r"] is not None:
            assert r["nb_r"] > 0


def test_er_blocking_bounds(spark):
    r = REGISTRY["q_er_blocking"].fn(spark, SF_DIR).collect()[0]
    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert r["n_records"] == n_cust
    assert r["max_block"] <= n_cust
    assert 0 <= r["cand_pairs"] <= n_cust * (n_cust - 1) // 2
    assert 0.0 <= r["reduction_ratio"] <= 1.0


def test_wilcoxon_w_plus_range(spark):
    r = REGISTRY["q_wilcoxon_signed_rank"].fn(spark, SF_DIR).collect()[0]
    n = r["n"]
    assert n >= 1
    assert 0.0 <= r["w_plus"] <= n * (n + 1) / 2


def test_user_features_conservation(spark):
    rows = REGISTRY["q_user_features"].fn(spark, SF_DIR).collect()
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert len(rows) == n_users
    for r in rows:
        assert r["n_purchases"] <= r["n_events"]
        assert r["recency_days"] >= 0 and r["tenure_days"] >= 0
        assert 1 <= r["active_days"] <= r["tenure_days"] + 1
        assert 1 <= r["n_types"] <= 5


def test_cms_one_sided_error_shrinks_with_width(spark):
    """CMS never underestimates, and a wider sketch can only tighten
    the aggregate estimate."""
    rows = sorted(
        REGISTRY["q_cms_width_sweep"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["width"],
    )
    assert [r["width"] for r in rows] == [64, 256, 1024]
    for r in rows:
        assert r["est_total"] >= r["true_total"]
        assert r["overestimate"] >= 1.0
    for a, b in zip(rows, rows[1:]):
        assert a["est_total"] >= b["est_total"]


def test_shift_function_monotone_quantiles(spark):
    rows = sorted(
        REGISTRY["q_shift_function"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 10))
    for a, b in zip(rows, rows[1:]):
        assert a["q_urgent"] <= b["q_urgent"]
        assert a["q_low"] <= b["q_low"]
    for r in rows:
        assert r["shift_dollars"] == pytest.approx(
            r["q_urgent"] - r["q_low"], abs=0.02
        )


def test_delta_contribution_shares_sum_to_one(spark):
    rows = REGISTRY["q_delta_contribution"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    assert sum(r["contribution"] for r in rows) == pytest.approx(1.0, abs=0.002)
    assert sorted(r["impact_rank"] for r in rows) == [1, 2, 3, 4, 5]
    for r in rows:
        assert r["delta"] == pytest.approx(r["rev_curr"] - r["rev_base"], abs=0.05)


def test_dim_correlation_range_and_rank(spark):
    rows = REGISTRY["q_dim_correlation"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    rs = [abs(r["r"]) for r in rows]
    assert rs == sorted(rs, reverse=True)
    for r in rows:
        assert 0 <= r["dim_i"] < r["dim_j"] < 16
        assert -1.0001 <= r["r"] <= 1.0001


def test_record_runs_laws(spark):
    rows = REGISTRY["q_record_runs"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r["n_records"] <= r["n_days"]  # day one is always a record
        assert r["final_record_dollars"] > 0
