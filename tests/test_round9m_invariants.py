"""Semantic invariants for the round-9 batch-14 operators:
Mahalanobis population + chi-square calibration band, Fisher-ratio
positivity and ordering, OC-curve monotonicity in the defect rate,
tail-dependence probability laws, the median-inside-CI law, NZV flag
rule, rank-stability shares summing to 1, TV ∈ [0,1] with the
max-shift lower bound, ESS ∈ (0,1], and pinball τ-asymmetry.
"""

from __future__ import annotations

import os

import pytest

from builder_spark.catalog import load_table
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_mahalanobis_population_and_calibration(spark):
    rows = REGISTRY["q_mahalanobis_outliers"].fn(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n"] for r in rows) == n_vecs
    # whitened distance² has mean ≈ 64 under any roughly-elliptic cloud
    pooled = sum(r["avg_dist2"] * r["n"] for r in rows) / n_vecs
    assert 40 <= pooled <= 90
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n"]


def test_fisher_ratio_positive_and_ranked(spark):
    rows = REGISTRY["q_fisher_ratio"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    vals = [r["fisher_ratio"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert r["fisher_ratio"] >= 0.0
        assert 0 <= r["dim"] < 64


def test_oc_curve_monotone_in_defect_rate(spark):
    """A higher defect rate can only LOWER the acceptance
    probability (the OC curve is decreasing)."""
    rows = sorted(
        REGISTRY["q_acceptance_sampling"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["defect_rate"],
    )
    assert len(rows) == 5
    for a, b in zip(rows, rows[1:]):
        if a["defect_rate"] < b["defect_rate"]:
            assert a["p_accept"] >= b["p_accept"]
    for r in rows:
        assert 0.0 <= r["p_accept"] <= 1.0


def test_tail_dependence_probability_laws(spark):
    r = REGISTRY["q_tail_dependence"].fn(spark, SF_DIR).collect()[0]
    assert r["n_joint"] <= min(r["n_x_tail"], r["n_y_tail"])
    assert r["n_x_tail"] <= r["n_days"] and r["n_y_tail"] <= r["n_days"]
    if r["lambda_upper"] is not None:
        assert 0.0 <= r["lambda_upper"] <= 1.0


def test_median_inside_ci(spark):
    r = REGISTRY["q_median_ci"].fn(spark, SF_DIR).collect()[0]
    assert r["ci_lo_dollars"] <= r["median_dollars"] <= r["ci_hi_dollars"]
    assert r["n"] > 0


def test_nzv_flag_rule(spark):
    rows = REGISTRY["q_nzv_screen"].fn(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        expect = 1 if (r["freq_ratio"] > 19 and r["pct_unique"] < 10) else 0
        if abs(r["freq_ratio"] - 19) > 0.01 and abs(r["pct_unique"] - 10) > 0.01:
            assert r["nzv_flag"] == expect
        assert r["n_distinct"] >= 1


def test_rank_stability_shares_sum_to_one(spark):
    rows = REGISTRY["q_rank_stability"].fn(spark, SF_DIR).collect()
    assert sum(r["n_wins"] for r in rows) == 8
    assert sum(r["win_share"] for r in rows) == pytest.approx(1.0, abs=0.001)


def test_tv_bounds(spark):
    r = REGISTRY["q_tv_drift"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["tv_distance"] <= 1.0
    # TV is half the L1, so the max single-type shift can't exceed 2·TV
    assert r["max_type_shift"] <= 2 * r["tv_distance"] + 0.001
    assert r["n_types"] == 5


def test_importance_weights_ess(spark):
    r = REGISTRY["q_importance_weights"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 < r["ess_ratio"] <= 1.0001  # Cauchy-Schwarz upper bound
    assert r["max_weight"] > 0
    assert r["n_bins"] >= 1


def test_pinball_tau_values(spark):
    rows = sorted(
        REGISTRY["q_pinball_loss"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["tau_pct"],
    )
    assert [r["tau_pct"] for r in rows] == [50, 90]
    assert rows[0]["n_days"] == rows[1]["n_days"] > 0
    for r in rows:
        assert r["pinball"] >= 0.0
