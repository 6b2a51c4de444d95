"""Semantic invariants for the round-9 batch-15 operators: lognormal
fitted-median proximity, Gumbel return-level monotonicity (RL₁₂₀ >
RL₁₂ > every fitted location), gate-ablation lattice laws
(conjunction ≤ min single ≤ max single ≤ disjunction), the exact
MSE = bias² + variance reconciliation, MMD ≥ 0 with population
conservation, conformal coverage ≈ the nominal level, Fano positivity,
the Chapman estimate bracketing, duplicate growth ≥ 1 (birthday
effect), and CV fold size/mean balance bands.
"""

from __future__ import annotations

import os

import pytest

from builder_spark.catalog import load_table
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_lognormal_fit_median_proximity(spark):
    """For a roughly log-symmetric money distribution the fitted
    median e^μ should land within a factor of 2 of the empirical
    median (a broken fit lands orders of magnitude off)."""
    r = REGISTRY["q_lognormal_fit"].fn(spark, SF_DIR).collect()[0]
    assert r["sigma_log"] > 0
    ratio = r["fitted_median_dollars"] / r["empirical_median_dollars"]
    assert 0.5 < ratio < 2.0
    assert r["fitted_p90_dollars"] > r["fitted_median_dollars"]


def test_gumbel_return_levels_monotone(spark):
    r = REGISTRY["q_gumbel_maxima"].fn(spark, SF_DIR).collect()[0]
    assert r["n_blocks"] >= 12
    assert r["gumbel_beta_dollars"] > 0
    assert r["rl_120_dollars"] > r["rl_12_dollars"] > r["gumbel_mu_dollars"]


def test_gate_ablation_lattice(spark):
    rows = {r["gate"]: r for r in REGISTRY["q_gate_ablation"].fn(spark, SF_DIR).collect()}
    singles = [rows[g]["n_pass"] for g in ("A", "B", "C")]
    assert rows["A&B&C"]["n_pass"] <= min(singles)
    assert rows["A|B|C"]["n_pass"] >= max(singles)
    for r in rows.values():
        assert 0.0 <= r["pass_rate"] <= 1.0


def test_mse_reconciles_exactly(spark):
    r = REGISTRY["q_mse_decomposition"].fn(spark, SF_DIR).collect()[0]
    assert r["mse"] == pytest.approx(r["bias2"] + r["variance"], abs=0.01)
    assert r["variance"] >= 0 and r["bias2"] >= 0
    assert r["mean_error"] ** 2 == pytest.approx(r["bias2"], abs=0.01)


def test_mmd_nonnegative_and_population(spark):
    r = REGISTRY["q_mmd_linear"].fn(spark, SF_DIR).collect()[0]
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert r["n_group0"] + r["n_group1"] == n_vecs
    assert r["mmd2_linear"] >= 0.0


def test_conformal_coverage_at_nominal(spark):
    """In-calibration coverage of the q95 residual band is ≥ 0.95 by
    construction (the quantile definition), within interpolation
    slack."""
    r = REGISTRY["q_conformal_interval"].fn(spark, SF_DIR).collect()[0]
    assert r["n_cal"] > 0
    assert r["qhat_dollars"] > 0
    assert 0.94 <= r["cal_coverage"] <= 1.0


def test_fano_positive(spark):
    rows = REGISTRY["q_fano_factor"].fn(spark, SF_DIR).collect()
    assert {r["scale"] for r in rows} == {"day", "week"}
    for r in rows:
        assert r["fano"] >= 0.0
        assert r["mean_count"] > 0


def test_chapman_bracketing(spark):
    """The Chapman estimate must be at least the users actually seen
    on either occasion (it extrapolates UP), and with heavy events
    per user it should land near the truth."""
    r = REGISTRY["q_capture_recapture"].fn(spark, SF_DIR).collect()[0]
    assert r["m"] <= min(r["n1"], r["n2"])
    if r["chapman_estimate"] is not None:
        assert r["chapman_estimate"] >= max(r["n1"], r["n2"])
        # every user has many events, so both occasions see nearly all
        assert r["chapman_estimate"] <= 3 * r["n_true"]


def test_dup_growth_birthday_effect(spark):
    """Doubling the corpus can only increase the duplicate RATE
    (pairs grow quadratically): growth_factor ≥ 1 whenever the half
    already contains duplicates."""
    r = REGISTRY["q_dup_mass_extrapolation"].fn(spark, SF_DIR).collect()[0]
    assert r["uniq_half"] <= r["n_half"]
    assert r["uniq_full"] <= r["n_full"]
    assert r["dup_rate_full"] >= r["dup_rate_half"] - 1e-9
    if r["growth_factor"] is not None:
        assert r["growth_factor"] >= 1.0


def test_cv_folds_balanced(spark):
    rows = REGISTRY["q_cv_fold_audit"].fn(spark, SF_DIR).collect()
    assert sorted(r["fold"] for r in rows) == [0, 1, 2, 3, 4]
    for r in rows:
        assert 0.8 <= r["size_ratio"] <= 1.2  # hash folds stay near 1/5
        assert 0.9 <= r["mean_ratio"] <= 1.1
        assert r["n_groups"] == 5
