"""Semantic invariants for the round-11 operators: ACF bounds and
portmanteau consistency (Ljung–Box), LM-statistic positivity
(Breusch–Pagan), DW range and the 2(1−ρ) identity (Durbin–Watson),
Bartlett positivity (Jensen), Atkinson/Hoover index ranges, Yule's K
spectrum accounting, and code-gate rate bounds."""

from __future__ import annotations

import os

import pytest

from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_ljung_box_bounds(spark):
    r = REGISTRY["q_ljung_box"].fn(spark, SF_DIR).collect()[0]
    for k in range(1, 6):
        assert -1.0 <= r[f"acf{k}"] <= 1.0
    assert r["q_stat"] >= 0
    assert r["reject_white_noise"] == (1 if r["q_stat"] > 11.0705 else 0)
    assert r["n_days"] > 10


def test_breusch_pagan_lm_positive(spark):
    r = REGISTRY["q_breusch_pagan"].fn(spark, SF_DIR).collect()[0]
    assert r["lm_stat"] >= 0  # n * R-squared of the aux regression
    assert r["reject_homoscedastic"] == (1 if r["lm_stat"] > 3.8415 else 0)


def test_durbin_watson_range_and_identity(spark):
    r = REGISTRY["q_durbin_watson"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["dw"] <= 4.0
    assert r["rho_approx"] == pytest.approx(1 - r["dw"] / 2, abs=0.001)
    assert r["positive_autocorr"] == (1 if r["dw"] < 1.5 else 0)


def test_bartlett_positive_and_shape(spark):
    r = REGISTRY["q_bartlett_test"].fn(spark, SF_DIR).collect()[0]
    # ln of the pooled variance >= the weighted mean of ln variances
    # (Jensen) so T >= 0 up to rounding
    assert r["t_stat"] >= -0.001
    assert r["k"] == 5 and r["df"] == 4
    assert r["n_total"] > r["k"]


def test_atkinson_range(spark):
    rows = REGISTRY["q_atkinson_index"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["atkinson_half"] < 1.0  # EDE <= mean (Jensen)
        assert r["mean_spend"] > 0
        assert r["n_cust"] > 0


def test_hoover_range_and_nation_accounting(spark):
    rows = REGISTRY["q_hoover_index"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    assert sum(r["n_nations"] for r in rows) == 25
    for r in rows:
        assert 0.0 <= r["hoover"] <= 1.0


def test_yules_k_spectrum_accounting(spark):
    rows = REGISTRY["q_yules_k"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 < r["vocab"] <= r["n_tokens"]
        assert 0.0 <= r["dis_share"] <= r["hapax_share"] + r["dis_share"] <= 1.0
        assert r["yules_k"] >= 0.0  # sum(m^2 Vm) >= sum(m Vm) always


def test_code_detect_rates(spark):
    rows = REGISTRY["q_code_detect"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert 0.0 <= r["flag_rate"] <= 1.0
        assert r["avg_sym_ratio"] >= 0.0


def test_kruskal_wallis_bounds(spark):
    r = REGISTRY["q_kruskal_wallis"].fn(spark, SF_DIR).collect()[0]
    assert r["k"] == 5
    assert r["h_stat"] >= -0.001
    # tie correction divides by (1 - T/(N^3-N)) <= 1, so corrected >= raw
    assert r["h_corrected"] >= r["h_stat"] - 0.001
    assert r["reject_equal_medians"] == (1 if r["h_corrected"] > 9.4877 else 0)


def test_cpk_bounds(spark):
    rows = REGISTRY["q_cpk_process_capability"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["sd_days"] > 0
        # Cpk <= Cp always (centering can only hurt)
        assert r["cpk"] <= r["cp"] + 0.001
        assert r["capable"] == (1 if r["cpk"] >= 1.33 else 0)


def test_page_hinkley_consistency(spark):
    r = REGISTRY["q_page_hinkley"].fn(spark, SF_DIR).collect()[0]
    assert r["max_ph_ratio"] >= 0  # PH_t = m_t - min m <= t is nonnegative
    if r["n_alarm_days"] > 0:
        assert r["first_alarm_day"] is not None
        assert r["max_ph_ratio"] > 1.0  # some day crossed lambda
    else:
        assert r["first_alarm_day"] is None
        assert r["max_ph_ratio"] <= 1.0


def test_relative_risk_ci_contains_point(spark):
    rows = REGISTRY["q_relative_risk"].fn(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ci_lo"] <= r["rr"] <= r["ci_hi"]
    assert r["rr"] > 0
    assert r["significant"] == (1 if r["ci_lo"] > 1 or r["ci_hi"] < 1 else 0)


def test_pacf_bounds_and_lag1_identity(spark):
    r = REGISTRY["q_pacf"].fn(spark, SF_DIR).collect()[0]
    lb = REGISTRY["q_ljung_box"].fn(spark, SF_DIR).collect()[0]
    # pacf(1) IS acf(1) by definition
    assert r["pacf1"] == pytest.approx(lb["acf1"], abs=0.0002)
    for k in (1, 2, 3):
        assert -1.0 <= r[f"pacf{k}"] <= 1.0


def test_spearman_footrule_bounds(spark):
    r = REGISTRY["q_spearman_footrule"].fn(spark, SF_DIR).collect()[0]
    assert r["n_sources"] == 20
    assert 0 <= r["footrule"] <= 200  # n^2/2 for n=20
    assert r["agreement"] == pytest.approx(1 - r["norm_footrule"], abs=0.001)


def test_coleman_liau_internal_consistency(spark):
    rows = REGISTRY["q_coleman_liau"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["l_per_100w"] > 0
        assert r["s_per_100w"] >= 0
        assert r["cli"] == pytest.approx(
            0.0588 * r["l_per_100w"] - 0.296 * r["s_per_100w"] - 15.8, abs=0.02
        )


def test_cochran_armitage_shape(spark):
    r = REGISTRY["q_cochran_armitage"].fn(spark, SF_DIR).collect()[0]
    assert r["n_bands"] >= 2
    assert r["reject_no_trend"] == (1 if abs(r["z"]) > 1.96 else 0)
