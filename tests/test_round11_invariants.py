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


def test_cohens_d_magnitude_label(spark):
    r = REGISTRY["q_cohens_d"].fn(spark, SF_DIR).collect()[0]
    a = abs(r["cohens_d"])
    expect = (
        "negligible" if a < 0.2 else
        "small" if a < 0.5 else
        "medium" if a < 0.8 else "large"
    )
    assert r["magnitude"] == expect
    # Hedges' g shrinks toward zero, never past it
    assert abs(r["hedges_g"]) <= a + 0.0001
    assert (r["hedges_g"] >= 0) == (r["cohens_d"] >= 0) or r["cohens_d"] == 0


def test_mcc_bounds(spark):
    r = REGISTRY["q_mcc_threshold"].fn(spark, SF_DIR).collect()[0]
    assert -1.0 <= r["mcc"] <= 1.0
    assert 0.0 <= r["f1"] <= 1.0
    assert 0.0 <= r["accuracy"] <= 1.0
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] > 0


def test_dot_vs_cosine_accounting(spark):
    rows = REGISTRY["q_dot_vs_cosine"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_same_argmax"] <= r["n"]
        assert 0 <= r["n_dot_correct"] <= r["n"]
        assert 0 <= r["n_cos_correct"] <= r["n"]


def test_curriculum_stages_partition_corpus(spark):
    rows = REGISTRY["q_curriculum_stages"].fn(spark, SF_DIR).collect()
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
    # stages partition the corpus and are length-ordered
    for a, b in zip(rows, rows[1:]):
        assert a["max_chars"] <= b["min_chars"]
    total = sum(r["n_docs"] for r in rows)
    from builder_spark.catalog import load_table

    assert total == load_table(spark, SF_DIR, "documents").count()


def test_seasonal_strength_range(spark):
    r = REGISTRY["q_seasonal_strength"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["seasonal_strength"] <= 1.0
    assert 0.0 <= r["trend_strength"] <= 1.0
    assert r["n_days_used"] > 7


def test_price_digit_bias_shares(spark):
    r = REGISTRY["q_price_digit_bias"].fn(spark, SF_DIR).collect()[0]
    assert r["chi_sq"] >= 0
    assert 1 <= r["n_endings_seen"] <= 100
    assert 0.0 <= r["pct_ending_00"] <= 1.0
    assert 0.0 <= r["pct_ending_99"] <= 1.0


def test_vocab_drift_bounds(spark):
    rows = REGISTRY["q_vocab_drift_halves"].fn(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r["jaccard"] <= 1.0
        if r["new_vocab_rate"] is not None:
            assert 0.0 <= r["new_vocab_rate"] <= 1.0


def test_band_occupancy_accounting(spark):
    rows = REGISTRY["q_band_occupancy"].fn(spark, SF_DIR).collect()
    assert len(rows) == 4  # one row per band
    n_docs = {r["n_docs"] for r in rows}
    assert len(n_docs) == 1  # every band hashes every doc once
    for r in rows:
        assert r["n_multi_buckets"] <= r["n_buckets"] <= r["n_docs"]
        assert r["max_bucket"] >= 1
        # pairs bound: sum c(c-1)/2 <= C(max_bucket,2) * n_multi... loose
        assert r["candidate_pairs"] >= 0


def test_jains_fairness_bounds(spark):
    rows = REGISTRY["q_jains_fairness"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1.0 / r["n_users"] - 0.001 <= r["fairness"] <= 1.0001


def test_modularity_bounds(spark):
    r = REGISTRY["q_modularity"].fn(spark, SF_DIR).collect()[0]
    assert -0.5 <= r["modularity"] <= 1.0
    assert 1 <= r["n_communities"] <= 9  # leading digit of Brand#1..25
    assert r["n_edges"] >= 1


def test_assortativity_bounds(spark):
    r = REGISTRY["q_assortativity"].fn(spark, SF_DIR).collect()[0]
    if r["assortativity"] is not None:
        assert -1.0 <= r["assortativity"] <= 1.0
    assert r["n_edges"] >= 0


def test_holm_power_ordering(spark):
    r = REGISTRY["q_holm_bonferroni"].fn(spark, SF_DIR).collect()[0]
    # the textbook dominance: Bonferroni <= Holm <= BH rejections
    assert r["n_bonferroni"] <= r["n_holm"] <= r["n_bh"] <= r["m"]
    assert 0.0 <= r["min_p"] <= 1.0


def test_repeat_ngram_gate_bounds(spark):
    rows = REGISTRY["q_repeat_ngram_gate"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert r["avg_max_rep"] >= 1.0  # every doc's max repeat is >= 1


def test_growth_accounting_identity(spark):
    rows = REGISTRY["q_growth_accounting"].fn(spark, SF_DIR).collect()
    assert rows
    prev_active = None
    for r in rows:  # ordered by week
        # active = new + retained + resurrected, exactly
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        if prev_active is None:
            assert r["n_churned"] is None
        else:
            assert r["n_churned"] == prev_active - r["n_retained"]
        prev_active = r["n_active"]


def test_decay_halflife_consistency(spark):
    r = REGISTRY["q_decay_halflife"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["r2"] <= 1.0001
    if r["half_life_days"] is not None:
        assert r["half_life_days"] > 0
        assert r["lambda_per_day"] > 0


def test_ivf_probe_sweep_monotone(spark):
    rows = REGISTRY["q_ivf_probe_sweep"].fn(spark, SF_DIR).collect()
    assert [r["probe_count"] for r in rows] == [1, 2, 4, 8]
    recalls = [r["recall_at_5"] for r in rows]
    # more probes can only add candidates -> recall is non-decreasing
    assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:]))
    for r in rows:
        assert 0.0 <= r["recall_at_5"] <= 1.0
        assert r["n_hits"] <= r["n_exact_pairs"]


def test_sharpe_sortino_relation(spark):
    r = REGISTRY["q_sharpe_sortino"].fn(spark, SF_DIR).collect()[0]
    assert r["n_days"] > 10
    if r["sortino_annual"] is not None and r["mean_daily_return"] > 0:
        # downside dev <= full sd only counts down days, so sortino >= sharpe
        assert r["sortino_annual"] >= r["sharpe_annual"] - 0.001


def test_intrinsic_dim_positive(spark):
    r = REGISTRY["q_intrinsic_dim"].fn(spark, SF_DIR).collect()[0]
    assert r["n_queries"] >= 1
    assert r["mean_ln_mu"] > 0  # d2 > d1 strictly for counted queries
    assert 0 < r["intrinsic_dim"] <= 64.5  # cannot exceed ambient dim (+slack)


def test_binary_quant_recall_bounds(spark):
    r = REGISTRY["q_binary_quant_recall"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["recall_at_5"] <= 1.0
    assert r["n_hits"] <= r["n_exact_pairs"]
    if r["n_hits"] > 0:
        assert 0 <= r["avg_hamming_of_hits"] <= 64


def test_iv_2sls_first_stage(spark):
    r = REGISTRY["q_iv_2sls"].fn(spark, SF_DIR).collect()[0]
    assert r["first_stage_f"] >= 0
    assert r["weak_instrument"] == (1 if r["first_stage_f"] < 10 else 0)


def test_oaxaca_decomposition_identity(spark):
    r = REGISTRY["q_oaxaca_blinder"].fn(spark, SF_DIR).collect()[0]
    # endowment + coefficient reconstruct the gap (to rounding)
    assert r["total_gap"] == pytest.approx(
        r["endowment_effect"] + r["coefficient_effect"], abs=0.001
    )
    assert r["decomposition_gap"] == 0.0


def test_palma_share_accounting(spark):
    r = REGISTRY["q_palma_ratio"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["bottom40_share"] <= 1.0
    assert 0.0 <= r["top10_share"] <= 1.0
    assert r["top10_share"] + r["bottom40_share"] <= 1.0001
    assert r["palma"] == pytest.approx(
        r["top10_share"] / r["bottom40_share"], rel=0.01
    )


def test_mood_median_shape(spark):
    r = REGISTRY["q_mood_median_test"].fn(spark, SF_DIR).collect()[0]
    assert r["k"] == 5
    assert r["chi_sq"] >= 0
    assert r["reject_equal_medians"] == (1 if r["chi_sq"] > 9.4877 else 0)


def test_cohen_kappa_bounds(spark):
    r = REGISTRY["q_cohen_kappa"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["po"] <= 1.0
    assert 0.0 < r["pe"] < 1.0
    assert -1.0 <= r["kappa"] <= 1.0
    # kappa consistent with its own po/pe to rounding
    assert r["kappa"] == pytest.approx((r["po"] - r["pe"]) / (1 - r["pe"]), abs=0.01)
