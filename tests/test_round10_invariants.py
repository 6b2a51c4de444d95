"""Semantic invariants for the round-10 operators: effect-size bounds
and label consistency (Cliff's delta), the Murphy decomposition
identity, h-index defining property, spectral-entropy normalization,
OLS diagnostic identities (leverage sums to p), hazard/survival
consistency (NA vs FH), Weiszfeld cost dominance, stump impurity
bounds, Holt vs naive MAE, isotonic monotonicity + calibration-mass
conservation, newsvendor service-level feasibility, GMM mixture laws,
RAKE score floors, median-polish residual centering, clustering-
coefficient range, and Anderson–Darling positivity."""

from __future__ import annotations

import os

import pytest

from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_cliffs_delta_bounds_and_labels(spark):
    rows = REGISTRY["q_cliffs_delta"].fn(spark, SF_DIR).collect()
    assert len(rows) == 3  # pairs of A/N/R
    for r in rows:
        assert -1.0 <= r["delta"] <= 1.0
        a = abs(r["delta"])
        expect = (
            "negligible" if a < 0.147 else
            "small" if a < 0.33 else
            "medium" if a < 0.474 else "large"
        )
        assert r["magnitude"] == expect
        assert r["n_gt"] >= 0 and r["n_lt"] >= 0


def test_brier_decomposition_identity(spark):
    r = REGISTRY["q_brier_decomposition"].fn(spark, SF_DIR).collect()[0]
    # Murphy identity holds exactly for binned forecasts
    assert r["brier_binned"] == pytest.approx(
        r["reliability"] - r["resolution"] + r["uncertainty"], abs=0.001
    )
    assert 0.0 <= r["uncertainty"] <= 0.25  # p(1-p) max at 0.25
    assert r["reliability"] >= 0 and r["resolution"] >= 0
    assert r["brier_raw"] >= 0


def test_h_index_defining_property(spark):
    """h ≤ n_docs always, and h ≤ max n_chars trivially; h ≥ 1 when the
    source has ≥1 doc of ≥1 char."""
    rows = REGISTRY["q_h_index"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["h_index"] <= r["n_docs"]


def test_spectral_entropy_normalized(spark):
    r = REGISTRY["q_spectral_entropy"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["spectral_entropy"] <= 1.0001
    assert 1 <= r["dom_k"] <= 14
    assert r["dom_period_days"] == pytest.approx(r["n_days"] / r["dom_k"], abs=0.001)


def test_cooks_leverage_sums_to_p(spark):
    """Σhᵢ = p = 2 for simple OLS — the hat-matrix trace identity."""
    rows = REGISTRY["q_cooks_distance"].fn(spark, SF_DIR).collect()
    assert len(rows) == 25
    assert sum(r["leverage"] for r in rows) == pytest.approx(2.0, abs=0.01)
    for r in rows:
        assert 0.0 < r["leverage"] < 1.0
        assert r["cooks_d"] >= 0


def test_nelson_aalen_vs_km_ordering(spark):
    """Ĥ is nondecreasing; FH survival = exp(−Ĥ) is nonincreasing and
    ≥ the KM product at every event time (standard FH ≥ KM bound)."""
    na = {r["t"]: r for r in REGISTRY["q_nelson_aalen"].fn(spark, SF_DIR).collect()}
    km = {r["t"]: r for r in REGISTRY["q_survival_km"].fn(spark, SF_DIR).collect()}
    assert na and set(na) == set(km)  # same event-time grain
    prev_h = 0.0
    for t in sorted(na):
        assert na[t]["na_cumhaz"] >= prev_h - 1e-9
        prev_h = na[t]["na_cumhaz"]
        assert na[t]["fh_survival"] >= km[t]["s_t"] - 0.001
        assert na[t]["n_risk"] >= na[t]["d"] >= 1


def test_geometric_median_never_loses(spark):
    """The geometric median minimizes summed distance, so its cost can
    never exceed the centroid's (up to rounding)."""
    rows = REGISTRY["q_geometric_median"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cost_gm"] <= r["cost_mean"] + 0.001


def test_stump_impurity_bounds_and_unique_best(spark):
    rows = REGISTRY["q_best_split_stump"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    assert sum(r["is_best"] for r in rows) >= 1
    for r in rows:
        assert 0.0 <= r["gini_split"] <= 0.5  # binary Gini max
        assert 0.0 <= r["pos_rate_left"] <= 1.0


def test_rake_scores_floor(spark):
    """Every word score degree/freq ≥ 1, so a phrase of w words scores
    ≥ w ≥ 1; ranks are 1..3 per lang."""
    rows = REGISTRY["q_rake_keywords"].fn(spark, SF_DIR).collect()
    assert rows
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        assert r["rake_score"] >= 1.0
        assert r["n_occ"] >= 1
        by_lang.setdefault(r["lang"], []).append(r["rnk"])
    for _lang, rnks in by_lang.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))


def test_median_polish_row_residuals_center(spark):
    """After the row sweep the per-region residual median is 0; the col
    sweep moves it by at most the col-effect spread — MAD stays small
    relative to the effects and is nonnegative."""
    rows = REGISTRY["q_median_polish"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["resid_mad"] >= 0
        assert r["resid_max"] >= r["resid_mad"]


def test_clustering_coeff_range(spark):
    rows = REGISTRY["q_clustering_coeff"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["coeff"] <= 1.0001
        assert r["degree"] >= 2
        # triangles at a node can't exceed C(deg, 2)
        assert r["triangles"] <= r["degree"] * (r["degree"] - 1) / 2


def test_anderson_darling_positive(spark):
    r = REGISTRY["q_anderson_darling"].fn(spark, SF_DIR).collect()[0]
    assert r["a_squared"] > 0
    assert r["lambda_hat"] > 0
    assert r["reject_exponential"] in (0, 1)
    assert r["reject_exponential"] == (1 if r["a_squared"] > 1.321 else 0)


def test_holt_beats_nothing_blows_up(spark):
    """Level must sit inside the observed count range's convex hull
    (exponential smoothing is a convex combination), trend finite."""
    r = REGISTRY["q_holt_linear"].fn(spark, SF_DIR).collect()[0]
    assert r["n_days"] >= 2
    assert r["mae_one_step"] >= 0
    assert abs(r["trend_end"]) < 1e6
    assert r["forecast_7d"] == pytest.approx(
        r["level_end"] + 7 * r["trend_end"], abs=0.001
    )


def test_isotonic_monotone_and_mass_preserving(spark):
    """The PAV fit is nondecreasing and preserves the weighted mean of
    the calibration targets (projection property)."""
    rows = sorted(
        REGISTRY["q_isotonic_calibration"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["bin"],
    )
    assert len(rows) == 10
    prev = -1.0
    for r in rows:
        assert r["iso_fit"] >= prev - 1e-9
        prev = r["iso_fit"]
        assert r["monotone_ok"] == 1
    tot = sum(r["nk"] for r in rows)
    mean_obar = sum(r["nk"] * r["obar"] for r in rows) / tot
    mean_iso = sum(r["nk"] * r["iso_fit"] for r in rows) / tot
    assert mean_iso == pytest.approx(mean_obar, abs=0.002)


def test_newsvendor_service_feasible(spark):
    rows = REGISTRY["q_newsvendor"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["q_star"] is not None
        assert r["service_level"] >= 0.75 - 1e-9
        assert 1 <= r["q_star"] <= 50


def test_gmm_mixture_laws(spark):
    r = REGISTRY["q_gmm_em_1d"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 < r["pi2"] < 1.0
    assert r["sg1"] > 0 and r["sg2"] > 0
    assert r["mu1"] <= r["mu2"] + 1e-9  # moment init orders components; EM keeps it
    assert r["avg_loglik"] < 0 or abs(r["avg_loglik"]) < 10


def test_ridge_path_shrinks_monotonically(spark):
    """‖β(λ)‖ is strictly decreasing in λ, and λ=0 is OLS (largest)."""
    rows = sorted(
        REGISTRY["q_ridge_path"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["lambda_rel"],
    )
    assert [r["lambda_rel"] for r in rows] == [0.0, 0.1, 1.0, 10.0]
    norms = [r["coef_norm"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(norms, norms[1:]))
    assert norms[0] > norms[-1]


def test_ipw_propensity_sane(spark):
    r = REGISTRY["q_propensity_ipw"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 < r["min_propensity"] <= r["max_propensity"] < 1.0
    # segment is (near-)independent of priority in the fixture, so the
    # IPW estimate should land near the naive difference — loose box
    assert abs(r["ipw_ate"] - r["naive_diff"]) < 5000


def test_good_turing_mass_laws(spark):
    rows = sorted(REGISTRY["q_good_turing"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r["r"])
    assert rows and rows[0]["r"] >= 1
    for r in rows:
        assert r["r_star"] > 0
        assert r["discount"] > 0
        assert 0.0 <= r["p0_unseen"] <= 1.0
    # p0 is a corpus constant — identical on every row
    assert len({r["p0_unseen"] for r in rows}) == 1


def test_two_way_anova_decomposition(spark):
    rows = {r["factor"]: r for r in REGISTRY["q_two_way_anova"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {"region", "segment", "interaction"}
    assert rows["region"]["df"] == 4
    assert rows["segment"]["df"] == 4
    assert rows["interaction"]["df"] == 16
    for r in rows.values():
        assert r["eta_sq"] >= 0.0
        assert r["f_stat"] >= 0.0
    # effect shares can't exceed 1 in total (SSE absorbs the rest)
    assert sum(r["eta_sq"] for r in rows.values()) <= 1.0001


def test_partial_correlation_bounds(spark):
    r = REGISTRY["q_partial_correlation"].fn(spark, SF_DIR).collect()[0]
    for k in ("r_xy", "r_xz", "r_yz", "partial_xy_given_z"):
        assert -1.0001 <= r[k] <= 1.0001
    # fixture columns are near-independent: with |r_xz|,|r_yz| ≈ 0 the
    # partial must sit close to the raw correlation (formula limit)
    assert r["partial_xy_given_z"] == pytest.approx(r["r_xy"], abs=0.02)
    assert r["n"] > 0


def test_granger_f_nonnegative(spark):
    r = REGISTRY["q_granger_lag1"].fn(spark, SF_DIR).collect()[0]
    assert r["f_stat"] >= -0.001  # RSS_r >= RSS_f by nesting
    assert r["x_causes_y"] == (1 if r["f_stat"] > 4.18 else 0)
    assert r["n"] >= 3


def test_burrows_delta_metric_properties(spark):
    rows = REGISTRY["q_burrows_delta"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["delta"] >= 0.0
        assert r["s1"] < r["s2"]
    assert [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])] == [1, 2, 3, 4, 5]
    deltas = [r["delta"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert all(a <= b + 1e-9 for a, b in zip(deltas, deltas[1:]))


def test_markov_attribution_conservation(spark):
    rows = REGISTRY["q_attribution_markov"].fn(spark, SF_DIR).collect()
    assert len(rows) == 4
    assert sum(r["attribution"] for r in rows) == pytest.approx(1.0, abs=0.002)
    for r in rows:
        assert 0.0 < r["conv_full"] <= 1.0
        assert 0.0 <= r["removal_effect"] <= 1.0  # removing never adds conversions
        assert 0.0 <= r["attribution"] <= 1.0
    # conv_full is the same chain for every row
    assert len({r["conv_full"] for r in rows}) == 1


def test_energy_distance_nonnegative(spark):
    """Energy distance is a metric between distributions: ≥ 0, and the
    cross-expectation dominates the average within-expectation."""
    r = REGISTRY["q_energy_distance"].fn(spark, SF_DIR).collect()[0]
    assert r["energy_dist"] >= -0.001
    assert r["e_xy"] >= (r["e_xx"] + r["e_yy"]) / 2 - 0.001
    assert r["e_xx"] > 0 and r["e_yy"] > 0
    assert r["na"] > 0 and r["nb"] > 0


def test_cronbach_alpha_range(spark):
    r = REGISTRY["q_cronbach_alpha"].fn(spark, SF_DIR).collect()[0]
    assert r["k"] == 5
    assert r["alpha"] <= 1.0001  # can be negative; never exceeds 1


def test_binary_segmentation_gain_nonnegative(spark):
    r = REGISTRY["q_binary_segmentation"].fn(spark, SF_DIR).collect()[0]
    assert r["sse_gain"] >= -0.001  # a split can never increase SSE
    assert r["n_left"] >= 1
    assert r["mean_left"] > 0 and r["mean_right"] > 0


def test_katz_centrality_ranked(spark):
    rows = sorted(REGISTRY["q_katz_centrality"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r["rnk"])
    assert rows
    scores = [r["katz_score"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(scores, scores[1:]))
    for r in rows:
        assert r["katz_score"] >= 0.0


def test_hubness_accounting(spark):
    r = REGISTRY["q_ann_hubness"].fn(spark, SF_DIR).collect()[0]
    assert r["n_vectors"] > 0
    assert 0 <= r["max_indegree"] <= r["n_vectors"] - 1
    assert 0.0 <= r["pct_never_retrieved"] <= 1.0


def test_crosslang_dup_spread(spark):
    rows = REGISTRY["q_crosslang_dup"].fn(spark, SF_DIR).collect()
    for r in rows:
        assert r["n_langs"] >= 2
        assert r["n_docs"] >= r["n_langs"]
        assert len(r["langs"].split(",")) == r["n_langs"]


def test_scalar_quant_monotone_in_bits(spark):
    """More bits can only reduce quantization error; SQNR grows ~6dB/bit."""
    rows = sorted(REGISTRY["q_scalar_quant_sweep"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r["bits"])
    assert [r["bits"] for r in rows] == [2, 4, 8]
    mses = [r["mse"] for r in rows]
    assert mses[0] > mses[1] > mses[2] >= 0
    sqnrs = [r["sqnr_db"] for r in rows]
    assert sqnrs[0] < sqnrs[1] < sqnrs[2]


def test_jm_perplexity_bounded_by_vocab(spark):
    """Perplexity of any λ-mixture is at most V/(1−λ) (uniform floor)
    and at least 1; the curve must be finite for every λ."""
    rows = REGISTRY["q_lm_interpolation_sweep"].fn(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["perplexity"] >= 1.0
        assert r["n_tokens"] > 0


def test_chain_ladder_factor_laws(spark):
    """Cumulative payments only grow, so every link ratio ≥ 1 and the
    age-to-ultimate suffix product is nonincreasing in lag (ends ≥ 1)."""
    rows = sorted(REGISTRY["q_chain_ladder"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r["lag"])
    assert rows
    a2u = [r["age_to_ultimate"] for r in rows]
    for r in rows:
        assert r["dev_factor"] >= 1.0 - 1e-9
        assert r["n_cohorts"] >= 1
    assert all(a >= b - 1e-9 for a, b in zip(a2u, a2u[1:]))
    assert a2u[-1] >= 1.0 - 1e-9


def test_borda_ranks_are_permutations(spark):
    rows = REGISTRY["q_borda_ranking"].fn(spark, SF_DIR).collect()
    k = len(rows)
    assert sorted(r["borda_rank"] for r in rows) == list(range(1, k + 1))
    assert sorted(r["revenue_rank"] for r in rows) == list(range(1, k + 1))
    # max possible points per day is k-1 per voter
    for r in rows:
        assert 0 <= r["borda_points"] <= r["n_days"] * (k - 1)


def test_burstiness_at_least_poisson_floor(spark):
    rows = REGISTRY["q_word_burstiness"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["doc_freq"] >= 5
        assert 0.0 <= r["repeat_rate"] <= 1.0
        assert r["burstiness"] > 0
        assert r["occurrences"] >= r["doc_freq"]


def test_mm1_stability_and_littles_law(spark):
    rows = REGISTRY["q_queueing_mm1"].fn(spark, SF_DIR).collect()
    assert len(rows) == 24
    for r in rows:
        assert 0.0 < r["rho"] <= 0.8 + 1e-9  # mu = 1.25x peak guarantees this
        assert r["lq"] >= 0
        # Little's law: Lq = lambda * Wq
        assert r["lq"] == pytest.approx(r["lambda_per_sec"] * r["wq_sec"], rel=0.02)


def test_huber_downweights_and_stays_sane(spark):
    r = REGISTRY["q_huber_irls"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["downweighted_share"] <= 1.0
    assert r["n"] > 0
    # Huber slope should stay within an order of magnitude of OLS
    assert abs(r["huber_slope"]) <= 10 * abs(r["ols_slope"]) + 1


def test_woe_iv_parts_nonnegative(spark):
    """Each IV contribution is (g−b)·ln(g/b) ≥ 0 (same sign factors)."""
    rows = REGISTRY["q_woe_iv"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["iv_part"] >= -1e-9
        assert r["n_good"] >= 0 and r["n_bad"] >= 0


def test_inventory_policy_positive(spark):
    rows = REGISTRY["q_inventory_policy"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["annual_demand"] > 0
        assert r["eoq"] > 0
        assert r["safety_stock"] >= 0
        assert r["reorder_point"] >= r["safety_stock"]


def test_ipf_margins_converge(spark):
    rows = REGISTRY["q_ipf_raking"].fn(spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        assert r["raked_weight"] > 0
        assert r["adjustment"] > 0
        # after 3 sweeps the row margins sit near their targets
        assert abs(r["row_margin_ratio"] - 1.0) < 0.1
    # column margins are EXACT after the final column sweep
    from collections import defaultdict
    col = defaultdict(float)
    for r in rows:
        col[r["segment"]] += r["raked_weight"]
    vals = list(col.values())
    assert max(vals) - min(vals) < 0.01 * max(vals)


def test_boosting_mse_declines(spark):
    """Each boosting round can only reduce train MSE (lr ∈ (0,1],
    fitted on the exact residuals)."""
    r = REGISTRY["q_l2_boost_stumps"].fn(spark, SF_DIR).collect()[0]
    assert r["mse_ratio_r1"] <= 1.0 + 1e-6
    assert r["mse_ratio_r2"] <= r["mse_ratio_r1"] + 1e-6
    assert r["mse_baseline"] > 0
    assert 5 <= r["thr_1"] <= 45 and 5 <= r["thr_2"] <= 45


def test_adstock_carryover_multiplier(spark):
    """Geometric carryover with λ=0.5 over 7 lags multiplies total
    exposure by ≈ Σλᵏ ≈ 1.99 (edge effects shave a little)."""
    r = REGISTRY["q_adstock_decay"].fn(spark, SF_DIR).collect()[0]
    assert 1.5 <= r["carryover_multiplier"] <= 2.0
    assert -1.0001 <= r["corr_raw"] <= 1.0001
    assert -1.0001 <= r["corr_adstock"] <= 1.0001


def test_tukey_hsd_antisymmetry_and_count(spark):
    rows = REGISTRY["q_tukey_hsd"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2)
    for r in rows:
        assert r["region_a"] < r["region_b"]
        assert r["significant"] in (0, 1)
        # q and mean_diff share sign
        assert (r["q_stat"] >= 0) == (r["mean_diff"] >= 0) or r["mean_diff"] == 0


def test_p_chart_limits_bracket(spark):
    rows = REGISTRY["q_p_chart"].fn(spark, SF_DIR).collect()
    assert rows
    n_ooc = 0
    for r in rows:
        assert 0.0 <= r["lcl"] <= r["ucl"] <= 1.5
        inside = r["lcl"] <= r["p_day"] <= r["ucl"]
        assert r["out_of_control"] == (0 if inside else 1)
        n_ooc += r["out_of_control"]
    # in-control synthetic data: OOC days are rare (< 5%)
    assert n_ooc <= len(rows) * 0.05


def test_coverage_curve_monotone(spark):
    rows = sorted(REGISTRY["q_ngram_coverage_curve"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r["top_k"])
    assert [r["top_k"] for r in rows] == [100, 500, 2000]
    covs = [r["token_coverage"] for r in rows]
    assert all(0.0 < c <= 1.0001 for c in covs)
    assert all(a <= b + 1e-9 for a, b in zip(covs, covs[1:]))  # more types, more coverage
    # once k exceeds the type count, coverage is exactly 1
    for r in rows:
        if r["top_k"] >= r["n_types"]:
            assert r["token_coverage"] == pytest.approx(1.0, abs=1e-6)


def test_weibull_fit_sane(spark):
    r = REGISTRY["q_weibull_fit"].fn(spark, SF_DIR).collect()[0]
    assert r["shape_k"] > 0
    assert r["scale_hours"] > 0
    assert 0.0 <= r["r_squared"] <= 1.0001
    assert r["n"] > 0


def test_seasonal_indices_normalized(spark):
    rows = REGISTRY["q_ratio_to_ma_seasonal"].fn(spark, SF_DIR).collect()
    assert len(rows) == 12
    mean_idx = sum(r["seasonal_index"] for r in rows) / 12
    assert mean_idx == pytest.approx(1.0, abs=0.01)
    for r in rows:
        assert r["raw_index"] > 0 and r["n_obs"] >= 1


def test_stopword_candidates_are_core(spark):
    rows = REGISTRY["q_stopword_discovery"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["df_share"] >= 0.8
        assert 0.0 < r["flatness"] <= 1.0001
        assert r["n_sources"] >= 1


def test_l_diversity_entropy_bound(spark):
    """Entropy l-diversity never exceeds distinct l-diversity
    (exp(H) ≤ #values, equality iff uniform)."""
    rows = REGISTRY["q_l_diversity"].fn(spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        assert 1.0 <= r["entropy_l"] <= r["distinct_sensitive"] + 0.001
        assert r["group_size"] >= r["distinct_sensitive"]


def test_t_closeness_tv_range(spark):
    rows = REGISTRY["q_t_closeness"].fn(spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        assert 0.0 <= r["tv_distance"] <= 1.0
        assert r["satisfies_t02"] == (1 if r["tv_distance"] <= 0.2 else 0)


def test_backtest_horizons_complete(spark):
    rows = sorted(REGISTRY["q_rolling_origin_backtest"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r["horizon"])
    assert [r["horizon"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert r["n_evals"] >= 1
        assert r["mae_naive"] >= 0 and r["mae_seasonal"] >= 0


def test_smr_ci_brackets_point(spark):
    rows = REGISTRY["q_smr_indirect"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    tot_obs = sum(r["observed"] for r in rows)
    tot_exp = sum(r["expected"] for r in rows)
    # indirect standardization conserves totals: sum O = sum E
    assert tot_obs == pytest.approx(tot_exp, rel=0.01)
    for r in rows:
        assert r["ci_lo"] <= r["smr"] <= r["ci_hi"]
        assert r["significant"] in (0, 1)


def test_event_study_pre_period_normalized(spark):
    rows = {r["rel_month"]: r for r in
            REGISTRY["q_event_study"].fn(spark, SF_DIR).collect()}
    assert set(rows) == set(range(-3, 4))
    # by construction the r=-1 effect is exactly 0
    assert rows[-1]["effect_vs_pre"] == pytest.approx(0.0, abs=1e-6)
    for r in rows.values():
        assert r["n_obs"] > 0


def test_bass_grid_complete_with_best(spark):
    rows = REGISTRY["q_bass_diffusion_fit"].fn(spark, SF_DIR).collect()
    assert len(rows) == 9
    assert sum(r["is_best"] for r in rows) >= 1
    for r in rows:
        assert r["sse"] >= 0
        assert r["n_days"] >= 1


def test_esd_z_decreasing_rounds(spark):
    """Peeled z-scores can bounce (sd shrinks after each peel), but all
    three rounds must produce distinct days with positive z."""
    rows = sorted(REGISTRY["q_esd_outliers"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [1, 2, 3]
    days = [r["day"] for r in rows]
    assert len(set(days)) == 3  # peeling never re-selects a removed day
    for r in rows:
        assert r["z_at_peel"] > 0
        assert r["flagged"] == (1 if r["z_at_peel"] > 3.0 else 0)


def test_bow_audit_accounting(spark):
    r = REGISTRY["q_bow_dup_audit"].fn(spark, SF_DIR).collect()[0]
    assert r["n_docs"] >= r["distinct_bags"] >= 1
    assert 0 <= r["bag_dup_docs"] <= r["n_docs"]
    assert 0 <= r["shuffled_template_groups"] <= r["distinct_bags"]


def test_self_excitation_ratio_positive(spark):
    r = REGISTRY["q_self_excitation"].fn(spark, SF_DIR).collect()[0]
    assert r["n_gaps"] > 0
    assert 0.0 <= r["share_within_5min"] <= 1.0
    assert 0.0 < r["poisson_expected"] < 1.0
    assert r["excitation_ratio"] > 0


def test_effective_tokens_bounds(spark):
    rows = REGISTRY["q_effective_tokens"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["effective_tokens"] <= r["raw_tokens"] + 0.01
        assert 0.0 <= r["dup_discount"] <= 1.0


def test_bullwhip_positive(spark):
    rows = REGISTRY["q_bullwhip_ratio"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["bullwhip_ratio"] > 0
        assert r["order_cv2"] >= 0
        assert r["amplifies"] == (1 if r["bullwhip_ratio"] > 1 else 0)


def test_kmv_estimate_in_ballpark(spark):
    """KMV with k=16 has ~1/sqrt(k-2) ≈ 27% relative sd — assert the
    estimate lands within 4 sds of the exact count."""
    r = REGISTRY["q_kmv_union_distinct"].fn(spark, SF_DIR).collect()[0]
    assert r["exact_distinct"] >= 16  # k <= n, sketch well-defined
    assert r["rel_error"] <= 1.1
    assert r["kmv_estimate"] > 0


def test_design_effect_laws(spark):
    r = REGISTRY["q_design_effect"].fn(spark, SF_DIR).collect()[0]
    assert -1.0 <= r["icc"] <= 1.0001
    assert r["deff"] >= 0
    assert 0 < r["effective_n"] <= r["n_obs"] * 2  # deff >= .5 in practice here
    assert r["avg_cluster_size"] == pytest.approx(
        r["n_obs"] / r["n_clusters"], abs=0.001
    )


def test_mediation_identity_exact(spark):
    """The linear-model identity c = c' + a*b holds exactly."""
    r = REGISTRY["q_mediation_paths"].fn(spark, SF_DIR).collect()[0]
    assert r["decomposition_gap"] == pytest.approx(0.0, abs=1e-4)
    assert r["n"] > 0


def test_davies_bouldin_positive(spark):
    r = REGISTRY["q_davies_bouldin"].fn(spark, SF_DIR).collect()[0]
    assert r["n_clusters"] == 10
    assert 0 < r["best_cluster_r"] <= r["davies_bouldin"] <= r["worst_cluster_r"]


def test_umass_coherence_nonpositive_ish(spark):
    """ln((c+1)/df) <= 0 whenever c+1 <= df; coherence is typically
    negative — assert finiteness and the pair count C(5,2)=10."""
    rows = REGISTRY["q_umass_coherence"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_pairs"] == 10
        assert -50 < r["umass_coherence"] < 5


def test_hotelling_t2_nonnegative(spark):
    r = REGISTRY["q_hotelling_t2"].fn(spark, SF_DIR).collect()[0]
    assert r["t_squared"] >= 0
    assert r["f_stat"] >= 0
    assert r["n_a"] > 2 and r["n_b"] > 2
    assert r["reject_equal_means"] == (1 if r["f_stat"] > 3.0 else 0)


def test_pr_curve_recall_monotone(spark):
    """Raising the threshold can only lower recall; precision stays in
    [0,1] and near the base rate for a random scorer."""
    rows = sorted(REGISTRY["q_pr_curve"].fn(spark, SF_DIR).collect(),
                  key=lambda r: r["threshold"])
    assert len(rows) == 9
    recalls = [r["recall"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(recalls, recalls[1:]))
    for r in rows:
        assert 0.0 <= r["precision"] <= 1.0
        assert 0.0 <= r["f1"] <= 1.0


def test_kendall_w_range(spark):
    r = REGISTRY["q_kendall_w"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["kendall_w"] <= 1.0001
    assert r["n_items"] >= 2
    assert r["n_judges"] >= 1


def test_logrank_consistency(spark):
    r = REGISTRY["q_logrank_test"].fn(spark, SF_DIR).collect()[0]
    assert r["variance"] > 0
    assert r["chi_sq"] >= 0
    assert r["chi_sq"] == pytest.approx(
        r["o_minus_e"] ** 2 / r["variance"], rel=0.01
    )
    assert r["reject_equal_survival"] == (1 if r["chi_sq"] > 3.841 else 0)
