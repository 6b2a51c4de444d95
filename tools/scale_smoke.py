#!/usr/bin/env python
"""Scale smoke: run heavy operators at ~10× the bench scale factor.

The grading fixtures stop at sf0.1 (600k lineitem / 5k docs). This
tool manufactures a 10× corpus in /tmp by unioning the sf0.1 tables N
times with key offsets (ids stay unique, distributions unchanged) and
times the operators whose cost curves matter — joins, dedup, vector
top-k, sessionization. A roughly-linear wall-clock ratio vs bench is
the evidence that the plans scale; superlinear blowup flags an
operator whose shuffle or fan-out is size-sensitive.

Usage: python tools/scale_smoke.py [N]   # default N=10
Writes one JSON line, mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from builder_spark.catalog import TABLES, load_table  # noqa: E402
from builder_spark.registry import load_all  # noqa: E402
from builder_spark.session import get_spark  # noqa: E402

#: operators worth scaling: the ones with joins/windows/quadratic risk
HEAVY = [
    "q_agg_group",
    "q_join_multi",
    "q_join_asof",
    "q_dedup_fuzzy",
    "q_cosine_topk",
    "q_win_session",
    "q_tfidf_top_terms",
    "q_tpch_q21",
    "q_decile_stats",  # stitched fact-grain global rank at 10x
    "q_group_decile_bands",  # grouped stitch (3-value PARTITION BY) at 10x
    "q_group_median_exact",  # stitched rank-selection quantiles (r5) at 10x
    # round-6 additions (r7 judge item 5): cell-aggregated density
    # clustering, span masking over token streams, stitched
    # token-balanced sharding, and rolling OLS windows
    "q_grid_density_cluster",
    "q_mlm_span_masking",
    "q_token_balanced_shards",
    "q_rolling_regression",
    # round-7 additions: cell-bucketed semantic dedup, span-hash dup
    # mass, KM gap survival. q_containment_dedup is deliberately NOT
    # here: the fixture's templated text makes the TRUE >=0.9
    # containment relation dense (7M pairs at sf0.1), so its
    # wall-clock tracks OUTPUT size — a 10x ratio would measure answer
    # growth, not plan shape.
    "q_semdedup_prune",
    "q_span_dup_rate",
    "q_survival_km",
    # round-7 batch 2/3: stitched sweep line, stitched double cumsum,
    # broadcast MIPS retrieval, one-shuffle bidirectional as-of
    "q_concurrency_sweep",
    "q_vocab_growth",
    "q_mips_maxdot",
    "q_join_asof_nearest",
    "q_rolling_median",
    "q_source_vocab_overlap",
    # round-9 additions (r8 judge item 5): the r7-tail compute queries —
    # token-grid MaxSim late interaction, query-anchored snippet
    # extraction, HITS over the bipartite click graph, nucleus (top-p)
    # vocabulary truncation
    "q_late_interaction_maxsim",
    "q_snippet_extraction",
    "q_hits_bipartite",
    "q_vocab_nucleus",
    # round-9 batch 2: the new window/iterative shapes — per-user
    # sweep-line interval merge, per-customer drawdown walk,
    # per-user state-dwell lead window, and the 3-round frontier BFS
    "q_merge_intervals",
    "q_max_drawdown",
    "q_time_in_state",
    "q_bfs_frontier",
    # round-9 batch 3: grid-bucketed spatial join, per-part FIFO
    # cumsum, linear-scan MRR vs broadcast queries, length-domain
    # quantile normalization
    "q_geo_nearest",
    "q_fifo_fill",
    "q_mrr_retrieval",
    "q_quantile_normalize",
    # round-9 batch 4: per-part top-2 pivot, per-user mode windows,
    # the 16-mask Shapley lattice over a per-user agg, one-pass
    # Fleiss kappa, and the posexplode anisotropy aggregate
    "q_vickrey_auction",
    "q_group_mode",
    "q_shapley_attribution",
    "q_fleiss_kappa",
    "q_embedding_anisotropy",
    # round-9 batch 5: stitched global decile rank, value-grain
    # stitched rank-sum, region-day sign runs, md5 prefix-key join,
    # leave-one-group fact join
    "q_gains_table",
    "q_mann_whitney_u",
    "q_runs_test",
    "q_boilerplate_prefix",
    "q_jackknife_variance",
    # round-9 batch 6: two-pass Levene z-scores, day-block Friedman
    # ranks, user-lag Markov transitions, (part,year) price-index
    # self-join, nation-grain Theil-Sen pair lattice
    "q_levene_test",
    "q_friedman_test",
    "q_markov_entropy_rate",
    "q_price_index",
    "q_theil_sen",
    # round-9 batch 7: stitched Wasserstein CDF pass, md5 gram-df join,
    # vocab-grain log-odds, FD quantile stitch + bin pass
    "q_wasserstein_1d",
    "q_trigram_support",
    "q_log_odds_monroe",
    "q_fd_histogram",
    # round-9 batch 8: part-grain full-outer PVM, double stitched MAD,
    # vocab-grain KN bigram joins, user-grain co-occurrence pairs,
    # posexplode recentering norms
    "q_pvm_decomposition",
    "q_mad_normalize",
    "q_kneser_ney_bigram",
    "q_event_cooccurrence",
    "q_recenter_l2",
    # round-9 batch 9: stitched MUS cumsum, per-customer ICC moments,
    # vocab-grain Chao1, prefix windows, SAX motif windows
    "q_mus_sample",
    "q_icc_orders",
    "q_chao1_unseen",
    "q_prefix_completions",
    "q_sax_symbols",
    # round-9 batch 10: stitched signed-rank, vocab-grain CMS cells,
    # two-group stitched deciles, 16-slice dim-pair join, part-grain CV
    "q_wilcoxon_signed_rank",
    "q_cms_width_sweep",
    "q_shift_function",
    "q_dim_correlation",
    "q_price_dispersion",
    # round-9 batch 11: stitched quintile ranks, stitched budget cut,
    # window-iterated PCA grid, count-of-counts posting stats, per-row
    # MATTR folds
    "q_qini_uplift",
    "q_budget_selection",
    "q_pca_power_iter",
    "q_posting_stats",
    "q_mattr_diversity",
    # round-9 batch 12: one-projection Bloom cells, stitched SPRT walk,
    # day-block Hurst windows, vocab-grain feature hashing, top-20
    # position probes
    "q_bloom_fpr_sweep",
    "q_sprt_sequential",
    "q_hurst_exponent",
    "q_feature_hashing",
    "q_token_position_bias",
    # round-9 batch 13: event-row threshold cells, user-desc rank
    # windows, char-pair explode, vocab-spread join, part-month lag
    "q_session_gap_sweep",
    "q_competing_risks",
    "q_char_bigram_entropy",
    "q_source_uniqueness",
    "q_price_stickiness",
    # round-9 batch 14: whitened per-vector distances, (dim,label)
    # Fisher cells, stitched median-CI rank pass, 8x bootstrap cells,
    # two-sided stitched tail quantiles
    "q_mahalanobis_outliers",
    "q_fisher_ratio",
    "q_median_ci",
    "q_rank_stability",
    "q_tail_dependence",
    # round-9 batch 15: stitched lognormal probes, quantized MMD sums,
    # stitched conformal residual quantile, md5 dup extrapolation,
    # fold-hash audit
    "q_lognormal_fit",
    "q_mmd_linear",
    "q_conformal_interval",
    "q_dup_mass_extrapolation",
    "q_cv_fold_audit",
    # round-9 batch 16: stitched two-year decile ranks, 4-round
    # broadcast value iteration over the transition grid
    "q_decile_migration",
    "q_absorbing_time",
    # round-10: explode-heavy RAKE phrases, triangle-join clustering
    # coefficient, 3-scan EM and Weiszfeld iterations, stitched AD
    # rank weights, user-window NA hazard, value-grain Cliff cells
    "q_rake_keywords",
    "q_clustering_coeff",
    "q_gmm_em_1d",
    "q_geometric_median",
    "q_anderson_darling",
    "q_nelson_aalen",
    "q_cliffs_delta",
    "q_newsvendor",
    # round-10 batch 5: double-pass ridge moments, fact-join IPW,
    # token-explode Good-Turing, 25-cell two-way ANOVA
    "q_ridge_path",
    "q_propensity_ipw",
    "q_good_turing",
    "q_two_way_anova",
    # round-10 batches 6-10: token-grid stylometry, stitched energy
    # distance, cell-pair hubness, 64x posexplode quantization sweep,
    # lambda-cell LM sweep, fact-join reserving triangle, day-grid
    # Borda votes, (word,doc)-grain burstiness
    "q_burrows_delta",
    "q_energy_distance",
    "q_ann_hubness",
    "q_scalar_quant_sweep",
    "q_lm_interpolation_sweep",
    "q_chain_ladder",
    "q_borda_ranking",
    "q_word_burstiness",
    # round-10 batches 11-12: 3-scan IRLS, lazy IPF sweeps, 3-scan
    # boosting, (brand,day) policy grid, pair-grid HSD, band cells,
    # day-lag adstock, full-chart p-chart
    "q_huber_irls",
    "q_ipf_raking",
    "q_l2_boost_stumps",
    "q_inventory_policy",
    "q_tukey_hsd",
    "q_woe_iv",
    "q_adstock_decay",
    "q_p_chart",
    # round-10 batch 13: bigram count-grain coverage, stitched Weibull
    # ranks, month-MA seasonal indices, multi-grain stopword screen
    "q_ngram_coverage_curve",
    "q_weibull_fit",
    "q_ratio_to_ma_seasonal",
    "q_stopword_discovery",
    # round-10 batch 14: privacy grids, day-index backtest joins,
    # fact-join SMR cells
    "q_l_diversity",
    "q_t_closeness",
    "q_rolling_origin_backtest",
    "q_smr_indirect",
    # round-10 batches 15-16: cell-grid event study, adoption-curve
    # grid fit, peel-round ESD, bag-hash audit, lag-window excitation,
    # hash-cluster token budget, dual-rollup bullwhip, KMV sketch
    "q_event_study",
    "q_bass_diffusion_fit",
    "q_esd_outliers",
    "q_bow_dup_audit",
    "q_self_excitation",
    "q_effective_tokens",
    "q_bullwhip_ratio",
    "q_kmv_union_distinct",
    # round-10 batches 17-18: ANOVA-component design effect,
    # centroid-cell Davies-Bouldin, topic-confined coherence pairs,
    # suff-stat Hotelling, threshold-cell PR curve, month-rank W,
    # gap-grain log-rank
    "q_design_effect",
    "q_davies_bouldin",
    "q_umass_coherence",
    "q_mediation_paths",
    "q_hotelling_t2",
    "q_pr_curve",
    "q_kendall_w",
    "q_logrank_test",
    "q_ljung_box",
    "q_breusch_pagan",
    "q_durbin_watson",
    "q_bartlett_test",
    "q_atkinson_index",
    "q_hoover_index",
    "q_yules_k",
    "q_code_detect",
    "q_kruskal_wallis",
    "q_cpk_process_capability",
    "q_page_hinkley",
    "q_relative_risk",
    "q_pacf",
    "q_spearman_footrule",
    "q_coleman_liau",
    "q_cochran_armitage",
    "q_cohens_d",
    "q_mcc_threshold",
    "q_dot_vs_cosine",
    "q_curriculum_stages",
    "q_seasonal_strength",
    "q_price_digit_bias",
    "q_vocab_drift_halves",
    "q_band_occupancy",
    "q_jains_fairness",
    "q_modularity",
    "q_assortativity",
    "q_holm_bonferroni",
    "q_repeat_ngram_gate",
    "q_growth_accounting",
    "q_decay_halflife",
    "q_ivf_probe_sweep",
    "q_sharpe_sortino",
    "q_intrinsic_dim",
    "q_binary_quant_recall",
    "q_iv_2sls",
    "q_oaxaca_blinder",
    "q_palma_ratio",
    "q_mood_median_test",
    "q_cohen_kappa",
    # round-12 additions: the unit-root day-series trio, day-pair Walsh
    # self-join, token-grain keyness + adjacent-pair ROUGE joins, the
    # per-user zero-day screen, and the stratified CMH rollup
    "q_jarque_bera",
    "q_welchs_anova",
    "q_cmh_test",
    "q_adf_test",
    "q_kpss_test",
    "q_variance_ratio",
    "q_zero_inflation",
    "q_hodges_lehmann",
    "q_dunning_llr",
    "q_rouge_adjacent",
    "q_brown_forsythe",
    "q_tost_equivalence",
    "q_poisson_etest",
    "q_cvm_test",
    "q_xbar_s_chart",
    "q_tolerance_interval",
    "q_paired_ttest",
    "q_bland_altman",
    "q_lin_ccc",
    "q_deming_regression",
    "q_breslow_day",
    "q_minhash_perm_sweep",
    "q_fisher_exact",
    "q_ansari_bradley",
    "q_sign_test",
    "q_ks_uniform",
    "q_storey_qvalues",
    "q_prefix_cache_mass",
    "q_weighted_kappa",
    "q_jonckheere_terpstra",
    "q_somers_gamma",
    "q_bowker_symmetry",
    "q_page_trend",
    "q_log_loss",
    "q_hosmer_lemeshow",
    "q_youden_lr",
    "q_ari_nmi",
    "q_hellinger_weekday",
    "q_cointegration_eg",
    "q_circular_rayleigh",
    "q_mrl_truncation_recall",
    "q_xml_roundtrip",
    "q_brunner_munzel",
    "q_lilliefors",
    "q_conover_squared_ranks",
    "q_rbo_ranking",
    "q_csv_corrupt_records",
    "q_cucconi_test",
    "q_bartels_rank",
    "q_grubbs_max_z",
    "q_padding_waste_curve",
    "q_csv_quoting_roundtrip",
    "q_pettitt_test",
    "q_seasonal_mann_kendall",
    "q_wald_wolfowitz",
    "q_hl_shift_ci",
    "q_quade_test",
    "q_van_der_waerden",
    "q_null_safe_join",
    "q_array_sort_comparator",
    # round-14 additions: grouped-stitch trimmed band, double-stitch
    # rank test, capped applyInPandas sessionization, pruned-pair link
    # prediction, bucketed interval-overlap join, stitched systematic
    # sample — the six whose fan-out or Python path could in principle
    # be size-sensitive
    "q_trimmed_mean",
    "q_bws_test",
    "q_session_cap",
    "q_adamic_adar",
    "q_interval_overlap_join",
    "q_systematic_sample",
]

#: per-table key columns to offset so replicas don't collide
_OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build_scaled(spark, src_dir: str, n: int, out_dir: str) -> None:
    for t in TABLES:
        df = load_table(spark, src_dir, t)
        if t in _OFFSETS:
            key_cols = _OFFSETS[t]
            mx = {c: df.agg(F.max(c)).first()[0] + 1 for c in key_cols}
            parts = []
            for i in range(n):
                p = df
                for c in key_cols:
                    p = p.withColumn(c, F.col(c) + F.lit(i * mx[c]))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df  # dimensions stay as-is (realistic: dims ≪ facts)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))


def main() -> None:
    # usage: scale_smoke.py [N] [query ...] — names restrict the run to
    # a subset of HEAVY (for iterating on one operator without
    # re-timing the whole list); the 10x corpus is cached either way
    args = sys.argv[1:]
    n = int(args.pop(0)) if args and args[0].isdigit() else 10
    heavy = args or HEAVY
    unknown = [q for q in heavy if q not in HEAVY]
    if unknown:
        raise SystemExit(f"not in HEAVY list: {unknown}")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(tempfile.gettempdir(), f"bs_scale_{n}x")
    spark = get_spark("builder-spark-scale-smoke")
    registry = load_all()

    if not os.path.exists(os.path.join(out_dir, "_READY")):
        shutil.rmtree(out_dir, ignore_errors=True)
        build_scaled(spark, src, n, out_dir)
        open(os.path.join(out_dir, "_READY"), "w").close()

    registry["q_agg_group"].fn(spark, out_dir).count()  # warmup
    times = {}
    for name in heavy:
        t0 = time.time()
        registry[name].fn(spark, out_dir).count()
        times[name] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "scale_smoke_total_sec",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "scale_multiple": n,
                "base": src,
            }
        )
    )


if __name__ == "__main__":
    main()
