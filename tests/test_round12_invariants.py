"""Round-12 query invariants — semantic sanity beyond the DuckDB
hash-match (tests/test_queries_oracle.py), in the style of the
round-11 battery: each new statistic obeys its mathematical bounds
and its plan stays in the pinned shuffle envelope.
"""

from __future__ import annotations

import os

import pytest

from builder_spark.plans.inspect import count_exchanges
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()

NEW = [
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
]


def test_round12_registers_behind_backlog():
    """Rotation protection (r11 verdict task 1): every still-never-graded
    round-12 query queues BEHIND the never-driver-graded backlog, so the
    driver's 50-query window keeps burning the older rows before any new
    surface. Structural (derived from CORRECTNESS_r*.json at test time)
    per the r12 verdict — a pinned head literal breaks every time the
    driver grades a window."""
    from tests.rotation_util import assert_registers_behind_backlog

    assert_registers_behind_backlog(REGISTRY, NEW)


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("q_jarque_bera", 1),     # one combinable moment pass
        ("q_welchs_anova", 4),    # join + 5-segment rollup + 1-row totals
        ("q_cmh_test", 2),        # stratum rollup + 1-row aggregate
        ("q_adf_test", 2),        # day rollup + day window
        ("q_kpss_test", 4),       # day rollup reprinted for the 1-row mean
        ("q_variance_ratio", 4),  # day rollup reprinted for the 1-row moments
        ("q_zero_inflation", 4),  # user rollup + 1-row span broadcast
        ("q_hodges_lehmann", 10),  # checkpointed day table + stitched Walsh
                                   # rank (pair lineage prints twice in the
                                   # static plan: local-window + offsets
                                   # branches; ReusedExchange collapses them
                                   # at runtime) + day-grain median rank
        ("q_dunning_llr", 3),     # vocab rollup + 1-row totals + TakeOrdered
        ("q_rouge_adjacent", 14), # 2 gram grains x (counts + self-join + lens)
        ("q_brown_forsythe", 6),  # stitched quantile + checkpointed 5-row moments
        ("q_tost_equivalence", 2),# join + 2-segment rollup pivoted to 1 row
        ("q_poisson_etest", 2),   # user rollup + 1-row aggregate
        ("q_cvm_test", 10),       # two stitched rank passes at fact grain
        ("q_xbar_s_chart", 4),    # day rollup reprinted for the pooled row
        ("q_tolerance_interval", 2),  # join + 5-segment moment rollup
        ("q_paired_ttest", 4),    # join + nation halves + 1-row midpoint
        ("q_bland_altman", 4),    # doc moments reprinted for the count pass
        ("q_lin_ccc", 1),         # one combinable moment pass
        ("q_deming_regression", 1),  # one combinable moment pass
        ("q_breslow_day", 4),     # strata rollup reprinted for the 1-row psi
        ("q_minhash_perm_sweep", 7),  # sig rollup x2 sides + 3 error aggs
        ("q_fisher_exact", 2),    # strata rollup + support explode + agg
        ("q_ansari_bradley", 6),  # one stitched rank pass + 1-row agg
        ("q_sign_test", 5),       # join + nation halves + tail explode
        ("q_ks_uniform", 2),      # 28-cell rollup + bounded CDF window
        ("q_storey_qvalues", 4),  # 35-cell battery + bounded rank windows
        ("q_prefix_cache_mass", 4),  # key-grain groups + 1-row total
        ("q_weighted_kappa", 14),    # 2 stitched quantile passes + cell algebra
    ],
)
def test_round12_shuffle_budget(spark, name, max_exchanges):
    df = REGISTRY[name].fn(spark, SF_DIR)
    n = count_exchanges(df)
    assert n <= max_exchanges, f"{name}: {n} exchanges > budget {max_exchanges}"


def test_jarque_bera_bounds(spark):
    rows = REGISTRY["q_jarque_bera"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["jb_stat"] >= 0
        assert r["reject_normal"] == (1 if r["jb_stat"] > 5.991465 else 0)


def test_welchs_anova_positive(spark):
    r = REGISTRY["q_welchs_anova"].fn(spark, SF_DIR).collect()[0]
    assert r["n_groups"] == 5
    assert r["welch_f"] >= 0
    assert r["df2"] > 0


def test_cmh_nonnegative(spark):
    r = REGISTRY["q_cmh_test"].fn(spark, SF_DIR).collect()[0]
    assert r["n_strata"] == 25
    assert r["cmh_chi2"] >= 0
    assert r["mh_odds_ratio"] > 0


def test_unit_root_trio_consistency(spark):
    """ADF and KPSS ask mirrored questions of the same day series; the
    variance ratio is the third view. All three must agree the series
    EXISTS (same n) and produce finite stats."""
    adf = REGISTRY["q_adf_test"].fn(spark, SF_DIR).collect()[0]
    kpss = REGISTRY["q_kpss_test"].fn(spark, SF_DIR).collect()[0]
    vr = REGISTRY["q_variance_ratio"].fn(spark, SF_DIR).collect()[0]
    assert adf["n_obs"] == kpss["n_days"] - 1 == vr["n_returns"]
    assert kpss["kpss_stat"] >= 0
    assert vr["variance_ratio"] > 0
    assert vr["momentum"] == (1 if vr["variance_ratio"] > 1 else 0)


def test_zero_inflation_accounting(spark):
    r = REGISTRY["q_zero_inflation"].fn(spark, SF_DIR).collect()[0]
    # observed zero-days can't be negative or exceed users x span
    assert 0 <= r["zeros_obs"] <= r["n_users"] * r["span_days"]
    assert r["zeros_expected"] >= 0


def test_hodges_lehmann_within_range(spark):
    """HL sits between the daily min and max; with symmetric-ish data
    it lands near the median (sanity, not equality)."""
    import pyspark.sql.functions as F

    from builder_spark.catalog import load_table

    r = REGISTRY["q_hodges_lehmann"].fn(spark, SF_DIR).collect()[0]
    daily = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.col("o_orderdate").cast("date"))
        .agg((F.sum(F.round(F.col("o_totalprice") * 100)) / 100.0).alias("v"))
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()[0]
    )
    assert daily["lo"] <= r["hl_location"] <= daily["hi"]
    assert daily["lo"] <= r["daily_median"] <= daily["hi"]
    assert r["n_walsh"] == r["n_days"] * (r["n_days"] + 1) // 2


def test_dunning_llr_bounds(spark):
    rows = REGISTRY["q_dunning_llr"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    g2s = [r["g2"] for r in rows]
    assert g2s == sorted(g2s, reverse=True)
    for r in rows:
        assert r["g2"] >= 0
        assert r["cnt_even"] >= 5 and r["cnt_odd"] >= 5


def test_rouge_adjacent_bounds(spark):
    rows = REGISTRY["q_rouge_adjacent"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r["doc_b"] == r["doc_a"] + 1
        assert 0.0 <= r["rouge1_f"] <= 1.0
        if r["rouge2_f"] is not None:
            assert 0.0 <= r["rouge2_f"] <= 1.0
        # ROUGE-2 clipped overlap can never beat ROUGE-1's
        if r["rouge2_f"] is not None and r["rouge1_f"] == 0.0:
            assert r["rouge2_f"] == 0.0


def test_cvm_bounds(spark):
    r = REGISTRY["q_cvm_test"].fn(spark, SF_DIR).collect()[0]
    # T is bounded below by -(something small); the location-free
    # statistic of two samples from the SAME price distribution sits
    # near its null mean 1/6 + tiny
    assert r["n_urgent"] + r["n_other"] > 0
    assert r["cvm_t"] > -1.0


def test_xbar_s_chart_counts(spark):
    r = REGISTRY["q_xbar_s_chart"].fn(spark, SF_DIR).collect()[0]
    assert 0 <= r["xbar_breaches"] <= r["n_days"]
    assert 0 <= r["s_breaches"] <= r["n_days"]
    assert r["sigma_hat"] > 0


def test_tolerance_interval_contains_mean(spark):
    for r in REGISTRY["q_tolerance_interval"].fn(spark, SF_DIR).collect():
        assert r["lo"] < r["mean_log"] < r["hi"]
        assert r["k_factor"] > 1.959964  # tolerance k exceeds the z quantile


def test_paired_ttest_pairs(spark):
    r = REGISTRY["q_paired_ttest"].fn(spark, SF_DIR).collect()[0]
    assert 0 < r["n_pairs"] <= 25


def test_brown_forsythe_vs_levene(spark):
    """Median- and mean-centered Levene ask the same question; on this
    corpus both must at least agree the statistic is finite and
    non-negative."""
    bf = REGISTRY["q_brown_forsythe"].fn(spark, SF_DIR).collect()[0]
    assert bf["bf_stat"] >= 0
    assert bf["n_groups"] == 5


def test_tost_and_etest_defined(spark):
    tost = REGISTRY["q_tost_equivalence"].fn(spark, SF_DIR).collect()[0]
    assert tost["t_lower"] is not None and tost["t_upper"] is not None
    assert tost["t_lower"] > tost["t_upper"]  # +delta side always larger
    et = REGISTRY["q_poisson_etest"].fn(spark, SF_DIR).collect()[0]
    assert et["u1"] + et["u2"] > 0


def test_agreement_trio_consistency(spark):
    """Three views of the same (chars/5, tokens) pairing must agree on
    n and tell one story: CCC <= |r| (CCC is penalized Pearson), and
    the Deming slope is further from 0 than OLS (attenuation)."""
    ba = REGISTRY["q_bland_altman"].fn(spark, SF_DIR).collect()[0]
    cc = REGISTRY["q_lin_ccc"].fn(spark, SF_DIR).collect()[0]
    dm = REGISTRY["q_deming_regression"].fn(spark, SF_DIR).collect()[0]
    assert ba["n_docs"] == cc["n_docs"] == dm["n_docs"]
    assert abs(cc["lin_ccc"]) <= abs(cc["pearson_r"]) + 1e-9
    assert 0.0 <= ba["pct_outside"] <= 1.0
    if dm["ols_slope"] is not None and dm["deming_slope"] is not None:
        assert abs(dm["deming_slope"]) >= abs(dm["ols_slope"]) - 1e-9


def test_breslow_day_bounds(spark):
    r = REGISTRY["q_breslow_day"].fn(spark, SF_DIR).collect()[0]
    assert r["n_strata"] == 5
    assert r["bd_chi2"] >= 0
    assert r["mh_odds_ratio"] > 0


def test_minhash_perm_sweep_monotone(spark):
    """More permutations -> estimator variance shrinks: RMSE at 16
    perms must not exceed RMSE at 4 perms (law of large numbers over
    indicator averages)."""
    rows = {r["n_perms"]: r for r in
            REGISTRY["q_minhash_perm_sweep"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {4, 8, 16}
    assert rows[16]["rmse"] <= rows[4]["rmse"] + 1e-9
    for r in rows.values():
        assert 0.0 <= r["mean_abs_err"] <= 1.0


def test_fisher_exact_is_probability(spark):
    rows = REGISTRY["q_fisher_exact"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["p_upper"] <= 1.0 + 1e-6
        # upper-tail p at the observed a: when a is below expectation,
        # the tail covers most of the mass
        if r["a_obs"] <= r["expected_a"]:
            assert r["p_upper"] > 0.4


def test_sign_test_vs_paired_ttest(spark):
    """Same pairing, two tests: the exact sign test and the paired t
    must agree on the pair count and produce a valid probability."""
    st = REGISTRY["q_sign_test"].fn(spark, SF_DIR).collect()[0]
    tt = REGISTRY["q_paired_ttest"].fn(spark, SF_DIR).collect()[0]
    assert st["n_pos"] + st["n_neg"] <= 25
    assert st["n_pairs"] == st["n_pos"] + st["n_neg"]
    assert 0.0 <= st["p_value"] <= 1.0
    assert tt["n_pairs"] >= st["n_pairs"]  # ties drop from the sign test only


def test_ks_uniform_bounds(spark):
    r = REGISTRY["q_ks_uniform"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["d_stat"] <= 1.0
    assert r["d_critical"] > 0


def test_ansari_bradley_statistic_range(spark):
    r = REGISTRY["q_ansari_bradley"].fn(spark, SF_DIR).collect()[0]
    nn = r["n_urgent"] + r["n_other"]
    # each a-score is in [1, ceil(nn/2)]
    assert r["n_urgent"] <= r["ab_statistic"] <= r["n_urgent"] * ((nn + 1) // 2)


def test_storey_vs_bh_consistency(spark):
    """Storey with pi0 <= 1 can only reject MORE than BH at the same
    alpha; both run on the identical battery so rank sets must align."""
    bh = {(r["event_type"], r["dow"]): r
          for r in REGISTRY["q_bh_fdr"].fn(spark, SF_DIR).collect()}
    st = {(r["event_type"], r["dow"]): r
          for r in REGISTRY["q_storey_qvalues"].fn(spark, SF_DIR).collect()}
    assert set(bh) == set(st)
    for key, b in bh.items():
        s_ = st[key]
        assert s_["rank_i"] == b["rank_i"]
        assert 0.0 <= s_["pi0"] <= 1.0
        if b["rejected"] == 1:
            assert s_["q_value"] <= 0.05 + 1e-9


def test_prefix_cache_mass_monotone(spark):
    """Longer prefixes can only be shared by FEWER docs, and the
    savings share stays a valid fraction."""
    rows = {r["k"]: r for r in
            REGISTRY["q_prefix_cache_mass"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {4, 8, 16}
    assert rows[4]["docs_sharing"] >= rows[8]["docs_sharing"] >= rows[16]["docs_sharing"]
    for r in rows.values():
        assert 0.0 <= r["cache_savings_pct"] <= 1.0
        assert r["docs_sharing"] <= r["n_docs_eligible"]


def test_weighted_kappa_bounds(spark):
    r = REGISTRY["q_weighted_kappa"].fn(spark, SF_DIR).collect()[0]
    assert -1.0 <= r["kappa_weighted"] <= 1.0
    assert 0.0 <= r["agreement_rate"] <= 1.0
    # chars and tokens are strongly related: the two raters must agree
    # far beyond chance on quartiles
    assert r["kappa_weighted"] > 0.3
