"""Semantic invariants for the round-9 batch-6 operators — cross-row
axioms of the statistics themselves, beyond DuckDB value parity:
kappa/McNemar cell-consistency against a direct recount, Levene W
non-negativity, Friedman rank conservation (Σ mean ranks = k(k+1)/2),
Markov entropy-rate convexity (rate inside the per-state entropy
hull, each H ≤ ln k), Hoeffding radius monotonicity in n, odds-ratio
CI ordering and OR inside it, SMD antisymmetry under arm relabeling
(checked via the flag rule), Fisher index between Laspeyres and
Paasche, and the Theil–Sen pair-count lattice bound.
"""

from __future__ import annotations

import math
import os

import pytest

from builder_spark.catalog import load_table
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_kappa_and_mcnemar_share_cells(spark):
    """The κ and McNemar queries rate the SAME documents with the SAME
    two gates, so κ's off-diagonal cells must equal McNemar's
    discordant cells, both totals must equal the corpus size, and
    κ ∈ [−1, 1] with p_o ∈ [0, 1]."""
    k = REGISTRY["q_cohens_kappa"].fn(spark, SF_DIR).collect()[0]
    m = REGISTRY["q_mcnemar_test"].fn(spark, SF_DIR).collect()[0]
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert k["n"] == m["n"] == n_docs
    assert k["n_a_only"] == m["b_discord"]
    assert k["n_b_only"] == m["c_discord"]
    assert k["n_both"] + k["n_a_only"] + k["n_b_only"] + k["n_neither"] == k["n"]
    assert 0.0 <= k["po"] <= 1.0
    assert -1.0 <= k["kappa"] <= 1.0
    if m["chi2_mcnemar"] is not None:
        assert m["chi2_mcnemar"] >= 0.0


def test_levene_w_nonnegative(spark):
    """W is a ratio of sums of squares scaled by positive dof — it can
    never be negative, and the group/total counts must be sane."""
    r = REGISTRY["q_levene_test"].fn(spark, SF_DIR).collect()[0]
    assert r["k"] >= 2
    assert r["n_total"] > r["k"]
    assert r["w_stat"] >= 0.0


def test_friedman_rank_conservation(spark):
    """Within every complete 5-region block ranks sum to 15, so mean
    ranks must sum to 15 across regions; each mean rank ∈ [1, 5]; Q ≥ 0;
    all regions see the same block count b."""
    rows = REGISTRY["q_friedman_test"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    bs = {r["b"] for r in rows}
    assert len(bs) == 1
    (b,) = bs
    assert b > 0
    assert sum(r["mean_rank"] for r in rows) == pytest.approx(15.0, abs=0.01)
    for r in rows:
        assert 1.0 <= r["mean_rank"] <= 5.0
        assert abs(r["sum_rank"] - r["mean_rank"] * b) <= 0.51 * b / 100 + 0.6
    qs = {r["q_stat"] for r in rows}
    assert len(qs) == 1
    (q,) = qs
    if q is not None:
        assert q >= 0.0


def test_markov_entropy_bounds(spark):
    """Each per-state conditional entropy obeys 0 ≤ H ≤ ln(n_dest)
    (uniform maximizes), and the chain rate — a convex combination of
    the per-state entropies — must lie within their [min, max] hull."""
    rows = REGISTRY["q_markov_entropy_rate"].fn(spark, SF_DIR).collect()
    assert rows
    rates = {r["h_rate"] for r in rows}
    assert len(rates) == 1
    (rate,) = rates
    hs = []
    for r in rows:
        assert r["n_out"] >= r["n_dest"] >= 1
        assert -1e-9 <= r["h_cond"] <= math.log(r["n_dest"]) + 1e-4
        hs.append(r["h_cond"])
    assert min(hs) - 1e-4 <= rate <= max(hs) + 1e-4


def test_hoeffding_eps_decreases_with_n(spark):
    """The Hoeffding radius is √(ln(2/δ)/2n): strictly decreasing in
    the sample size — a bigger source must never get a wider band —
    and flags must match the |mean − μ| > ε rule against a direct
    recomputation of the corpus mean."""
    rows = REGISTRY["q_hoeffding_gate"].fn(spark, SF_DIR).collect()
    assert rows
    by_n = sorted(rows, key=lambda r: r["n"])
    for a, b in zip(by_n, by_n[1:]):
        if a["n"] < b["n"]:
            assert a["eps"] >= b["eps"]
    total = sum(r["n"] for r in rows)
    mu = sum(r["mean_score"] * r["n"] for r in rows) / total
    for r in rows:
        expect = 1 if abs(r["mean_score"] - mu) > r["eps"] else 0
        # rounding of mean_score/eps to 4dp can flip knife-edge cases;
        # allow disagreement only within the rounding band
        if abs(abs(r["mean_score"] - mu) - r["eps"]) > 2e-4:
            assert r["flagged"] == expect


def test_odds_ratio_ci_contains_point(spark):
    """ci_lo ≤ OR ≤ ci_hi (Woolf CI is centered on ln OR), all three
    positive, and the 2×2 cells recount the distinct user base."""
    r = REGISTRY["q_odds_ratio"].fn(spark, SF_DIR).collect()[0]
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert r["a"] + r["b"] + r["c"] + r["d"] == n_users
    assert 0 < r["ci_lo"] <= r["odds_ratio"] <= r["ci_hi"]


def test_smd_flag_rule(spark):
    """Every reported nation must have ≥2 members per arm and the
    imbalanced flag must equal |smd| > 0.1 at the reported rounding."""
    rows = REGISTRY["q_smd_balance"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n0"] > 1 and r["n1"] > 1
        if abs(abs(r["smd"]) - 0.1) > 2e-4:  # outside the rounding band
            assert r["imbalanced"] == (1 if abs(r["smd"]) > 0.1 else 0)


def test_fisher_between_laspeyres_and_paasche(spark):
    """The Fisher ideal index is the geometric mean of Laspeyres and
    Paasche, so it must lie between them; all three positive."""
    r = REGISTRY["q_price_index"].fn(spark, SF_DIR).collect()[0]
    assert r["n_parts"] > 0
    lo, hi = sorted([r["laspeyres"], r["paasche"]])
    assert lo > 0
    assert lo - 1e-4 <= r["fisher"] <= hi + 1e-4


def test_theil_sen_pair_count_bound(spark):
    """Pairs form over the ≤25 nation points: n_pairs ≤ C(n_points, 2)
    (equal-x pairs are dropped), and the slopes are finite."""
    r = REGISTRY["q_theil_sen"].fn(spark, SF_DIR).collect()[0]
    n = r["n_points"]
    assert 2 <= n <= 25
    assert 1 <= r["n_pairs"] <= n * (n - 1) // 2
    assert math.isfinite(r["ts_slope"]) and math.isfinite(r["ols_slope"])
