"""Semantic invariants for the round-9 batch-12 operators:
feature-hashing pigeonhole laws, Neyman allocation feasibility,
the memory-gain ≥ 0 information inequality, CVaR ≤ VaR tail ordering,
Croston identity, XYZ partition laws, the Hurst range, SPRT walk
bounds, the Bloom FPR-shrinks-with-bits law with the fill-ratio
prediction, and position-bias range/flag rules.
"""

from __future__ import annotations

import os

import pytest

from builder_spark.catalog import load_table
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_feature_hashing_pigeonhole(spark):
    r = REGISTRY["q_feature_hashing"].fn(spark, SF_DIR).collect()[0]
    assert r["used"] <= r["n_buckets"] == 256
    assert r["max_terms_per_bucket"] * r["used"] >= r["vocab"] / 256  # sanity
    if r["vocab"] > r["n_buckets"]:
        # pigeonhole: more terms than buckets forces collisions
        assert r["colliding_terms"] >= r["vocab"] - r["n_buckets"]
    assert 0.0 <= r["colliding_mass_share"] <= 1.0


def test_neyman_allocation_feasible(spark):
    rows = REGISTRY["q_neyman_allocation"].fn(spark, SF_DIR).collect()
    assert rows
    total = sum(r["n_alloc"] for r in rows)
    assert 1000 - len(rows) <= total <= 1000  # floor loses < 1 per stratum
    assert sum(r["alloc_share"] for r in rows) == pytest.approx(
        1.0, abs=0.001 * len(rows)
    )
    for r in rows:
        assert 0 <= r["n_alloc"] <= 1000


def test_markov_memory_gain_nonnegative(spark):
    """Conditioning on more context can only reduce entropy:
    H(next|p1,p2) ≤ H(next|p1), so the gain is ≥ 0 (both estimated
    on the same empirical trigram counts, where the inequality is an
    algebraic identity, not just asymptotic)."""
    r = REGISTRY["q_markov2_memory"].fn(spark, SF_DIR).collect()[0]
    assert r["h_order2"] >= -1e-4
    assert r["h_order1"] >= r["h_order2"] - 1e-4
    assert r["memory_gain"] == pytest.approx(
        r["h_order1"] - r["h_order2"], abs=0.001
    )


def test_cvar_dominates_var(spark):
    """CVaR (mean of the tail beyond VaR) can never be better than
    VaR itself."""
    r = REGISTRY["q_var_cvar"].fn(spark, SF_DIR).collect()[0]
    assert r["n_days"] > 0
    if r["cvar95_dollars"] is not None:
        assert r["cvar95_dollars"] <= r["var95_dollars"]


def test_croston_identity(spark):
    r = REGISTRY["q_croston_intermittent"].fn(spark, SF_DIR).collect()[0]
    assert r["n_parts"] >= 0
    if r["n_parts"] > 0:
        assert r["avg_demand_size"] >= 1.0  # nonzero demand days
        assert r["avg_interval_days"] >= 1.0
        assert r["croston_rate_per_day"] > 0
        assert 0 <= r["n_intermittent"] <= r["n_parts"]


def test_xyz_partition(spark):
    rows = REGISTRY["q_xyz_variability"].fn(spark, SF_DIR).collect()
    assert {r["xyz"] for r in rows} <= {"X", "Y", "Z"}
    assert sum(r["qty_share"] for r in rows) == pytest.approx(
        1.0, abs=0.001 * max(len(rows), 1)
    )
    for r in rows:
        assert r["n_parts"] > 0 and r["total_qty"] > 0


def test_hurst_range(spark):
    """R/S Hurst estimates land in (0, 1) for any real series (the
    estimator can drift slightly past at tiny n — allow margin)."""
    r = REGISTRY["q_hurst_exponent"].fn(spark, SF_DIR).collect()[0]
    # tiny SFs have calendar gaps, so few complete blocks survive; the
    # slope needs >= 2 scales to exist at all
    assert r["n_scales"] >= 1
    if r["n_scales"] >= 2 and r["hurst"] is not None:
        assert -0.2 <= r["hurst"] <= 1.2


def test_sprt_walk_bounds(spark):
    """Crossing indices are valid sample positions; the decision is
    consistent with which boundary was hit first; the max/min of the
    walk bound the boundaries that were crossed."""
    r = REGISTRY["q_sprt_sequential"].fn(spark, SF_DIR).collect()[0]
    n = r["n_events"]
    assert n > 0
    a, b = 2944439, -2944439
    if r["first_accept_h1"] is not None:
        assert 1 <= r["first_accept_h1"] <= n
        assert r["max_llr"] >= a
    if r["first_accept_h0"] is not None:
        assert 1 <= r["first_accept_h0"] <= n
        assert r["min_llr"] <= b
    h1, h0 = r["first_accept_h1"], r["first_accept_h0"]
    if r["decision_h1"] == 1:
        assert h1 is not None and (h0 is None or h1 < h0)
    elif r["decision_h1"] == 0:
        assert h0 is not None


def test_bloom_fpr_shrinks_with_bits(spark):
    """More bits ⇒ lower fill ⇒ FPR can only improve; and the
    measured FPR must be in the same regime the fill ratio predicts
    (≈ fill² for k=2, within a loose factor)."""
    rows = sorted(
        REGISTRY["q_bloom_fpr_sweep"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["n_bits"],
    )
    assert [r["n_bits"] for r in rows] == [1024, 4096, 16384]
    for a, b in zip(rows, rows[1:]):
        assert a["fill_ratio"] >= b["fill_ratio"]
        assert a["fpr"] >= b["fpr"] - 0.02
    for r in rows:
        assert 0.0 <= r["fpr"] <= 1.0
        assert 0 < r["bits_set"] <= r["n_bits"]
        predicted = r["fill_ratio"] ** 2
        assert r["fpr"] <= max(5 * predicted, 0.05)


def test_token_position_bias_ranges(spark):
    rows = REGISTRY["q_token_position_bias"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert 0.0 <= r["mean_rel_position"] <= 1.0
        assert r["n_docs"] > 0 and r["n_occur"] >= r["n_docs"]
        if abs(r["mean_rel_position"] - 0.35) > 0.001:
            assert r["front_loaded"] == (
                1 if r["mean_rel_position"] < 0.35 else 0
            )
