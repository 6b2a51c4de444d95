"""Semantic invariants for the round-9 batch-11 operators: Qini
population conservation, budget feasibility, posting-quantile
ordering, assortativity range, weighted-percentile monotonicity and
size-bias dominance, MATTR range, the HHI uniform floor, half-life
sign law, top-k drift set identities, and the power-iteration
eigen-share bounds (λ₁ between trace/d and trace).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_qini_conservation(spark):
    rows = sorted(
        REGISTRY["q_qini_uplift"].fn(spark, SF_DIR).collect(), key=lambda r: r["seg"]
    )
    assert [r["seg"] for r in rows] == [1, 2, 3, 4, 5]
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r["nt"] + r["nc"] for r in rows) == n_users
    for r in rows:
        if r["uplift"] is not None:
            assert -1.0 <= r["uplift"] <= 1.0


def test_budget_selection_feasible(spark):
    rows = REGISTRY["q_budget_selection"].fn(spark, SF_DIR).collect()
    assert sum(r["tokens_selected"] for r in rows) <= 20000
    for r in rows:
        assert 0 <= r["n_selected"] <= r["n_total"]


def test_posting_stats_quantile_order(spark):
    r = REGISTRY["q_posting_stats"].fn(spark, SF_DIR).collect()[0]
    assert 1 <= r["median_posting"] <= r["p99_posting"] <= r["max_posting"]
    assert r["total_postings"] >= r["vocab"]
    assert r["avg_posting"] == pytest.approx(
        r["total_postings"] / r["vocab"], abs=0.01
    )


def test_assortativity_range(spark):
    r = REGISTRY["q_degree_assortativity"].fn(spark, SF_DIR).collect()[0]
    assert r["n_edges"] > 0
    if r["assortativity"] is not None:
        assert -1.0001 <= r["assortativity"] <= 1.0001


def test_weighted_percentiles_monotone_and_size_biased(spark):
    rows = sorted(
        REGISTRY["q_weighted_percentiles"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["pctl"],
    )
    assert [r["pctl"] for r in rows] == [25, 50, 75, 90, 99]
    vals = [r["value_dollars"] for r in rows]
    assert vals == sorted(vals)
    # dollar-weighting upweights big orders: the revenue median sits at
    # or above the count median
    o = load_table(spark, SF_DIR, "orders")
    count_median = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("m")
    ).first()["m"]
    assert vals[1] >= count_median - 0.01


def test_mattr_range(spark):
    rows = REGISTRY["q_mattr_diversity"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["mattr"] <= 1.0
        assert r["n_windows"] >= r["n_docs"] > 0


def test_hhi_uniform_floor(spark):
    rows = REGISTRY["q_hhi_concentration"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["hhi_uniform"] - 0.01 <= r["hhi"] <= 10000.0


def test_retention_halflife_sign_law(spark):
    r = REGISTRY["q_retention_halflife"].fn(spark, SF_DIR).collect()[0]
    assert r["n_weeks"] >= 2
    if r["decay_slope"] is not None and r["decay_slope"] < 0:
        assert r["halflife_weeks"] > 0
    else:
        assert r["halflife_weeks"] is None


def test_topk_drift_set_identities(spark):
    r = REGISTRY["q_topk_drift"].fn(spark, SF_DIR).collect()[0]
    assert r["n_common"] + r["n_entered"] == 10
    assert r["n_common"] + r["n_dropped"] == 10
    c = r["n_common"]
    assert r["jaccard"] == pytest.approx(c / (20 - c), abs=0.001)
    if c > 0:
        assert 0.0 <= r["avg_rank_shift"] <= 9.0


def test_pca_eigen_share_bounds(spark):
    """λ̂₁/trace must sit in [1/d, 1]: the top eigenvalue is at least
    the average and at most the whole trace (PSD matrix); small
    integer-scaling bias allowed."""
    r = REGISTRY["q_pca_power_iter"].fn(spark, SF_DIR).collect()[0]
    assert r["n_vecs"] > 0
    assert 0 <= r["top_dim"] < 16
    assert 1 / 16 - 0.02 <= r["eigen_share"] <= 1.05
