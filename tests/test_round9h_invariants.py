"""Semantic invariants for the round-9 batch-9 operators: SAX
alphabet/rank laws, cross-correlation range + shrinking support,
MUS selection-count and size-bias laws, ICC/F sign agreement, the
Chao1 ≥ observed-vocabulary law, life-table conservation (Σchurned =
users, at-risk non-increasing, terminal hazard = 1), prefix-table
containment, sign-bit flag rule, seasonality-R² range, and hash-audit
bucket coverage.
"""

from __future__ import annotations

import os

import pytest

from builder_spark.catalog import load_table
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_sax_alphabet_and_ranks(spark):
    rows = REGISTRY["q_sax_symbols"].fn(spark, SF_DIR).collect()
    assert rows
    per = {}
    for r in rows:
        assert len(r["motif"]) == 3 and set(r["motif"]) <= set("abcd")
        assert r["n_occur"] >= 1
        per.setdefault(r["grp"], []).append(r["n_occur"])
    for grp, occ in per.items():
        assert len(occ) <= 3


def test_cross_correlation_range_and_support(spark):
    rows = sorted(
        REGISTRY["q_cross_correlation"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["lag"],
    )
    assert [r["lag"] for r in rows] == list(range(8))
    for a, b in zip(rows, rows[1:]):
        assert a["n_days"] >= b["n_days"]  # each lag drops one more day
    for r in rows:
        if r["xcorr"] is not None:
            assert -1.0001 <= r["xcorr"] <= 1.0001


def test_mus_selection_count_and_size_bias(spark):
    """Interval sampling places ≤ total//B ∈ {40, 41} hits, each order
    absorbs ≥1 hit when selected, and the dollar-weighted design must
    pick orders at least as large as average overall."""
    rows = REGISTRY["q_mus_sample"].fn(spark, SF_DIR).collect()
    n_sel = sum(r["n_sampled"] for r in rows)
    assert 1 <= n_sel <= 41
    tot_orders = sum(r["n_orders"] for r in rows)
    tot_cents = sum(r["cents_sampled"] for r in rows)
    o = load_table(spark, SF_DIR, "orders")
    import pyspark.sql.functions as F

    corpus_avg = (
        o.agg(F.avg(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))).first()[0]
    )
    assert tot_orders > n_sel
    assert tot_cents / n_sel >= corpus_avg  # PPS upweights big orders


def test_icc_f_sign_agreement(spark):
    """ICC > 0 ⇔ MSB > MSW (F > 1); both in valid ranges."""
    r = REGISTRY["q_icc_orders"].fn(spark, SF_DIR).collect()[0]
    assert r["n_orders"] > r["n_customers"] >= 2
    assert r["f_ratio"] > 0
    assert -1.0 <= r["icc"] <= 1.0
    if abs(r["f_ratio"] - 1.0) > 0.001:
        assert (r["icc"] > 0) == (r["f_ratio"] > 1)


def test_chao1_dominates_observed_vocab(spark):
    rows = REGISTRY["q_chao1_unseen"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["chao1"] >= r["vocab"]
        assert 0.0 <= r["unseen_mass"] <= 1.0
        assert r["f1"] + r["f2"] <= r["vocab"]


def test_churn_hazard_life_table_laws(spark):
    rows = sorted(
        REGISTRY["q_churn_hazard"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["tenure_week"],
    )
    assert rows
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r["churned"] for r in rows) == n_users
    assert rows[0]["at_risk"] == n_users
    for a, b in zip(rows, rows[1:]):
        assert a["at_risk"] >= b["at_risk"]
        assert a["at_risk"] - a["churned"] == b["at_risk"]
    last = rows[-1]
    assert last["churned"] == last["at_risk"]  # terminal hazard = 1
    for r in rows:
        assert 0.0 <= r["hazard"] <= 1.0


def test_prefix_completions_containment(spark):
    rows = REGISTRY["q_prefix_completions"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    masses = [r["prefix_mass"] for r in rows]
    assert masses == sorted(masses, reverse=True)
    for r in rows:
        assert r["top_completion"].startswith(r["prefix"])
        assert 0 < r["n_occur"] <= r["prefix_mass"]
        assert 0.0 < r["share"] <= 1.0


def test_signbit_density_flag_rule(spark):
    rows = REGISTRY["q_signbit_density"].fn(spark, SF_DIR).collect()
    assert len(rows) == 16
    for r in rows:
        assert 0.0 <= r["pos_rate"] <= 1.0
        if abs(r["pos_rate"] - 0.1) > 0.001 and abs(r["pos_rate"] - 0.9) > 0.001:
            expect = 1 if (r["pos_rate"] < 0.1 or r["pos_rate"] > 0.9) else 0
            assert r["dead_bit"] == expect


def test_seasonality_strength_is_r_squared(spark):
    rows = REGISTRY["q_seasonality_strength"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert -0.0001 <= r["strength"] <= 1.0001


def test_hash_uniformity_coverage(spark):
    r = REGISTRY["q_hash_uniformity"].fn(spark, SF_DIR).collect()[0]
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert r["n_keys"] == n_orders
    assert r["n_nonempty"] == r["n_buckets"] == 16
    assert r["min_bucket"] <= n_orders / 16 <= r["max_bucket"]
    assert r["chi2"] >= 0.0
