"""Semantic invariants for the round-9 batch-13 operators:
session-count monotonicity in the gap threshold, supplier-risk
set containment, checksum row-count conservation, CIF summing to 1,
price-ending mass bounds, exclusive-vocabulary conservation,
return-rate range, entropy normalization, spell-duration identity,
and empirical-Bayes contraction (every shrunk mean lies between its
raw mean and the grand mean, with bigger n shrinking less).
"""

from __future__ import annotations

import os

import pytest

from builder_spark.catalog import load_table
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_session_count_monotone_in_gap(spark):
    """A larger inactivity gap can only MERGE sessions, and every
    user contributes at least one session at any threshold."""
    rows = sorted(
        REGISTRY["q_session_gap_sweep"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["gap_minutes"],
    )
    assert [r["gap_minutes"] for r in rows] == [5, 15, 30, 60]
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    for a, b in zip(rows, rows[1:]):
        assert a["n_sessions"] >= b["n_sessions"]
        assert a["events_per_session"] <= b["events_per_session"]
    for r in rows:
        assert r["n_sessions"] >= n_users


def test_supplier_risk_containment(spark):
    r = REGISTRY["q_supplier_risk"].fn(spark, SF_DIR).collect()[0]
    # sole-sourced parts are a subset of majority-single parts
    assert r["n_sole_source"] <= r["n_majority_single"] <= r["n_parts"]
    assert r["avg_suppliers"] >= 1.0


def test_table_checksums_row_conservation(spark):
    rows = {r["tbl"]: r for r in REGISTRY["q_table_checksums"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {"orders", "customer", "lineitem"}
    for t in rows:
        assert rows[t]["n_rows"] == load_table(spark, SF_DIR, t).count()
        assert rows[t]["key_sum"] > 0


def test_competing_risks_cif_sums_to_one(spark):
    rows = REGISTRY["q_competing_risks"].fn(spark, SF_DIR).collect()
    assert rows
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_total_exits"] for r in rows) == n_users
    assert sum(r["cif_final"] for r in rows) == pytest.approx(
        1.0, abs=0.001 * len(rows)
    )


def test_price_endings_mass(spark):
    rows = REGISTRY["q_price_endings"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    assert sum(r["pct"] for r in rows) <= 100.0001
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert 0 <= r["cents_ending"] <= 99
        assert r["excess_vs_uniform"] == pytest.approx(r["pct"] - 1.0, abs=0.001)


def test_source_uniqueness_bounds(spark):
    rows = REGISTRY["q_source_uniqueness"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["exclusive_terms"] <= r["vocab"]
        assert 1.0 <= r["avg_spread"] <= 20.0
        assert r["exclusive_share"] == pytest.approx(
            r["exclusive_terms"] / r["vocab"], abs=0.0002
        )


def test_return_rate_range(spark):
    r = REGISTRY["q_return_rate_trend"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["overall_rate"] <= 1.0
    assert r["n_months"] > 12


def test_char_entropy_normalization(spark):
    rows = REGISTRY["q_char_bigram_entropy"].fn(spark, SF_DIR).collect()
    assert rows
    import math

    for r in rows:
        assert 0.0 <= r["h_char_bigram"] <= math.log(r["n_bigrams"]) + 0.001
        assert 0.0 <= r["h_normalized"] <= 1.0001


def test_price_stickiness_identity(spark):
    r = REGISTRY["q_price_stickiness"].fn(spark, SF_DIR).collect()[0]
    assert r["n_parts"] >= 0
    if r["n_parts"] > 0:
        assert 0.0 <= r["change_rate"] <= 1.0
        if r["avg_spell_months"] is not None:
            assert r["avg_spell_months"] == pytest.approx(
                1.0 / r["change_rate"], rel=0.02
            )


def test_eb_shrinkage_contraction(spark):
    """Every shrunk mean must lie between its raw mean and the grand
    mean (w ∈ [0,1] contraction), and the grand mean is the
    unweighted mean of raw means by construction."""
    rows = REGISTRY["q_eb_shrinkage"].fn(spark, SF_DIR).collect()
    assert rows
    grand = sum(r["raw_mean"] for r in rows) / len(rows)
    for r in rows:
        assert 0.0 <= r["weight"] <= 1.0
        lo, hi = sorted([r["raw_mean"], grand])
        assert lo - 0.51 <= r["shrunk_mean"] <= hi + 0.51
