"""Semantic invariants for the round-9 batch-8 operators: the PVM
bridge identity (effects sum EXACTLY to ΔR), MAD non-negativity,
k-anonymity population conservation, JL distortion consistency,
recentering conservation laws, Kneser–Ney probability bounds, OOV
rate bounds, co-occurrence pair-grid completeness with PMI=ln(lift),
peak-density upper bound, and Gumbel-top-k size exactness.
"""

from __future__ import annotations

import math
import os

import pytest

from builder_spark.catalog import load_table
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_pvm_bridge_identity(spark):
    """price + volume + new + dropped must equal ΔR — the defining
    property of the decomposition (dropped_part_effect is already
    negative)."""
    r = REGISTRY["q_pvm_decomposition"].fn(spark, SF_DIR).collect()[0]
    bridge = (
        r["price_effect"]
        + r["volume_effect"]
        + r["new_part_effect"]
        + r["dropped_part_effect"]
    )
    assert bridge == pytest.approx(r["delta"], abs=0.05)
    assert r["delta"] == pytest.approx(r["rev_curr"] - r["rev_base"], abs=0.05)
    assert r["n_common"] > 0


def test_mad_normalize_bounds(spark):
    rows = REGISTRY["q_mad_normalize"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["mad_dollars"] >= 0.0
        assert 0 <= r["n_outliers"] <= r["n"]
        # MAD fences at 3.5 robust-sigma keep the vast majority
        assert r["n_outliers"] / r["n"] < 0.25


def test_k_anonymity_conserves_population(spark):
    rows = REGISTRY["q_k_anonymity"].fn(spark, SF_DIR).collect()
    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 0 <= r["n_below_k"] <= r["n_customers"]
        assert r["min_group"] >= 1
        assert r["share_below_k"] == pytest.approx(
            r["n_below_k"] / r["n_customers"], abs=0.0002
        )


def test_jl_projection_distortion_consistency(spark):
    """45 label pairs; distortion must equal dist_proj/dist_orig and
    sit in a sane band for k=8 (JL is loose here, but a sign-matrix
    projection of centroids can't collapse or explode distances by
    10×)."""
    rows = REGISTRY["q_jl_projection"].fn(spark, SF_DIR).collect()
    assert len(rows) == 45
    for r in rows:
        assert r["dist_orig"] > 0
        assert r["distortion"] == pytest.approx(
            r["dist_proj"] / r["dist_orig"], abs=0.01
        )
        assert 0.05 < r["distortion"] < 10.0
    # a healthy (top-bit) sign matrix keeps the TYPICAL pair near 1;
    # the parity-bit bug this guards against had median ~0.5 with a
    # 0.002 tail (rank-1 collapse)
    med = sorted(r["distortion"] for r in rows)[len(rows) // 2]
    assert 0.5 < med < 2.0


def test_recenter_l2_conservation(spark):
    rows = REGISTRY["q_recenter_l2"].fn(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n"] for r in rows) == n_vecs
    for r in rows:
        assert 0 <= r["n_shrunk"] <= r["n"]
        assert r["avg_raw_norm"] > 0 and r["avg_centered_norm"] > 0


def test_kneser_ney_probability_bounds(spark):
    """P_KN is a proper smoothed probability: strictly positive and
    ≤ 1; the board is ranked by the exact bigram count."""
    rows = REGISTRY["q_kneser_ney_bigram"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    counts = [r["c_bigram"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 0.0 < r["p_kn"] <= 1.0001
        assert r["c_bigram"] >= 1


def test_oov_rate_bounds(spark):
    rows = REGISTRY["q_oov_rate"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_test_tokens"]
        assert 0.0 <= r["oov_rate"] <= 1.0


def test_event_cooccurrence_grid_and_pmi(spark):
    """All C(5,2)=10 unordered type pairs; PMI must equal ln(lift)
    and co-occurrence can't exceed the user count."""
    rows = REGISTRY["q_event_cooccurrence"].fn(spark, SF_DIR).collect()
    assert len(rows) == 10
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    for r in rows:
        assert r["ta"] < r["tb"]
        assert 0 < r["c_both"] <= n_users
        assert r["lift"] > 0
        assert r["pmi"] == pytest.approx(math.log(r["lift"]), abs=0.001)


def test_peak_density_bound(spark):
    """Strict local maxima can't occupy adjacent days, so peak count
    is at most ⌈days/2⌉."""
    rows = REGISTRY["q_peak_detection"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_peaks"] <= (r["n_days"] + 1) // 2
        assert r["peak_rate"] == pytest.approx(
            r["n_peaks"] / r["n_days"], abs=0.0002
        )


def test_gumbel_topk_exact_size_and_size_bias(spark):
    """Exactly k=50 documents sampled across languages, and the
    length-weighted sample must skew long overall: the pooled sampled
    mean length exceeds the pooled corpus mean length."""
    rows = REGISTRY["q_gumbel_topk_sample"].fn(spark, SF_DIR).collect()
    assert sum(r["n_sampled"] for r in rows) == 50
    total_sampled_chars = sum(r["chars_sampled"] for r in rows)
    total_corpus_chars = sum(
        r["avg_len_corpus"] * r["n_corpus"] for r in rows
    )
    total_corpus_n = sum(r["n_corpus"] for r in rows)
    assert total_sampled_chars / 50 > total_corpus_chars / total_corpus_n
    for r in rows:
        assert 0 <= r["n_sampled"] <= 50
