"""Semantic invariants for the round-9 batch-7 operators — cross-row
axioms beyond DuckDB value parity: Cochran cell consistency with the
kappa 2×2, the Wasserstein ≥ |Δmean| transport lower bound, z-score
normalization identities, FD histogram mass conservation, sampling-
table range partition of [0,1], power-analysis flag consistency,
support-rate bounds, SRM population conservation, and the
participation-ratio range law 1 ≤ PR ≤ d.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_cochran_cells_match_kappa(spark):
    """Gates A and B are the SAME predicates as q_cohens_kappa's
    raters, so Cochran's per-gate totals must recount the kappa cells
    (G_A = both + a_only, G_B = both + b_only) and Q ≥ 0."""
    q = REGISTRY["q_cochran_q"].fn(spark, SF_DIR).collect()[0]
    k = REGISTRY["q_cohens_kappa"].fn(spark, SF_DIR).collect()[0]
    assert q["n"] == k["n"]
    assert q["g_a"] == k["n_both"] + k["n_a_only"]
    assert q["g_b"] == k["n_both"] + k["n_b_only"]
    if q["q_cochran"] is not None:
        assert q["q_cochran"] >= 0.0


def test_wasserstein_dominates_mean_gap(spark):
    """W₁(A, B) ≥ |E[A] − E[B]| (Jensen on the coupling) and ≥ 0 —
    the transport lower bound, checked against directly recomputed
    group means."""
    r = REGISTRY["q_wasserstein_1d"].fn(spark, SF_DIR).collect()[0]
    o = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    means = {
        row["o_orderpriority"]: row["m"]
        for row in o.groupBy("o_orderpriority")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()
    }
    gap = abs(means["1-URGENT"] - means["5-LOW"])
    assert r["emd_dollars"] >= gap - 0.01
    assert r["emd_dollars"] >= 0.0


def test_log_odds_top10_is_bounded_and_finite(spark):
    rows = REGISTRY["q_log_odds_monroe"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    zs = [abs(r["zeta"]) for r in rows]
    assert zs == sorted(zs, reverse=True)  # ranked by |z|
    for r in rows:
        assert math.isfinite(r["zeta"])
        assert r["y1"] + r["y2"] >= 0


def test_zscore_identities(spark):
    """Per-source z-mean must be ~0 (the normalization identity),
    max|z| ≥ |z-mean|, and outliers can't exceed the row count."""
    rows = REGISTRY["q_zscore_normalize"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r["z_mean"]) <= 0.0002  # 4dp rounding of ~0
        assert r["max_abs_z"] >= abs(r["z_mean"])
        assert 0 <= r["n_outliers"] <= r["n"]


def test_fd_histogram_conserves_mass(spark):
    """Bin counts must sum to the orders row count; bins are distinct
    and non-negative; bin_lo is monotone in the bin index."""
    rows = REGISTRY["q_fd_histogram"].fn(spark, SF_DIR).collect()
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r["n"] for r in rows) == n_orders
    by_bin = sorted(rows, key=lambda r: r["bin"])
    assert len({r["bin"] for r in rows}) == len(rows)
    for a, b in zip(by_bin, by_bin[1:]):
        assert a["bin"] >= 0 and a["bin_lo_dollars"] < b["bin_lo_dollars"]


def test_negative_sampling_ranges_partition_unit_interval(spark):
    """The cumulative ranges must tile [0, 1]: first lo = 0, last
    hi = 1, consecutive ranges touch exactly (same quantized integer
    ⇒ identical rounded value), probs sum to ~1, counts ranked."""
    rows = REGISTRY["q_negative_sampling_table"].fn(spark, SF_DIR).collect()
    assert rows
    ordered = sorted(rows, key=lambda r: r["cum_lo"])
    assert ordered[0]["cum_lo"] == 0.0
    assert abs(ordered[-1]["cum_hi"] - 1.0) <= 0.0002
    for a, b in zip(ordered, ordered[1:]):
        assert a["cum_hi"] == b["cum_lo"]
    assert abs(sum(r["prob"] for r in rows) - 1.0) <= 0.0002 * len(rows)
    counts = [r["c"] for r in ordered]
    assert counts == sorted(counts, reverse=True)


def test_power_analysis_flag_consistency(spark):
    """feasible=1 must imply n_obs/2 covers the (ceil'd) requirement;
    requirement positive; mean positive."""
    rows = REGISTRY["q_power_analysis"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_required"] > 0 and r["mean_dollars"] > 0
        if r["feasible"] == 1:
            assert r["n_obs"] / 2.0 >= r["n_required"] - 1
        else:
            assert r["n_obs"] / 2.0 < r["n_required"]


def test_trigram_support_rate_bounds(spark):
    rows = REGISTRY["q_trigram_support"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["support_rate"] <= 1.0
        assert r["n_grams"] >= r["n_docs"] > 0


def test_srm_conserves_population(spark):
    """Arm counts across nations must recount the customer table
    exactly, chi2 ≥ 0, and the flag must match the exact integer
    rule (n0−n1)²·/(n0+n1) > 10.8276."""
    rows = REGISTRY["q_srm_check"].fn(spark, SF_DIR).collect()
    n_cust = load_table(spark, SF_DIR, "customer").count()
    assert sum(r["n0"] + r["n1"] for r in rows) == n_cust
    for r in rows:
        chi2 = (r["n0"] - r["n1"]) ** 2 / (r["n0"] + r["n1"])
        assert r["chi2"] >= 0.0
        assert r["srm_flag"] == (1 if chi2 > 10.8276 else 0)


def test_effective_rank_range_law(spark):
    """1 ≤ PR ≤ n_dims (Cauchy–Schwarz both ways) and
    rank_ratio = PR/n_dims."""
    r = REGISTRY["q_effective_rank"].fn(spark, SF_DIR).collect()[0]
    assert r["n_dims"] == 64
    assert 1.0 <= r["effective_rank"] <= r["n_dims"]
    assert r["rank_ratio"] == pytest.approx(
        r["effective_rank"] / r["n_dims"], abs=0.0002
    )
