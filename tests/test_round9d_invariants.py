"""Semantic invariants for the round-9 batch-5 operators — cross-row
axioms of the statistics themselves, beyond DuckDB value parity:
budget conservation + common-water-level structure for the capped
allocation, run-count bounds, U-statistic range, gains-table
conservation + capture monotonicity, Cramér's V range, jackknife
closeness, ordinal-entropy normalization, and prefix-group
conservation.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_capped_allocation_conserves_budget_and_water_level(spark):
    """Σ alloc must equal B = (4·Σcap)//5 exactly; binding groups get
    exactly their cap; non-binding groups share ONE water level
    t = alloc/w (the defining property of water-filling); and every
    allocation respects its cap."""
    rows = REGISTRY["q_capped_allocation"].fn(spark, SF_DIR).collect()
    assert len(rows) == 25
    total_cap = sum(r["cap"] for r in rows)
    budget = (total_cap * 4) // 5
    assert sum(r["alloc"] for r in rows) == pytest.approx(budget, abs=25 * 1e-3)
    levels = set()
    for r in rows:
        assert r["alloc"] <= r["cap"] + 1e-6
        if r["binding"] == 1:
            assert r["alloc"] == pytest.approx(r["cap"], abs=1e-6)
        else:
            levels.add(round(r["alloc"] / r["w"], 6))
    assert len(levels) <= 1  # one shared water level among non-binding
    # binding groups must sit at or below the water level (cheaper caps bind)
    if levels:
        (t,) = levels
        for r in rows:
            if r["binding"] == 1:
                assert r["cap"] / r["w"] <= t + 1e-6


def test_runs_test_bounds(spark):
    """R ∈ [1, n] for any non-empty sign sequence, and z's sign must
    agree with R − μ (more runs than expected ⇒ positive z)."""
    for r in REGISTRY["q_runs_test"].fn(spark, SF_DIR).collect():
        n = r["n_up"] + r["n_down"]
        if n == 0:
            continue
        assert 1 <= r["runs"] <= n
        if r["z"] is not None and r["n_up"] > 0 and r["n_down"] > 0:
            mu = 1 + 2.0 * r["n_up"] * r["n_down"] / n
            if abs(r["runs"] - mu) > 1e-9:
                assert (r["z"] > 0) == (r["runs"] > mu)


def test_mann_whitney_u_range(spark):
    """0 ≤ U₁ ≤ n₁·n₂ — the hard range of the U statistic — and the
    rank-sum identity keeps U₁ a multiple of 0.5."""
    row = REGISTRY["q_mann_whitney_u"].fn(spark, SF_DIR).collect()[0]
    assert 0 <= row["u1"] <= row["n1"] * row["n2"]
    assert float(row["u1"] * 2).is_integer()


def test_gains_table_conservation(spark):
    """Deciles partition all customers (sizes differing by ≤1),
    cumulative capture is nondecreasing and ends at 1.0, and the
    n-weighted mean of pos_rate reproduces the base rate (so lift
    averages to 1)."""
    rows = sorted(
        REGISTRY["q_gains_table"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(r["n"] for r in rows) == n_cust
    sizes = {r["n"] for r in rows}
    assert max(sizes) - min(sizes) <= 1
    caps = [r["cum_capture"] for r in rows]
    assert caps == sorted(caps)
    assert caps[-1] == pytest.approx(1.0, abs=1e-4)
    total_pos = sum(r["n_pos"] for r in rows)
    wmean = sum(r["n"] * r["pos_rate"] for r in rows) / n_cust
    assert wmean == pytest.approx(total_pos / n_cust, abs=1e-3)


def test_cramers_v_range(spark):
    row = REGISTRY["q_cramers_v"].fn(spark, SF_DIR).collect()[0]
    assert row["chi2"] >= 0
    assert 0.0 <= row["cramers_v"] <= 1.0
    assert row["r_levels"] == 25 and row["c_levels"] == 5


def test_jackknife_mean_tracks_full_estimate(spark):
    """Leave-one-group-out estimates average back near the full-sample
    estimate (exactly equal only for linear statistics; a ratio's gap
    is O(1/n)) and SE is positive."""
    row = REGISTRY["q_jackknife_variance"].fn(spark, SF_DIR).collect()[0]
    assert row["g"] == 25
    assert row["se_jack"] > 0
    assert abs(row["theta_jack_mean"] - row["theta_full"]) < 0.05 * abs(
        row["theta_full"]
    )


def test_permutation_entropy_normalized(spark):
    """PE ∈ [0, 1] by the ln 6 normalization; ≤ 6 patterns can occur;
    and the window count matches the series length − 2 recomputed
    independently from the region-day rollup."""
    days = {
        r["r_name"]: r["nd"]
        for r in (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .join(
                spark.read.parquet(f"{SF_DIR}/customer.parquet"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .join(
                spark.read.parquet(f"{SF_DIR}/nation.parquet"),
                F.col("c_nationkey") == F.col("n_nationkey"),
            )
            .join(
                spark.read.parquet(f"{SF_DIR}/region.parquet"),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("r_name", F.date_trunc("day", "o_orderdate").alias("d"))
            .groupBy("r_name")
            .agg(F.countDistinct("d").alias("nd"))
            .collect()
        )
    }
    rows = REGISTRY["q_permutation_entropy"].fn(spark, SF_DIR).collect()
    assert {r["r_name"] for r in rows} == set(days)
    for r in rows:
        assert 0.0 <= r["pe"] <= 1.0 + 1e-9
        assert 1 <= r["n_patterns"] <= 6
        assert r["n_windows"] == days[r["r_name"]] - 2


def test_seasonal_decompose_covers_week(spark):
    rows = REGISTRY["q_seasonal_decompose"].fn(spark, SF_DIR).collect()
    assert sorted(r["dow"] for r in rows) == list(range(7))
    for r in rows:
        # |seasonal| can never exceed the mean absolute detrended value
        assert abs(r["seasonal"]) <= r["mean_abs_det"] + 1e-4


def test_boilerplate_prefix_conservation(spark):
    """Per-source doc counts must sum to the corpus size, boiler docs
    are a subset, and a source's distinct prefixes can't exceed its
    docs."""
    rows = REGISTRY["q_boilerplate_prefix"].fn(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["n_boiler_docs"] <= r["n_docs"]
        assert 1 <= r["n_prefixes"] <= r["n_docs"]
        assert r["boiler_rate"] == pytest.approx(
            r["n_boiler_docs"] / r["n_docs"], abs=1e-4
        )


def test_simpson_flip_implies_opposite_signs(spark):
    rows = REGISTRY["q_simpson_check"].fn(spark, SF_DIR).collect()
    assert len(rows) == 25
    pooled = {r["pooled_slope"] for r in rows}
    assert len(pooled) == 1  # one global slope broadcast to every row
    for r in rows:
        if r["sign_flip"] == 1:
            assert r["slope"] * r["pooled_slope"] < 0
