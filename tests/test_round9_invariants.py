"""Semantic invariants for the round-9 operators — checks the DuckDB
differential CANNOT express (cross-row axioms of the statistic itself,
not value parity): Shapley efficiency, BH step-up prefix structure,
FIFO conservation, interval-merge lower bounds, HRW conservation +
one-way churn, anisotropy's norm/mean-cos identity, tau-b bounds.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()


def test_shapley_efficiency_axiom(spark):
    """Σ_i phi_i must equal v(grand coalition) − v(∅) — the efficiency
    axiom that uniquely characterizes Shapley values (with symmetry/
    dummy/additivity). Recomputed independently from the mask table."""
    phis = {
        r["channel"]: r["phi"]
        for r in REGISTRY["q_shapley_attribution"].fn(spark, SF_DIR).collect()
    }
    assert set(phis) == {"click", "view", "signup", "error"}

    # independent v(0) and v(15) from the same exposure definition
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_type"
    )
    cnt = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))  # noqa: E731
    pu = ev.groupBy("user_id").agg(
        cnt("click").alias("n_click"),
        cnt("view").alias("n_view"),
        cnt("signup").alias("n_signup"),
        cnt("error").alias("n_error"),
        cnt("purchase").alias("n_purchase"),
    )
    tot = pu.agg(
        F.count(F.lit(1)).alias("nu"),
        F.sum("n_click").alias("tc"),
        F.sum("n_view").alias("tv"),
        F.sum("n_signup").alias("ts"),
        F.sum("n_error").alias("te"),
        F.sum("n_purchase").alias("tp"),
    ).collect()[0]
    import math

    thr = {
        c: math.ceil(tot["t" + c[0] if c != "signup" else "ts"] / tot["nu"])
        for c in ["click", "view", "error"]
    }
    thr["signup"] = math.ceil(tot["ts"] / tot["nu"])
    thr_p = math.ceil(tot["tp"] / tot["nu"])
    rows = pu.collect()
    from collections import defaultdict

    mask_n = defaultdict(int)
    mask_c = defaultdict(int)
    for r in rows:
        m = (
            8 * (r["n_click"] >= thr["click"])
            + 4 * (r["n_view"] >= thr["view"])
            + 2 * (r["n_signup"] >= thr["signup"])
            + 1 * (r["n_error"] >= thr["error"])
        )
        mask_n[m] += 1
        mask_c[m] += r["n_purchase"] >= thr_p
    v0 = mask_c[0] / mask_n[0] if mask_n[0] else 0.0
    v15 = mask_c[15] / mask_n[15] if mask_n[15] else 0.0
    assert sum(phis.values()) == pytest.approx(v15 - v0, abs=5e-4)


def test_bh_rejections_form_rank_prefix(spark):
    """BH step-up rejects exactly ranks 1..k* — the rejected set must be
    a prefix of the p-value ranking, never a gap."""
    rows = REGISTRY["q_bh_fdr"].fn(spark, SF_DIR).collect()
    rejected = sorted(r["rank_i"] for r in rows if r["rejected"] == 1)
    assert rejected == list(range(1, len(rejected) + 1))
    assert len(rows) == 35 and sorted(r["rank_i"] for r in rows) == list(range(1, 36))


def test_fifo_conservation(spark):
    """Demand is exactly half the total (integer), fully-consumed lots
    never exceed the lot count, and the partial take is non-negative
    and smaller than the demand whenever any lot was fully consumed."""
    for r in REGISTRY["q_fifo_fill"].fn(spark, SF_DIR).collect():
        assert r["demand"] == r["total_qty"] // 2
        assert 0 <= r["n_full"] <= r["n_lots"]
        assert r["partial_qty"] >= 0
        assert r["n_full"] < r["n_lots"] or r["partial_qty"] == 0


def test_merge_intervals_lower_bound(spark):
    """Every merged interval spans at least one 5-minute base interval,
    so covered_sec ≥ 300 · n_merged; and merging can't produce more
    intervals than the user's event count."""
    ev_counts = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = REGISTRY["q_merge_intervals"].fn(spark, SF_DIR).collect()
    assert {r["user_id"] for r in out} == set(ev_counts)
    for r in out:
        assert r["covered_sec"] >= 300 * r["n_merged"]
        assert 1 <= r["n_merged"] <= ev_counts[r["user_id"]]


def test_rendezvous_conservation_and_one_way_churn(spark):
    """Every doc lands in exactly one of the 8 shards, and HRW's
    minimal-disruption property bounds churn: growing 8→9 moves ~1/9
    of docs (binomial-loose bounds), never more than a third of any
    shard in this fixture."""
    rows = REGISTRY["q_rendezvous_shards"].fn(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["shard"] for r in rows} <= set(range(8))
    total_moved = sum(r["n_moved"] for r in rows)
    assert 0 < total_moved < n_docs / 3
    for r in rows:
        assert 0 <= r["n_moved"] <= r["n_docs"]


def test_anisotropy_identity(spark):
    """‖mean‖² and the mean pairwise cosine are two views of the same
    quantity: n²‖mean‖² = n + n(n−1)·mean_cos — must agree within
    output rounding."""
    for r in REGISTRY["q_embedding_anisotropy"].fn(spark, SF_DIR).collect():
        n = r["n_vecs"]
        lhs = (n * r["norm_of_mean"]) ** 2
        rhs = n + n * (n - 1) * r["mean_pairwise_cos"]
        assert lhs == pytest.approx(rhs, rel=None, abs=n * n * 2e-4)
        assert -1.0 / (n - 1) - 1e-4 <= r["mean_pairwise_cos"] <= 1.0 + 1e-9


def test_kendall_tau_bounds(spark):
    row = REGISTRY["q_kendall_tau"].fn(spark, SF_DIR).collect()[0]
    n0 = row["n_nations"] * (row["n_nations"] - 1) // 2
    assert row["concordant"] + row["discordant"] <= n0
    assert -1.0 <= row["tau_b"] <= 1.0


def test_mrr_rank_reciprocal_consistency(spark):
    for r in REGISTRY["q_mrr_retrieval"].fn(spark, SF_DIR).collect():
        assert r["rel_rank"] >= 1
        if r["rel_rank"] <= 10:
            assert r["rr"] == pytest.approx(1.0 / r["rel_rank"], abs=1e-4)
        else:
            assert r["rr"] == 0.0


def test_geo_nearest_within_radius(spark):
    for r in REGISTRY["q_geo_nearest"].fn(spark, SF_DIR).collect():
        assert 0.0 <= r["dist_km"] <= 100.0


def test_topk_with_ties_rank_semantics(spark):
    """Within each priority the emitted ranks must be RANK()-shaped:
    start at 1, gaps exactly the tie multiplicities, max rank ≤ 3."""
    from collections import defaultdict

    by_prio = defaultdict(list)
    for r in REGISTRY["q_topk_with_ties"].fn(spark, SF_DIR).collect():
        by_prio[r["prio"]].append((r["rk"], r["price"]))
    for prio, rows in by_prio.items():
        rows.sort()
        assert rows[0][0] == 1, prio
        # equal prices share a rank; the next rank jumps by the tie count
        seen = defaultdict(int)
        for rk, price in rows:
            seen[rk] += 1
        expect = 1
        for rk in sorted(seen):
            assert rk == expect, (prio, dict(seen))
            expect += seen[rk]
        assert max(seen) <= 3
