"""Round-14 query invariants — semantic sanity beyond the DuckDB
hash-match (tests/test_queries_oracle.py), in the style of the
round-11/12/12b batteries: each new statistic obeys its mathematical
bounds, the stateful operators obey their boundary contracts, and
every plan stays in the pinned shuffle envelope.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from builder_spark.plans.inspect import count_exchanges
from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()

NEW = [
    "q_trimmed_mean",
    "q_systematic_sample",
    "q_ewma_chart",
    "q_fligner_killeen",
    "q_newey_west",
    "q_rdd_sharp",
    "q_bws_test",
    "q_interval_overlap_join",
    "q_adamic_adar",
    "q_session_cap",
    "q_err_ranking",
    "q_matrix_profile_daily",
    "q_dixon_q_test",
    "q_bigram_richness",
    "q_skipgram_pairs",
    "q_wordlist_gate",
    "q_haar_energy",
    "q_mmr_rerank",
]


def test_round14_registers_behind_backlog():
    """Rotation protection: every still-never-graded round-14 query
    queues BEHIND the never-driver-graded backlog (rows 580-653 until
    the driver grades them). Structural — derived from
    CORRECTNESS_r*.json at test time."""
    from tests.rotation_util import assert_registers_behind_backlog

    assert_registers_behind_backlog(REGISTRY, NEW)


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("q_trimmed_mean", 5),          # grouped stitch + group rollup
        ("q_systematic_sample", 4),     # one stitched rank
        ("q_ewma_chart", 5),            # day rollup + bounded windows
        ("q_fligner_killeen", 6),       # stitched median + stitched rank
        ("q_newey_west", 3),            # day rollup + banded self-join
        ("q_rdd_sharp", 4),             # per-order rollup + 2-row algebra
        ("q_bws_test", 12),             # global + grouped stitch passes
        ("q_interval_overlap_join", 4), # session shuffle + broadcast days
        ("q_adamic_adar", 10),          # (cust,part) rollup, prune, pairs
        ("q_session_cap", 2),           # ONE shuffle into applyInPandas
        ("q_err_ranking", 2),           # broadcast KxN, bounded windows
        ("q_matrix_profile_daily", 13), # day-grain subsequence algebra
        ("q_dixon_q_test", 7),          # nation rollup + 5-row algebra
        ("q_bigram_richness", 3),       # (source,bigram) count + rollup
        ("q_skipgram_pairs", 2),        # banded positional self-join
        ("q_wordlist_gate", 2),         # scan-side intersect + rollup
        ("q_haar_energy", 6),           # day rollup + 4 pair levels
        ("q_mmr_rerank", 1),            # broadcast KxN argmax rounds
    ],
)
def test_round14_shuffle_budget(spark, name, max_exchanges):
    df = REGISTRY[name].fn(spark, SF_DIR)
    n = count_exchanges(df)
    assert n <= max_exchanges, f"{name}: {n} exchanges > pinned {max_exchanges}"


def test_trimmed_mean_band(spark):
    """Kept band is n - 2*floor(0.1n) rows and the trimmed mean sits
    inside the winsorized/global envelope (within the group range)."""
    rows = REGISTRY["q_trimmed_mean"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_kept == r.n_total - 2 * math.floor(0.1 * r.n_total)
        assert r.trimmed_mean > 0


def test_systematic_sample_stride(spark):
    """Every sampled rank is ≡ 3 (mod 7) and the sample size is the
    exact stride count floor((N - 3)/7) + 1."""
    from builder_spark.catalog import load_table

    out = REGISTRY["q_systematic_sample"].fn(spark, SF_DIR)
    ranks = [r.sample_rank for r in out.collect()]
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert all(r % 7 == 3 for r in ranks)
    assert len(set(ranks)) == len(ranks)
    assert len(ranks) == (0 if n_docs < 3 else (n_docs - 3) // 7 + 1)


def test_ewma_chart_bounds(spark):
    """EWMA is a convex combination of the observations and mu, so it
    stays inside [min(x, mu), max(x, mu)]; limits widen monotonically
    in t (they converge to the asymptote from below); breach flags are
    consistent with the emitted z and limits."""
    rows = REGISTRY["q_ewma_chart"].fn(spark, SF_DIR).orderBy("day").collect()
    assert rows
    xs = [r.cents for r in rows]
    mu = sum(xs) / len(xs)
    lo, hi = min(min(xs), mu), max(max(xs), mu)
    prev_halfw = 0.0
    for r in rows:
        assert lo - 1e-6 <= r.ewma <= hi + 1e-6
        halfw = (r.ucl - r.lcl) / 2
        assert halfw >= prev_halfw - 1e-9  # monotone widening
        prev_halfw = halfw
        assert r.breach == (1 if (r.ewma > r.ucl or r.ewma < r.lcl) else 0)


def test_fligner_killeen_nonnegative(spark):
    from builder_spark.catalog import load_table

    row = REGISTRY["q_fligner_killeen"].fn(spark, SF_DIR).collect()[0]
    assert row.fk_stat >= 0
    assert row.n_orders == load_table(spark, SF_DIR, "orders").count()
    assert row.variances_differ in (0, 1)


def test_newey_west_consistency(spark):
    """Both SEs positive and the reported ratio is exactly their
    quotient (to rounding)."""
    row = REGISTRY["q_newey_west"].fn(spark, SF_DIR).collect()[0]
    assert row.se_ols > 0 and row.se_hac > 0
    assert abs(row.hac_ratio - row.se_hac / row.se_ols) < 1e-3


def test_rdd_sharp_flag_consistent(spark):
    row = REGISTRY["q_rdd_sharp"].fn(spark, SF_DIR).collect()[0]
    assert row.n_left > 0 and row.n_right > 0
    assert row.se > 0
    assert row.significant == (1 if abs(row.jump) > 1.96 * row.se else 0)


def test_bws_nonnegative(spark):
    """B is an average of squared deviations over positive weights."""
    row = REGISTRY["q_bws_test"].fn(spark, SF_DIR).collect()[0]
    assert row.bws_b >= 0
    assert row.n_building > 0 and row.n_machinery > 0


def test_interval_overlap_bounds(spark):
    """Top-3 busy days; per-day overlap totals are consistent: each
    session's overlap with one day is at most a day, max <= total,
    and every busy day has at least one overlapping session."""
    rows = REGISTRY["q_interval_overlap_join"].fn(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 3
    day_us = 86_400_000_000
    for r in rows:
        assert r.n_sessions >= 1
        assert 0 <= r.max_overlap_us <= day_us
        assert r.max_overlap_us <= r.total_overlap_us <= r.n_sessions * day_us


def test_adamic_adar_ordering_and_bounds(spark):
    """Top-10 by rounded score; every pair's score is bounded by
    n_common / ln(2) (a common customer contributes at most
    1/ln(2))."""
    rows = REGISTRY["q_adamic_adar"].fn(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 10
    scores = [r.aa_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_common >= 1
        assert r.aa_score <= r.n_common / math.log(2) + 1e-6


def test_session_cap_contract(spark):
    """The gap+cap walk's defining invariants on the fixture: every
    session's duration <= cap; intra-session gaps <= gap (implied by
    duration bound only for the cap — check the gap rule by
    reconstruction); session count >= the gap-only sessionization's
    (the cap can only split further); event counts conserve."""
    from builder_spark.catalog import load_table

    out = REGISTRY["q_session_cap"].fn(spark, SF_DIR).collect()
    cap_us, gap_us = 7_200_000_000, 1_800_000_000
    ev = load_table(spark, SF_DIR, "events")
    n_events = ev.count()
    assert sum(r.n_events for r in out) == n_events
    for r in out:
        assert 0 <= r.duration_us <= cap_us
        assert r.duration_us == r.end_us - r.start_us
    # gap-only session count for the SAME gap (lag+cumsum)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros("ts")
    g = us - F.lag(us).over(w)
    gap_only = (
        ev.withColumn("ns", F.when(g.isNull() | (g > gap_us), 1).otherwise(0))
        .agg(F.sum("ns"))
        .collect()[0][0]
    )
    assert len(out) >= gap_only
    # per-user session ids are 1..k with no holes
    per_user: dict[int, list[int]] = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.session_id)
    for sids in per_user.values():
        assert sorted(sids) == list(range(1, len(sids) + 1))


def test_err_ranking_bounds(spark):
    """ERR is a probability-weighted reciprocal rank: 0 <= ERR < 1,
    one row per query vector."""
    rows = REGISTRY["q_err_ranking"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.err10 < 1.0


def test_matrix_profile_exclusion_and_symmetry_bound(spark):
    """Neighbors respect the trivial-match exclusion |i-j| >= 4;
    distances are in [0, 2*sqrt(m)] (z-normalized bound sqrt(4m))."""
    rows = REGISTRY["q_matrix_profile_daily"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r.t_start - r.nn_start) >= 4
        assert 0.0 <= r.mp_dist <= 2 * math.sqrt(7.0) + 1e-6


def test_dixon_q_bounds(spark):
    """Q = gap/range is in [0, 1]; n = 5 nations per region."""
    rows = REGISTRY["q_dixon_q_test"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    crit = {3: 0.941, 4: 0.829, 5: 0.710}
    for r in rows:
        assert 1 <= r.n <= 5  # small fixtures may miss nations
        if r.q_high is None:  # n == 1: range undefined, guarded null
            assert r.is_outlier == 0
            continue
        assert 0.0 <= r.q_high <= 1.0
        assert r.is_outlier == (1 if r.q_high > crit.get(r.n, 0.710) else 0)


def test_bigram_richness_spectrum_consistent(spark):
    """V1 + V2 <= V <= N; Sichel in [0,1]; Honore positive when
    defined (V1 < V)."""
    rows = REGISTRY["q_bigram_richness"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.v1 + r.v2 <= r.v <= r.n_bigrams
        assert 0.0 <= r.sichel_s <= 1.0
        if r.honore_r is not None:
            assert r.honore_r > 0


def test_skipgram_pair_symmetry(spark):
    """Window co-occurrence is symmetric: count(a->b) == count(b->a)
    whenever both orderings appear in the top-20 slice; counts
    positive and sorted."""
    rows = REGISTRY["q_skipgram_pairs"].fn(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 20
    counts = {(r.center, r.context): r.n_pairs for r in rows}
    ns = [r.n_pairs for r in rows]
    assert ns == sorted(ns, reverse=True)
    for (a, b), n in counts.items():
        if (b, a) in counts:
            assert counts[(b, a)] == n


def test_wordlist_gate_rates(spark):
    """Rates in [0,1]; flagged <= docs; avg hits bounded by the
    blocklist size."""
    from builder_spark.queries.round14 import _BLOCKLIST

    rows = REGISTRY["q_wordlist_gate"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_flagged <= r.n_docs
        assert abs(r.flag_rate - r.n_flagged / r.n_docs) < 1e-3
        assert 0.0 <= r.avg_hits <= len(_BLOCKLIST)


def test_haar_energy_parseval(spark):
    """Parseval-style consistency: total series energy of the 16-day
    dyadic window equals sum over levels of 2^level * energy_level
    + 16 * approx_energy (Haar with the (a+b)/2,(a-b)/2 convention
    scales by 2 per level)."""
    from builder_spark.catalog import load_table
    from pyspark.sql import Window as W

    rows = {r.level: r.energy for r in REGISTRY["q_haar_energy"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    e = load_table(spark, SF_DIR, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.round(F.sum("value") * 100).cast("long").alias("cents")
    )
    xs = [
        r.cents * 1.0
        for r in daily.withColumn("t", F.row_number().over(W.orderBy("day")))
        .filter(F.col("t") <= 16)
        .orderBy("t")
        .collect()
    ]
    if len(xs) == 16:
        total = sum(x * x for x in xs)
        recon = sum((2 ** lvl) * rows[lvl] for lvl in (1, 2, 3, 4)) + 16 * rows[0]
        assert abs(total - recon) / total < 1e-9


def test_mmr_first_pick_is_argmax_relevance(spark):
    """Rank 1 is the plain relevance argmax; ranks are 1..k distinct;
    mmr_score never exceeds 0.7*relevance + 0.3 envelope."""
    rows = sorted(
        REGISTRY["q_mmr_rerank"].fn(spark, SF_DIR).collect(), key=lambda r: r.rank
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len({r.vec_id for r in rows}) == len(rows)
    if rows:
        assert rows[0].mmr_score == rows[0].relevance
        for r in rows[1:]:
            assert r.mmr_score <= 0.7 * r.relevance + 0.3 + 1e-6
