"""Standing degenerate-input audit (round-12, VERDICT r11 task 3).

tools/degenerate_audit.py runs every query on BOTH engines against a
0-row and a 1-row slice of every table and flags raises (ANSI
DIVIDE_BY_ZERO etc.), row-count and canonical-value divergence. The
round-12 sweep found 75 findings across 60 queries — all fixed; this
battery pins the class shut:

- the REGRESSION SET (the 60 once-failing queries) runs on every CI
  pass — these are the shapes that actually break (driver-side Python
  on empty collects, unguarded denominators, grouped-vs-global agg
  row counts, empty-write readback);
- the FULL 584-query sweep runs when SPARK_GRAFT_FULL_DEGEN=1 (the
  per-round close-out gate; ~10 min of Spark time).
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "degenerate_audit",
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "tools", "degenerate_audit.py"
    ),
)
_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_audit)

#: Every query the round-12 sweep caught (75 findings, 60 queries) —
#: the degenerate-input regression set. A new failure here means a
#: refactor re-opened the class; run the full tool to see the detail.
REGRESSION_SET = sorted(
    [
        "q_adstock_decay",
        "q_ann_hubness",
        "q_attribution_markov",
        "q_auc_roc",
        "q_binary_quant_recall",
        "q_bloom_fpr_sweep",
        "q_breusch_pagan",
        "q_cohen_kappa",
        "q_cohens_kappa",
        "q_compaction",
        "q_conformal_interval",
        "q_cosine_topk",
        "q_cramers_v",
        "q_cronbach_alpha",
        "q_cube",
        "q_cuped",
        "q_dataset_card",
        "q_design_effect",
        "q_dup_mass_extrapolation",
        "q_durbin_watson",
        "q_embedding_anisotropy",
        "q_er_blocking",
        "q_gains_table",
        "q_gmm_em_1d",
        "q_grouping_sets",
        "q_hive_partitioned_source",
        "q_holt_linear",
        "q_huber_irls",
        "q_incremental_dedup",
        "q_ivf_probe_sweep",
        "q_jackknife_variance",
        "q_join_key_skew",
        "q_js_divergence",
        "q_kmeans_embed",
        "q_kmeans_silhouette",
        "q_kruskal_wallis",
        "q_ks_test",
        "q_l2_boost_stumps",
        "q_lang_mix_entropy",
        "q_levene_test",
        "q_ljung_box",
        "q_mediation_paths",
        "q_moments",
        "q_multi_regression",
        "q_near_dup_precision_recall",
        "q_pacf",
        "q_pagerank",
        "q_page_hinkley",
        "q_pca_power_iter",
        "q_pivot_multi_agg",
        "q_power_analysis",
        "q_rollup",
        "q_seasonality_strength",
        "q_self_excitation",
        "q_stream_foreach_batch",
        "q_tail_dependence",
        # round-14 sweep catches (single-row fixture): unguarded
        # (n-1) variance denominator / sxx=0 slope division — both
        # fixed with F.when/nullif guards on BOTH engines
        "q_fligner_killeen",
        "q_newey_west",
        # r14 ADVICE closures (round 15): same unguarded-denominator
        # class, caught by review not the sweep (the plain fixtures
        # never reached the division) — guarded + targeted fixtures
        # below (test_round15_advice_fixtures)
        "q_ewma_chart",
        "q_rdd_sharp",
        "q_time_rollup",
        "q_topk_drift",
        "q_wilson_interval",
        "q_woe_iv",
        "q_write_roundtrip",
    ]
)


def test_degenerate_audit_pinned_clean(spark):
    """Both fixtures × both engines over the regression set (or the
    full surface with SPARK_GRAFT_FULL_DEGEN=1): zero findings is the
    pinned state."""
    names = None if os.environ.get("SPARK_GRAFT_FULL_DEGEN") else REGRESSION_SET
    findings = _audit.audit(names=names, spark=spark)
    assert findings == [], (
        f"{len(findings)} degenerate-input finding(s) — run "
        f"`python tools/degenerate_audit.py` for detail: {findings[:5]}"
    )


def test_round15_advice_fixtures(spark):
    """r14 ADVICE: the plain empty/single fixtures never reach
    q_ewma_chart's (n-1) variance denominator (no purchase row) or
    q_rdd_sharp's slope divisions (band filter empties first). These
    targeted fixtures do — a single purchase day (n-1 == 0) and a
    flat in-band order group (sxx == 0) — and both engines must agree
    without raising."""
    findings = _audit.audit(
        names=["q_ewma_chart"], fixtures=("single_purchase",), spark=spark
    )
    findings += _audit.audit(
        names=["q_rdd_sharp"], fixtures=("rdd_flat_band",), spark=spark
    )
    assert findings == [], findings


def test_fixtures_preserve_schema():
    """The 0-row slice must keep each table's arrow schema — a fixture
    that silently drops or retypes columns would make the whole audit
    vacuous."""
    import pyarrow.parquet as pq

    d = _audit.build_fixture("empty")
    for t in ("events", "documents", "embeddings", "lineitem"):
        src = pq.read_schema(os.path.join(_audit.BASE_SF, f"{t}.parquet"))
        dst = pq.read_schema(os.path.join(d, f"{t}.parquet"))
        assert src.equals(dst), t
        assert pq.read_metadata(os.path.join(d, f"{t}.parquet")).num_rows == 0
