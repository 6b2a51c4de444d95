"""Round-9 surface growth, batch 11: Qini uplift curve over
deterministic arms, budget-constrained greedy selection, inverted-
index posting statistics, bipartite degree assortativity, weighted
percentiles, MATTR lexical diversity, Herfindahl concentration,
retention half-life fit, leaderboard (top-k) drift, and a fixed-round
power-iteration PCA step over the dimension covariance grid.

Design rules (unchanged): entity/vocab/value-grain collapse first;
cumulative structure rides ``stitched_running``; iterative linear
algebra is UNROLLED over constant-bounded grids (16×16 covariance,
2 rounds) — never a driver loop over fact data; deterministic arms
come from the Knuth hash; one identical float expression per
statistic, rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.functions.hashing import KNUTH, knuth_top_bit
from builder_spark.operators.partitioning import ntile_from_rank, stitched_running
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# Qini uplift curve


@register(
    "q_qini_uplift",
    oracle=f"""
        WITH pu AS (
            SELECT user_id,
                   CAST(((CAST(user_id AS HUGEINT) * {KNUTH})
                         % 4294967296) // 2147483648 AS INT) AS arm,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS converted
            FROM events GROUP BY user_id
        ),
        rk AS (
            SELECT arm, converted,
                   ntile(5) OVER (ORDER BY n_events DESC, user_id ASC) AS seg
            FROM pu
        ),
        cells AS (
            SELECT seg,
                   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
                   CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                        AS BIGINT) AS yt,
                   CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                        AS BIGINT) AS yc
            FROM rk GROUP BY seg
        ),
        cum AS (
            SELECT seg, nt, nc, yt, yc,
                   sum(yt) OVER w AS cyt, sum(yc) OVER w AS cyc,
                   sum(nt) OVER w AS cnt_t, sum(nc) OVER w AS cnt_c
            FROM cells WINDOW w AS (ORDER BY seg
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)
        )
        SELECT CAST(seg AS INT) AS seg, nt, nc,
               round(CASE WHEN nt > 0 AND nc > 0
                     THEN yt * 1.0 / nt - yc * 1.0 / nc END, 4) AS uplift,
               round(CASE WHEN cnt_c > 0
                     THEN cyt - cyc * cnt_t * 1.0 / cnt_c END, 4) AS qini
        FROM cum
    """,
    category="analytics",
)
def q_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve over activity quintiles: per segment the
    incremental conversion rate (treated − control, arms from the
    Knuth user hash) and the cumulative Qini value
    Qini(k) = Σyt − Σyc·(Nt/Nc) — the uplift-model evaluation
    standard: a targeting policy is worth shipping only if Qini grows
    faster than the random-targeting diagonal. The missing third leg
    of the experiment suite: q_abtest_proportions tests THE average
    effect, q_gains_table ranks by outcome, THIS ranks by
    incremental effect.

    Per-user flags are one combinable aggregate; quintiles come from
    a rank over the bounded user aggregate (user grain, unique-key
    tie-break); cells collapse to 5 rows before the cumulative
    window (whitelisted); everything integer-exact to the two final
    ratios."""
    pu = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("converted"),
        )
        .withColumn("arm", knuth_top_bit("user_id").cast("int"))
    )
    ranked = stitched_running(
        pu.select(
            "arm", "converted", (-F.col("n_events")).alias("neg_n"), "user_id"
        ),
        ["neg_n", "user_id"],
        rank_name="rn",
        with_totals=True,
    )
    rk = ranked.withColumn("seg", ntile_from_rank(5, "rn", "rn_total"))
    cells = rk.groupBy("seg").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("nt"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("nc"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("yt"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("yc"),
    )
    w = Window.orderBy("seg").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "seg",
        "nt",
        "nc",
        "yt",
        "yc",
        F.sum("yt").over(w).alias("cyt"),
        F.sum("yc").over(w).alias("cyc"),
        F.sum("nt").over(w).alias("cnt_t"),
        F.sum("nc").over(w).alias("cnt_c"),
    )
    # tiny-SF quintiles can be one-armed — report NULL, never a
    # divide-by-zero (same CASE guards in the oracle)
    return cum.select(
        F.col("seg").cast("int").alias("seg"),
        "nt",
        "nc",
        F.round(
            F.when(
                (F.col("nt") > 0) & (F.col("nc") > 0),
                F.col("yt") * 1.0 / F.col("nt") - F.col("yc") * 1.0 / F.col("nc"),
            ),
            4,
        ).alias("uplift"),
        F.round(
            F.when(
                F.col("cnt_c") > 0,
                F.col("cyt") - F.col("cyc") * F.col("cnt_t") * 1.0 / F.col("cnt_c"),
            ),
            4,
        ).alias("qini"),
    )


# ---------------------------------------------------------------------------
# budget-constrained greedy selection


_BUDGET_TOKENS = 20000


@register(
    "q_budget_selection",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source,
                   CAST(length(text) - length(replace(text, ' ', '')) + 1
                        AS BIGINT) AS n_tokens,
                   CAST(least(n_chars, 2000) AS BIGINT) AS q
            FROM documents
        ),
        scored AS (
            SELECT doc_id, source, n_tokens,
                   q * 1000000 // n_tokens AS score_ppm
            FROM d WHERE n_tokens > 0
        ),
        r AS (
            SELECT source, n_tokens,
                   sum(n_tokens) OVER (ORDER BY score_ppm DESC, doc_id ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum_tokens
            FROM scored
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN cum_tokens <= {_BUDGET_TOKENS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
               CAST(sum(CASE WHEN cum_tokens <= {_BUDGET_TOKENS}
                        THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_selected
        FROM r GROUP BY source
    """,
    category="llm-pipeline",
)
def q_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained greedy selection: rank documents by
    quality-per-token (integer ppm score — capped chars per token)
    and keep the prefix that fits a 20k-token budget — the knapsack
    greedy that is optimal-up-to-one-item for this LP relaxation, and
    the selection policy behind "best data under a compute budget"
    curation. Reports kept counts and token mass per source.

    The value ordering rides ONE stitched running token sum over the
    (score, doc_id) order — never a single-partition window; the
    score is exact integer arithmetic (q·10⁶ div tokens), so the
    selected set is deterministic cross-engine; the budget cut is an
    integer comparison."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (
            F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("bigint")
        .alias("n_tokens"),
        F.least(F.col("n_chars"), F.lit(2000)).cast("bigint").alias("q"),
    )
    scored = d.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr("q * 1000000 div n_tokens").alias("score_ppm"),
    )
    r = stitched_running(
        scored.select(
            "source", "n_tokens", (-F.col("score_ppm")).alias("neg_score"), "doc_id"
        ),
        ["neg_score", "doc_id"],
        running={"cum_tokens": "n_tokens"},
    )
    kept = F.when(F.col("cum_tokens") <= _BUDGET_TOKENS, 1).otherwise(0)
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(kept).cast("bigint").alias("n_selected"),
        F.sum(kept * F.col("n_tokens")).cast("bigint").alias("tokens_selected"),
    )


# ---------------------------------------------------------------------------
# inverted-index posting statistics


@register(
    "q_posting_stats",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
            FROM documents
        ),
        df AS (
            SELECT term, CAST(count(*) AS BIGINT) AS posting_len
            FROM tok GROUP BY term
        ),
        coc AS (
            SELECT posting_len, CAST(count(*) AS BIGINT) AS n_terms
            FROM df GROUP BY posting_len
        ),
        tot AS (
            SELECT CAST(sum(n_terms) AS BIGINT) AS vocab,
                   CAST(sum(posting_len * n_terms) AS BIGINT) AS total_postings
            FROM coc
        ),
        cum AS (
            SELECT posting_len, n_terms,
                   sum(n_terms) OVER (ORDER BY posting_len
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum_terms
            FROM coc
        )
        SELECT vocab, total_postings,
               round(total_postings * 1.0 / vocab, 2) AS avg_posting,
               CAST(min(CASE WHEN cum_terms * 2 >= vocab
                        THEN posting_len END) AS BIGINT) AS median_posting,
               CAST(min(CASE WHEN cum_terms * 100 >= vocab * 99
                        THEN posting_len END) AS BIGINT) AS p99_posting,
               CAST(max(posting_len) AS BIGINT) AS max_posting
        FROM cum CROSS JOIN tot
        GROUP BY vocab, total_postings
    """,
    category="llm-text",
)
def q_posting_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index sizing profile: document-frequency (posting-list
    length) distribution over the corpus vocabulary — total postings,
    mean/median/p99/max posting length — the numbers that size a
    search index's storage and decide its stop-list (the max-posting
    terms) before building q_bm25_search's index.

    Per-doc DISTINCT terms collapse to document frequency at vocab
    grain; the distribution collapses AGAIN to a count-of-counts
    table bounded by the max df, so the exact median/p99 are integer
    cumsum probes over that tiny domain (the q_join_key_skew
    discipline), never a rank over the vocabulary."""
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("term")
    )
    df = tok.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("posting_len"))
    coc = df.groupBy("posting_len").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms")
    )
    tot = coc.agg(
        F.sum("n_terms").cast("bigint").alias("vocab"),
        F.sum(F.col("posting_len") * F.col("n_terms"))
        .cast("bigint")
        .alias("total_postings"),
    )
    w = Window.orderBy("posting_len").rowsBetween(Window.unboundedPreceding, 0)
    cum = coc.select(
        "posting_len", "n_terms", F.sum("n_terms").over(w).alias("cum_terms")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("vocab", "total_postings")
        .agg(
            F.round(F.col("total_postings") * 1.0 / F.col("vocab"), 2).alias(
                "avg_posting"
            ),
            F.min(
                F.when(
                    F.col("cum_terms") * 2 >= F.col("vocab"), F.col("posting_len")
                )
            )
            .cast("bigint")
            .alias("median_posting"),
            F.min(
                F.when(
                    F.col("cum_terms") * 100 >= F.col("vocab") * 99,
                    F.col("posting_len"),
                )
            )
            .cast("bigint")
            .alias("p99_posting"),
            F.max("posting_len").cast("bigint").alias("max_posting"),
        )
        .select(
            "vocab",
            "total_postings",
            "avg_posting",
            "median_posting",
            "p99_posting",
            "max_posting",
        )
    )


# ---------------------------------------------------------------------------
# bipartite degree assortativity


@register(
    "q_degree_assortativity",
    oracle="""
        WITH e AS (
            SELECT DISTINCT user_id, event_type FROM events
        ),
        du AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS deg_u FROM e
            GROUP BY user_id
        ),
        dt AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS deg_t FROM e
            GROUP BY event_type
        )
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               round(avg(deg_u), 4) AS avg_user_degree,
               round(avg(deg_t), 4) AS avg_type_degree,
               round(CASE WHEN stddev_samp(deg_u) > 0 AND stddev_samp(deg_t) > 0
                     THEN covar_samp(deg_u, deg_t)
                          / (stddev_samp(deg_u) * stddev_samp(deg_t)) END, 4)
                   AS assortativity
        FROM e JOIN du USING (user_id) JOIN dt USING (event_type)
    """,
    category="analytics",
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the user–event-type bipartite graph:
    across edges, the correlation between the user's degree and the
    type's degree — do broad users do popular things (assortative,
    >0) or niche things (disassortative, <0)? The one-number mixing
    summary on top of q_degree_distribution's marginals and the
    structure check before q_hits_bipartite's score propagation.

    Edges dedup once; both degree tables are combinable aggregates
    joined back on their own keys (type side broadcast-small); corr
    is one combinable pass over edges."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    du = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("deg_u"))
    dt = e.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("deg_t"))
    j = e.join(du, "user_id").join(F.broadcast(dt), "event_type")
    # a degenerate graph (all degrees equal, e.g. every user does every
    # type at tiny SF) has zero variance on a side — report NULL, not a
    # divide-by-zero (same CASE guard in the oracle)
    sd_u, sd_t = F.stddev_samp("deg_u"), F.stddev_samp("deg_t")
    r = F.when(
        (sd_u > 0) & (sd_t > 0), F.covar_samp("deg_u", "deg_t") / (sd_u * sd_t)
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.round(F.avg("deg_u"), 4).alias("avg_user_degree"),
        F.round(F.avg("deg_t"), 4).alias("avg_type_degree"),
        F.round(r, 4).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# weighted percentiles


@register(
    "q_weighted_percentiles",
    oracle=f"""
        WITH v AS (
            SELECT {_OC} AS cents, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum({_OC}) AS BIGINT) AS w
            FROM orders GROUP BY {_OC}
        ),
        r AS (
            SELECT cents, w,
                   sum(w) OVER (ORDER BY cents
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cw
            FROM v
        ),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM v),
        probes AS (
            SELECT p FROM (VALUES (25), (50), (75), (90), (99)) t(p)
        )
        SELECT CAST(p AS INT) AS pctl,
               round(min(CASE WHEN cw * 100 >= tw * p THEN cents END)
                     / 100.0, 2) AS value_dollars
        FROM r CROSS JOIN tot CROSS JOIN probes
        GROUP BY p
    """,
    category="order-stats",
)
def q_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOLLAR-weighted percentiles of order value: the price v such
    that p% of total REVENUE (not order count) sits at or below v —
    p50 here is the "half the money" point, far above the count
    median for skewed books. The weighted generalization of
    q_global_median_exact, and what monetary SLAs/concentration
    reports actually quote (a count percentile under-weights the
    whales by construction).

    Prices collapse to value grain with integer weight sums; ONE
    stitched running weight sum serves all five probes (inverse-CDF
    by integer cross-multiplication — no division, no floats until
    the display cast); the probe grid is a 5-row broadcast."""
    oc = F.expr(_OC)
    v = (
        load_table(spark, sf_dir, "orders")
        .groupBy(oc.alias("cents"))
        .agg(F.sum(oc).cast("bigint").alias("w"))
    )
    r = stitched_running(v, ["cents"], running={"cw": "w"})
    tot = v.agg(F.sum("w").cast("bigint").alias("tw"))
    probes = F.explode(F.array(*[F.lit(p) for p in (25, 50, 75, 90, 99)])).alias("p")
    return (
        r.crossJoin(F.broadcast(tot))
        .select("cents", "cw", "tw", probes)
        .groupBy(F.col("p").cast("int").alias("pctl"))
        .agg(
            F.round(
                F.min(
                    F.when(
                        F.col("cw") * 100 >= F.col("tw") * F.col("p"), F.col("cents")
                    )
                )
                / 100.0,
                2,
            ).alias("value_dollars")
        )
    )


# ---------------------------------------------------------------------------
# MATTR lexical diversity (strided windows)


_MATTR_W = 50  # window length in tokens
_MATTR_STRIDE = 10


@register(
    "q_mattr_diversity",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
        ),
        win AS (
            SELECT doc_id, lang,
                   list_transform(
                       range(1, greatest(len(ws) - {_MATTR_W - 1}, 0) + 1),
                       i -> CASE WHEN (i - 1) % {_MATTR_STRIDE} = 0
                            THEN len(list_distinct(list_slice(ws, i,
                                     i + {_MATTR_W - 1}))) END) AS tt
            FROM d WHERE len(ws) >= {_MATTR_W}
        ),
        per AS (
            SELECT doc_id, lang,
                   CAST(list_sum(list_filter(tt, x -> x IS NOT NULL))
                        AS BIGINT) AS tt_sum,
                   CAST(len(list_filter(tt, x -> x IS NOT NULL)) AS BIGINT)
                       AS n_win
            FROM win
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_win) AS BIGINT) AS n_windows,
               round(sum(tt_sum) * 1.0 / (sum(n_win) * {_MATTR_W}), 4)
                   AS mattr
        FROM per GROUP BY lang
    """,
    category="llm-text",
)
def q_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR — moving-average type-token ratio over 50-token windows
    (stride 10): the lexical-diversity measure that, unlike the raw
    TTR in q_vocab_stats, does NOT shrink mechanically with document
    length (Heaps' law makes whole-doc TTR a length proxy; fixed
    windows remove that). Per language: window count and the mean
    windowed TTR.

    Window distinct-counts are bounded per-row array folds (O(W²/s)
    per document, constant in corpus size — the q_snippet_extraction
    discipline); per-doc sums are exact integers; one combinable
    rollup per language. Docs shorter than one window are excluded
    identically by an integer length gate."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("ws")
    ).filter(F.size("ws") >= _MATTR_W)
    tt = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("ws") - (_MATTR_W - 1), F.lit(0))),
        lambda i: F.when(
            (i - 1) % _MATTR_STRIDE == 0,
            F.size(F.array_distinct(F.slice(F.col("ws"), i, _MATTR_W))),
        ),
    )
    win = d.select("doc_id", "lang", tt.alias("tt"))
    kept = F.filter(F.col("tt"), lambda x: x.isNotNull())
    per = win.select(
        "lang",
        F.aggregate(kept, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("tt_sum"),
        F.size(kept).cast("bigint").alias("n_win"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_win").cast("bigint").alias("n_windows"),
        F.round(
            F.sum("tt_sum") * 1.0 / (F.sum("n_win") * _MATTR_W), 4
        ).alias("mattr"),
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman concentration


@register(
    "q_hhi_concentration",
    oracle=f"""
        WITH per AS (
            SELECT c_mktsegment AS seg, o_custkey,
                   {_OC} // 100 AS rev_d
            FROM orders JOIN customer ON o_custkey = c_custkey
        ),
        cust AS (
            SELECT seg, o_custkey, CAST(sum(rev_d) AS BIGINT) AS rd
            FROM per GROUP BY seg, o_custkey
        ),
        s AS (
            SELECT seg, CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(rd) AS BIGINT) AS total,
                   CAST(sum(rd * rd) AS BIGINT) AS sum_sq
            FROM cust GROUP BY seg
        )
        SELECT seg, n_customers,
               round(sum_sq * 10000.0 / (total * 1.0 * total), 2) AS hhi,
               round(1.0 / n_customers * 10000, 2) AS hhi_uniform
        FROM s
    """,
    category="analytics",
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of revenue concentration within
    each market segment: HHI = 10⁴·Σ shareᵢ² over customer revenue
    shares (10⁴/n = perfectly even; 10⁴ = monopoly; antitrust calls
    >2500 concentrated). The squared-shares complement of
    q_gini_concentration and q_pareto_customers — HHI weights the
    single biggest whale hardest.

    Σshare² = Σrd²/(Σrd)² so the whole statistic is ONE ratio of
    exact integer sums (revenue quantized to whole dollars first to
    keep Σrd² far from int64 range at any SF) — no per-customer float
    shares are ever summed."""
    per = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            "o_custkey",
            F.expr(f"{_OC} div 100").alias("rev_d"),
        )
    )
    cust = per.groupBy("seg", "o_custkey").agg(
        F.sum("rev_d").cast("bigint").alias("rd")
    )
    s = cust.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rd").cast("bigint").alias("total"),
        F.sum(F.col("rd") * F.col("rd")).cast("bigint").alias("sum_sq"),
    )
    return s.select(
        "seg",
        "n_customers",
        F.round(
            F.col("sum_sq") * 10000.0 / (F.col("total") * 1.0 * F.col("total")), 2
        ).alias("hhi"),
        F.round(1.0 / F.col("n_customers") * 10000, 2).alias("hhi_uniform"),
    )


# ---------------------------------------------------------------------------
# retention half-life


@register(
    "q_retention_halflife",
    oracle="""
        WITH firstw AS (
            SELECT user_id, min(date_trunc('week', ts)) AS w0 FROM events
            GROUP BY user_id
        ),
        act AS (
            SELECT DISTINCT e.user_id,
                   CAST(date_diff('week', firstw.w0,
                                  date_trunc('week', e.ts)) AS BIGINT) AS wk
            FROM events e JOIN firstw ON e.user_id = firstw.user_id
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM firstw),
        curve AS (
            SELECT wk, CAST(count(*) AS BIGINT) AS active
            FROM act GROUP BY wk
        ),
        fit AS (
            SELECT regr_slope(ln(active * 1.0 / nu), wk * 1.0) AS slope,
                   CAST(count(*) AS BIGINT) AS n_weeks
            FROM curve CROSS JOIN tot WHERE wk >= 1 AND active > 0
        )
        SELECT n_weeks,
               round(slope, 4) AS decay_slope,
               round(CASE WHEN slope < 0 THEN -ln(2) / slope END, 2)
                   AS halflife_weeks
        FROM fit
    """,
    category="analytics",
)
def q_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: fit ln(active share) ~ weeks-since-first
    by least squares over the weekly retention curve and convert the
    decay slope to a half-life −ln2/slope — the single number a
    growth team quotes from the curve q_retention_cohort draws
    (NULL when activity doesn't decay — also worth knowing).

    Per-user first week is one aggregate; (user, week-offset) dedups
    to the curve grain (calendar-bounded rows); the regression is one
    combinable regr_slope over that bounded curve — the fit costs
    nothing more than the curve itself."""
    e = load_table(spark, sf_dir, "events")
    firstw = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("w0")
    )
    act = (
        e.join(F.broadcast(firstw), "user_id")
        .select(
            "user_id",
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("w0").cast("date"))
                / 7
            )
            .cast("bigint")
            .alias("wk"),
        )
        .distinct()
    )
    tot = firstw.agg(F.count(F.lit(1)).cast("bigint").alias("nu"))
    curve = act.groupBy("wk").agg(F.count(F.lit(1)).cast("bigint").alias("active"))
    fit = (
        curve.crossJoin(F.broadcast(tot))
        .filter((F.col("wk") >= 1) & (F.col("active") > 0))
        .agg(
            F.expr("regr_slope(ln(active * 1.0 / nu), wk * 1.0)").alias("slope"),
            F.count(F.lit(1)).cast("bigint").alias("n_weeks"),
        )
    )
    return fit.select(
        "n_weeks",
        F.round(F.col("slope"), 4).alias("decay_slope"),
        F.round(
            F.when(F.col("slope") < 0, -F.log(F.lit(2.0)) / F.col("slope")), 2
        ).alias("halflife_weeks"),
    )


# ---------------------------------------------------------------------------
# leaderboard (top-k) drift


_TKD_K = 10


def _tkd_year_sql(y: int) -> str:
    return f"""
            SELECT l_partkey AS pk,
                   row_number() OVER (
                       ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                                DESC, l_partkey ASC) AS rk
            FROM lineitem WHERE year(l_shipdate) = {y}
            GROUP BY l_partkey
            ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)) DESC,
                     l_partkey ASC
            LIMIT {_TKD_K}"""


@register(
    "q_topk_drift",
    oracle=f"""
        WITH a AS ({_tkd_year_sql(1995)}),
        b AS ({_tkd_year_sql(1996)}),
        j AS (
            SELECT a.pk AS pk_a, b.pk AS pk_b, a.rk AS rk_a, b.rk AS rk_b
            FROM a FULL OUTER JOIN b ON a.pk = b.pk
        )
        SELECT CAST(count(*) FILTER (pk_a IS NOT NULL AND pk_b IS NOT NULL)
                    AS BIGINT) AS n_common,
               round(count(*) FILTER (pk_a IS NOT NULL AND pk_b IS NOT NULL)
                     * 1.0 / (2 * {_TKD_K} - count(*) FILTER
                              (pk_a IS NOT NULL AND pk_b IS NOT NULL)), 4)
                   AS jaccard,
               round(avg(abs(rk_a - rk_b)) FILTER
                     (pk_a IS NOT NULL AND pk_b IS NOT NULL), 2)
                   AS avg_rank_shift,
               CAST(count(*) FILTER (pk_a IS NULL) AS BIGINT) AS n_entered,
               CAST(count(*) FILTER (pk_b IS NULL) AS BIGINT) AS n_dropped
        FROM j
    """,
    category="analytics",
)
def q_topk_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard drift: compare the top-10 revenue parts of 1995 vs
    1996 — set Jaccard, mean |rank shift| among survivors, entries
    and exits. The stability metric for any periodically-recomputed
    top-k (trending items, heavy hitters, search suggestions): high
    churn means the board is noise, not signal.

    Each year's board is its own filtered part-grain aggregate +
    TakeOrdered on exact integer revenue (year filters push to the
    scan); the rank decorates the 10-row result (whitelisted
    bounded window); the comparison is a 10×10 full outer join."""
    li = load_table(spark, sf_dir, "lineitem")

    def board(y: int) -> DataFrame:
        agg = (
            li.filter(F.year("l_shipdate") == y)
            .groupBy(F.col("l_partkey").alias("pk"))
            .agg(F.sum(F.expr(_LI_CENTS_J)).alias("rev"))
            .orderBy(F.col("rev").desc(), F.col("pk").asc())
            .limit(_TKD_K)
        )
        w = Window.orderBy(F.col("rev").desc(), F.col("pk").asc())
        return agg.withColumn("rk", F.row_number().over(w)).drop("rev")

    a = board(1995).select(F.col("pk").alias("pk_a"), F.col("rk").alias("rk_a"))
    b = board(1996).select(F.col("pk").alias("pk_b"), F.col("rk").alias("rk_b"))
    j = a.join(b, F.col("pk_a") == F.col("pk_b"), "full_outer")
    common = F.col("pk_a").isNotNull() & F.col("pk_b").isNotNull()
    # coalesced counts: the oracle's count(*) FILTER is 0 (not NULL)
    # over an empty join (degenerate audit)
    n_common = F.coalesce(F.sum(F.when(common, 1).otherwise(0)), F.lit(0)).cast(
        "bigint"
    )
    return j.agg(
        n_common.alias("n_common"),
        F.round(
            n_common * 1.0 / (2 * _TKD_K - n_common), 4
        ).alias("jaccard"),
        F.round(
            F.avg(F.when(common, F.abs(F.col("rk_a") - F.col("rk_b")))), 2
        ).alias("avg_rank_shift"),
        F.coalesce(F.sum(F.when(F.col("pk_a").isNull(), 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_entered"),
        F.coalesce(F.sum(F.when(F.col("pk_b").isNull(), 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_dropped"),
    )


_LI_CENTS_J = "CAST(round(l_extendedprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# power-iteration PCA step over the integer covariance grid


_PI_DIMS = 16
_PI_CS = 1000000  # covariance down-scale (integer div)
_PI_VS = 1000  # iterate down-scale (integer div)


@register(
    "q_pca_power_iter",
    oracle=f"""
        WITH u AS (
            SELECT vec_id, i AS dim,
                   CAST(round(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
                              * 10000) AS BIGINT) AS xq
            FROM embeddings, unnest(range(0, {_PI_DIMS})) t(i)
        ),
        mu AS (
            SELECT dim, CAST(sum(xq) // count(*) AS BIGINT) AS mq,
                   CAST(count(*) AS BIGINT) AS n
            FROM u GROUP BY dim
        ),
        xc AS (
            SELECT u.vec_id, u.dim, u.xq - mu.mq AS x
            FROM u JOIN mu ON u.dim = mu.dim
        ),
        cov AS (
            SELECT a.dim AS i, b.dim AS j,
                   CAST(sum(a.x * b.x) // {_PI_CS} AS BIGINT) AS c
            FROM xc a JOIN xc b ON a.vec_id = b.vec_id
            GROUP BY a.dim, b.dim
        ),
        itered AS (
            -- C is symmetric, so v1_j = Σ_k c_jk = the window sum over
            -- PARTITION BY j; v2_i then rides PARTITION BY i of c·v1s_j
            SELECT i, j, c,
                   CAST(sum(c) OVER (PARTITION BY j) // {_PI_VS} AS BIGINT)
                       AS v1s_j
            FROM cov
        ),
        it2 AS (
            SELECT i, j, c, v1s_j,
                   CAST(sum(c * v1s_j) OVER (PARTITION BY i) AS BIGINT) AS v2_i
            FROM itered
        ),
        diag AS (
            SELECT i, c, v1s_j AS v1s_i, v2_i,
                   max(abs(v2_i)) OVER () AS max_abs
            FROM it2 WHERE i = j
        )
        SELECT (SELECT CAST(max(n) AS BIGINT) FROM mu) AS n_vecs,
               CAST(min(CASE WHEN abs(v2_i) = max_abs THEN i END) AS INT)
                   AS top_dim,
               round(sum(v2_i * 1.0 * v1s_i) / sum(v1s_i * 1.0 * v1s_i)
                     / sum(c), 4) AS eigen_share
        FROM diag
    """,
    category="llm-similarity",
)
def q_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled power-iteration rounds for the top principal
    component of the first 16 embedding dimensions: integer-centered
    covariance grid C (exact int64 — values quantized to 1e-4 units,
    means integer-div), v₁ = C·1, v₂ = C·v₁ with deterministic
    integer down-scaling between rounds, Rayleigh quotient
    λ̂ = v₂·v₁/v₁·v₁, reported as the top component's share of total
    variance (λ̂/trace C) plus the dominant dimension. The
    distributed-PCA pattern: ONE fact-grain moment pass, then all
    iteration happens on the 256-row covariance grid — a 1000-round
    power iteration would still never rescan the data.

    Every matrix entry and iterate is an exact integer (scaling is
    integer div, part of the algorithm spec, identical on both
    engines); floats appear only in the final Rayleigh/trace ratios
    of 16-term dot products."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select(
        "vec_id", F.posexplode(F.slice(F.col("embedding"), 1, _PI_DIMS)).alias("dim", "x")
    ).select(
        "vec_id",
        "dim",
        F.round(F.col("x").cast("double") * 10000).cast("bigint").alias("xq"),
    )
    mu = u.groupBy("dim").agg(
        F.expr("sum(xq) div count(*)").cast("bigint").alias("mq"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    xc = u.join(F.broadcast(mu), "dim").select(
        "vec_id", "dim", (F.col("xq") - F.col("mq")).alias("x")
    )
    a = xc.select("vec_id", F.col("dim").alias("i"), F.col("x").alias("xa"))
    b = xc.select(
        F.col("vec_id").alias("vid_b"), F.col("dim").alias("j"), F.col("x").alias("xb")
    )
    cov = (
        a.join(b, F.col("vec_id") == F.col("vid_b"))
        .groupBy("i", "j")
        .agg(
            F.expr(f"sum(xa * xb) div {_PI_CS}").cast("bigint").alias("c")
        )
    )
    # C is symmetric, so v1_j = Σ_k c_jk = the window sum over
    # PARTITION BY j — both iteration rounds ride windows on the ONE
    # 256-row covariance grid instead of re-printing its fact-grain
    # moment pass per consumer branch
    itered = cov.withColumn(
        "v1s_j",
        F.expr(f"sum(c) OVER (PARTITION BY j) div {_PI_VS}").cast("bigint"),
    )
    it2 = itered.withColumn(
        "v2_i",
        F.sum(F.col("c") * F.col("v1s_j")).over(Window.partitionBy("i")).cast("bigint"),
    )
    diag = it2.filter(F.col("i") == F.col("j")).select(
        "i",
        "c",
        F.col("v1s_j").alias("v1s_i"),
        "v2_i",
        F.max(F.abs(F.col("v2_i"))).over(Window.partitionBy()).alias("max_abs"),
    )  # 16 diagonal rows (whitelisted)
    n_vecs = mu.agg(F.max("n").cast("bigint").alias("n_vecs"))
    out = diag.agg(
        F.min(F.when(F.abs(F.col("v2_i")) == F.col("max_abs"), F.col("i")))
        .cast("int")
        .alias("top_dim"),
        (  # ANSI /0 guards: zero covariance (single-vector corpus)
            F.sum(F.col("v2_i") * 1.0 * F.col("v1s_i"))
            / F.when(
                F.sum(F.col("v1s_i") * 1.0 * F.col("v1s_i")) != 0,
                F.sum(F.col("v1s_i") * 1.0 * F.col("v1s_i")),
            )
            / F.when(F.sum("c") != 0, F.sum("c"))
        ).alias("share_raw"),
    )
    return out.crossJoin(F.broadcast(n_vecs)).select(
        "n_vecs", "top_dim", F.round(F.col("share_raw"), 4).alias("eigen_share")
    )
