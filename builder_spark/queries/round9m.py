"""Round-9 surface growth, batch 14: diagonal-Mahalanobis embedding
outliers, Fisher discriminant ratios per dimension, acceptance-
sampling OC points, upper-tail dependence, order-statistic median
CIs, near-zero-variance feature screening, bootstrap rank stability,
total-variation drift, importance weights with effective sample size,
and a fixed-plan pinball-loss forecast evaluation.

Design rules (unchanged): (label, dim)/(day)/(bin) grids bound every
statistic; thresholds are fixed constants or integer-derived;
deterministic bootstrap replicates come from the Knuth hash (zero
RNG); one identical float expression per statistic, rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.functions.hashing import KNUTH
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# diagonal-Mahalanobis embedding outliers


_MAHA_P99_CHI2_64 = 93.2169  # chi^2_{64} 0.99 quantile


@register(
    "q_mahalanobis_outliers",
    oracle=f"""
        WITH u AS (
            SELECT vec_id, label, i AS dim,
                   CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS x
            FROM embeddings, unnest(range(0, 64)) t(i)
        ),
        mv AS (
            SELECT dim,
                   CAST(round(avg(x) * 1000000) AS BIGINT) AS mq,
                   CAST(round(var_samp(x) * 1000000) AS BIGINT) AS vq
            FROM u GROUP BY dim
        ),
        d2 AS (
            SELECT u.vec_id, u.label,
                   sum((x * 1000000 - mq) * (x * 1000000 - mq)
                       / (vq * 1000000.0)) AS dist2
            FROM u JOIN mv ON u.dim = mv.dim
            GROUP BY u.vec_id, u.label
        )
        SELECT label, CAST(count(*) AS BIGINT) AS n,
               round(avg(dist2), 2) AS avg_dist2,
               CAST(sum(CASE WHEN dist2 > {_MAHA_P99_CHI2_64}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               round(sum(CASE WHEN dist2 > {_MAHA_P99_CHI2_64}
                         THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
                   AS outlier_rate
        FROM d2 GROUP BY label
    """,
    category="llm-similarity",
)
def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier screen: diagonal-covariance Mahalanobis
    distance² per vector (Σ(x−μ)²/σ² — the whitened norm) against the
    χ²₆₄ p99 threshold, rolled up per label — mislabeled or corrupt
    vectors concentrate in the flagged tail, and a label whose
    outlier rate ≫ 1% is a candidate for re-embedding. Pairs with
    q_recenter_l2 (first moment) and q_dim_variance (the diagonal
    this query whitens by).

    Per-dim μ/σ² are one (dim)-grain aggregate quantized to integer
    micro-units (64-row broadcast); the per-vector distance is one
    combinable sum whose per-term numerators are EXACT integer
    squares (only the final /σ² is float); threshold comparisons use
    a fixed constant."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "label", "dim", F.col("x").cast("double").alias("x"))
    mv = u.groupBy("dim").agg(
        F.round(F.avg("x") * 1000000).cast("bigint").alias("mq"),
        F.round(F.var_samp("x") * 1000000).cast("bigint").alias("vq"),
    )
    term = (F.col("x") * 1000000 - F.col("mq")) * (
        F.col("x") * 1000000 - F.col("mq")
    ) / (F.col("vq") * 1000000.0)
    d2 = (
        u.join(F.broadcast(mv), "dim")
        .groupBy("vec_id", "label")
        .agg(F.sum(term).alias("dist2"))
    )
    flagged = F.when(F.col("dist2") > _MAHA_P99_CHI2_64, 1).otherwise(0)
    return d2.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("dist2"), 2).alias("avg_dist2"),
        F.sum(flagged).cast("bigint").alias("n_outliers"),
        F.round(F.sum(flagged) * 1.0 / F.count(F.lit(1)), 4).alias("outlier_rate"),
    )


# ---------------------------------------------------------------------------
# Fisher discriminant ratio per dimension


@register(
    "q_fisher_ratio",
    oracle="""
        WITH u AS (
            SELECT label, i AS dim,
                   CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS x
            FROM embeddings, unnest(range(0, 64)) t(i)
        ),
        per AS (
            SELECT dim, label, CAST(count(*) AS BIGINT) AS n,
                   avg(x) AS m, var_samp(x) AS v
            FROM u GROUP BY dim, label
        ),
        agg AS (
            SELECT dim,
                   CAST(sum(n) AS BIGINT) AS nn,
                   sum(n * m) / sum(n) AS grand,
                   sum(n * v) / sum(n) AS within_v
            FROM per GROUP BY dim
        ),
        f AS (
            SELECT per.dim,
                   sum(per.n * (per.m - agg.grand) * (per.m - agg.grand))
                       / max(agg.nn) AS between_v,
                   max(agg.within_v) AS within_v
            FROM per JOIN agg ON per.dim = agg.dim
            GROUP BY per.dim
        )
        SELECT CAST(dim AS INT) AS dim,
               round(between_v / within_v, 4) AS fisher_ratio
        FROM f
        ORDER BY round(between_v / within_v, 4) DESC, dim ASC
        LIMIT 10
    """,
    category="llm-similarity",
)
def q_fisher_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher discriminant ratio per embedding dimension: between-
    class variance of label means over pooled within-class variance —
    the 10 most label-separating axes. The supervised counterpart of
    q_dim_variance (which finds HIGH-variance dims whether or not the
    variance is label signal) and the feature-selection screen before
    a nearest-centroid or linear-probe classifier.

    (dim, label) moments are one combinable pass (640 cells); grand
    means/pooled variances are a dim-grain rollup; the board ranks
    the ROUNDED ratio with a dim tie-break."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select("label", F.posexplode("embedding").alias("dim", "x")).select(
        "label", "dim", F.col("x").cast("double").alias("x")
    )
    per = u.groupBy("dim", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("x").alias("m"),
        F.var_samp("x").alias("v"),
    )
    agg = per.groupBy("dim").agg(
        F.sum("n").cast("bigint").alias("nn"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand"),
        (F.sum(F.col("n") * F.col("v")) / F.sum("n")).alias("within_v"),
    )
    f = (
        per.join(F.broadcast(agg), "dim")
        .groupBy("dim")
        .agg(
            (
                F.sum(
                    F.col("n")
                    * (F.col("m") - F.col("grand"))
                    * (F.col("m") - F.col("grand"))
                )
                / F.max("nn")
            ).alias("between_v"),
            F.max("within_v").alias("within_v"),
        )
    )
    out = f.select(
        F.col("dim").cast("int").alias("dim"),
        F.round(F.col("between_v") / F.col("within_v"), 4).alias("fisher_ratio"),
    )
    return out.orderBy(F.col("fisher_ratio").desc(), F.col("dim").asc()).limit(10)


# ---------------------------------------------------------------------------
# acceptance-sampling OC points


_AS_N = 50  # sample size
_AS_C = 2  # acceptance number


@register(
    "q_acceptance_sampling",
    oracle=f"""
        WITH p AS (
            SELECT o_orderpriority AS grp,
                   sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.0
                   / count(*) AS defect_rate,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        )
        SELECT grp, n_items, round(defect_rate, 4) AS defect_rate,
               round(pow(1 - defect_rate, {_AS_N})
                     + {_AS_N} * defect_rate * pow(1 - defect_rate, {_AS_N - 1})
                     + {_AS_N * (_AS_N - 1) // 2} * defect_rate * defect_rate
                       * pow(1 - defect_rate, {_AS_N - 2}), 4) AS p_accept
        FROM p
    """,
    category="analytics",
)
def q_acceptance_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance-sampling OC evaluation: with the classic (n=50, c=2)
    single-sampling plan, the probability a lot from each priority
    class would be ACCEPTED given its observed return-defect rate —
    P(accept) = Σ_{{k≤2}} C(50,k)p^k(1−p)^{{50−k}}, the three-term
    binomial CDF in closed form. The QC bridge between the observed
    defect rates and an inspection policy: a class whose p_accept is
    mid-slope on the OC curve gets inconsistent lot decisions.

    Defect rates are integer-count ratios from one joined aggregate;
    P(accept) is one identical closed-form float expression (binomial
    coefficients are compile-time constants)."""
    j = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            (
                F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1))
            ).alias("defect_rate"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )
    p = F.col("defect_rate")
    q = 1 - p
    p_accept = (
        F.pow(q, _AS_N)
        + _AS_N * p * F.pow(q, _AS_N - 1)
        + (_AS_N * (_AS_N - 1) // 2) * p * p * F.pow(q, _AS_N - 2)
    )
    return j.select(
        "grp",
        "n_items",
        F.round(p, 4).alias("defect_rate"),
        F.round(p_accept, 4).alias("p_accept"),
    )


# ---------------------------------------------------------------------------
# upper-tail dependence


@register(
    "q_tail_dependence",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS d,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum({_OC}) AS BIGINT) AS rev
            FROM orders GROUP BY date_trunc('day', o_orderdate)
        ),
        q AS (
            SELECT quantile_cont(cnt, 0.95) AS qx,
                   quantile_cont(rev, 0.95) AS qy,
                   CAST(count(*) AS BIGINT) AS n
            FROM daily
        )
        SELECT n AS n_days,
               CAST(sum(CASE WHEN cnt > qx THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_x_tail,
               CAST(sum(CASE WHEN rev > qy THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_y_tail,
               CAST(sum(CASE WHEN cnt > qx AND rev > qy THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_joint,
               round(sum(CASE WHEN cnt > qx AND rev > qy THEN 1 ELSE 0 END)
                     * 1.0 / nullif(sum(CASE WHEN rev > qy
                                        THEN 1 ELSE 0 END), 0), 4)
                   AS lambda_upper
        FROM daily CROSS JOIN q
        GROUP BY n
    """,
    category="analytics",
)
def q_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-tail dependence between daily order COUNT and daily
    REVENUE: λ_U ≈ P(count > q95 | revenue > q95) — do the extreme
    days co-occur? Correlation (q_cross_correlation) measures the
    middle of the joint distribution; capacity planning cares about
    the corner, where λ_U near 1 means volume spikes and revenue
    spikes are the SAME days (one failure domain), near 0 means two
    independent tail risks.

    Both q95s come from the stitched rank selection over the day
    table; tail flags are comparisons against the broadcast
    thresholds; one combinable joint-count pass."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.expr(_OC)).cast("bigint").alias("rev"),
        )
    )
    qx = quantile_cont_stitched(daily, "cnt", {"qx": 0.95}).drop("n")
    qy = quantile_cont_stitched(daily, "rev", {"qy": 0.95}).drop("n")
    j = daily.crossJoin(F.broadcast(qx)).crossJoin(F.broadcast(qy))
    x_tail = F.when(F.col("cnt") > F.col("qx"), 1).otherwise(0)
    y_tail = F.when(F.col("rev") > F.col("qy"), 1).otherwise(0)
    joint = F.when((F.col("cnt") > F.col("qx")) & (F.col("rev") > F.col("qy")), 1).otherwise(0)
    # groupBy the broadcast thresholds (one group on any real input)
    # to mirror the oracle's GROUP BY n: empty series -> 0 rows both
    return j.groupBy("qx", "qy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(x_tail).cast("bigint").alias("n_x_tail"),
        F.sum(y_tail).cast("bigint").alias("n_y_tail"),
        F.sum(joint).cast("bigint").alias("n_joint"),
        F.round(
            F.sum(joint) * 1.0 / F.nullif(F.sum(y_tail), F.lit(0)), 4
        ).alias("lambda_upper"),
    ).select("n_days", "n_x_tail", "n_y_tail", "n_joint", "lambda_upper")


# ---------------------------------------------------------------------------
# order-statistic median confidence interval


@register(
    "q_median_ci",
    oracle=f"""
        WITH x AS (SELECT {_OC} AS cents FROM orders),
        n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM x),
        bounds AS (
            SELECT nn,
                   CAST(floor(nn / 2.0 - 1.959964 * sqrt(nn / 4.0)) AS BIGINT)
                       AS r_lo,
                   CAST(ceil(nn / 2.0 + 1 + 1.959964 * sqrt(nn / 4.0))
                        AS BIGINT) AS r_hi
            FROM n
        ),
        r AS (
            SELECT cents, row_number() OVER (ORDER BY cents) AS rn
            FROM x
        )
        SELECT max(nn) AS n,
               round(min(CASE WHEN rn * 2 >= nn THEN cents END) / 100.0, 2)
                   AS median_dollars,
               round(min(CASE WHEN rn >= r_lo THEN cents END) / 100.0, 2)
                   AS ci_lo_dollars,
               round(min(CASE WHEN rn >= r_hi THEN cents END) / 100.0, 2)
                   AS ci_hi_dollars
        FROM r CROSS JOIN bounds
    """,
    category="order-stats",
)
def q_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median of
    order totals via binomial order statistics: the CI endpoints are
    the values at ranks n/2 ± 1.96·√(n/4) — valid for ANY continuous
    distribution, no variance estimate, no bootstrap. The uncertainty
    companion every q_global_median_exact-style point estimate should
    ship with.

    The ranked pass rides the stitched rank selection (never a
    single-partition sort); rank bounds are integer expressions of n
    (floor/ceil of one identical float); endpoint extraction is three
    conditional mins in one combinable aggregate."""
    from builder_spark.operators.partitioning import stitched_running

    x = load_table(spark, sf_dir, "orders").select(F.expr(_OC).alias("cents"))
    r = stitched_running(x, ["cents"], rank_name="rn", with_totals=True)
    nn = F.col("rn_total")
    r_lo = F.floor(nn / 2.0 - 1.959964 * F.sqrt(nn / 4.0))
    r_hi = F.ceil(nn / 2.0 + 1 + 1.959964 * F.sqrt(nn / 4.0))
    return r.agg(
        F.max(nn).cast("bigint").alias("n"),
        F.round(
            F.min(F.when(F.col("rn") * 2 >= nn, F.col("cents"))) / 100.0, 2
        ).alias("median_dollars"),
        F.round(
            F.min(F.when(F.col("rn") >= r_lo, F.col("cents"))) / 100.0, 2
        ).alias("ci_lo_dollars"),
        F.round(
            F.min(F.when(F.col("rn") >= r_hi, F.col("cents"))) / 100.0, 2
        ).alias("ci_hi_dollars"),
    )


# ---------------------------------------------------------------------------
# near-zero-variance feature screen


@register(
    "q_nzv_screen",
    oracle=f"""
        WITH feats AS (
            SELECT 'totalprice_dollars' AS feature,
                   CAST({_OC} // 100 AS VARCHAR) AS val FROM orders
            UNION ALL
            SELECT 'orderpriority', o_orderpriority FROM orders
            UNION ALL
            SELECT 'orderstatus', o_orderstatus FROM orders
        ),
        vc AS (
            SELECT feature, val, CAST(count(*) AS BIGINT) AS c
            FROM feats GROUP BY feature, val
        ),
        top2 AS (
            SELECT feature, c,
                   row_number() OVER (PARTITION BY feature
                                      ORDER BY c DESC, val ASC) AS rk
            FROM vc
        ),
        s AS (
            SELECT vc.feature,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(c) AS BIGINT) AS n_rows
            FROM vc GROUP BY vc.feature
        ),
        fr AS (
            SELECT feature,
                   max(CASE WHEN rk = 1 THEN c END) * 1.0
                   / coalesce(max(CASE WHEN rk = 2 THEN c END), 1)
                       AS freq_ratio
            FROM top2 WHERE rk <= 2 GROUP BY feature
        )
        SELECT s.feature, n_distinct,
               round(n_distinct * 100.0 / n_rows, 4) AS pct_unique,
               round(freq_ratio, 4) AS freq_ratio,
               CAST(CASE WHEN freq_ratio > 19
                              AND n_distinct * 100.0 / n_rows < 10
                    THEN 1 ELSE 0 END AS INT) AS nzv_flag
        FROM s JOIN fr ON s.feature = fr.feature
    """,
    category="analytics",
)
def q_nzv_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-zero-variance feature screen (the caret nearZeroVar rule):
    for each candidate feature, the distinct-value percentage and the
    top-1/top-2 frequency ratio; flag when ratio > 19 AND uniqueness
    < 10% — features that are almost constant break CV folds and
    waste encoder capacity. The tabular-ML data-prep screen, run here
    over three order attributes stacked into one long frame.

    The stack explodes per ROW (3×, one scan); value counts are
    combinable; the top-2 ranks ride a window PARTITIONed by feature
    over the bounded value-count grain; flags are deterministic."""
    o = load_table(spark, sf_dir, "orders")
    feats = (
        o.select(
            F.lit("totalprice_dollars").alias("feature"),
            F.expr(f"CAST({_OC} div 100 AS STRING)").alias("val"),
        )
        .unionByName(
            o.select(
                F.lit("orderpriority").alias("feature"),
                F.col("o_orderpriority").alias("val"),
            )
        )
        .unionByName(
            o.select(
                F.lit("orderstatus").alias("feature"),
                F.col("o_orderstatus").alias("val"),
            )
        )
    )
    vc = feats.groupBy("feature", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    rk = F.row_number().over(
        Window.partitionBy("feature").orderBy(F.col("c").desc(), F.col("val").asc())
    )
    top2 = vc.select("feature", "c", rk.alias("rk")).filter(F.col("rk") <= 2)
    s = vc.groupBy("feature").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum("c").cast("bigint").alias("n_rows"),
    )
    fr = top2.groupBy("feature").agg(
        (
            F.max(F.when(F.col("rk") == 1, F.col("c")))
            * 1.0
            / F.coalesce(F.max(F.when(F.col("rk") == 2, F.col("c"))), F.lit(1))
        ).alias("freq_ratio")
    )
    pct_unique = F.col("n_distinct") * 100.0 / F.col("n_rows")
    return s.join(fr, "feature").select(
        "feature",
        "n_distinct",
        F.round(pct_unique, 4).alias("pct_unique"),
        F.round(F.col("freq_ratio"), 4).alias("freq_ratio"),
        F.when((F.col("freq_ratio") > 19) & (pct_unique < 10), 1)
        .otherwise(0)
        .cast("int")
        .alias("nzv_flag"),
    )


# ---------------------------------------------------------------------------
# bootstrap rank stability


_RS_REPS = 8


@register(
    "q_rank_stability",
    oracle=f"""
        WITH reps AS (
            SELECT d.source, d.n_chars, r.rep,
                   CAST(((CAST(d.doc_id * {_RS_REPS} + r.rep AS HUGEINT)
                          * {KNUTH}) % 4294967296) // 1073741824 AS BIGINT)
                       AS w4
            FROM documents d CROSS JOIN (
                SELECT unnest(range(0, {_RS_REPS})) AS rep
            ) r
        ),
        cells AS (
            SELECT rep, source,
                   sum(w4 * n_chars) AS wsum, CAST(sum(w4) AS BIGINT) AS wn
            FROM reps GROUP BY rep, source
        ),
        winners AS (
            SELECT rep, source,
                   row_number() OVER (PARTITION BY rep
                                      ORDER BY wsum * 1.0 / wn DESC,
                                               source ASC) AS rk
            FROM cells WHERE wn > 0
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_wins,
               round(count(*) * 1.0 / {_RS_REPS}, 4) AS win_share
        FROM winners WHERE rk = 1
        GROUP BY source
    """,
    category="llm-pipeline",
)
def q_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard stability under resampling: 8 deterministic
    Poisson-ish bootstrap replicates (integer weights 0–3 from the
    Knuth hash of (doc, rep) — zero RNG, recomputable anywhere)
    re-elect the "longest-documents" source; the win share across
    replicates is the confidence that the #1 slot is real rather than
    sampling noise. One winner per replicate ⇒ win shares sum to 1.
    The leaderboard complement of q_poisson_bootstrap's variance
    estimate, and the honesty check q_topk_drift motivates.

    Replicates explode per DOC row (8×, one scan); per-(rep, source)
    weighted sums are combinable exact integers; the winner rank runs
    over the 8×20 cells grid (bounded, whitelisted low-card)."""
    d = load_table(spark, sf_dir, "documents")
    rep = F.explode(F.sequence(F.lit(0), F.lit(_RS_REPS - 1))).alias("rep")
    reps = d.select("doc_id", "source", "n_chars", rep).select(
        "rep",
        "source",
        "n_chars",
        (
            F.pmod(
                (F.col("doc_id") * _RS_REPS + F.col("rep")).cast("decimal(38,0)")
                * KNUTH,
                F.lit(2**32),
            )
            / F.lit(2**30)
        )
        .cast("long")
        .alias("w4"),
    )
    cells = reps.groupBy("rep", "source").agg(
        F.sum(F.col("w4") * F.col("n_chars")).alias("wsum"),
        F.sum("w4").cast("bigint").alias("wn"),
    )
    rk = F.row_number().over(
        Window.partitionBy("rep").orderBy(
            (F.col("wsum") * 1.0 / F.col("wn")).desc(), F.col("source").asc()
        )
    )
    winners = cells.filter(F.col("wn") > 0).select(
        "rep", "source", rk.alias("rk")
    ).filter(F.col("rk") == 1)
    return winners.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_wins"),
        F.round(F.count(F.lit(1)) * 1.0 / _RS_REPS, 4).alias("win_share"),
    )


# ---------------------------------------------------------------------------
# total-variation drift


@register(
    "q_tv_drift",
    oracle="""
        WITH mid AS (
            SELECT (CAST(min(epoch_us(ts)) AS BIGINT)
                    + CAST(max(epoch_us(ts)) AS BIGINT)) // 2 AS m
            FROM events
        ),
        half AS (
            SELECT event_type,
                   CASE WHEN epoch_us(ts) < m THEN 0 ELSE 1 END AS h
            FROM events CROSS JOIN mid
        ),
        cnt AS (
            SELECT event_type, h, CAST(count(*) AS BIGINT) AS n
            FROM half GROUP BY event_type, h
        ),
        tot AS (
            SELECT h, CAST(sum(n) AS BIGINT) AS nh FROM cnt GROUP BY h
        ),
        p AS (
            SELECT cnt.event_type,
                   sum(CASE WHEN cnt.h = 0 THEN n * 1.0 / nh ELSE 0 END) AS p0,
                   sum(CASE WHEN cnt.h = 1 THEN n * 1.0 / nh ELSE 0 END) AS p1
            FROM cnt JOIN tot ON cnt.h = tot.h
            GROUP BY cnt.event_type
        )
        SELECT CAST(count(*) AS BIGINT) AS n_types,
               round(sum(abs(p0 - p1)) / 2, 4) AS tv_distance,
               round(max(abs(p0 - p1)), 4) AS max_type_shift
        FROM p
    """,
    category="analytics",
)
def q_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation drift of the event-type mix between the first
    and second half of the timeline: TV = ½Σ|p₀−p₁| — the tightest
    bound on how much ANY downstream classifier's behavior can change
    from the mix shift alone (PSI and KL diverge on vanishing bins;
    TV is bounded in [0,1] and directly interpretable as re-labeled
    mass). The third leg of the drift suite next to q_psi_drift and
    the KL in q_js_divergence.

    The midpoint is the integer-microsecond mean of min/max ts (a 1-row broadcast; integer div on both engines — no interval-vs-seconds precision skew); counts collapse
    to the (type × half) grid; TV is one combinable sum over ≤5
    rows."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    mid = e.agg(
        F.expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").alias("m")
    )
    half = e.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.when(us < F.col("m"), 0).otherwise(1).alias("h"),
    )
    cnt = half.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cnt.groupBy("h").agg(F.sum("n").cast("bigint").alias("nh"))
    p = (
        cnt.join(F.broadcast(tot), "h")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("h") == 0, F.col("n") * 1.0 / F.col("nh")).otherwise(0)
            ).alias("p0"),
            F.sum(
                F.when(F.col("h") == 1, F.col("n") * 1.0 / F.col("nh")).otherwise(0)
            ).alias("p1"),
        )
    )
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.round(F.sum(F.abs(F.col("p0") - F.col("p1"))) / 2, 4).alias("tv_distance"),
        F.round(F.max(F.abs(F.col("p0") - F.col("p1"))), 4).alias("max_type_shift"),
    )


# ---------------------------------------------------------------------------
# importance weights + effective sample size


@register(
    "q_importance_weights",
    oracle=f"""
        WITH b AS (
            SELECT CASE WHEN ((CAST(doc_id AS HUGEINT) * {KNUTH})
                              % 4294967296) // 2147483648 = 0
                        THEN 'train' ELSE 'target' END AS split,
                   least(n_chars // 200, 9) AS bin
            FROM documents
        ),
        cnt AS (
            SELECT split, bin, CAST(count(*) AS BIGINT) AS n
            FROM b GROUP BY split, bin
        ),
        tot AS (
            SELECT split, CAST(sum(n) AS BIGINT) AS ns FROM cnt GROUP BY split
        ),
        w AS (
            SELECT tr.bin, tr.n AS n_train,
                   (tg.n * 1.0 / tgt.ns) / (tr.n * 1.0 / trt.ns) AS iw
            FROM (SELECT * FROM cnt WHERE split = 'train') tr
            JOIN (SELECT * FROM cnt WHERE split = 'target') tg
              ON tr.bin = tg.bin
            CROSS JOIN (SELECT ns FROM tot WHERE split = 'train') trt
            CROSS JOIN (SELECT ns FROM tot WHERE split = 'target') tgt
        )
        SELECT CAST(count(*) AS BIGINT) AS n_bins,
               CAST(sum(n_train) AS BIGINT) AS n_train,
               round(max(iw), 4) AS max_weight,
               round(sum(n_train * iw) * sum(n_train * iw)
                     / (sum(n_train * iw * iw) * sum(n_train)), 4)
                   AS ess_ratio
        FROM w
    """,
    category="llm-pipeline",
)
def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-shift reweighting audit: density-ratio importance
    weights w(x) = p_target(x)/p_train(x) over length bins (train /
    target = the deterministic top-bit hash split), with the number
    that decides whether reweighting is usable at all — the effective
    sample size ratio ESS/n = (Σw)²/(n·Σw²). ESS ≈ 1 means the shift
    is mild; ESS ≪ 1 means a few giant weights dominate and you need
    to collect target-like data instead of reweighting. The standard
    domain-adaptation preflight.

    Histogram bins are integer div (shared domain, ≤10 bins); weights
    are ratios of integer-count shares on the bin grid; ESS is one
    identical float expression over ≤10 rows."""
    from builder_spark.functions.hashing import knuth_top_bit

    b = load_table(spark, sf_dir, "documents").select(
        F.when(knuth_top_bit("doc_id") == 0, "train")
        .otherwise("target")
        .alias("split"),
        F.least(F.expr("n_chars div 200"), F.lit(9)).alias("bin"),
    )
    cnt = b.groupBy("split", "bin").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cnt.groupBy("split").agg(F.sum("n").cast("bigint").alias("ns"))
    tr = cnt.filter(F.col("split") == "train").select(
        "bin", F.col("n").alias("n_train")
    )
    tg = cnt.filter(F.col("split") == "target").select(
        F.col("bin").alias("bin_t"), F.col("n").alias("n_target")
    )
    trt = tot.filter(F.col("split") == "train").select(F.col("ns").alias("ns_train"))
    tgt = tot.filter(F.col("split") == "target").select(
        F.col("ns").alias("ns_target")
    )
    w = (
        tr.join(tg, F.col("bin") == F.col("bin_t"))
        .crossJoin(F.broadcast(trt))
        .crossJoin(F.broadcast(tgt))
        .select(
            "bin",
            "n_train",
            (
                (F.col("n_target") * 1.0 / F.col("ns_target"))
                / (F.col("n_train") * 1.0 / F.col("ns_train"))
            ).alias("iw"),
        )
    )
    return w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("n_train").cast("bigint").alias("n_train"),
        F.round(F.max("iw"), 4).alias("max_weight"),
        F.round(
            F.sum(F.col("n_train") * F.col("iw"))
            * F.sum(F.col("n_train") * F.col("iw"))
            / (
                F.sum(F.col("n_train") * F.col("iw") * F.col("iw"))
                * F.sum("n_train")
            ),
            4,
        ).alias("ess_ratio"),
    )


# ---------------------------------------------------------------------------
# pinball-loss forecast evaluation


_PINBALL_TAUS = [50, 90]  # percent


@register(
    "q_pinball_loss",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM orders GROUP BY date_trunc('day', o_orderdate)
        ),
        fc AS (
            SELECT d, cnt,
                   lag(cnt, 7) OVER (ORDER BY d) AS yhat
            FROM daily
        ),
        cells AS (
            SELECT t.tau, cnt, yhat
            FROM fc CROSS JOIN (
                SELECT unnest([{", ".join(str(t) for t in _PINBALL_TAUS)}]) AS tau
            ) t
            WHERE yhat IS NOT NULL
        )
        SELECT CAST(tau AS INT) AS tau_pct,
               CAST(count(*) AS BIGINT) AS n_days,
               round(avg(CASE WHEN cnt >= yhat
                         THEN tau / 100.0 * (cnt - yhat)
                         ELSE (1 - tau / 100.0) * (yhat - cnt) END), 4)
                   AS pinball
        FROM cells GROUP BY tau
    """,
    category="analytics",
)
def q_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of the seasonal-naive forecast
    (ŷ_t = y_{{t−7}}) at τ ∈ {{0.5, 0.9}} — the scoring rule that makes
    quantile forecasts comparable: τ=0.5 is half the MAE
    (q_seasonal_naive_error's metric), τ=0.9 penalizes
    under-forecasting 9× (the capacity-planning asymmetry). A
    forecast pipeline is graded on THIS, not RMSE, when the cost of
    under- vs over-provisioning differs.

    The day rollup absorbs facts; one lag window (calendar-bounded,
    whitelisted) builds the forecast; the τ grid explodes per DAY row
    (2×); the loss is a combinable conditional mean — integer counts
    in, one float expression out."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.orderBy("d")  # day table (whitelisted)
    fc = daily.select(
        "cnt", F.lag("cnt", 7).over(w).alias("yhat")
    ).filter(F.col("yhat").isNotNull())
    tau = F.explode(F.array(*[F.lit(t) for t in _PINBALL_TAUS])).alias("tau")
    cells = fc.select("cnt", "yhat", tau)
    loss = F.when(
        F.col("cnt") >= F.col("yhat"),
        F.col("tau") / 100.0 * (F.col("cnt") - F.col("yhat")),
    ).otherwise((1 - F.col("tau") / 100.0) * (F.col("yhat") - F.col("cnt")))
    return cells.groupBy(F.col("tau").cast("int").alias("tau_pct")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.avg(loss), 4).alias("pinball"),
    )
