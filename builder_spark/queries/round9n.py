"""Round-9 surface growth, batch 15: log-normal distribution fitting
with a quantile-probe goodness check, Gumbel block-maxima return
levels (EVT), quality-gate ablation, MSE bias–variance decomposition,
linear-kernel MMD two-sample test, split-conformal prediction
intervals, multi-scale Fano factors, capture–recapture population
estimation, duplicate-mass extrapolation, and a deterministic
cross-validation fold audit.

Design rules (unchanged): block/bin/gate grids bound every statistic;
splits/folds come from the TOP bits of the Knuth hash; distribution
fits are method-of-moments closed forms (no iteration); embedding
statistics quantize to integer units before any cross-row sum; one
identical float expression per statistic, rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.functions.hashing import KNUTH, knuth_bucket, knuth_top_bit
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# log-normal fit + quantile-probe check


@register(
    "q_lognormal_fit",
    oracle=f"""
        WITH x AS (
            SELECT ln({_OC} * 1.0) AS lx, {_OC} AS cents FROM orders
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   avg(lx) AS mu, stddev_samp(lx) AS sigma
            FROM x
        ),
        med AS (
            SELECT quantile_cont(cents, 0.5) AS q50,
                   quantile_cont(cents, 0.9) AS q90
            FROM x
        )
        SELECT n, round(mu, 4) AS mu_log, round(sigma, 4) AS sigma_log,
               round(exp(mu) / 100.0, 2) AS fitted_median_dollars,
               round(q50 / 100.0, 2) AS empirical_median_dollars,
               round(exp(mu + 1.281552 * sigma) / 100.0, 2)
                   AS fitted_p90_dollars,
               round(q90 / 100.0, 2) AS empirical_p90_dollars
        FROM m CROSS JOIN med
    """,
    category="analytics",
)
def q_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-normal fit of order totals by moments of the logs
    (μ̂, σ̂ on ln cents), checked the way a fit SHOULD be checked:
    fitted vs empirical quantiles side by side (median = e^μ, p90 =
    e^{{μ+1.2816σ}}) — heavy-tailed money data is the log-normal's
    home turf, and the fitted/empirical gap at p90 is the one-row
    tail-model verdict capacity planning needs before extrapolating
    beyond observed data.

    Log moments are one combinable pass (per-row ln of exact integer
    cents — identical doubles); empirical quantiles come from the
    stitched rank selection; the comparison is pure display
    arithmetic."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    x = load_table(spark, sf_dir, "orders").select(
        F.log(F.expr(_OC) * 1.0).alias("lx"), F.expr(_OC).alias("cents")
    )
    m = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("lx").alias("mu"),
        F.stddev_samp("lx").alias("sigma"),
    )
    med = quantile_cont_stitched(x, "cents", {"q50": 0.5, "q90": 0.9}).drop("n")
    j = m.crossJoin(F.broadcast(med))
    return j.select(
        "n",
        F.round(F.col("mu"), 4).alias("mu_log"),
        F.round(F.col("sigma"), 4).alias("sigma_log"),
        F.round(F.exp(F.col("mu")) / 100.0, 2).alias("fitted_median_dollars"),
        F.round(F.col("q50") / 100.0, 2).alias("empirical_median_dollars"),
        F.round(F.exp(F.col("mu") + 1.281552 * F.col("sigma")) / 100.0, 2).alias(
            "fitted_p90_dollars"
        ),
        F.round(F.col("q90") / 100.0, 2).alias("empirical_p90_dollars"),
    )


# ---------------------------------------------------------------------------
# Gumbel block maxima + return levels


@register(
    "q_gumbel_maxima",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS d,
                   CAST(sum({_OC}) AS BIGINT) AS rev
            FROM orders GROUP BY date_trunc('day', o_orderdate)
        ),
        mx AS (
            SELECT date_trunc('month', d) AS m, CAST(max(rev) AS BIGINT) AS mrev
            FROM daily GROUP BY date_trunc('month', d)
        ),
        fit AS (
            SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                   avg(mrev * 1.0) AS mean_mx,
                   stddev_samp(mrev * 1.0) AS sd_mx
            FROM mx
        )
        SELECT n_blocks,
               round((mean_mx - 0.5772 * sd_mx * 0.7797) / 100.0, 2)
                   AS gumbel_mu_dollars,
               round(sd_mx * 0.7797 / 100.0, 2) AS gumbel_beta_dollars,
               round((mean_mx - 0.5772 * sd_mx * 0.7797
                      - sd_mx * 0.7797 * ln(-ln(1 - 1.0 / 12))) / 100.0, 2)
                   AS rl_12_dollars,
               round((mean_mx - 0.5772 * sd_mx * 0.7797
                      - sd_mx * 0.7797 * ln(-ln(1 - 1.0 / 120))) / 100.0, 2)
                   AS rl_120_dollars
        FROM fit
    """,
    category="analytics",
)
def q_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value block maxima: fit a Gumbel to MONTHLY maxima of
    daily revenue by moments (β̂ = √6·s/π ≈ 0.7797·s, μ̂ = m̄ − γβ̂)
    and read off the 12-month and 120-month return levels
    μ − β·ln(−ln(1−1/T)) — 'the biggest day we should expect per
    year / per decade', which the empirical max CANNOT answer beyond
    its own record. The EVT capacity number behind q_var_cvar's
    within-sample tail.

    Day rollup → monthly max (two combinable passes); the fit and
    return levels are closed-form expressions of two moments — no
    iteration, no quantile machinery."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(F.sum(F.expr(_OC)).cast("bigint").alias("rev"))
    )
    mx = daily.groupBy(F.date_trunc("month", F.col("d")).alias("m")).agg(
        F.max("rev").cast("bigint").alias("mrev")
    )
    fit = mx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.avg(F.col("mrev") * 1.0).alias("mean_mx"),
        F.stddev_samp(F.col("mrev") * 1.0).alias("sd_mx"),
    )
    beta = F.col("sd_mx") * 0.7797
    mu = F.col("mean_mx") - 0.5772 * beta

    def rl(t: int):
        import math

        return mu - beta * math.log(-math.log(1 - 1.0 / t))

    return fit.select(
        "n_blocks",
        F.round(mu / 100.0, 2).alias("gumbel_mu_dollars"),
        F.round(beta / 100.0, 2).alias("gumbel_beta_dollars"),
        F.round(rl(12) / 100.0, 2).alias("rl_12_dollars"),
        F.round(rl(120) / 100.0, 2).alias("rl_120_dollars"),
    )


# ---------------------------------------------------------------------------
# quality-gate ablation


@register(
    "q_gate_ablation",
    oracle="""
        WITH g AS (
            SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ga,
                   CASE WHEN length(text) - length(replace(text, ' ', ''))
                             >= 49 THEN 1 ELSE 0 END AS gb,
                   CASE WHEN regexp_matches(text, '[0-9]')
                        THEN 1 ELSE 0 END AS gc
            FROM documents
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g),
        combos AS (
            SELECT 'A' AS gate, CAST(sum(ga) AS BIGINT) AS n_pass FROM g
            UNION ALL
            SELECT 'B', CAST(sum(gb) AS BIGINT) FROM g
            UNION ALL
            SELECT 'C', CAST(sum(gc) AS BIGINT) FROM g
            UNION ALL
            SELECT 'A&B&C', CAST(sum(ga * gb * gc) AS BIGINT) FROM g
            UNION ALL
            SELECT 'A|B|C',
                   CAST(sum(CASE WHEN ga + gb + gc > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) FROM g
        )
        SELECT gate, n_pass,
               round(n_pass * 1.0 / n, 4) AS pass_rate
        FROM combos CROSS JOIN tot
    """,
    category="llm-pipeline",
)
def q_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate ablation: pass rates for each of the three
    document gates alone, their conjunction, and their disjunction —
    the inclusion–exclusion readout that shows whether gates are
    REDUNDANT (A∧B∧C ≈ min single) or COMPLEMENTARY (A∨B∨C ≫ max
    single), which decides whether running all of them buys anything.
    The set-structure companion to q_cochran_q's marginal-rate test
    and q_gopher_gates' per-gate stats.

    All five combos come from ONE combinable pass over the gate
    flags (integer products/sums of 0/1 — no per-combo scan); the
    union count is the >0 indicator of the flag sum."""
    d = load_table(spark, sf_dir, "documents")
    g = d.select(
        F.expr("CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END").alias("ga"),
        F.expr(
            "CASE WHEN length(text) - length(replace(text, ' ', '')) >= 49 "
            "THEN 1 ELSE 0 END"
        ).alias("gb"),
        F.expr("CASE WHEN text RLIKE '[0-9]' THEN 1 ELSE 0 END").alias("gc"),
    )
    one = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ga").cast("bigint").alias("a"),
        F.sum("gb").cast("bigint").alias("b"),
        F.sum("gc").cast("bigint").alias("c"),
        F.sum(F.col("ga") * F.col("gb") * F.col("gc")).cast("bigint").alias("abc"),
        F.sum(F.when(F.col("ga") + F.col("gb") + F.col("gc") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("any_g"),
    )
    rows = None
    for gate, col in [
        ("A", "a"),
        ("B", "b"),
        ("C", "c"),
        ("A&B&C", "abc"),
        ("A|B|C", "any_g"),
    ]:
        r = one.select(
            F.lit(gate).alias("gate"),
            F.col(col).alias("n_pass"),
            F.round(F.col(col) * 1.0 / F.col("n"), 4).alias("pass_rate"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


# ---------------------------------------------------------------------------
# MSE bias-variance decomposition


@register(
    "q_mse_decomposition",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM orders GROUP BY date_trunc('day', o_orderdate)
        ),
        fc AS (
            SELECT cnt, lag(cnt, 7) OVER (ORDER BY d) AS yhat
            FROM daily
        ),
        e AS (
            SELECT cnt - yhat AS err FROM fc WHERE yhat IS NOT NULL
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               round(avg(err * err * 1.0), 4) AS mse,
               round(avg(err * 1.0) * avg(err * 1.0), 4) AS bias2,
               round(avg(err * err * 1.0)
                     - avg(err * 1.0) * avg(err * 1.0), 4) AS variance,
               round(avg(err * 1.0), 4) AS mean_error
        FROM e
    """,
    category="analytics",
)
def q_mse_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MSE = bias² + variance decomposition of the seasonal-naive
    forecast errors: a biased forecast (bias² dominant) is fixed by a
    level adjustment; a noisy one (variance dominant) needs a better
    model — the diagnosis that tells you WHICH investment the
    q_pinball_loss / q_seasonal_naive_error numbers warrant.

    Errors are exact integer differences off one lag window over the
    calendar-bounded day table; the decomposition is one combinable
    pass over those integers (the identity is algebraic, so the three
    reported terms reconcile exactly)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.orderBy("d")  # day table (whitelisted)
    e = (
        daily.select((F.col("cnt") - F.lag("cnt", 7).over(w)).alias("err"))
        .filter(F.col("err").isNotNull())
    )
    return e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.avg(F.col("err") * F.col("err") * 1.0), 4).alias("mse"),
        F.round(F.avg(F.col("err") * 1.0) * F.avg(F.col("err") * 1.0), 4).alias(
            "bias2"
        ),
        F.round(
            F.avg(F.col("err") * F.col("err") * 1.0)
            - F.avg(F.col("err") * 1.0) * F.avg(F.col("err") * 1.0),
            4,
        ).alias("variance"),
        F.round(F.avg(F.col("err") * 1.0), 4).alias("mean_error"),
    )


# ---------------------------------------------------------------------------
# linear-kernel MMD two-sample test


@register(
    "q_mmd_linear",
    oracle=f"""
        WITH u AS (
            SELECT CASE WHEN ((CAST(vec_id AS HUGEINT) * {KNUTH})
                              % 4294967296) // 2147483648 = 0
                        THEN 0 ELSE 1 END AS grp,
                   i AS dim,
                   CAST(round(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
                              * 10000) AS BIGINT) AS xq
            FROM embeddings, unnest(range(0, 64)) t(i)
        ),
        m AS (
            SELECT grp, dim, CAST(sum(xq) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM u GROUP BY grp, dim
        ),
        pair AS (
            SELECT a.dim,
                   (a.s * 1.0 / a.n - b.s * 1.0 / b.n)
                   * (a.s * 1.0 / a.n - b.s * 1.0 / b.n) AS d2,
                   a.n AS n0, b.n AS n1
            FROM (SELECT * FROM m WHERE grp = 0) a
            JOIN (SELECT * FROM m WHERE grp = 1) b ON a.dim = b.dim
        )
        SELECT CAST(max(n0) AS BIGINT) AS n_group0,
               CAST(max(n1) AS BIGINT) AS n_group1,
               round(sum(d2) / 100000000.0, 6) AS mmd2_linear
        FROM pair
    """,
    category="llm-similarity",
)
def q_mmd_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-kernel maximum-mean-discrepancy between two random
    halves of the embedding corpus (top-bit hash split):
    MMD² = ‖μ₀ − μ₁‖² over the 64-dim means — the two-sample test
    for "did my embedding distribution change between snapshots?"
    (a NULL split like this one calibrates the noise floor; rerun
    against yesterday's vectors to detect drift). Linear-kernel MMD
    is exactly the mean-embedding distance — one number, no pairwise
    kernel matrix.

    Per-(group, dim) sums of quantized integer coordinates are one
    combinable pass; the 64-row dim join computes the squared mean
    gap; the /10⁸ rescale undoes the 1e-4 quantization."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select(
        knuth_top_bit("vec_id").alias("grp"),
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "grp",
        "dim",
        F.round(F.col("x").cast("double") * 10000).cast("bigint").alias("xq"),
    )
    m = u.groupBy("grp", "dim").agg(
        F.sum("xq").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a = m.filter(F.col("grp") == 0).select(
        "dim", F.col("s").alias("s0"), F.col("n").alias("n0")
    )
    b = m.filter(F.col("grp") == 1).select(
        F.col("dim").alias("dim_b"), F.col("s").alias("s1"), F.col("n").alias("n1")
    )
    gap = F.col("s0") * 1.0 / F.col("n0") - F.col("s1") * 1.0 / F.col("n1")
    pair = a.join(F.broadcast(b), F.col("dim") == F.col("dim_b")).select(
        (gap * gap).alias("d2"), "n0", "n1"
    )
    return pair.agg(
        F.max("n0").cast("bigint").alias("n_group0"),
        F.max("n1").cast("bigint").alias("n_group1"),
        F.round(F.sum("d2") / 100000000.0, 6).alias("mmd2_linear"),
    )


# ---------------------------------------------------------------------------
# split-conformal prediction interval


@register(
    "q_conformal_interval",
    oracle=f"""
        WITH s AS (
            SELECT o_orderpriority AS grp, {_OC} AS cents,
                   CASE WHEN ((CAST(o_orderkey AS HUGEINT) * {KNUTH})
                              % 4294967296) // 2147483648 = 0
                        THEN 'train' ELSE 'cal' END AS split
            FROM orders
        ),
        mu AS (
            SELECT grp, CAST(sum(cents) AS BIGINT) AS ts,
                   CAST(count(*) AS BIGINT) AS tn
            FROM s WHERE split = 'train' GROUP BY grp
        ),
        resid AS (
            SELECT abs(s.cents - mu.ts * 1.0 / mu.tn) AS r
            FROM s JOIN mu ON s.grp = mu.grp WHERE s.split = 'cal'
        ),
        q AS (
            SELECT quantile_cont(r, 0.95) AS qhat,
                   CAST(count(*) AS BIGINT) AS n_cal
            FROM resid
        )
        SELECT n_cal,
               round(qhat / 100.0, 2) AS qhat_dollars,
               round((SELECT sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END) * 1.0
                      / count(*) FROM resid), 4) AS cal_coverage
        FROM q
    """,
    category="analytics",
)
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for order value: fit the
    predictor (per-priority train-half mean) on the train split,
    take the 95th percentile q̂ of absolute calibration residuals —
    then ŷ ± q̂ covers ≥95% of future points with NO distributional
    assumptions (the finite-sample guarantee that makes conformal
    the default UQ wrapper around any model). Reported with the
    in-calibration coverage, which must land at ≈0.95 by
    construction — the self-check.

    The split is the key's hash top bit; train means are exact
    integer ratios broadcast back; the residual quantile rides the
    stitched rank selection; coverage is one combinable comparison
    pass."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    s = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(_OC).alias("cents"),
        F.when(knuth_top_bit("o_orderkey") == 0, "train")
        .otherwise("cal")
        .alias("split"),
    )
    mu = (
        s.filter(F.col("split") == "train")
        .groupBy("grp")
        .agg(
            F.sum("cents").cast("bigint").alias("ts"),
            F.count(F.lit(1)).cast("bigint").alias("tn"),
        )
    )
    resid = (
        s.filter(F.col("split") == "cal")
        .join(F.broadcast(mu), "grp")
        .select(F.abs(F.col("cents") - F.col("ts") * 1.0 / F.col("tn")).alias("r"))
    )
    q = quantile_cont_stitched(resid, "r", {"qhat": 0.95})
    cov = resid.crossJoin(F.broadcast(q.select("qhat"))).agg(
        F.round(
            F.sum(F.when(F.col("r") <= F.col("qhat"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("cal_coverage")
    )
    return (
        # coalesce: the oracle's count(*) is 0 (not NULL) on an empty
        # calibration set (degenerate audit)
        q.select(F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_cal"), "qhat")
        .crossJoin(F.broadcast(cov))
        .select(
            "n_cal",
            F.round(F.col("qhat") / 100.0, 2).alias("qhat_dollars"),
            "cal_coverage",
        )
    )


# ---------------------------------------------------------------------------
# multi-scale Fano factor


@register(
    "q_fano_factor",
    oracle="""
        WITH cells AS (
            SELECT 'day' AS scale, date_trunc('day', ts) AS w,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY date_trunc('day', ts)
            UNION ALL
            SELECT 'week', date_trunc('week', ts), CAST(count(*) AS BIGINT)
            FROM events GROUP BY date_trunc('week', ts)
        ),
        s AS (
            SELECT scale, CAST(count(*) AS BIGINT) AS n_windows,
                   CAST(sum(n) AS BIGINT) AS total,
                   CAST(sum(n * n) AS BIGINT) AS ss
            FROM cells GROUP BY scale
        )
        SELECT scale, n_windows,
               round(total * 1.0 / n_windows, 4) AS mean_count,
               round(((ss - total * 1.0 * total / n_windows)
                      / (n_windows - 1))
                     / (total * 1.0 / n_windows), 4) AS fano
        FROM s WHERE n_windows > 1
    """,
    category="analytics",
)
def q_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-scale Fano factor of the event stream: variance/mean of
    window counts at day and week scales — 1 at every scale for a
    Poisson process; GROWING with the window for clustered/long-
    memory arrivals (the scale-dependence is the signature
    q_nb_overdispersion's single-grain index can't see, and the
    discrete-count cousin of q_hurst_exponent).

    Each scale is its own calendar rollup (two combinable passes
    unioned); the Fano algebra is exact integer moments per scale."""
    e = load_table(spark, sf_dir, "events")
    cells = None
    for scale in ["day", "week"]:
        c = e.groupBy(F.date_trunc(scale, F.col("ts")).alias("w")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        ).select(F.lit(scale).alias("scale"), "n")
        cells = c if cells is None else cells.unionByName(c)
    s = cells.groupBy("scale").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum("n").cast("bigint").alias("total"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("ss"),
    )
    mean = F.col("total") * 1.0 / F.col("n_windows")
    var = (
        F.col("ss") - F.col("total") * 1.0 * F.col("total") / F.col("n_windows")
    ) / (F.col("n_windows") - 1)
    return s.filter(F.col("n_windows") > 1).select(
        "scale",
        "n_windows",
        F.round(mean, 4).alias("mean_count"),
        F.round(var / mean, 4).alias("fano"),
    )


# ---------------------------------------------------------------------------
# capture-recapture population estimate


@register(
    "q_capture_recapture",
    oracle=f"""
        WITH sightings AS (
            SELECT DISTINCT user_id,
                   CASE WHEN ((CAST(event_id AS HUGEINT) * {KNUTH})
                              % 4294967296) // 2147483648 = 0
                        THEN 0 ELSE 1 END AS occasion
            FROM events
        ),
        c AS (
            SELECT CAST(sum(CASE WHEN occasion = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(sum(CASE WHEN occasion = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n2,
                   CAST(count(*) - count(DISTINCT user_id) AS BIGINT) AS m
            FROM sightings
        ),
        truth AS (
            SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_true
            FROM events
        )
        SELECT n1, n2, m, n_true,
               CAST(CASE WHEN m > 0
                    THEN ((n1 + 1) * (n2 + 1)) // (m + 1) - 1 END AS BIGINT)
                   AS chapman_estimate
        FROM c CROSS JOIN truth
    """,
    category="analytics",
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture–recapture (Chapman) population estimate: split the
    EVENT stream into two deterministic 'sampling occasions' (hash
    top bit of event_id), count users seen on each and on both, and
    estimate the total user population N̂ = (n₁+1)(n₂+1)/(m+1) − 1 —
    the mark-recapture estimator ecology and dedup-count auditing
    share ('how many users exist that we never logged?'). Here the
    truth is known, so the row doubles as the estimator's accuracy
    check.

    Sightings dedup to (user, occasion) — m = rows − distinct users
    counts the both-occasion users without a self-join; the Chapman
    formula is exact integer arithmetic."""
    e = load_table(spark, sf_dir, "events")
    sightings = e.select(
        "user_id", knuth_top_bit("event_id").alias("occasion")
    ).distinct()
    c = sightings.agg(
        F.sum(F.when(F.col("occasion") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("occasion") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        (F.count(F.lit(1)) - F.countDistinct("user_id")).cast("bigint").alias("m"),
    )
    truth = e.agg(F.countDistinct("user_id").cast("bigint").alias("n_true"))
    chapman = F.when(
        F.col("m") > 0,
        F.expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1"),
    ).cast("bigint")
    return c.crossJoin(F.broadcast(truth)).select(
        "n1", "n2", "m", "n_true", chapman.alias("chapman_estimate")
    )


# ---------------------------------------------------------------------------
# duplicate-mass extrapolation


@register(
    "q_dup_mass_extrapolation",
    oracle=f"""
        WITH fp AS (
            SELECT md5(text) AS h,
                   ((CAST(doc_id AS HUGEINT) * {KNUTH}) % 4294967296)
                       // 2147483648 AS half
            FROM documents
        ),
        half0 AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT h) AS BIGINT) AS u
            FROM fp WHERE half = 0
        ),
        full_c AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT h) AS BIGINT) AS u
            FROM fp
        )
        SELECT half0.n AS n_half, half0.u AS uniq_half,
               full_c.n AS n_full, full_c.u AS uniq_full,
               round((half0.n - half0.u) * 1.0 / half0.n, 4) AS dup_rate_half,
               round((full_c.n - full_c.u) * 1.0 / full_c.n, 4) AS dup_rate_full,
               round(((full_c.n - full_c.u) * 1.0 / full_c.n)
                     / nullif((half0.n - half0.u) * 1.0 / half0.n, 0), 4)
                   AS growth_factor
        FROM half0 CROSS JOIN full_c
    """,
    category="llm-dedup",
)
def q_dup_mass_extrapolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How does the duplicate rate GROW with corpus size? Measure the
    exact-duplicate rate on a deterministic half of the corpus and on
    the full corpus; the growth factor between them is the empirical
    answer to 'if we double the crawl, how much more duplication do
    we ingest?' — duplicate mass grows superlinearly (birthday
    effect), which is why dedup gets more valuable with scale, and
    the planning number behind q_dedup_summary's point-in-time rates.

    Fingerprints are md5 (16-byte keys move, never documents); the
    half is the doc key's hash top bit; both dup rates come from
    distinct-counts over the fingerprint column."""
    fp = load_table(spark, sf_dir, "documents").select(
        F.md5("text").alias("h"), knuth_top_bit("doc_id").alias("half")
    )
    half0 = fp.filter(F.col("half") == 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_half"),
        F.countDistinct("h").cast("bigint").alias("uniq_half"),
    )
    full_c = fp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_full"),
        F.countDistinct("h").cast("bigint").alias("uniq_full"),
    )
    j = half0.crossJoin(F.broadcast(full_c))
    # ANSI /0 guards: empty corpus / empty sampled half
    dr_half = (F.col("n_half") - F.col("uniq_half")) * 1.0 / F.when(
        F.col("n_half") != 0, F.col("n_half")
    )
    dr_full = (F.col("n_full") - F.col("uniq_full")) * 1.0 / F.when(
        F.col("n_full") != 0, F.col("n_full")
    )
    return j.select(
        "n_half",
        "uniq_half",
        "n_full",
        "uniq_full",
        F.round(dr_half, 4).alias("dup_rate_half"),
        F.round(dr_full, 4).alias("dup_rate_full"),
        F.round(dr_full / F.nullif(dr_half, F.lit(0.0)), 4).alias("growth_factor"),
    )


# ---------------------------------------------------------------------------
# cross-validation fold audit


_CV_FOLDS = 5


@register(
    "q_cv_fold_audit",
    oracle=f"""
        WITH folds AS (
            SELECT CAST(((CAST(o_orderkey AS HUGEINT) * {KNUTH})
                         % 4294967296) // 858993460 AS INT) AS fold,
                   o_orderpriority AS grp, {_OC} AS cents
            FROM orders
        ),
        per AS (
            SELECT fold, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS s,
                   CAST(count(DISTINCT grp) AS BIGINT) AS n_groups
            FROM folds GROUP BY fold
        ),
        tot AS (
            SELECT CAST(sum(n) AS BIGINT) AS nn, sum(s) * 1.0 / sum(n) AS gmean
            FROM per
        )
        SELECT CAST(fold AS INT) AS fold, n, n_groups,
               round(n * {_CV_FOLDS}.0 / nn, 4) AS size_ratio,
               round((s * 1.0 / n) / gmean, 4) AS mean_ratio
        FROM per CROSS JOIN tot
    """,
    category="analytics",
)
def q_cv_fold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-validation fold audit for the deterministic 5-fold hash
    assignment (top bits of the key hash ÷ ⌈2³²/5⌉): per fold the
    size ratio vs perfect 1/5 and the target-mean ratio vs the grand
    mean — folds that differ in size or outcome distribution leak
    bias into every CV estimate (the k-fold generalization of
    q_srm_check's two-arm test, and the audit that catches a broken
    fold hash BEFORE a week of model sweeps).

    Folds come from the TOP bits (÷ 2³²/5), not mod 5 — the bottom
    bits of a multiplicative hash are linear in the key; per-fold
    moments are one combinable integer pass."""
    folds = load_table(spark, sf_dir, "orders").select(
        (
            F.pmod(
                F.col("o_orderkey").cast("decimal(38,0)") * KNUTH, F.lit(2**32)
            )
            / F.lit(858993460)
        )
        .cast("int")
        .alias("fold"),
        F.col("o_orderpriority").alias("grp"),
        F.expr(_OC).alias("cents"),
    )
    per = folds.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.countDistinct("grp").cast("bigint").alias("n_groups"),
    )
    tot = per.agg(
        F.sum("n").cast("bigint").alias("nn"),
        (F.sum("s") * 1.0 / F.sum("n")).alias("gmean"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("fold").cast("int").alias("fold"),
        "n",
        "n_groups",
        F.round(F.col("n") * float(_CV_FOLDS) / F.col("nn"), 4).alias("size_ratio"),
        F.round((F.col("s") * 1.0 / F.col("n")) / F.col("gmean"), 4).alias(
            "mean_ratio"
        ),
    )
