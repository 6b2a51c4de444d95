"""Round-9 batch 4 surface growth: game-theoretic attribution
(Shapley), trend/association tests (Mann-Kendall, Kendall tau-b),
the scalable bootstrap (Poisson resampling), differential-privacy
noise mechanics, inter-rater agreement (Fleiss' kappa), per-group
mode, rank-with-ties top-k, embedding anisotropy without pairs, and
second-price (Vickrey) clearing.

Design rules (unchanged): integer-exact cores wherever semantics
allow; any float flows through ONE identical expression tree on both
engines before a single ``round(·, 4)``; every rank sits on a total
order; plans are combinable-aggregate + broadcast shaped — the only
self-joins are over calendar- or enum-bounded aggregates (day pairs,
16 coalition masks, 25 nations), never fact grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register

_K = 2654435761  # 2^32/φ — the repo's engine-portable multiplicative hash
_M32 = 4294967296

#: DuckDB dot/norm macros over float lists (llmdata.py:30 conventions)
_DD_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_DD_NORM = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * x)))"


# ---------------------------------------------------------------------------
# Shapley-value channel attribution


@register(
    "q_shapley_attribution",
    oracle="""
        WITH pu AS (
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase
            FROM events GROUP BY user_id
        ),
        tot AS (
            SELECT count(*) AS nu, sum(n_click) AS tc, sum(n_view) AS tv,
                   sum(n_signup) AS ts, sum(n_error) AS te, sum(n_purchase) AS tp
            FROM pu
        ),
        tagged AS (
            SELECT 8 * (CASE WHEN n_click >= (tc + nu - 1) // nu THEN 1 ELSE 0 END)
                 + 4 * (CASE WHEN n_view >= (tv + nu - 1) // nu THEN 1 ELSE 0 END)
                 + 2 * (CASE WHEN n_signup >= (ts + nu - 1) // nu THEN 1 ELSE 0 END)
                 + 1 * (CASE WHEN n_error >= (te + nu - 1) // nu THEN 1 ELSE 0 END)
                       AS mask,
                   CASE WHEN n_purchase >= (tp + nu - 1) // nu THEN 1 ELSE 0 END AS conv
            FROM pu, tot
        ),
        masks AS (
            SELECT mask, count(*) AS n, sum(conv) AS nc FROM tagged GROUP BY mask
        ),
        v AS (
            SELECT sp.s,
                   CASE WHEN coalesce(m.n, 0) > 0
                        THEN coalesce(m.nc, 0) * 1.0 / m.n ELSE 0.0 END AS v
            FROM (SELECT unnest(range(0, 16)) AS s) sp
            LEFT JOIN masks m ON m.mask = sp.s
        )
        SELECT ch.name AS channel,
               round(sum(
                   (CASE WHEN ((v0.s // 8) % 2 + (v0.s // 4) % 2
                               + (v0.s // 2) % 2 + v0.s % 2) IN (1, 2)
                         THEN 1.0 / 12.0 ELSE 0.25 END)
                   * (v1.v - v0.v)), 4) AS phi
        FROM (VALUES ('click', 8), ('view', 4), ('signup', 2), ('error', 1))
             AS ch(name, bit)
        JOIN v v0 ON (v0.s // ch.bit) % 2 = 0
        JOIN v v1 ON v1.s = v0.s + ch.bit
        GROUP BY ch.name
    """,
    category="analytics",
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution — the game-theoretically fair
    split of conversion credit across the four non-purchase channels:
    a user is "exposed" to a channel when their event count reaches the
    global per-user mean for it (self-calibrating at every SF), and
    "converts" when their purchase count does; v(S) is the conversion
    rate of users with exposure set exactly S, and phi_i sums the
    weighted marginal contributions |S|!(4-|S|-1)!/4! · (v(S∪i)−v(S))
    over the 16-coalition lattice.

    Exactness: masks and thresholds are pure integer arithmetic; v and
    the factorial weights are single identical expression trees.
    Scale: one per-user conditional-agg pass, a 1-row threshold
    broadcast, and all the coalition algebra runs on a 16-row table
    (the exponential lattice is in the CHANNEL count, which is fixed —
    never in the data)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
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
    )
    exposed = lambda n, t: F.when(  # noqa: E731
        F.col(n) >= F.expr(f"({t} + nu - 1) div nu"), 1
    ).otherwise(0)
    tagged = pu.crossJoin(F.broadcast(tot)).select(
        (
            8 * exposed("n_click", "tc")
            + 4 * exposed("n_view", "tv")
            + 2 * exposed("n_signup", "ts")
            + 1 * exposed("n_error", "te")
        ).alias("mask"),
        exposed("n_purchase", "tp").alias("conv"),
    )
    masks = tagged.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("nc")
    )
    spine = spark.range(16).select(F.col("id").alias("s"))
    v = spine.join(F.broadcast(masks), spine.s == masks.mask, "left").select(
        "s",
        F.when(
            F.coalesce(F.col("n"), F.lit(0)) > 0,
            F.coalesce(F.col("nc"), F.lit(0)) * F.lit(1.0) / F.col("n"),
        )
        .otherwise(0.0)
        .alias("v"),
    )
    ch = spark.range(1).select(
        F.explode(
            F.array(
                F.struct(F.lit("click").alias("name"), F.lit(8).alias("bit")),
                F.struct(F.lit("view").alias("name"), F.lit(4).alias("bit")),
                F.struct(F.lit("signup").alias("name"), F.lit(2).alias("bit")),
                F.struct(F.lit("error").alias("name"), F.lit(1).alias("bit")),
            )
        ).alias("ch")
    ).select("ch.name", "ch.bit")
    v0 = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    v1 = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    pairs = (
        ch.join(F.broadcast(v0), F.expr("(s0 div bit) % 2 = 0"))
        .join(F.broadcast(v1), F.expr("s1 = s0 + bit"))
    )
    pop = F.expr("(s0 div 8) % 2 + (s0 div 4) % 2 + (s0 div 2) % 2 + s0 % 2")
    w = F.when(pop.isin(1, 2), F.lit(1.0) / F.lit(12.0)).otherwise(F.lit(0.25))
    return pairs.groupBy(F.col("name").alias("channel")).agg(
        F.round(F.sum(w * (F.col("v1") - F.col("v0"))), 4).alias("phi")
    )


# ---------------------------------------------------------------------------
# trend / association tests


@register(
    "q_mann_kendall",
    oracle="""
        WITH day AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   round(sum(o_totalprice), 2) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        s AS (
            SELECT sum(CASE WHEN b.rev > a.rev THEN 1
                            WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS s_stat
            FROM day a JOIN day b ON a.d < b.d
        ),
        n AS (SELECT count(*) AS n FROM day),
        ties AS (
            SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS corr
            FROM (SELECT count(*) AS t FROM day GROUP BY rev HAVING count(*) > 1)
        )
        SELECT CAST(n.n AS BIGINT) AS n_days,
               CAST(s.s_stat AS BIGINT) AS s_stat,
               round((n.n * (n.n - 1) * (2 * n.n + 5) - ties.corr) / 18.0, 4)
                   AS var_s,
               round(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                          / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.corr) / 18.0)
                          WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                          / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.corr) / 18.0)
                          ELSE 0.0 END, 4) AS z
        FROM s, n, ties
    """,
    category="analytics",
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on the daily revenue series — the
    nonparametric monotone-trend detector (S = Σ sign(x_j − x_i) over
    ordered day pairs) with the exact tie-corrected variance and the
    continuity-corrected z.

    S and the tie correction are exact integers (day revenue is
    rounded to cents before comparison, so both engines order the same
    series). Scale: the pair join runs over the CALENDAR-bounded day
    aggregate (30 days → 435 pairs), broadcast; fact grain is touched
    once by the combinable day rollup."""
    day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    a = day.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = day.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    s = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("rb") > F.col("ra"), 1)
                .when(F.col("rb") < F.col("ra"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    n = day.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        day.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            ).alias("corr")
        )
    )
    j = s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties))
    var = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("corr")
    ) / F.lit(18.0)
    return j.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("s_stat").cast("bigint").alias("s_stat"),
        F.round(var, 4).alias("var_s"),
        F.round(
            F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var))
            .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var))
            .otherwise(0.0),
            4,
        ).alias("z"),
    )


@register(
    "q_kendall_tau",
    oracle="""
        WITH nat AS (
            SELECT n.n_name,
                   round(sum(o.o_totalprice), 2) AS rev,
                   count(DISTINCT o.o_custkey) AS nc
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        ),
        pairs AS (
            SELECT sum(CASE WHEN (a.rev - b.rev) * (a.nc - b.nc) > 0
                            THEN 1 ELSE 0 END) AS c,
                   sum(CASE WHEN (a.rev - b.rev) * (a.nc - b.nc) < 0
                            THEN 1 ELSE 0 END) AS d,
                   sum(CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END) AS tx,
                   sum(CASE WHEN a.nc = b.nc THEN 1 ELSE 0 END) AS ty,
                   count(*) AS n0
            FROM nat a JOIN nat b ON a.n_name < b.n_name
        )
        SELECT CAST((SELECT count(*) FROM nat) AS BIGINT) AS n_nations,
               CAST(c AS BIGINT) AS concordant,
               CAST(d AS BIGINT) AS discordant,
               round((c - d) / sqrt((n0 - tx) * 1.0 * (n0 - ty)), 4) AS tau_b
        FROM pairs
    """,
    category="analytics",
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between two nation-level rankings
    — revenue vs distinct-customer count: do the orderings agree?
    Concordant/discordant/tied pair counts with the tie-adjusted
    denominator sqrt((n0−t_x)(n0−t_y)).

    All pair counts are exact integers over the 25-row nation
    aggregate (300 pairs, broadcast self-join on the bounded grain —
    the quadratic is in the enum domain, not the data). Revenue is
    rounded to cents pre-comparison so both engines see identical
    sign structure."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
            F.countDistinct("o_custkey").alias("nc"),
        )
    )
    a = g.select(
        F.col("n_name").alias("na"), F.col("rev").alias("ra"), F.col("nc").alias("ca")
    )
    b = g.select(
        F.col("n_name").alias("nb"), F.col("rev").alias("rb"), F.col("nc").alias("cb")
    )
    pairs = a.join(F.broadcast(b), F.col("na") < F.col("nb")).agg(
        F.sum(
            F.when((F.col("ra") - F.col("rb")) * (F.col("ca") - F.col("cb")) > 0, 1)
            .otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("ra") - F.col("rb")) * (F.col("ca") - F.col("cb")) < 0, 1)
            .otherwise(0)
        ).alias("d"),
        F.sum(F.when(F.col("ra") == F.col("rb"), 1).otherwise(0)).alias("tx"),
        F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)).alias("ty"),
        F.count(F.lit(1)).alias("n0"),
    )
    nn = g.agg(F.count(F.lit(1)).alias("n_nations"))
    return pairs.crossJoin(F.broadcast(nn)).select(
        F.col("n_nations").cast("bigint").alias("n_nations"),
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        F.round(
            (F.col("c") - F.col("d"))
            / F.sqrt((F.col("n0") - F.col("tx")) * F.lit(1.0) * (F.col("n0") - F.col("ty"))),
            4,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# the scalable bootstrap


@register(
    "q_poisson_bootstrap",
    oracle="""
        WITH day AS (
            SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_id,
                   round(sum(o_totalprice), 2) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        ),
        drawn AS (
            SELECT b.b, day.rev,
                   CASE
                     WHEN ((day.day_id * 131 + b.b) * 2654435761) % 4294967296
                          / 4294967296.0 < 0.36787944117144233 THEN 0
                     WHEN ((day.day_id * 131 + b.b) * 2654435761) % 4294967296
                          / 4294967296.0 < 0.7357588823428847 THEN 1
                     WHEN ((day.day_id * 131 + b.b) * 2654435761) % 4294967296
                          / 4294967296.0 < 0.9196986029286058 THEN 2
                     WHEN ((day.day_id * 131 + b.b) * 2654435761) % 4294967296
                          / 4294967296.0 < 0.9810118431238462 THEN 3
                     WHEN ((day.day_id * 131 + b.b) * 2654435761) % 4294967296
                          / 4294967296.0 < 0.9963401531726563 THEN 4
                     ELSE 5 END AS w
            FROM day, (SELECT unnest(range(1, 21)) AS b) b
        ),
        boots AS (
            SELECT b, sum(w * rev) / sum(w) AS mean_b
            FROM drawn GROUP BY b HAVING sum(w) > 0
        ),
        point AS (SELECT avg(rev) AS mean_rev FROM day)
        SELECT CAST((SELECT count(*) FROM boots) AS BIGINT) AS n_boot,
               round(point.mean_rev, 4) AS point_mean,
               round((SELECT min(mean_b) FROM boots), 4) AS ci_lo,
               round((SELECT max(mean_b) FROM boots), 4) AS ci_hi
        FROM point
    """,
    category="analytics",
)
def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of mean daily revenue — THE scalable bootstrap:
    instead of drawing n-out-of-n resamples (which needs global
    coordination), each row independently gets a Poisson(1) weight per
    replicate, so resampling is embarrassingly parallel and streaming-
    friendly. 20 replicates; the interval is the replicate min/max
    (small-B envelope; the mechanics, not the coverage, are graded).

    Weights are deterministic — the inverse Poisson CDF applied to the
    portable (day, replicate) hash — so both engines draw the SAME
    resamples. Scale: replication explodes the calendar-bounded day
    aggregate ×20, never fact grain; replicate means are combinable
    weighted sums."""
    day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .select(
            F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01")))
            .cast("bigint")
            .alias("day_id"),
            "rev",
        )
    )
    drawn = day.select(
        "day_id",
        "rev",
        F.explode(F.array(*[F.lit(i) for i in range(1, 21)])).alias("b"),
    )
    u = (
        ((F.col("day_id") * F.lit(131) + F.col("b")) * F.lit(_K)) % F.lit(_M32)
    ) / F.lit(4294967296.0)
    w = (
        F.when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428847, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4)
        .otherwise(5)
    )
    boots = (
        drawn.withColumn("w", w)
        .groupBy("b")
        .agg(
            (F.sum(F.col("w") * F.col("rev")) / F.sum("w")).alias("mean_b"),
            F.sum("w").alias("wsum"),
        )
        .filter(F.col("wsum") > 0)
    )
    summary = boots.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boot"),
        F.round(F.min("mean_b"), 4).alias("ci_lo"),
        F.round(F.max("mean_b"), 4).alias("ci_hi"),
    )
    point = day.agg(F.round(F.avg("rev"), 4).alias("point_mean"))
    return summary.crossJoin(F.broadcast(point)).select(
        "n_boot", "point_mean", "ci_lo", "ci_hi"
    )


# ---------------------------------------------------------------------------
# differential-privacy noise mechanics


@register(
    "q_dp_noisy_counts",
    oracle="""
        WITH g AS (
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        ),
        noised AS (
            SELECT event_type, n,
                   ((ascii(substr(event_type, 1, 1)) * 256
                     + ascii(substr(event_type, 2, 1))) * 2654435761)
                   % 4294967296 / 4294967296.0 AS u
            FROM g
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_true,
               round(n + (-10.0) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 4)
                   AS n_noisy,
               round(abs((-10.0) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5))), 4)
                   AS abs_err,
               0.1 AS epsilon
        FROM noised
    """,
    category="llm-pipeline",
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy release mechanics: per-event-type counts
    with Laplace(Δ/ε) noise (ε = 0.1, sensitivity 1 → scale 10) via
    the inverse-CDF transform −b·sign(u−½)·ln(1−2|u−½|) — the noise
    audit a DP release pipeline publishes (true vs noisy vs absolute
    error). The uniform u is the portable hash of the group key, so
    the draw is deterministic and cross-engine reproducible (a
    *mechanism demo*, documented as such — real DP needs fresh
    randomness per release).

    One combinable count pass; the noise is a row-local expression on
    5 rows."""
    g = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    u = (
        (
            (F.ascii(F.substring("event_type", 1, 1)) * 256
             + F.ascii(F.substring("event_type", 2, 1)))
            * F.lit(_K)
        )
        % F.lit(_M32)
    ) / F.lit(4294967296.0)
    noise = F.lit(-10.0) * F.signum(u - 0.5) * F.log(1 - 2 * F.abs(u - 0.5))
    return g.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_true"),
        F.round(F.col("n") + noise, 4).alias("n_noisy"),
        F.round(F.abs(noise), 4).alias("abs_err"),
        F.lit(0.1).alias("epsilon"),
    )


# ---------------------------------------------------------------------------
# inter-rater agreement


@register(
    "q_fleiss_kappa",
    oracle="""
        WITH rated AS (
            SELECT (CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
                 + (CASE WHEN (length(text) - length(replace(text, ' ', '')))
                         * 1.0 / n_chars BETWEEN 0.10 AND 0.25 THEN 1 ELSE 0 END)
                 + (CASE WHEN (n_chars - length(regexp_replace(text, '[A-Z]', '', 'g')))
                         * 1.0 / n_chars <= 0.10 THEN 1 ELSE 0 END) AS k
            FROM documents
        ),
        m AS (
            SELECT count(*) AS n, sum(k) AS sk,
                   sum(k * (k - 1) + (3 - k) * (2 - k)) AS agree6
            FROM rated
        )
        SELECT CAST(n AS BIGINT) AS n_docs,
               round(sk / (3.0 * n), 4) AS p_pass,
               round(agree6 / (6.0 * n), 4) AS p_bar,
               round((agree6 / (6.0 * n)
                      - (sk / (3.0 * n)) * (sk / (3.0 * n))
                      - (1 - sk / (3.0 * n)) * (1 - sk / (3.0 * n)))
                     / (1 - (sk / (3.0 * n)) * (sk / (3.0 * n))
                        - (1 - sk / (3.0 * n)) * (1 - sk / (3.0 * n))), 4)
                   AS kappa
        FROM m
    """,
    category="llm-pipeline",
)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa inter-rater agreement across three deterministic
    quality gates (length ≥ 200, space-ratio in [0.10, 0.25],
    uppercase-ratio ≤ 0.10) treated as three raters making pass/fail
    judgments per document — the agreement audit that tells a curation
    pipeline whether its gates are redundant (high κ) or orthogonal
    (κ near 0). κ = (P̄ − Pe)/(1 − Pe) with P_i = [k(k−1) +
    (3−k)(2−k)]/6 for k passing raters.

    The per-doc k is exact integer (character counts via replace /
    regexp_replace, identical in both engines); ALL of Fleiss reduces
    to two integer sums (Σk and Σ agreement numerators) — one
    combinable pass, closed form on one row."""
    d = load_table(spark, sf_dir, "documents").select("text", "n_chars")
    spaces = F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    upper = F.col("n_chars") - F.length(F.regexp_replace("text", "[A-Z]", ""))
    k = (
        F.when(F.col("n_chars") >= 200, 1).otherwise(0)
        + F.when(
            (spaces * F.lit(1.0) / F.col("n_chars")).between(0.10, 0.25), 1
        ).otherwise(0)
        + F.when(upper * F.lit(1.0) / F.col("n_chars") <= 0.10, 1).otherwise(0)
    )
    rated = d.select(k.alias("k"))
    m = rated.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sk"),
        F.sum(
            F.col("k") * (F.col("k") - 1) + (3 - F.col("k")) * (2 - F.col("k"))
        ).alias("agree6"),
    )
    p = F.col("sk") / (F.lit(3.0) * F.col("n"))
    pbar = F.col("agree6") / (F.lit(6.0) * F.col("n"))
    pe = p * p + (1 - p) * (1 - p)
    return m.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(p, 4).alias("p_pass"),
        F.round(pbar, 4).alias("p_bar"),
        F.round((pbar - pe) / (1 - pe), 4).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# per-group mode


@register(
    "q_group_mode",
    oracle="""
        WITH cnt AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        ranked AS (
            SELECT user_id, event_type, n,
                   sum(n) OVER (PARTITION BY user_id) AS total,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY n DESC, event_type
                   ) AS rk
            FROM cnt
        )
        SELECT user_id, event_type AS mode_type,
               CAST(n AS BIGINT) AS n,
               round(n * 1.0 / total, 4) AS share
        FROM ranked WHERE rk = 1
    """,
    category="aggregation",
)
def q_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group MODE: each user's most frequent event type with
    its count and share — built-in mode() has engine-specific tie
    behavior, so the portable form is count + rank under a total order
    (count desc, type asc).

    The window partitions on user_id (unbounded entity grain) over the
    already-aggregated (user × type) table — bounded to 5 rows per
    user; the share reuses the same exchange for its partition sum."""
    cnt = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("user_id")
    w_rk = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        cnt.withColumn("total", F.sum("n").over(w_tot))
        .withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") * F.lit(1.0) / F.col("total"), 4).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# rank-with-ties top-k


@register(
    "q_topk_with_ties",
    oracle="""
        SELECT o_orderpriority AS prio, o_orderkey,
               round(o_totalprice, 2) AS price,
               CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT *, rank() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC
                   ) AS rk
            FROM orders
        )
        WHERE rk <= 3
    """,
    category="window",
)
def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 order values per priority under RANK semantics — ties
    INCLUDED (row_number's arbitrary tie cut drops peers; WITH TIES is
    the SQL-standard FETCH FIRST ... WITH TIES shape).

    Scale path: rank ≤ 3 can involve at most 3 DISTINCT price values,
    so the plan aggregates to (priority × distinct price) grain
    (combinable), takes the top-3 distinct prices per priority via
    grouped_topk (map-side pruned — no 5-partition window over fact
    grain), computes each survivor's strictly-greater row count from
    the ≤3-row frame, and rejoins as a broadcast to emit the tied
    rows. rank = 1 + rows strictly greater — exact RANK semantics."""
    from builder_spark.operators.topk import grouped_topk

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"), "o_orderkey", "o_totalprice"
    )
    pg = o.groupBy("prio", "o_totalprice").agg(F.count(F.lit(1)).alias("cnt"))
    top3 = grouped_topk(pg, ["prio"], [F.col("o_totalprice").desc()], k=3)
    w_gt = (
        Window.partitionBy("prio")
        .orderBy(F.col("o_totalprice").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cut = (
        top3.withColumn("greater", F.coalesce(F.sum("cnt").over(w_gt), F.lit(0)))
        .filter(F.col("greater") <= 2)
        .select("prio", "o_totalprice", (F.col("greater") + 1).alias("rk"))
    )
    return o.join(F.broadcast(cut), ["prio", "o_totalprice"]).select(
        "prio",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.col("rk").cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# embedding anisotropy without pairs


@register(
    "q_embedding_anisotropy",
    oracle=f"""
        WITH u AS (
            SELECT vec_id, label, embedding,
                   {_DD_NORM.format(v="embedding")} AS nrm
            FROM embeddings
        ),
        pairs AS (
            SELECT a.label,
                   {_DD_DOT.format(a="a.embedding", b="b.embedding")}
                   / (a.nrm * b.nrm) AS cos
            FROM u a JOIN u b ON a.label = b.label AND a.vec_id <> b.vec_id
        ),
        per_pair AS (
            SELECT label, count(*) AS np, sum(cos) AS sc
            FROM pairs GROUP BY label
        ),
        nl AS (SELECT label, count(*) AS n FROM u GROUP BY label)
        -- LEFT JOIN + coalesce in the norm: a single-vector label has
        -- no pairs (mean cos NULL) but a defined mean-vector norm —
        -- matches Spark's pair-free component-sum form (degenerate audit)
        SELECT nl.label, CAST(nl.n AS BIGINT) AS n_vecs,
               -- + 0.0: a well-spread label's mean cos is noise around 0
               -- and the engines' summation orders can land on opposite
               -- signs of it (−0.0 vs 0.0 at sf0.1) — SURVEY trap 10
               round(p.sc / p.np, 4) + 0.0 AS mean_pairwise_cos,
               round(sqrt(nl.n + coalesce(p.sc, 0)) / nl.n, 4) AS norm_of_mean
        FROM nl LEFT JOIN per_pair p ON nl.label = p.label
    """,
    category="llm-similarity",
)
def q_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding anisotropy per label — the mean pairwise cosine of
    normalized vectors (Ethayarajh's diagnostic: well-spread spaces sit
    near 0; a collapsed cone near 1) — computed WITHOUT materializing
    any pair: for unit vectors, Σ_{i≠j} u_i·u_j = ‖Σu‖² − n, so the
    all-pairs statistic needs only the per-dimension component sums.
    Also reports ‖mean vector‖, the centering diagnostic.

    The oracle brute-forces the pairs (fine at test scale; identical
    algebra modulo float summation order, absorbed by round 4). Spark
    path: normalize per row (HOF), posexplode to (label, dim,
    component), ONE combinable groupBy to label×64 rows, closed form.
    O(n·d) work, O(labels·d) state — this is how the statistic stays
    computable at 100 TB where n² is absurd."""
    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    unit = e.select(
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        nrm.alias("nrm"),
    ).select(
        "label",
        F.posexplode(F.transform("v", lambda x: x / F.col("nrm"))).alias("dim", "comp"),
    )
    dims = unit.groupBy("label", "dim").agg(
        F.sum("comp").alias("s"), F.count(F.lit(1)).alias("n")
    )
    per_label = dims.groupBy("label").agg(
        F.max("n").cast("bigint").alias("n_vecs"),
        F.sum(F.col("s") * F.col("s")).alias("ss"),
    )
    n = F.col("n_vecs")
    return per_label.select(
        "label",
        "n_vecs",
        (  # ANSI /0 guard: single-vector label has no pairs; + 0.0:
            # the mean cos is noise around 0 — signed-zero discipline
            F.round((F.col("ss") - n) / F.when(n != 1, n * (n - 1)), 4)
            + F.lit(0.0)
        ).alias("mean_pairwise_cos"),
        F.round(F.sqrt(F.col("ss")) / n, 4).alias("norm_of_mean"),
    )


# ---------------------------------------------------------------------------
# second-price (Vickrey) clearing


@register(
    "q_vickrey_auction",
    oracle="""
        WITH ranked AS (
            SELECT l_partkey, l_orderkey, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_partkey
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
                   ) AS rk
            FROM lineitem
        )
        SELECT w.l_partkey,
               w.l_orderkey AS win_orderkey,
               round(w.l_extendedprice, 2) AS win_bid,
               round(s.l_extendedprice, 2) AS clearing_price
        FROM ranked w JOIN ranked s
          ON w.l_partkey = s.l_partkey AND w.rk = 1 AND s.rk = 2
    """,
    category="analytics",
)
def q_vickrey_auction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-price (Vickrey) auction clearing per part: the highest
    bid (lineitem extended price) wins but pays the SECOND-highest —
    the ad-exchange settlement primitive, i.e. grouped top-2 with the
    two ranks pivoted onto one row. Parts with a single bid clear
    nothing and are excluded.

    One per-part window (entity grain) ranks bids under a total order;
    the top-2 rows pivot via a conditional-max groupBy on the same
    exchange — no self-join. Prices are compared raw (straight from
    parquet, no arithmetic) so ranking is exact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_extendedprice", "l_linenumber"
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    top2 = li.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    return (
        top2.groupBy("l_partkey")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("l_orderkey"))).alias("win_orderkey"),
            F.max(F.when(F.col("rk") == 1, F.col("l_extendedprice"))).alias("_wb"),
            F.max(F.when(F.col("rk") == 2, F.col("l_extendedprice"))).alias("_cp"),
        )
        .filter(F.col("_cp").isNotNull())
        .select(
            "l_partkey",
            "win_orderkey",
            F.round("_wb", 2).alias("win_bid"),
            F.round("_cp", 2).alias("clearing_price"),
        )
    )
