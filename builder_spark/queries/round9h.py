"""Round-9 surface growth, batch 9: SAX time-series symbolization
with motif counts, lead–lag cross-correlation between event series,
monetary-unit (PPS systematic) audit sampling, intraclass correlation
(one-way ICC), Chao1 + Good–Turing unseen-vocabulary estimates,
discrete-time churn hazard, per-prefix top completions, sign-bit
density audit for hyperplane LSH, weekday seasonality strength, and a
chi-square uniformity audit of the repo's own Knuth split hash.

Design rules (unchanged): integer-exact cores; day-grain rollups
absorb fact growth before any window; windows partition on series /
entity keys; global cumulative structure rides ``stitched_running``;
count-of-count tables bound every estimator; one identical float
expression per statistic, rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.functions.hashing import KNUTH, knuth_bucket
from builder_spark.operators.partitioning import stitched_running
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# SAX symbolization + motifs


_SAX_DAILY_SQL = """
        SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY grp, date_trunc('day', o_orderdate)
"""


@register(
    "q_sax_symbols",
    oracle=f"""
        WITH daily AS ({_SAX_DAILY_SQL}),
        m AS (
            SELECT grp, count(*) AS n,
                   CAST(sum(cnt) AS BIGINT) AS s,
                   CAST(sum(cnt * cnt) AS BIGINT) AS ss
            FROM daily GROUP BY grp
        ),
        z AS (
            SELECT daily.grp, d,
                   (cnt - s * 1.0 / n)
                   / sqrt((ss - s * 1.0 * s / n) / (n - 1)) AS zv
            FROM daily JOIN m ON daily.grp = m.grp WHERE m.n > 1
        ),
        sym AS (
            SELECT grp, d,
                   CASE WHEN zv < -0.6745 THEN 'a'
                        WHEN zv < 0 THEN 'b'
                        WHEN zv < 0.6745 THEN 'c'
                        ELSE 'd' END AS s
            FROM z
        ),
        mot AS (
            SELECT grp,
                   s || lead(s, 1) OVER w || lead(s, 2) OVER w AS motif
            FROM sym WINDOW w AS (PARTITION BY grp ORDER BY d)
        )
        SELECT grp, motif, CAST(count(*) AS BIGINT) AS n_occur
        FROM mot WHERE motif IS NOT NULL
        GROUP BY grp, motif
        QUALIFY row_number() OVER (PARTITION BY grp
                                   ORDER BY count(*) DESC, motif ASC) <= 3
    """,
    category="analytics",
)
def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) of each priority's daily
    order-count series: z-normalize per series, discretize into the
    4-symbol Gaussian-equiprobable alphabet (breakpoints ±0.6745, 0),
    and report each series' top-3 length-3 motifs — the
    pattern-mining front end (motif/discord discovery, SAX-VSM
    classification) that turns a numeric series into n-gram text.

    The day-grain rollup absorbs fact growth before anything else;
    per-series moments come from exact integer Σ/Σ² (one combinable
    pass, broadcast back); symbols are deterministic CASE cuts on one
    identical z expression; motifs are two leads PARTITIONed by the
    series key; the top-3 is a per-series rank over the bounded
    (series × 64 motifs) aggregate."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.date_trunc("day", F.col("o_orderdate")).alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    m = daily.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").cast("bigint").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("ss"),
    )
    sd = F.sqrt(
        (F.col("ss") - F.col("s") * 1.0 * F.col("s") / F.col("n")) / (F.col("n") - 1)
    )
    z = (
        daily.join(F.broadcast(m), "grp")
        .filter(F.col("n") > 1)
        .select(
            "grp", "d", ((F.col("cnt") - F.col("s") * 1.0 / F.col("n")) / sd).alias("zv")
        )
    )
    sym = z.select(
        "grp",
        "d",
        F.when(F.col("zv") < -0.6745, "a")
        .when(F.col("zv") < 0, "b")
        .when(F.col("zv") < 0.6745, "c")
        .otherwise("d")
        .alias("s"),
    )
    w = Window.partitionBy("grp").orderBy("d")
    mot = sym.select(
        "grp",
        F.concat(F.col("s"), F.lead("s", 1).over(w), F.lead("s", 2).over(w)).alias(
            "motif"
        ),
    ).filter(F.col("motif").isNotNull())
    cnts = mot.groupBy("grp", "motif").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occur")
    )
    rk = Window.partitionBy("grp").orderBy(
        F.col("n_occur").desc(), F.col("motif").asc()
    )
    return (
        cnts.withColumn("_r", F.row_number().over(rk))
        .filter(F.col("_r") <= 3)
        .drop("_r")
    )


# ---------------------------------------------------------------------------
# lead–lag cross-correlation


_XCORR_LAG_SELECTS = "\n            UNION ALL\n".join(
    f"""
            SELECT CAST({lag} AS INT) AS lag,
                   lag(x, {lag}) OVER (ORDER BY d) AS x_l, y
            FROM daily"""
    for lag in range(8)
)


@register(
    "q_cross_correlation",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS d,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS x,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS y
            FROM events GROUP BY date_trunc('day', ts)
        ),
        lagged AS ({_XCORR_LAG_SELECTS}
        )
        SELECT lag,
               CAST(count(*) AS BIGINT) AS n_days,
               round(corr(x_l, y), 4) AS xcorr
        FROM lagged WHERE x_l IS NOT NULL GROUP BY lag
    """,
    category="analytics",
)
def q_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead–lag cross-correlation between daily views and purchases:
    corr(view_{t−l}, purchase_t) for l = 0..7 — does view volume LEAD
    purchase volume, and by how many days? The lead-lag discovery
    behind marketing-mix and demand-forecast features, and the
    cross-series sibling of q_autocorrelation (same harness, two
    series).

    One day-grain rollup computes both series in one pass (combinable
    conditional counts); ALL 8 lag columns come from ONE window pass
    over the calendar-bounded day table (whitelisted — the
    q_autocorrelation discipline, no per-lag re-scan), stack-unpivoted
    to (lag, x_l, y) rows; corr is per-lag combinable. NULL-dropping
    the first l days matches both engines exactly (integer presence,
    no float gate)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )
    w = Window.orderBy("d")  # day table (calendar-bounded, whitelisted)
    wide = daily.select(
        "y", *[F.lag("x", lag).over(w).alias(f"x{lag}") for lag in range(8)]
    )
    stack = ", ".join(f"{lag}, x{lag}" for lag in range(8))
    un = wide.select(
        "y", F.expr(f"stack(8, {stack}) AS (lag, x_l)")
    ).select(F.col("lag").cast("int").alias("lag"), "x_l", "y")
    return (
        un.filter(F.col("x_l").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.corr("x_l", "y"), 4).alias("xcorr"),
        )
    )


# ---------------------------------------------------------------------------
# monetary-unit (PPS systematic) sampling


_MUS_N = 40  # target sample size


@register(
    "q_mus_sample",
    oracle=f"""
        WITH x AS (
            SELECT o_orderkey, o_orderpriority AS grp, {_OC} AS cents
            FROM orders
        ),
        r AS (
            SELECT o_orderkey, grp, cents,
                   sum(cents) OVER (ORDER BY o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum
            FROM x
        ),
        tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM x),
        sel AS (
            SELECT grp, cents,
                   (cum - 1 + t) // (t // {_MUS_N})
                   - (cum - cents - 1 + t) // (t // {_MUS_N}) AS hits
            FROM r CROSS JOIN tot
        )
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sampled,
               CAST(sum(CASE WHEN hits > 0 THEN cents ELSE 0 END) AS BIGINT)
                   AS cents_sampled
        FROM sel GROUP BY grp
    """,
    category="analytics",
)
def q_mus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-unit sampling (PPS systematic) — the audit-sampling
    standard where P(select) ∝ dollars, implemented as a fixed
    sampling interval B = total//N marched across the cumulative
    cents line: an order is selected iff its cumulative span
    (cum−cents, cum] contains a multiple of B, i.e.
    (cum−1)//B − (cum−cents−1)//B > 0 — big orders are certainties,
    small ones proportional. Zero RNG: the selection is a pure
    function of the cumulative position.

    The cumulative line rides ONE stitched running pass over the
    unique-key order (never a single-partition window); the span
    test is exact integer div arithmetic against a 1-row broadcast
    total; per-segment audit counts are combinable. Both operands
    carry a +t shift so the first row's left edge stays positive and
    `div` agrees between engines without floor-vs-truncate games."""
    x = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("grp"), F.expr(_OC).alias("cents")
    )
    r = stitched_running(x, ["o_orderkey"], running={"cum": "cents"})
    tot = x.agg(F.sum("cents").cast("bigint").alias("t"))
    b = F.expr(f"t div {_MUS_N}")
    # hits = floor((cum-1)/B) - floor((cum-cents-1)/B); the first row's
    # left edge is -1 — add t (a multiple-of-B-sized shift is NOT
    # guaranteed, so shift BOTH sides by +t to keep operands positive
    # and the difference identical)
    hits = F.expr(f"(cum - 1 + t) div (t div {_MUS_N})") - F.expr(
        f"(cum - cents - 1 + t) div (t div {_MUS_N})"
    )
    sel = r.crossJoin(F.broadcast(tot)).select(
        "grp", "cents", hits.alias("hits")
    )
    return sel.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sampled"),
        F.sum(F.when(F.col("hits") > 0, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("cents_sampled"),
    )


# ---------------------------------------------------------------------------
# intraclass correlation (one-way random effects)


@register(
    "q_icc_orders",
    oracle=f"""
        WITH per AS (
            SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS ni,
                   CAST(sum({_OC}) AS BIGINT) AS si,
                   CAST(sum({_OC} * {_OC}) AS BIGINT) AS ssi
            FROM orders GROUP BY o_custkey
            HAVING count(*) >= 2
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(ni) AS BIGINT) AS n,
                   CAST(sum(si) AS BIGINT) AS s,
                   sum(ssi - si * 1.0 * si / ni) AS ssw,
                   sum(si * 1.0 * si / ni) AS sb_part,
                   sum(ni * 1.0 * ni) AS sum_ni2
            FROM per
        ),
        ms AS (
            SELECT k, n,
                   (sb_part - s * 1.0 * s / n) / (k - 1) AS msb,
                   ssw / (n - k) AS msw,
                   (n - sum_ni2 / n) / (k - 1) AS k0
            FROM tot
        )
        SELECT k AS n_customers, n AS n_orders,
               round(msb / msw, 4) AS f_ratio,
               round((msb - msw) / (msb + (k0 - 1) * msw), 4) AS icc
        FROM ms
    """,
    category="analytics",
)
def q_icc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way intraclass correlation of order values within
    customers — ICC(1) = (MSB − MSW)/(MSB + (k₀−1)·MSW) with the
    unbalanced-design k₀ = (N − Σnᵢ²/N)/(k−1): how much of price
    variance is a stable customer trait vs within-customer noise. The
    clustered-data diagnostic that decides whether per-customer
    features are worth building (ICC≈0 ⇒ they're noise) and whether
    standard errors need cluster correction.

    Single-visit customers are excluded by an integer HAVING (they
    contribute nothing to within-variance). One per-customer
    combinable aggregate of exact integer moments, one 1-row rollup.
    The mean squares are reported only as the scale-free F = MSB/MSW
    (raw MS values are ~10¹⁴ cents² where round(·,4) cannot absorb
    cross-engine accumulation dust; the ratio's relative error is
    ~1e-16 and rounds identically)."""
    oc = F.expr(_OC)
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ni"),
            F.sum(oc).cast("bigint").alias("si"),
            F.sum(oc * oc).cast("bigint").alias("ssi"),
        )
        .filter(F.col("ni") >= 2)
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ni").cast("bigint").alias("n"),
        F.sum("si").cast("bigint").alias("s"),
        F.sum(F.col("ssi") - F.col("si") * 1.0 * F.col("si") / F.col("ni")).alias(
            "ssw"
        ),
        F.sum(F.col("si") * 1.0 * F.col("si") / F.col("ni")).alias("sb_part"),
        F.sum(F.col("ni") * 1.0 * F.col("ni")).alias("sum_ni2"),
    )
    msb = (F.col("sb_part") - F.col("s") * 1.0 * F.col("s") / F.col("n")) / (
        F.col("k") - 1
    )
    msw = F.col("ssw") / (F.col("n") - F.col("k"))
    k0 = (F.col("n") - F.col("sum_ni2") / F.col("n")) / (F.col("k") - 1)
    return tot.select(
        F.col("k").alias("n_customers"),
        F.col("n").alias("n_orders"),
        F.round(msb / msw, 4).alias("f_ratio"),
        F.round((msb - msw) / (msb + (k0 - 1) * msw), 4).alias("icc"),
    )


# ---------------------------------------------------------------------------
# Chao1 + Good–Turing unseen-vocabulary estimates


@register(
    "q_chao1_unseen",
    oracle="""
        WITH tok AS (
            SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
        ),
        cnt AS (
            SELECT lang, term, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY lang, term
        ),
        s AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS v,
                   CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
                   CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
            FROM cnt GROUP BY lang
        )
        SELECT lang, v AS vocab, n AS n_tokens, f1, f2,
               round(v + CASE WHEN f2 > 0 THEN f1 * 1.0 * f1 / (2 * f2)
                              ELSE f1 * 1.0 * (f1 - 1) / 2 END, 1) AS chao1,
               round(f1 * 1.0 / n, 4) AS unseen_mass
        FROM s
    """,
    category="llm-text",
)
def q_chao1_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much vocabulary HAVEN'T we seen? Per language: the Chao1
    richness estimate V + F₁²/(2F₂) (bias-corrected F₁(F₁−1)/2 when
    doubletons vanish) and the Good–Turing unseen probability mass
    P₀ = F₁/N — the coverage estimates that tell a tokenizer/corpus
    team whether more data will keep finding new types (pairs with
    q_vocab_growth's empirical Heaps curve; these are its parametric
    extrapolations).

    The token stream collapses once to (lang, term) counts; singleton
    and doubleton counts are conditional integer aggregates on that
    vocab grain; both estimators are single float expressions of
    exact integers."""
    tok = load_table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    )
    cnt = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    s = cnt.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("bigint").alias("f2"),
    )
    chao = F.col("v") + F.when(
        F.col("f2") > 0, F.col("f1") * 1.0 * F.col("f1") / (2 * F.col("f2"))
    ).otherwise(F.col("f1") * 1.0 * (F.col("f1") - 1) / 2)
    return s.select(
        "lang",
        F.col("v").alias("vocab"),
        F.col("n").alias("n_tokens"),
        "f1",
        "f2",
        F.round(chao, 1).alias("chao1"),
        F.round(F.col("f1") * 1.0 / F.col("n"), 4).alias("unseen_mass"),
    )


# ---------------------------------------------------------------------------
# discrete-time churn hazard


@register(
    "q_churn_hazard",
    oracle="""
        WITH per AS (
            SELECT user_id,
                   date_diff('week', min(date_trunc('week', ts)),
                             max(date_trunc('week', ts))) AS tenure_w
            FROM events GROUP BY user_id
        ),
        mx AS (SELECT max(tenure_w) AS m FROM per),
        spine AS (
            SELECT unnest(range(0, CAST(m AS BIGINT) + 1)) AS w FROM mx
        ),
        haz AS (
            SELECT spine.w,
                   CAST(sum(CASE WHEN per.tenure_w >= spine.w
                            THEN 1 ELSE 0 END) AS BIGINT) AS at_risk,
                   CAST(sum(CASE WHEN per.tenure_w = spine.w
                            THEN 1 ELSE 0 END) AS BIGINT) AS churned
            FROM spine CROSS JOIN per
            GROUP BY spine.w
        )
        SELECT CAST(w AS INT) AS tenure_week, at_risk, churned,
               round(churned * 1.0 / at_risk, 4) AS hazard
        FROM haz WHERE at_risk > 0
    """,
    category="analytics",
)
def q_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard by tenure week: h(w) =
    P(last-active week = w | survived to w) from each user's
    first→last activity span — WHERE in the lifecycle users drop off
    (a hazard spike at week 1 means onboarding; a flat tail means
    random attrition). The life-table complement of q_survival_km's
    Kaplan–Meier gap curve.

    Per-user tenure is one combinable aggregate (integer weeks); the
    hazard table joins the tiny calendar-bounded week spine against
    the TENURE HISTOGRAM, not per-user rows — at-risk counts are
    suffix sums over that bounded domain. All integers to the final
    ratio."""
    per = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.datediff(
                    F.date_trunc("week", F.max("ts")),
                    F.date_trunc("week", F.min("ts")),
                )
                / 7
            )
            .cast("bigint")
            .alias("tenure_w")
        )
    )
    hist = per.groupBy("tenure_w").agg(F.count(F.lit(1)).cast("bigint").alias("nw"))
    mx = hist.agg(F.max("tenure_w").alias("m"))
    spine = mx.select(
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("m"))).alias("w")
    )
    haz = (
        spine.join(
            F.broadcast(hist), F.col("tenure_w") >= F.col("w"), "left"
        )
        .groupBy("w")
        .agg(
            F.sum("nw").cast("bigint").alias("at_risk"),
            F.sum(F.when(F.col("tenure_w") == F.col("w"), F.col("nw")).otherwise(0))
            .cast("bigint")
            .alias("churned"),
        )
    )
    return haz.filter(F.col("at_risk") > 0).select(
        F.col("w").cast("int").alias("tenure_week"),
        "at_risk",
        "churned",
        F.round(F.col("churned") * 1.0 / F.col("at_risk"), 4).alias("hazard"),
    )


# ---------------------------------------------------------------------------
# per-prefix top completion


@register(
    "q_prefix_completions",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ),
        cnt AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c
            FROM tok WHERE length(term) >= 3 GROUP BY term
        ),
        pfx AS (
            SELECT substr(term, 1, 3) AS prefix, term, c,
                   row_number() OVER (PARTITION BY substr(term, 1, 3)
                                      ORDER BY c DESC, term ASC) AS rk,
                   CAST(sum(c) OVER (PARTITION BY substr(term, 1, 3))
                        AS BIGINT) AS prefix_mass
            FROM cnt
        )
        SELECT prefix, term AS top_completion, c AS n_occur, prefix_mass,
               round(c * 1.0 / prefix_mass, 4) AS share
        FROM pfx WHERE rk = 1
        ORDER BY prefix_mass DESC, prefix ASC
        LIMIT 20
    """,
    category="llm-text",
)
def q_prefix_completions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete table: for each 3-char prefix, the most frequent
    completion and its share of the prefix's token mass, top-20
    prefixes by mass — the first-keystroke suggestion table a search
    box ships, and a vocabulary-concentration readout (share≈1 means
    the prefix is effectively one word).

    The token stream collapses to vocab grain once; the rank and
    mass windows PARTITION BY prefix over that vocab-grain aggregate
    (bounded rows per prefix by the vocabulary, not the corpus); the
    final board is a TakeOrdered on exact integers with a prefix
    tie-break."""
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    cnt = (
        tok.filter(F.length("term") >= 3)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn("prefix", F.substring("term", 1, 3))
    )
    wp = Window.partitionBy("prefix")
    rk = F.row_number().over(
        Window.partitionBy("prefix").orderBy(F.col("c").desc(), F.col("term").asc())
    )
    pfx = cnt.select(
        "prefix",
        "term",
        "c",
        rk.alias("rk"),
        F.sum("c").over(wp).cast("bigint").alias("prefix_mass"),
    )
    return (
        pfx.filter(F.col("rk") == 1)
        .select(
            "prefix",
            F.col("term").alias("top_completion"),
            F.col("c").alias("n_occur"),
            "prefix_mass",
            F.round(F.col("c") * 1.0 / F.col("prefix_mass"), 4).alias("share"),
        )
        .orderBy(F.col("prefix_mass").desc(), F.col("prefix").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# sign-bit density audit (hyperplane LSH health)


@register(
    "q_signbit_density",
    oracle="""
        WITH u AS (
            SELECT i AS dim,
                   CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS x
            FROM embeddings, unnest(range(0, 64)) t(i)
        ),
        s AS (
            SELECT CAST(dim AS INT) AS dim,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_pos
            FROM u GROUP BY dim
        )
        SELECT dim, n_pos,
               round(n_pos * 1.0 / n, 4) AS pos_rate,
               CAST(CASE WHEN n_pos * 10 < n OR (n - n_pos) * 10 < n
                    THEN 1 ELSE 0 END AS INT) AS dead_bit
        FROM s
        ORDER BY abs(n_pos * 2 - n) DESC, dim ASC
        LIMIT 16
    """,
    category="llm-similarity",
)
def q_signbit_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit density audit for hyperplane LSH / SimHash over raw
    dimensions: per dimension, the share of positive values, flagging
    dims where one sign holds <10% of mass — a "dead bit" that wastes
    a hash position and skews bucket sizes (the q_ann_lsh /
    q_simhash design check; q_dim_variance finds low-VARIANCE dims,
    this finds biased-SIGN dims — a dim can be high-variance and
    still always-positive). Top-16 most-skewed dims reported.

    One (dim)-grain combinable integer aggregate; the skew ordering
    |2·n_pos − n| is exact integer arithmetic, so the board can't
    float-flip; TakeOrdered bounds the output."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select(F.posexplode("embedding").alias("dim", "x"))
    s = u.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("x") > 0, 1).otherwise(0)).cast("bigint").alias("n_pos"),
    )
    dead = F.when(
        (F.col("n_pos") * 10 < F.col("n"))
        | ((F.col("n") - F.col("n_pos")) * 10 < F.col("n")),
        1,
    ).otherwise(0)
    return (
        s.select(
            "dim",
            "n_pos",
            F.round(F.col("n_pos") * 1.0 / F.col("n"), 4).alias("pos_rate"),
            dead.cast("int").alias("dead_bit"),
            F.abs(F.col("n_pos") * 2 - F.col("n")).alias("_skew"),
        )
        .orderBy(F.col("_skew").desc(), F.col("dim").asc())
        .limit(16)
        .drop("_skew")
    )


# ---------------------------------------------------------------------------
# weekday seasonality strength


@register(
    "q_seasonality_strength",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM orders GROUP BY grp, date_trunc('day', o_orderdate)
        ),
        keyed AS (
            SELECT grp, cnt,
                   CAST(date_diff('day', DATE '1970-01-01', CAST(d AS DATE))
                        % 7 AS INT) AS dow
            FROM daily
        ),
        dow_m AS (
            SELECT grp, dow, CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(cnt) AS BIGINT) AS sd
            FROM keyed GROUP BY grp, dow
        ),
        tot AS (
            SELECT grp, CAST(sum(nd) AS BIGINT) AS n,
                   CAST(sum(sd) AS BIGINT) AS s,
                   sum(sd * 1.0 * sd / nd) AS fit_part
            FROM dow_m GROUP BY grp
        ),
        raw AS (
            SELECT grp, CAST(sum(cnt * cnt) AS BIGINT) AS ss
            FROM keyed GROUP BY grp
        )
        SELECT tot.grp,
               round((fit_part - s * 1.0 * s / n)
                     / (ss - s * 1.0 * s / n), 4) AS strength
        FROM tot JOIN raw ON tot.grp = raw.grp
    """,
    category="analytics",
)
def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality strength per priority series: the share of
    daily-count variance explained by weekday means — the ANOVA R²
    of cnt ~ weekday, i.e. (Σnᵈ·(x̄ᵈ−x̄)²)/(Σ(x−x̄)²) computed by the
    closed form (Σsd²/nd − s²/n)/(ss − s²/n). The one-number
    follow-up to q_seasonal_decompose: is the weekly pattern worth
    modeling at all (≈0) or dominant (→1)?

    Weekday is epoch-day mod 7 (integer, engine-identical — no
    locale-dependent dayofweek); all sums exact integers from two
    combinable passes over the day-grain rollup; strength is one
    identical float expression."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.date_trunc("day", F.col("o_orderdate")).alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    keyed = daily.select(
        "grp",
        "cnt",
        F.pmod(F.datediff(F.col("d").cast("date"), F.lit("1970-01-01").cast("date")), F.lit(7))
        .cast("int")
        .alias("dow"),
    )
    dow_m = keyed.groupBy("grp", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("cnt").cast("bigint").alias("sd"),
    )
    tot = dow_m.groupBy("grp").agg(
        F.sum("nd").cast("bigint").alias("n"),
        F.sum("sd").cast("bigint").alias("s"),
        F.sum(F.col("sd") * 1.0 * F.col("sd") / F.col("nd")).alias("fit_part"),
    )
    raw = keyed.groupBy("grp").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("ss")
    )
    _sst = F.col("ss") - F.col("s") * 1.0 * F.col("s") / F.col("n")
    sst = F.when(_sst != 0, _sst)  # ANSI /0 guard: constant daily counts
    ssb = F.col("fit_part") - F.col("s") * 1.0 * F.col("s") / F.col("n")
    return tot.join(raw, "grp").select("grp", F.round(ssb / sst, 4).alias("strength"))


# ---------------------------------------------------------------------------
# chi-square uniformity audit of the split hash


_HU_BUCKETS = 16


@register(
    "q_hash_uniformity",
    oracle=f"""
        WITH b AS (
            SELECT CAST((CAST(o_orderkey AS HUGEINT) * {KNUTH})
                        % 4294967296 % {_HU_BUCKETS} AS INT) AS bkt
            FROM orders
        ),
        c AS (
            SELECT bkt, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bkt
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                       CAST(count(*) AS BIGINT) AS k FROM c)
        SELECT CAST({_HU_BUCKETS} AS INT) AS n_buckets,
               CAST(max(k) AS BIGINT) AS n_nonempty,
               CAST(max(nn) AS BIGINT) AS n_keys,
               CAST(min(n) AS BIGINT) AS min_bucket,
               CAST(max(n) AS BIGINT) AS max_bucket,
               round(sum((n - nn * 1.0 / {_HU_BUCKETS})
                         * (n - nn * 1.0 / {_HU_BUCKETS}))
                     / max(nn * 1.0 / {_HU_BUCKETS}), 4) AS chi2
        FROM c CROSS JOIN tot
    """,
    category="analytics",
)
def q_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square uniformity audit of the repo's own split hash: drop
    the order keys into 16 Knuth-hash buckets and test the counts
    against uniform — χ² = Σ(nᵢ−E)²/E with E = N/16 (15 dof; ≈25 is
    the p=0.05 line). This is the pipeline auditing its OWN
    randomness source: every deterministic split/sample in this repo
    (q_hash_split, q_smd_balance, q_gumbel_topk_sample) leans on this
    hash, and the JL parity bug (see knuth_top_bit) is exactly the
    class of defect this query exists to catch.

    One combinable bucket count, a 1-row broadcast total, and one
    identical float expression over the 16-row bucket table."""
    b = load_table(spark, sf_dir, "orders").select(
        knuth_bucket("o_orderkey", _HU_BUCKETS).cast("int").alias("bkt")
    )
    c = b.groupBy("bkt").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.agg(
        F.sum("n").cast("bigint").alias("nn"), F.count(F.lit(1)).cast("bigint").alias("k")
    )
    e = F.col("nn") * 1.0 / _HU_BUCKETS
    return (
        c.crossJoin(F.broadcast(tot))
        .agg(
            F.lit(_HU_BUCKETS).cast("int").alias("n_buckets"),
            F.max("k").cast("bigint").alias("n_nonempty"),
            F.max("nn").cast("bigint").alias("n_keys"),
            F.min("n").cast("bigint").alias("min_bucket"),
            F.max("n").cast("bigint").alias("max_bucket"),
            F.round(F.sum((F.col("n") - e) * (F.col("n") - e)) / F.max(e), 4).alias(
                "chi2"
            ),
        )
    )
