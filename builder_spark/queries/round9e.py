"""Round-9 surface growth, batch 6: agreement statistics (Cohen's
kappa, McNemar), variance-homogeneity and rank-based block tests
(Levene/Brown–Forsythe, Friedman), Markov-chain entropy rate of event
sequences, Hoeffding-bound quality gating, 2×2 odds ratio with Woolf
CI, covariate-balance SMD across deterministic hash arms, classic
price indices (Laspeyres/Paasche/Fisher), and the robust Theil–Sen
slope.

Design rules (unchanged):
- integer-exact cores (counts, cents, bounded integer scores);
  floats only through one identical expression tree on both engines,
  then ``round(·, 4)``;
- per-block windows partition on the block key (day / user) — never
  a global sort over fact grain; pairwise constructions only over
  constant-bounded aggregates (25 nations → ≤300 slope pairs,
  whitelisted);
- global scalars travel as 1-row broadcast cross joins; the
  train/control arm assignment reuses the TOP BIT of the engine-portable
  Knuth multiplicative hash (`functions/hashing.py`) so any engine can
  recompute membership from the key alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.functions.hashing import KNUTH, knuth_bucket, knuth_top_bit
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"
_AC = "CAST(round(c_acctbal * 100) AS BIGINT)"

#: two deterministic document "raters" shared by the kappa/McNemar
#: pair: a char-length gate and a whitespace-count (word-proxy) gate —
#: both integer-exact and engine-identical
_RATER_A_SQL = "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END"
_RATER_B_SQL = (
    "CASE WHEN length(text) - length(replace(text, ' ', '')) >= 49 "
    "THEN 1 ELSE 0 END"
)


def _raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.expr(_RATER_A_SQL).alias("ra"), F.expr(_RATER_B_SQL).alias("rb")
    )


# ---------------------------------------------------------------------------
# Cohen's kappa


@register(
    "q_cohens_kappa",
    oracle=f"""
        WITH r AS (
            SELECT {_RATER_A_SQL} AS ra, {_RATER_B_SQL} AS rb FROM documents
        ),
        c AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(ra * rb) AS BIGINT) AS n_both,
                   CAST(sum(ra * (1 - rb)) AS BIGINT) AS n_a_only,
                   CAST(sum((1 - ra) * rb) AS BIGINT) AS n_b_only,
                   CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS n_neither
            FROM r
        )
        SELECT n, n_both, n_a_only, n_b_only, n_neither,
               round((n_both + n_neither) * 1.0 / n, 4) AS po,
               round(((n_both + n_neither) * 1.0 / n
                      - ((n_both + n_a_only) * (n_both + n_b_only)
                         + (n_b_only + n_neither) * (n_a_only + n_neither))
                        * 1.0 / (n * n))
                     / (1 - ((n_both + n_a_only) * (n_both + n_b_only)
                             + (n_b_only + n_neither) * (n_a_only + n_neither))
                           * 1.0 / (n * n)), 4) AS kappa
        FROM c
    """,
    category="llm-pipeline",
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two binary
    document raters (a char-length quality gate vs a word-count
    gate): κ = (p_o − p_e)/(1 − p_e) with p_e from the raters'
    marginals. The two-rater sibling of q_fleiss_kappa, and the
    number a labeling pipeline reports before trusting a cheap gate
    as a proxy for an expensive one.

    Both raters are integer predicates, so the 2×2 table is exact and
    κ is one identical float expression — a single combinable
    aggregate over the corpus, no windows, no joins."""
    r = _raters(spark, sf_dir)
    c = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("ra") * F.col("rb")).cast("bigint").alias("n_both"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("bigint").alias("n_a_only"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("bigint").alias("n_b_only"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).cast("bigint").alias("n_neither"),
    )
    po = (F.col("n_both") + F.col("n_neither")) * 1.0 / F.col("n")
    pe = (
        (F.col("n_both") + F.col("n_a_only")) * (F.col("n_both") + F.col("n_b_only"))
        + (F.col("n_b_only") + F.col("n_neither"))
        * (F.col("n_a_only") + F.col("n_neither"))
    ) * 1.0 / (F.col("n") * F.col("n"))
    return c.select(
        "n",
        "n_both",
        "n_a_only",
        "n_b_only",
        "n_neither",
        F.round(po, 4).alias("po"),
        # guard: trivially-agreeing raters give pe == 1 (ANSI /0)
        F.round((po - pe) / F.when(1 - pe != 0, 1 - pe), 4).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Levene / Brown–Forsythe variance homogeneity


@register(
    "q_levene_test",
    oracle=f"""
        WITH x AS (
            SELECT o_orderpriority AS grp, {_OC} AS cents FROM orders
        ),
        m AS (
            SELECT grp, sum(cents) AS sx, count(*) AS n FROM x GROUP BY grp
        ),
        z AS (
            SELECT x.grp, abs(x.cents - m.sx / (m.n * 1.0)) AS zv
            FROM x JOIN m ON x.grp = m.grp
        ),
        g AS (
            SELECT grp, count(*) AS n, sum(zv) AS sz, sum(zv * zv) AS szz
            FROM z GROUP BY grp
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(n) AS BIGINT) AS nn,
                   sum(sz) AS tsz
            FROM g
        ),
        parts AS (
            SELECT sum(n * (sz / n - tsz / nn) * (sz / n - tsz / nn)) AS numer,
                   sum(szz - sz * sz / n) AS denom
            FROM g CROSS JOIN tot
        )
        SELECT k, nn AS n_total,
               round(((nn - k) * 1.0 / (k - 1)) * numer / denom, 4) AS w_stat
        FROM parts CROSS JOIN tot
    """,
    category="analytics",
)
def q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's test (mean-centered variant) for homogeneity of price
    variance across the five order priorities:
    W = ((N−k)/(k−1)) · Σnᵢ(z̄ᵢ−z̄)² / ΣΣ(zᵢⱼ−z̄ᵢ)² with
    z = |x − x̄ᵢ| — the gatekeeper before pooled-variance tests
    (q_welch_ttest exists precisely because this often rejects).

    Two aggregate passes: group means from exact integer cents
    (broadcast back, 5 rows), then per-group (Σz, Σz², n) — the inner
    sum-of-squares via the closed form Σz² − (Σz)²/n so no third
    pass. Everything after the per-row |x − x̄ᵢ| is combinable."""
    x = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), F.expr(_OC).alias("cents")
    )
    m = x.groupBy("grp").agg(F.sum("cents").alias("sx"), F.count(F.lit(1)).alias("n"))
    z = x.join(F.broadcast(m), "grp").select(
        "grp", F.abs(F.col("cents") - F.col("sx") / (F.col("n") * 1.0)).alias("zv")
    )
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("zv").alias("sz"),
        F.sum(F.col("zv") * F.col("zv")).alias("szz"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("sz").alias("tsz"),
    )
    zi = F.col("sz") / F.col("n")
    zbar = F.col("tsz") / F.col("nn")
    parts = g.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.col("n") * (zi - zbar) * (zi - zbar)).alias("numer"),
        F.sum(F.col("szz") - F.col("sz") * F.col("sz") / F.col("n")).alias("denom"),
    )
    return parts.crossJoin(F.broadcast(tot)).select(
        "k",
        F.col("nn").alias("n_total"),
        F.round(  # ANSI /0 guards: single group / zero within-group spread
            ((F.col("nn") - F.col("k")) * 1.0 / F.when(F.col("k") != 1, F.col("k") - 1))
            * F.col("numer")
            / F.when(F.col("denom") != 0, F.col("denom")),
            4,
        ).alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# Friedman rank test over (month × region) blocks


_REGION_DAILY_REV_SQL = f"""
        SELECT r_name, date_trunc('month', o_orderdate) AS d,
               sum({_OC}) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, date_trunc('month', o_orderdate)
"""


@register(
    "q_friedman_test",
    oracle=f"""
        WITH daily AS ({_REGION_DAILY_REV_SQL}),
        blocks AS (
            SELECT r_name, d, rev
            FROM (
                SELECT r_name, d, rev,
                       count(*) OVER (PARTITION BY d) AS cnt
                FROM daily
            ) WHERE cnt = 5
        ),
        rk AS (
            SELECT r_name, d,
                   rank() OVER (PARTITION BY d ORDER BY rev)
                   + (count(*) OVER (PARTITION BY d, rev) - 1) / 2.0 AS r
            FROM blocks
        ),
        rk2 AS (
            SELECT r_name, r,
                   count(*) OVER () AS nrows,
                   sum(r * r) OVER () AS a
            FROM rk
        ),
        per AS (
            SELECT r_name, sum(r) AS rj,
                   max(nrows) // 5 AS b, max(a) AS a
            FROM rk2 GROUP BY r_name
        ),
        per2 AS (
            SELECT r_name, rj, b, a,
                   sum((rj - b * 3.0) * (rj - b * 3.0)) OVER () AS ssq
            FROM per
        )
        SELECT r_name, CAST(b AS BIGINT) AS b,
               round(rj, 1) AS sum_rank,
               round(rj / b, 4) AS mean_rank,
               round(CASE WHEN a - b * 45.0 > 0
                          THEN 4 * ssq / (a - b * 45.0) ELSE NULL END, 4)
                   AS q_stat
        FROM per2
    """,
    category="analytics",
)
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test with tie correction: within each month
    (block) rank the five regions by revenue (average ranks on ties),
    and test whether any region is systematically hotter —
    Q = (k−1)·Σ(Rⱼ − b(k+1)/2)² / (A − C) with A = ΣΣr², the
    tie-general form (C = bk(k+1)²/4 = 45b, b(k+1)/2 = 3b for k=5).
    The nonparametric two-way sibling of q_anova_f: blocks absorb the
    month-level demand swings a one-way test would count as noise.

    Revenue is exact integer cents (ties are real ranks, not float
    dust); average ranks are exact .5-multiples, so rⱼ, a = Σr², and
    ssq are all exactly representable doubles — no summation-order
    hazard anywhere. Rank/completeness windows partition on the MONTH
    key (unbounded block count over a growing calendar) (≤5 rows each); the two residual global windows run over the
    calendar-bounded month×region grid and the 5-row region aggregate
    (whitelisted). Blocks with missing regions are excluded
    (complete-block design); b = rows/5 exactly because only complete
    blocks survive."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", F.date_trunc("month", F.col("o_orderdate")).alias("d"))
        .agg(F.sum(F.expr(_OC)).alias("rev"))
    )
    blocks = daily.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("d"))
    ).filter(F.col("cnt") == 5)
    r = (
        F.rank().over(Window.partitionBy("d").orderBy("rev"))
        + (F.count(F.lit(1)).over(Window.partitionBy("d", "rev")) - 1) / F.lit(2.0)
    )
    rk = blocks.select("r_name", "d", r.alias("r"))
    wg = Window.partitionBy()  # month×region grid (calendar-bounded, whitelisted)
    rk2 = rk.select(
        "r_name",
        "r",
        F.count(F.lit(1)).over(wg).alias("nrows"),
        F.sum(F.col("r") * F.col("r")).over(wg).alias("a"),
    )
    per = rk2.groupBy("r_name").agg(
        F.sum("r").alias("rj"),
        F.expr("max(nrows) div 5").alias("b"),
        F.max("a").alias("a"),
    )
    w5 = Window.partitionBy()  # 5 region rows (whitelisted)
    dev = F.col("rj") - F.col("b") * F.lit(3.0)
    per2 = per.withColumn("ssq", F.sum(dev * dev).over(w5))
    return per2.select(
        "r_name",
        F.col("b").cast("bigint").alias("b"),
        F.round(F.col("rj"), 1).alias("sum_rank"),
        F.round(F.col("rj") / F.col("b"), 4).alias("mean_rank"),
        F.round(
            F.when(
                F.col("a") - F.col("b") * F.lit(45.0) > 0,
                F.lit(4) * F.col("ssq") / (F.col("a") - F.col("b") * F.lit(45.0)),
            ).otherwise(F.lit(None)),
            4,
        ).alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# Markov entropy rate of event sequences


@register(
    "q_markov_entropy_rate",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM events
        ),
        trans AS (
            SELECT prev, event_type AS cur, count(*) AS n_ij
            FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
        ),
        t2 AS (
            SELECT prev, n_ij,
                   sum(n_ij) OVER (PARTITION BY prev) AS n_i,
                   count(*) OVER (PARTITION BY prev) AS n_dest,
                   sum(n_ij) OVER () AS nn
            FROM trans
        ),
        t3 AS (
            SELECT prev, n_i, n_dest,
                   sum(-(n_ij * 1.0 / n_i) * ln(n_ij * 1.0 / n_i))
                       OVER (PARTITION BY prev) AS h_cond,
                   sum(-(n_ij * 1.0 / nn) * ln(n_ij * 1.0 / n_i))
                       OVER () AS h_rate
            FROM t2
        )
        SELECT prev AS event_type,
               CAST(max(n_i) AS BIGINT) AS n_out,
               CAST(max(n_dest) AS BIGINT) AS n_dest,
               round(max(h_cond), 4) AS h_cond,
               round(max(h_rate), 4) AS h_rate
        FROM t3 GROUP BY prev
    """,
    category="analytics",
)
def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov entropy rate of user event streams:
    empirical transition matrix from per-user consecutive event
    pairs, per-state conditional entropy H(next|state), and the
    chain's entropy rate Σp(i)·H(next|i) — equivalently
    Σᵢⱼ −(nᵢⱼ/N)·ln(nᵢⱼ/nᵢ), the form both engines compute so the
    float summation grid is identical. How predictable the next
    action is given the current one — the information-theoretic
    summary on top of q_event_transitions' raw matrix.

    The lag window partitions on user_id (entity grain); transitions
    collapse to the 5×5 state grid immediately (combinable counts),
    and ALL remaining algebra is window functions over those ≤25
    exact-integer rows — no join/aggregate subtree is re-printed, so
    the static plan is one fact chain plus tiny-grid windows."""
    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev"),
    )
    trans = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("cur"))
        .agg(F.count(F.lit(1)).alias("n_ij"))
    )
    wp = Window.partitionBy("prev")
    wg = Window.partitionBy()  # 25-row transition grid (whitelisted)
    t2 = trans.select(
        "prev",
        "n_ij",
        F.sum("n_ij").over(wp).alias("n_i"),
        F.count(F.lit(1)).over(wp).alias("n_dest"),
        F.sum("n_ij").over(wg).alias("nn"),
    )
    pij = F.col("n_ij") * 1.0 / F.col("n_i")
    t3 = t2.select(
        "prev",
        "n_i",
        "n_dest",
        F.sum(-pij * F.log(pij)).over(wp).alias("h_cond"),
        F.sum(-(F.col("n_ij") * 1.0 / F.col("nn")) * F.log(pij)).over(wg).alias(
            "h_rate"
        ),
    )
    return t3.groupBy(F.col("prev").alias("event_type")).agg(
        F.max("n_i").cast("bigint").alias("n_out"),
        F.max("n_dest").cast("bigint").alias("n_dest"),
        F.round(F.max("h_cond"), 4).alias("h_cond"),
        F.round(F.max("h_rate"), 4).alias("h_rate"),
    )


# ---------------------------------------------------------------------------
# Hoeffding-bound source quality gate


@register(
    "q_hoeffding_gate",
    oracle="""
        WITH s AS (
            SELECT source, least(n_chars, 2000) AS sc FROM documents
        ),
        per AS (
            SELECT source, count(*) AS n, sum(sc) AS ssum FROM s GROUP BY source
        ),
        tot AS (SELECT sum(n) AS ng, sum(ssum) AS sg FROM per)
        SELECT source, CAST(n AS BIGINT) AS n,
               round(ssum / (2000.0 * n), 4) AS mean_score,
               round(sqrt(ln(40.0) / (2 * n)), 4) AS eps,
               CAST(CASE WHEN abs(ssum / (2000.0 * n) - sg / (2000.0 * ng))
                              > sqrt(ln(40.0) / (2 * n))
                    THEN 1 ELSE 0 END AS INT) AS flagged
        FROM per CROSS JOIN tot
    """,
    category="llm-pipeline",
)
def q_hoeffding_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding-bound source drift gate: score each document with a
    bounded [0,1] quality proxy (capped char count / 2000), and flag
    sources whose mean deviates from the corpus mean by more than the
    Hoeffding radius ε = √(ln(2/δ)/(2n)) at δ = 0.05 — a
    distribution-free alternative to z-tests that is valid at ANY
    per-source sample size, which is exactly the regime of long-tail
    source audits.

    The score is an integer (capped chars), so per-source sums are
    exact and mean/ε/flag are one identical float expression from
    exact integers — the flag can never disagree cross-engine. One
    combinable aggregate + a 1-row broadcast; nothing per-row
    survives the first groupBy."""
    s = load_table(spark, sf_dir, "documents").select(
        "source", F.least(F.col("n_chars"), F.lit(2000)).alias("sc")
    )
    per = s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("sc").alias("ssum")
    )
    tot = per.agg(F.sum("n").alias("ng"), F.sum("ssum").alias("sg"))
    mean_i = F.col("ssum") / (F.lit(2000.0) * F.col("n"))
    mu = F.col("sg") / (F.lit(2000.0) * F.col("ng"))
    eps = F.sqrt(F.log(F.lit(40.0)) / (2 * F.col("n")))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n").cast("bigint").alias("n"),
        F.round(mean_i, 4).alias("mean_score"),
        F.round(eps, 4).alias("eps"),
        F.when(F.abs(mean_i - mu) > eps, 1).otherwise(0).cast("int").alias("flagged"),
    )


# ---------------------------------------------------------------------------
# 2×2 odds ratio with Woolf CI


@register(
    "q_odds_ratio",
    oracle="""
        WITH pu AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ck,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS buy
            FROM events GROUP BY user_id
        ),
        cells AS (
            SELECT CAST(sum(ck * buy) AS BIGINT) AS a,
                   CAST(sum(ck * (1 - buy)) AS BIGINT) AS b,
                   CAST(sum((1 - ck) * buy) AS BIGINT) AS c,
                   CAST(sum((1 - ck) * (1 - buy)) AS BIGINT) AS d
            FROM pu
        ),
        adj AS (
            SELECT a, b, c, d,
                   CASE WHEN least(a, b, c, d) = 0 THEN 0.5 ELSE 0.0 END AS h
            FROM cells
        )
        SELECT a, b, c, d,
               round((a + h) * (d + h) / ((b + h) * (c + h)), 4) AS odds_ratio,
               round(exp(ln((a + h) * (d + h) / ((b + h) * (c + h)))
                         - 1.96 * sqrt(1 / (a + h) + 1 / (b + h)
                                       + 1 / (c + h) + 1 / (d + h))), 4)
                   AS ci_lo,
               round(exp(ln((a + h) * (d + h) / ((b + h) * (c + h)))
                         + 1.96 * sqrt(1 / (a + h) + 1 / (b + h)
                                       + 1 / (c + h) + 1 / (d + h))), 4)
                   AS ci_hi
        FROM adj
    """,
    category="analytics",
)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase odds ratio with the Woolf log-normal CI:
    OR = ad/bc over the per-user 2×2 (ever-clicked × ever-purchased),
    CI = exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)), with the
    Haldane–Anscombe +0.5 correction applied exactly when a zero cell
    exists. The effect-size complement to q_chisq_independence's
    p-value — what an experimentation readout actually reports.

    Per-user flags are a combinable max-aggregate; the 2×2 is one
    more aggregate; all cells integers, CI one identical float
    expression. The correction is a deterministic CASE on the min
    cell, so both engines pick the same branch."""
    pu = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("ck"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("buy"),
        )
    )
    cells = pu.agg(
        F.sum(F.col("ck") * F.col("buy")).cast("bigint").alias("a"),
        F.sum(F.col("ck") * (1 - F.col("buy"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("ck")) * F.col("buy")).cast("bigint").alias("c"),
        F.sum((1 - F.col("ck")) * (1 - F.col("buy"))).cast("bigint").alias("d"),
    )
    adj = cells.withColumn(
        "h",
        F.when(F.least("a", "b", "c", "d") == 0, F.lit(0.5)).otherwise(F.lit(0.0)),
    )
    a, b, c, d, h = (F.col(x) for x in "abcdh")
    orr = (a + h) * (d + h) / ((b + h) * (c + h))
    se = F.sqrt(1 / (a + h) + 1 / (b + h) + 1 / (c + h) + 1 / (d + h))
    return adj.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orr, 4).alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - 1.96 * se), 4).alias("ci_lo"),
        F.round(F.exp(F.log(orr) + 1.96 * se), 4).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# McNemar paired test


@register(
    "q_mcnemar_test",
    oracle=f"""
        WITH r AS (
            SELECT {_RATER_A_SQL} AS ra, {_RATER_B_SQL} AS rb FROM documents
        ),
        c AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(ra * (1 - rb)) AS BIGINT) AS b_discord,
                   CAST(sum((1 - ra) * rb) AS BIGINT) AS c_discord
            FROM r
        )
        SELECT n, b_discord, c_discord,
               round(CASE WHEN b_discord + c_discord > 0
                     THEN (abs(b_discord - c_discord) - 1)
                          * (abs(b_discord - c_discord) - 1) * 1.0
                          / (b_discord + c_discord)
                     ELSE NULL END, 4) AS chi2_mcnemar
        FROM c
    """,
    category="llm-pipeline",
)
def q_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on the same paired raters as q_cohens_kappa:
    does the length gate systematically pass documents the word gate
    fails (or vice versa)? Only the DISCORDANT cells matter —
    χ² = (|b−c|−1)²/(b+c) with continuity correction — which is why
    it's the right test for comparing two classifiers on the same
    examples where accuracy deltas mislead (kappa answers "do they
    agree", McNemar answers "who is stricter").

    One combinable aggregate; integer cells; a single identical
    float expression for the statistic."""
    r = _raters(spark, sf_dir)
    c = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("bigint").alias("b_discord"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("bigint").alias("c_discord"),
    )
    b, cc = F.col("b_discord"), F.col("c_discord")
    stat = (F.abs(b - cc) - 1) * (F.abs(b - cc) - 1) * F.lit(1.0) / (b + cc)
    return c.select(
        "n",
        "b_discord",
        "c_discord",
        F.round(F.when(b + cc > 0, stat).otherwise(F.lit(None)), 4).alias(
            "chi2_mcnemar"
        ),
    )


# ---------------------------------------------------------------------------
# standardized mean difference (covariate balance)


@register(
    "q_smd_balance",
    oracle=f"""
        WITH armed AS (
            SELECT c_nationkey AS nk, {_AC} AS cents,
                   CAST(((CAST(c_custkey AS HUGEINT) * {KNUTH})
                         % 4294967296) // 2147483648 AS INT) AS arm
            FROM customer
        ),
        per AS (
            SELECT nk,
                   sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
                   sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
                   sum(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS s0,
                   sum(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS s1,
                   sum(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END) AS ss0,
                   sum(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END) AS ss1
            FROM armed GROUP BY nk
            HAVING sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 1
               AND sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 1
        )
        SELECT n_name, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
               round((s1 / (n1 * 1.0) - s0 / (n0 * 1.0)) / 100.0
                     / sqrt(((ss0 - s0 * 1.0 * s0 / n0) / (n0 - 1)
                             + (ss1 - s1 * 1.0 * s1 / n1) / (n1 - 1))
                            / 2 / 10000.0), 4) AS smd,
               CAST(CASE WHEN abs((s1 / (n1 * 1.0) - s0 / (n0 * 1.0)) / 100.0
                     / sqrt(((ss0 - s0 * 1.0 * s0 / n0) / (n0 - 1)
                             + (ss1 - s1 * 1.0 * s1 / n1) / (n1 - 1))
                            / 2 / 10000.0)) > 0.1
                    THEN 1 ELSE 0 END AS INT) AS imbalanced
        FROM per JOIN nation ON nk = n_nationkey
    """,
    category="analytics",
)
def q_smd_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-balance audit for a deterministic 50/50 experiment
    split: assign customers to arms by the engine-portable Knuth
    multiplicative hash of their key, then per nation compute the
    standardized mean difference of account balance
    SMD = (m₁−m₀)/√((v₀+v₁)/2) and flag |SMD| > 0.1 — the
    pre-experiment sanity check that randomization didn't skew a
    covariate inside any segment.

    The arm is recomputable from the key alone on any engine (no
    RNG); sums/sums-of-squares are exact integer cents so mean,
    pooled SD, SMD and the flag are one identical float expression.
    One combinable aggregate + a broadcast dim join — no shuffle
    beyond the nation rollup."""
    armed = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.expr(_AC).alias("cents"),
        knuth_top_bit("c_custkey").cast("int").alias("arm"),
    )
    per = armed.groupBy("nk").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("cents")).otherwise(0)).alias("s0"),
        F.sum(F.when(F.col("arm") == 1, F.col("cents")).otherwise(0)).alias("s1"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("cents") * F.col("cents")).otherwise(0)
        ).alias("ss0"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("cents") * F.col("cents")).otherwise(0)
        ).alias("ss1"),
    ).filter((F.col("n0") > 1) & (F.col("n1") > 1))
    mean_diff = (
        F.col("s1") / (F.col("n1") * 1.0) - F.col("s0") / (F.col("n0") * 1.0)
    ) / F.lit(100.0)
    pooled_sd = F.sqrt(
        (
            (F.col("ss0") - F.col("s0") * 1.0 * F.col("s0") / F.col("n0"))
            / (F.col("n0") - 1)
            + (F.col("ss1") - F.col("s1") * 1.0 * F.col("s1") / F.col("n1"))
            / (F.col("n1") - 1)
        )
        / 2
        / F.lit(10000.0)
    )
    smd = mean_diff / pooled_sd
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return per.join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey")).select(
        "n_name",
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(smd, 4).alias("smd"),
        F.when(F.abs(smd) > 0.1, 1).otherwise(0).cast("int").alias("imbalanced"),
    )


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indices


_LI_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_LI_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"


@register(
    "q_price_index",
    oracle=f"""
        WITH py AS (
            SELECT l_partkey AS pk, year(l_shipdate) AS y,
                   sum({_LI_QTY}) AS q, sum({_LI_CENTS}) AS cents
            FROM lineitem
            WHERE year(l_shipdate) IN (1995, 1996)
            GROUP BY l_partkey, year(l_shipdate)
        ),
        pboth AS (
            SELECT a.pk,
                   a.cents * 1.0 / a.q AS p0, a.q AS q0,
                   b.cents * 1.0 / b.q AS p1, b.q AS q1
            FROM py a JOIN py b ON a.pk = b.pk AND a.y = 1995 AND b.y = 1996
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n_parts,
                   sum(p1 * q0) AS l_num, sum(p0 * q0) AS l_den,
                   sum(p1 * q1) AS p_num, sum(p0 * q1) AS p_den
            FROM pboth
        )
        SELECT n_parts,
               round(l_num / l_den, 4) AS laspeyres,
               round(p_num / p_den, 4) AS paasche,
               round(sqrt((l_num / l_den) * (p_num / p_den)), 4) AS fisher
        FROM s
    """,
    category="analytics",
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic price indices between 1995 (base) and 1996 over parts
    shipped in BOTH years: Laspeyres Σp₁q₀/Σp₀q₀ (base-weighted),
    Paasche Σp₁q₁/Σp₀q₁ (current-weighted), and their geometric mean
    Fisher ideal index. Unit prices are per-part-year
    Σcents/Σqty — the aggregation-then-ratio form that is robust to
    line-item size mix within a part.

    Quantities and cents are exact integers; unit prices are single
    float divisions of exact sums; the index numerators/denominators
    sum those identically on both engines. Shape: one combinable
    (part × year) aggregate, a self-equi-join on partkey at part
    grain (already reduced ~1000× from line grain), one final 1-row
    aggregate."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("y", F.year("l_shipdate"))
        .filter(F.col("y").isin(1995, 1996))
        .groupBy(F.col("l_partkey").alias("pk"), "y")
        .agg(F.sum(F.expr(_LI_QTY)).alias("q"), F.sum(F.expr(_LI_CENTS)).alias("cents"))
    )
    a = li.filter(F.col("y") == 1995).select(
        "pk",
        (F.col("cents") * 1.0 / F.col("q")).alias("p0"),
        F.col("q").alias("q0"),
    )
    b = li.filter(F.col("y") == 1996).select(
        F.col("pk").alias("pk_b"),
        (F.col("cents") * 1.0 / F.col("q")).alias("p1"),
        F.col("q").alias("q1"),
    )
    both = a.join(b, F.col("pk") == F.col("pk_b"))
    s = both.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.col("p1") * F.col("q0")).alias("l_num"),
        F.sum(F.col("p0") * F.col("q0")).alias("l_den"),
        F.sum(F.col("p1") * F.col("q1")).alias("p_num"),
        F.sum(F.col("p0") * F.col("q1")).alias("p_den"),
    )
    lasp = F.col("l_num") / F.col("l_den")
    paas = F.col("p_num") / F.col("p_den")
    return s.select(
        "n_parts",
        F.round(lasp, 4).alias("laspeyres"),
        F.round(paas, 4).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 4).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust slope


@register(
    "q_theil_sen",
    oracle=f"""
        WITH cx AS (
            SELECT c_nationkey AS nk, sum({_AC}) AS sx, count(*) AS n
            FROM customer GROUP BY c_nationkey
        ),
        cy AS (
            SELECT c_nationkey AS nk, sum({_OC}) AS sy, count(*) AS m
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey
        ),
        pts AS (
            SELECT cx.nk, sx / (100.0 * n) AS x, sy / (100.0 * m) AS y
            FROM cx JOIN cy ON cx.nk = cy.nk
        ),
        pairs AS (
            SELECT (b.y - a.y) / (b.x - a.x) AS slope, a.nk AS i, b.nk AS j
            FROM pts a JOIN pts b ON a.nk < b.nk AND a.x <> b.x
        ),
        rk AS (
            SELECT slope,
                   row_number() OVER (ORDER BY slope, i, j) AS rn,
                   count(*) OVER () AS np
            FROM pairs
        ),
        med AS (
            SELECT avg(slope) AS ts_slope, max(np) AS np
            FROM rk WHERE rn IN ((np + 1) // 2, (np + 2) // 2)
        ),
        ols AS (
            SELECT regr_slope(y, x) AS ols_slope, count(*) AS n_points FROM pts
        )
        SELECT CAST(n_points AS BIGINT) AS n_points,
               CAST(np AS BIGINT) AS n_pairs,
               round(ts_slope, 4) AS ts_slope,
               round(ols_slope, 4) AS ols_slope
        FROM med CROSS JOIN ols
    """,
    category="analytics",
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator — the median of all pairwise slopes —
    for mean order value vs mean account balance across the 25
    nation-level points, next to the OLS slope it robustifies
    (breakdown point 29% vs OLS's single-outlier collapse). The
    standard robust trend line for noisy per-segment metrics.

    All-pairs is the textbook trap; here it is SAFE BY CONSTRUCTION:
    pairs form over the 25-row NATION aggregate (≤300 pairs,
    broadcast self-join), never over fact rows — the bounded-frame
    median window is whitelisted with that grain. Coordinates are
    single float divisions of exact integer sums, so pair slopes and
    the median row selection agree bit-for-bit cross-engine."""
    cx = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.sum(F.expr(_AC)).alias("sx"), F.count(F.lit(1)).alias("n"))
    )
    cy = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.sum(F.expr(_OC)).alias("sy"), F.count(F.lit(1)).alias("m"))
    )
    pts = cx.join(cy, "nk").select(
        "nk",
        (F.col("sx") / (F.lit(100.0) * F.col("n"))).alias("x"),
        (F.col("sy") / (F.lit(100.0) * F.col("m"))).alias("y"),
    )
    a = pts.select(F.col("nk").alias("i"), F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = pts.select(F.col("nk").alias("j"), F.col("x").alias("xj"), F.col("y").alias("yj"))
    pairs = a.join(
        F.broadcast(b), (F.col("i") < F.col("j")) & (F.col("xi") != F.col("xj"))
    ).select(((F.col("yj") - F.col("yi")) / (F.col("xj") - F.col("xi"))).alias("slope"), "i", "j")
    w = Window.orderBy("slope", "i", "j")
    rk = pairs.withColumn("rn", F.row_number().over(w)).withColumn(
        "np", F.count(F.lit(1)).over(Window.partitionBy())
    )
    med = rk.filter(
        (F.col("rn") == F.expr("(np + 1) div 2"))
        | (F.col("rn") == F.expr("(np + 2) div 2"))
    ).agg(F.avg("slope").alias("ts_slope"), F.max("np").alias("np"))
    ols = pts.agg(
        F.expr("regr_slope(y, x)").alias("ols_slope"), F.count(F.lit(1)).alias("n_points")
    )
    return med.crossJoin(F.broadcast(ols)).select(
        F.col("n_points").cast("bigint").alias("n_points"),
        F.col("np").cast("bigint").alias("n_pairs"),
        F.round(F.col("ts_slope"), 4).alias("ts_slope"),
        F.round(F.col("ols_slope"), 4).alias("ols_slope"),
    )
