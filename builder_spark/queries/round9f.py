"""Round-9 surface growth, batch 7: k-rater agreement (Cochran's Q),
1-D optimal transport (exact Wasserstein-1 between two price
distributions via a telescoped CDF integral), corpus comparison
("Fightin' Words" log-odds with a Dirichlet prior), per-group z-score
normalization audit, Freedman–Diaconis histogram, the word2vec
¾-power negative-sampling table, closed-form A/B power analysis,
trigram-support corpus redundancy (a self-BLEU proxy), sample-ratio-
mismatch detection for hash-based splits, and the participation-ratio
effective rank of the embedding space.

Design rules (unchanged from batches 1–6):
- integer-exact cores (counts, cents, quantized weights); floats only
  through one identical expression tree on both engines, then
  ``round(·, 4)``;
- value-grain collapse before any ordered pass; global cumulative
  structure rides ``stitched_running`` (never a single-partition
  window over fact grain); pairwise/bounded constructions only over
  constant-bounded aggregates, each whitelisted with its grain;
- only fixed-width keys shuffle in the text queries (md5 of the gram,
  never the gram stream twice); dimension joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.functions.hashing import KNUTH, knuth_bucket, knuth_top_bit
from builder_spark.operators.partitioning import stitched_running
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"

#: three deterministic binary document gates (the kappa/McNemar pair
#: plus a digit-presence gate) — integer-exact and engine-identical
_GATE_A_SQL = "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END"
_GATE_B_SQL = (
    "CASE WHEN length(text) - length(replace(text, ' ', '')) >= 49 "
    "THEN 1 ELSE 0 END"
)
_GATE_C_SQL_DUCK = "CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END"
_GATE_C_SQL_SPARK = "CASE WHEN text RLIKE '[0-9]' THEN 1 ELSE 0 END"


# ---------------------------------------------------------------------------
# Cochran's Q — k-rater extension of McNemar


@register(
    "q_cochran_q",
    oracle=f"""
        WITH g AS (
            SELECT {_GATE_A_SQL} AS ga, {_GATE_B_SQL} AS gb,
                   {_GATE_C_SQL_DUCK} AS gc
            FROM documents
        ),
        c AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(ga) AS BIGINT) AS g_a,
                   CAST(sum(gb) AS BIGINT) AS g_b,
                   CAST(sum(gc) AS BIGINT) AS g_c,
                   CAST(sum(ga + gb + gc) AS BIGINT) AS sl,
                   CAST(sum((ga + gb + gc) * (ga + gb + gc)) AS BIGINT) AS sll
            FROM g
        )
        SELECT n, g_a, g_b, g_c,
               round(CASE WHEN 3 * sl - sll > 0
                     THEN 2.0 * (3 * (g_a * g_a + g_b * g_b + g_c * g_c)
                                 - sl * sl) / (3 * sl - sll)
                     ELSE NULL END, 4) AS q_cochran
        FROM c
    """,
    category="llm-pipeline",
)
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q — do three binary document gates (char-length,
    word-count, digit-presence) pass the same share of documents?
    Q = (k−1)·(k·ΣGⱼ² − (ΣGⱼ)²) / (k·ΣLᵢ − ΣLᵢ²) with Gⱼ the
    per-gate totals and Lᵢ the per-document row sums — the k-rater
    generalization of q_mcnemar_test (k=2 reduces to it exactly).
    The test a labeling pipeline runs before treating k cheap gates
    as interchangeable.

    All three gates are integer predicates, so Gⱼ, ΣLᵢ and ΣLᵢ² are
    exact in ONE combinable aggregate pass (Lᵢ is a per-row integer
    expression, not a second scan) and Q is a single identical float
    expression."""
    d = load_table(spark, sf_dir, "documents")
    g = d.select(
        F.expr(_GATE_A_SQL).alias("ga"),
        F.expr(_GATE_B_SQL).alias("gb"),
        F.expr(_GATE_C_SQL_SPARK).alias("gc"),
    )
    li = F.col("ga") + F.col("gb") + F.col("gc")
    c = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ga").cast("bigint").alias("g_a"),
        F.sum("gb").cast("bigint").alias("g_b"),
        F.sum("gc").cast("bigint").alias("g_c"),
        F.sum(li).cast("bigint").alias("sl"),
        F.sum(li * li).cast("bigint").alias("sll"),
    )
    ga, gb, gc, sl, sll = (F.col(x) for x in ("g_a", "g_b", "g_c", "sl", "sll"))
    q = 2.0 * (3 * (ga * ga + gb * gb + gc * gc) - sl * sl) / (3 * sl - sll)
    return c.select(
        "n",
        "g_a",
        "g_b",
        "g_c",
        F.round(F.when(3 * sl - sll > 0, q).otherwise(F.lit(None)), 4).alias(
            "q_cochran"
        ),
    )


# ---------------------------------------------------------------------------
# exact 1-D Wasserstein (earth mover's) distance


@register(
    "q_wasserstein_1d",
    oracle=f"""
        WITH s AS (
            SELECT {_OC} AS cents,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ia
            FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        v AS (
            SELECT cents, CAST(sum(ia) AS BIGINT) AS a,
                   CAST(count(*) - sum(ia) AS BIGINT) AS b
            FROM s GROUP BY cents
        ),
        r AS (
            SELECT cents, a, b,
                   sum(a) OVER (ORDER BY cents
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS ca,
                   sum(b) OVER (ORDER BY cents
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cb
            FROM v
        ),
        tot AS (
            SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
            FROM v
        ),
        terms AS (
            SELECT sum(cents * (
                       abs((ca - a) * 1.0 / na - (cb - b) * 1.0 / nb)
                       - abs(ca * 1.0 / na - cb * 1.0 / nb))) AS emd_cents
            FROM r CROSS JOIN tot
        )
        SELECT na, nb,
               round(emd_cents / 100.0, 4) AS emd_dollars
        FROM terms CROSS JOIN tot
    """,
    category="analytics",
)
def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover's) distance between the
    URGENT and LOW order-price distributions: W₁ = ∫|F_A − F_B| dx —
    the average dollars each urgent order's price must "move" to look
    like a low-priority order. The transport-metric complement to
    q_ks_test's sup-norm: KS sees the worst gap, W₁ integrates all of
    them.

    The scale trick: the CDF-gap integral Σᵢ Tᵢ·(vᵢ₊₁−vᵢ) telescopes
    to Σⱼ vⱼ·(Tⱼ₋₁ − Tⱼ), and Tⱼ₋₁ = |(cumA−a)/nA − (cumB−b)/nB| is
    computable FROM ROW j ALONE — so no lead/lag window over the
    value grain is ever needed. Prices collapse to value grain first
    (exact integer cents, combinable), one stitched running pass
    carries both cumulative counts, and the integral is a single
    combinable aggregate. CDF ratios are float divisions of exact
    integers; final round(·,4) after the one division by 100."""
    s = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.expr(_OC).alias("cents"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("ia"),
        )
    )
    v = s.groupBy("cents").agg(
        F.sum("ia").cast("bigint").alias("a"),
        (F.count(F.lit(1)) - F.sum("ia")).cast("bigint").alias("b"),
    )
    r = stitched_running(v, ["cents"], running={"ca": "a", "cb": "b"})
    tot = v.agg(
        F.sum("a").cast("bigint").alias("na"), F.sum("b").cast("bigint").alias("nb")
    )
    na, nb = F.col("na"), F.col("nb")
    t_prev = F.abs(
        (F.col("ca") - F.col("a")) * 1.0 / na - (F.col("cb") - F.col("b")) * 1.0 / nb
    )
    t_cur = F.abs(F.col("ca") * 1.0 / na - F.col("cb") * 1.0 / nb)
    terms = r.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.col("cents") * (t_prev - t_cur)).alias("emd_cents")
    )
    return terms.crossJoin(F.broadcast(tot)).select(
        "na",
        "nb",
        F.round(F.col("emd_cents") / F.lit(100.0), 4).alias("emd_dollars"),
    )


# ---------------------------------------------------------------------------
# "Fightin' Words" — log-odds with informative Dirichlet prior


_LOM_K1, _LOM_K2 = "src0", "src1"
_LOM_PRIOR = 500.0  # total pseudo-count budget spread by corpus shares


@register(
    "q_log_odds_monroe",
    oracle=f"""
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS term
            FROM documents WHERE source IN ('{_LOM_K1}', '{_LOM_K2}')
        ),
        bg AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ),
        prior AS (
            SELECT term, CAST(count(*) AS BIGINT) AS pc FROM bg GROUP BY term
        ),
        ptot AS (SELECT CAST(sum(pc) AS BIGINT) AS p0 FROM prior),
        cnt AS (
            SELECT term,
                   CAST(sum(CASE WHEN source = '{_LOM_K1}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS y1,
                   CAST(sum(CASE WHEN source = '{_LOM_K2}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS y2
            FROM tok GROUP BY term
        ),
        ntot AS (
            SELECT CAST(sum(y1) AS BIGINT) AS n1, CAST(sum(y2) AS BIGINT) AS n2
            FROM cnt
        ),
        z AS (
            SELECT term, y1, y2,
                   (ln((y1 + {_LOM_PRIOR} * pc / p0)
                       / (n1 + {_LOM_PRIOR} - y1 - {_LOM_PRIOR} * pc / p0))
                    - ln((y2 + {_LOM_PRIOR} * pc / p0)
                         / (n2 + {_LOM_PRIOR} - y2 - {_LOM_PRIOR} * pc / p0)))
                   / sqrt(1.0 / (y1 + {_LOM_PRIOR} * pc / p0)
                          + 1.0 / (y2 + {_LOM_PRIOR} * pc / p0)) AS zeta
            FROM cnt JOIN prior USING (term) CROSS JOIN ntot CROSS JOIN ptot
        )
        SELECT term, y1, y2, round(zeta, 4) AS zeta
        FROM z
        ORDER BY abs(round(zeta, 4)) DESC, term ASC
        LIMIT 10
    """,
    category="llm-text",
)
def q_log_odds_monroe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe–Colaresi–Quinn "Fightin' Words": the 10 most
    discriminative tokens between two sources by z-scored log-odds
    with an informative Dirichlet prior drawn from the WHOLE corpus —
    δ_w = ln-odds₁(w) − ln-odds₂(w) with α_w ∝ corpus frequency,
    z = δ/√(1/(y₁+α) + 1/(y₂+α)). The standard corpus-comparison
    statistic (raw log-odds overweights rare words; the prior shrinks
    them) — what a data-mixture audit reports when two crawls drift.

    Token streams collapse to vocab grain immediately (combinable
    counts); the prior joins on the term equi-key (vocab-grain, never
    corpus-grain); totals are 1-row broadcasts; the top-10 is a
    TakeOrdered over |z| AFTER round(·,4) with a term tie-break so
    cross-engine float dust cannot reorder the board."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.filter(F.col("source").isin(_LOM_K1, _LOM_K2)).select(
        "source", F.explode(F.split("text", " ")).alias("term")
    )
    prior = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pc"))
    )
    cnt = tok.groupBy("term").agg(
        F.sum(F.when(F.col("source") == _LOM_K1, 1).otherwise(0))
        .cast("bigint")
        .alias("y1"),
        F.sum(F.when(F.col("source") == _LOM_K2, 1).otherwise(0))
        .cast("bigint")
        .alias("y2"),
    )
    ntot = cnt.agg(
        F.sum("y1").cast("bigint").alias("n1"), F.sum("y2").cast("bigint").alias("n2")
    )
    ptot = prior.agg(F.sum("pc").cast("bigint").alias("p0"))
    j = (
        cnt.join(prior, "term")
        .crossJoin(F.broadcast(ntot))
        .crossJoin(F.broadcast(ptot))
    )
    alpha = F.lit(_LOM_PRIOR) * F.col("pc") / F.col("p0")
    delta = F.log(
        (F.col("y1") + alpha) / (F.col("n1") + F.lit(_LOM_PRIOR) - F.col("y1") - alpha)
    ) - F.log(
        (F.col("y2") + alpha) / (F.col("n2") + F.lit(_LOM_PRIOR) - F.col("y2") - alpha)
    )
    zeta = delta / F.sqrt(1.0 / (F.col("y1") + alpha) + 1.0 / (F.col("y2") + alpha))
    z = j.select("term", "y1", "y2", F.round(zeta, 4).alias("zeta"))
    return z.orderBy(F.abs(F.col("zeta")).desc(), F.col("term").asc()).limit(10)


# ---------------------------------------------------------------------------
# per-group z-score normalization audit


@register(
    "q_zscore_normalize",
    oracle="""
        WITH m AS (
            SELECT source, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS s,
                   CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
            FROM documents GROUP BY source
        ),
        z AS (
            SELECT d.source,
                   (d.n_chars - m.s * 1.0 / m.n)
                   / sqrt((m.ss - m.s * 1.0 * m.s / m.n) / (m.n - 1)) AS zv
            FROM documents d JOIN m ON d.source = m.source
            WHERE m.n > 1 AND m.ss * m.n > m.s * m.s
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               round(avg(zv), 4) + 0.0 AS z_mean,
               round(max(abs(zv)), 4) AS max_abs_z,
               CAST(sum(CASE WHEN abs(zv) > 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers
        FROM z GROUP BY source
    """,
    category="llm-pipeline",
)
def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source z-score normalization of document lengths with the
    audit a feature pipeline actually ships: per-source mean of z
    (must be ~0 — the identity that catches a broken join), the max
    |z|, and the |z|>3 outlier count. Standardization is THE
    pre-embedding numeric transform; the audit row is how you verify
    it ran per-group and not globally.

    Two passes like q_levene_test: per-source (n, Σx, Σx²) from exact
    integers (5-row broadcast back), then per-row z and one combinable
    audit aggregate. Degenerate sources (n≤1 or zero variance) are
    excluded by an integer predicate (ss·n > s², exact), so both
    engines drop identical rows."""
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    m = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("ss"),
    )
    sd = F.sqrt(
        (F.col("ss") - F.col("s") * 1.0 * F.col("s") / F.col("n")) / (F.col("n") - 1)
    )
    z = (
        d.join(F.broadcast(m), "source")
        .filter((F.col("n") > 1) & (F.col("ss") * F.col("n") > F.col("s") * F.col("s")))
        .select(
            "source",
            ((F.col("n_chars") - F.col("s") * 1.0 / F.col("n")) / sd).alias("zv"),
        )
    )
    return z.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("zv"), 4).alias("z_mean"),
        F.round(F.max(F.abs(F.col("zv"))), 4).alias("max_abs_z"),
        F.sum(F.when(F.abs(F.col("zv")) > 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# Freedman–Diaconis histogram


@register(
    "q_fd_histogram",
    oracle=f"""
        WITH x AS (SELECT {_OC} AS cents FROM orders),
        q AS (
            SELECT quantile_cont(cents, 0.25) AS q1,
                   quantile_cont(cents, 0.75) AS q3,
                   min(cents) AS lo, count(*) AS n
            FROM x
        ),
        w AS (
            SELECT lo, greatest(floor(2.0 * (q3 - q1) / pow(n, 1.0 / 3)), 1)
                       AS width
            FROM q
        )
        SELECT CAST(floor((cents - lo) / width) AS BIGINT) AS bin,
               round((lo + floor((cents - lo) / width) * width) / 100.0, 2)
                   AS bin_lo_dollars,
               CAST(count(*) AS BIGINT) AS n
        FROM x CROSS JOIN w
        GROUP BY 1, 2
    """,
    category="analytics",
)
def q_fd_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freedman–Diaconis histogram of order totals: bin width
    h = 2·IQR/n^⅓ — the robust rule that adapts bin count to both
    spread and sample size (Sturges under-bins heavy tails; fixed
    widths don't survive a 100× scale-up, FD does by construction).
    The better default for q_hist_equiwidth's fixed bin count.

    Quartiles come from the stitched rank selection
    (operators/quantiles.py — never a buffering percentile over fact
    grain); the width is floored to integer cents (exact on both
    engines) and ≥1; binning is integer arithmetic against a 1-row
    broadcast; the histogram is one combinable aggregate whose bin
    count is data-bounded by range/width."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    x = load_table(spark, sf_dir, "orders").select(F.expr(_OC).alias("cents"))
    q = quantile_cont_stitched(x, "cents", {"q1": 0.25, "q3": 0.75}).drop("n")
    stats = x.agg(F.min("cents").alias("lo"), F.count(F.lit(1)).alias("n"))
    w = (
        q.crossJoin(F.broadcast(stats))
        .select(
            "lo",
            F.greatest(
                F.floor(
                    2.0 * (F.col("q3") - F.col("q1")) / F.pow(F.col("n"), 1.0 / 3)
                ),
                F.lit(1).cast("bigint"),
            ).alias("width"),
        )
    )
    binned = x.crossJoin(F.broadcast(w)).select(
        F.floor((F.col("cents") - F.col("lo")) / F.col("width"))
        .cast("bigint")
        .alias("bin"),
        F.round(
            (
                F.col("lo")
                + F.floor((F.col("cents") - F.col("lo")) / F.col("width"))
                * F.col("width")
            )
            / 100.0,
            2,
        ).alias("bin_lo_dollars"),
    )
    return binned.groupBy("bin", "bin_lo_dollars").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


# ---------------------------------------------------------------------------
# word2vec 3/4-power negative-sampling table


_NEG_V = 40  # table size (top-V tokens by frequency)


@register(
    "q_negative_sampling_table",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ),
        cnt AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY term
        ),
        top AS (
            SELECT term, c,
                   CAST(floor(pow(c, 0.75) * 1000) AS BIGINT) AS w
            FROM cnt
            ORDER BY c DESC, term ASC
            LIMIT {_NEG_V}
        ),
        cum AS (
            SELECT term, c, w,
                   sum(w) OVER (ORDER BY c DESC, term ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cw,
                   sum(w) OVER () AS tw
            FROM top
        )
        SELECT term, c,
               round(w * 1.0 / tw, 4) AS prob,
               round((cw - w) * 1.0 / tw, 4) AS cum_lo,
               round(cw * 1.0 / tw, 4) AS cum_hi
        FROM cum
    """,
    category="llm-pipeline",
)
def q_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word2vec negative-sampling table: unigram counts raised to
    the 3/4 power (the Mikolov smoothing that up-weights the tail),
    normalized, with each token's half-open cumulative range
    [cum_lo, cum_hi) — the lookup structure a skip-gram trainer
    samples negatives from by inverse-CDF on a uniform draw.

    The token stream collapses to vocab grain once; the table is a
    top-V TakeOrdered (constant-bounded — V rows, whitelisted); the
    3/4-power weights are QUANTIZED to integer milli-units
    (floor(c^0.75·1000)) so the cumulative sums are exact integers and
    the ranges are identical float divisions of exact ints — the
    sampling table can never disagree cross-engine."""
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    top = (
        cnt.orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(_NEG_V)
        .withColumn(
            "w", F.floor(F.pow(F.col("c"), 0.75) * 1000).cast("bigint")
        )
    )
    wcum = Window.orderBy(F.col("c").desc(), F.col("term").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wg = Window.partitionBy()  # V-row sampling table (whitelisted)
    cum = top.select(
        "term",
        "c",
        "w",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wg).alias("tw"),
    )
    return cum.select(
        "term",
        "c",
        F.round(F.col("w") * 1.0 / F.col("tw"), 4).alias("prob"),
        F.round((F.col("cw") - F.col("w")) * 1.0 / F.col("tw"), 4).alias("cum_lo"),
        F.round(F.col("cw") * 1.0 / F.col("tw"), 4).alias("cum_hi"),
    )


# ---------------------------------------------------------------------------
# closed-form A/B power analysis


@register(
    "q_power_analysis",
    oracle=f"""
        WITH m AS (
            -- ss: exact (HUGEINT) sum, ONE deterministic cast to double
            -- — Σcents² tops 7e19 at sf0.1, past int64 AND past double's
            -- 2^53 exact range (a double SUM would diverge by order)
            SELECT o_orderpriority AS grp, count(*) AS n,
                   CAST(sum({_OC}) AS BIGINT) AS s,
                   CAST(sum({_OC} * {_OC}) AS DOUBLE) AS ss
            FROM orders GROUP BY o_orderpriority
        )
        SELECT grp, CAST(n AS BIGINT) AS n_obs,
               round(s / (100.0 * n), 2) AS mean_dollars,
               CAST(ceil(2 * 7.848886 * ((ss - s * 1.0 * s / n) / (n - 1))
                         / (0.02 * s / (n * 1.0) * 0.02 * s / (n * 1.0)))
                    AS BIGINT) AS n_required,
               CAST(CASE WHEN n / 2.0 >= 2 * 7.848886
                              * ((ss - s * 1.0 * s / n) / (n - 1))
                              / (0.02 * s / (n * 1.0) * 0.02 * s / (n * 1.0))
                    THEN 1 ELSE 0 END AS INT) AS feasible
        FROM m
    """,
    category="analytics",
)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form A/B sample-size requirement per order priority:
    n/arm = 2·(z_{{α/2}}+z_β)²·σ²/δ² for a 2% lift of the mean at
    α=0.05, power 80% — (1.959964+0.841621)² = 7.848886. The
    pre-experiment feasibility readout: can this segment's volume
    detect a 2% effect at all? Pairs with q_welch_ttest (the test you
    run after) and q_smd_balance (the balance check).

    One combinable aggregate: n, Σcents exact int64; Σcents² summed
    EXACTLY in wide decimal/HUGEINT (it tops 7e19 at sf0.1 — past both
    int64 and double's 2^53 exact range) then cast once to double, the
    same deterministic rounding on both engines; variance by the closed
    form; n_required one identical float expression ceil'd on both
    engines; the feasible flag compares the UN-rounded requirement so
    it cannot flip at the rounding edge."""
    m = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderpriority").alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr(_OC)).cast("bigint").alias("s"),
        # exact decimal(38,0) sum, ONE deterministic cast to double —
        # Σcents² tops 7e19 at sf0.1 (> int64, > double's 2^53 exactness)
        F.sum(F.expr(f"CAST({_OC} AS DECIMAL(19,0)) * {_OC}"))
        .cast("double")
        .alias("ss"),
    )
    # ANSI /0 guards: a single-order group (n == 1) or zero mean (delta == 0)
    var = (F.col("ss") - F.col("s") * 1.0 * F.col("s") / F.col("n")) / F.when(
        F.col("n") != 1, F.col("n") - 1
    )
    delta = 0.02 * F.col("s") / (F.col("n") * 1.0)
    req = 2 * F.lit(7.848886) * var / F.when(delta * delta != 0, delta * delta)
    return m.select(
        "grp",
        F.col("n").cast("bigint").alias("n_obs"),
        F.round(F.col("s") / (100.0 * F.col("n")), 2).alias("mean_dollars"),
        F.ceil(req).cast("bigint").alias("n_required"),
        F.when(F.col("n") / 2.0 >= req, 1).otherwise(0).cast("int").alias("feasible"),
    )


# ---------------------------------------------------------------------------
# trigram support (self-BLEU proxy)


_TRIGRAM_DUCK = """list_distinct(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2]))"""


@register(
    "q_trigram_support",
    oracle=f"""
        WITH g AS (
            SELECT doc_id, source, md5(unnest({_TRIGRAM_DUCK})) AS gh
            FROM documents
        ),
        df AS (
            SELECT gh, CAST(count(*) AS BIGINT) AS nd FROM g GROUP BY gh
        ),
        per_doc AS (
            SELECT g.source, g.doc_id,
                   count(*) AS n_grams,
                   sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS n_supported
            FROM g JOIN df ON g.gh = df.gh
            GROUP BY g.source, g.doc_id
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_grams) AS BIGINT) AS n_grams,
               round(sum(n_supported * 1.0 / n_grams) / count(*), 4)
                   AS support_rate
        FROM per_doc GROUP BY source
    """,
    category="llm-dedup",
)
def q_trigram_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU-style corpus redundancy: for each document, the share
    of its DISTINCT trigrams that also occur in at least one other
    document, averaged per source. A high support rate means the
    source adds little novel phrasing — the redundancy signal used to
    down-weight boilerplate-heavy crawls in a training mix (the
    document-level complement of q_doc_novelty_rate's corpus ordering
    and q_contamination's cross-split check).

    Trigram sets are distinct per doc (the same construction as the
    MinHash family); only 32-hex md5 keys ever shuffle — the gram
    text is hashed in the SAME projection that explodes it. Document
    frequency is a combinable count on the uniform hash key; the
    support join is a vocab-grain equi-join; per-doc and per-source
    rollups are combinable. Since every distinct gram belongs to ≥1
    doc, df≥2 ⇔ "appears in another document" — set-exact, no floats
    until the final ratio."""
    d = load_table(spark, sf_dir, "documents")
    # materialized _toks column: inlined in the lambda the split
    # re-evaluates per element (no CSE inside HOF lambdas)
    tk = F.col("_toks")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tk) - 2, F.lit(0))),
            lambda i: F.concat_ws(
                " ",
                F.element_at(tk, i),
                F.element_at(tk, i + 1),
                F.element_at(tk, i + 2),
            ),
        )
    )
    g = (
        d.select("doc_id", "source", F.split(F.col("text"), " ").alias("_toks"))
        .select("doc_id", "source", F.explode(grams).alias("gram"))
        .select("doc_id", "source", F.md5("gram").alias("gh"))
    )
    df = g.groupBy("gh").agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    per_doc = (
        g.join(df, "gh")
        .groupBy("source", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_supported"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_grams").cast("bigint").alias("n_grams"),
        F.round(
            F.sum(F.col("n_supported") * 1.0 / F.col("n_grams")) / F.count(F.lit(1)), 4
        ).alias("support_rate"),
    )


# ---------------------------------------------------------------------------
# sample-ratio mismatch (SRM) check


@register(
    "q_srm_check",
    oracle=f"""
        WITH armed AS (
            SELECT n_name,
                   CAST(((CAST(c_custkey AS HUGEINT) * {KNUTH})
                         % 4294967296) // 2147483648 AS INT) AS arm
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        ),
        per AS (
            SELECT n_name,
                   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
            FROM armed GROUP BY n_name
        )
        SELECT n_name, n0, n1,
               round((n0 - n1) * (n0 - n1) * 1.0 / (n0 + n1), 4) AS chi2,
               CAST(CASE WHEN (n0 - n1) * (n0 - n1) * 1.0 / (n0 + n1)
                              > 10.8276 THEN 1 ELSE 0 END AS INT) AS srm_flag
        FROM per
    """,
    category="analytics",
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch detector per nation for the deterministic
    Knuth-hash 50/50 split: χ² = (n₀−n₁)²/(n₀+n₁) against the 1-dof
    critical value at p=0.001 (10.8276) — the guardrail every
    experimentation platform runs BEFORE reading any metric, because a
    skewed assignment invalidates everything downstream (q_smd_balance
    checks covariates; this checks the split itself).

    The arm is recomputable from the key alone (no RNG); counts are
    exact integers from one combinable aggregate + a broadcast dim
    join; χ² and the flag are identical integer-derived expressions —
    the flag compares integer-exact quantities and cannot flip."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", knuth_top_bit("c_custkey").cast("int").alias("arm")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n1"),
        )
    )
    diff = F.col("n0") - F.col("n1")
    chi2 = diff * diff * 1.0 / (F.col("n0") + F.col("n1"))
    return per.select(
        "n_name",
        "n0",
        "n1",
        F.round(chi2, 4).alias("chi2"),
        F.when(chi2 > 10.8276, 1).otherwise(0).cast("int").alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# participation-ratio effective rank of the embedding space


@register(
    "q_effective_rank",
    oracle="""
        WITH u AS (
            SELECT i AS dim,
                   CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS x
            FROM embeddings, unnest(range(0, 64)) t(i)
        ),
        v AS (
            SELECT dim,
                   CAST(round(var_samp(x) * 1000000) AS BIGINT) AS vq
            FROM u GROUP BY dim
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n_dims,
                   CAST(sum(vq) AS BIGINT) AS sv,
                   CAST(sum(vq * vq) AS BIGINT) AS svv
            FROM v
        )
        SELECT n_dims,
               round(sv * 1.0 * sv / svv, 4) AS effective_rank,
               round(sv * 1.0 * sv / svv / n_dims, 4) AS rank_ratio
        FROM s
    """,
    category="llm-similarity",
)
def q_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation-ratio effective rank of the embedding space:
    PR = (Σᵢvᵢ)²/Σᵢvᵢ² over the per-dimension variances — how many
    dimensions the representation ACTUALLY uses (64 iid dims → 64;
    one dominant direction → 1). The single-number anisotropy summary
    on top of q_dim_variance's per-dim board and the capacity check
    run before choosing a PQ/IVF compression budget.

    Per-dim variances come from one (dim)-grain combinable aggregate
    over the posexploded vectors, then are QUANTIZED to integer
    micro-units so the PR numerator/denominator are exact integer
    sums — the cross-engine moment-sum dust is rounded away BEFORE
    the ratio, not after."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select(F.posexplode("embedding").alias("dim", "x")).select(
        "dim", F.col("x").cast("double").alias("x")
    )
    v = u.groupBy("dim").agg(
        F.round(F.var_samp("x") * 1000000).cast("bigint").alias("vq")
    )
    s = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.sum("vq").cast("bigint").alias("sv"),
        F.sum(F.col("vq") * F.col("vq")).cast("bigint").alias("svv"),
    )
    pr = F.col("sv") * 1.0 * F.col("sv") / F.col("svv")
    return s.select(
        "n_dims",
        F.round(pr, 4).alias("effective_rank"),
        F.round(pr / F.col("n_dims"), 4).alias("rank_ratio"),
    )
