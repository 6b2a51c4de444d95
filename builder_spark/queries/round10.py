"""Round-10 surface growth, batch 1: rank-based effect size (Cliff's
delta), Murphy's Brier-score decomposition, per-source h-index, and a
DFT periodogram with spectral entropy.

Design rules (house style, unchanged): facts collapse to value/cell/
day grain before any window or join; pairwise work runs over bounded
cell grids, never row pairs; frequency/threshold sweeps are CELLS from
one projection, not plan branches; every float aggregate is one
identical expression rounded once on both engines.

Reference parity note: /root/reference is an empty mount (SURVEY §0);
these extend the Layer-B analytics surface mandated by BASELINE.json,
with DuckDB oracles as the correctness contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register

# ---------------------------------------------------------------------------
# Cliff's delta — ordinal effect size between groups


@register(
    "q_cliffs_delta",
    oracle="""
        WITH cells AS (
            SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS qty,
                   count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS INT)
        ),
        pairs AS (
            SELECT a.flag AS flag_a, b.flag AS flag_b,
                   sum(CASE WHEN a.qty > b.qty THEN a.cnt * b.cnt ELSE 0 END) AS gt,
                   sum(CASE WHEN a.qty < b.qty THEN a.cnt * b.cnt ELSE 0 END) AS lt,
                   sum(a.cnt * b.cnt) AS npairs
            FROM cells a JOIN cells b ON a.flag < b.flag
            GROUP BY a.flag, b.flag
        )
        SELECT flag_a, flag_b,
               CAST(gt AS BIGINT) AS n_gt, CAST(lt AS BIGINT) AS n_lt,
               round((gt - lt) * 1.0 / npairs, 4) AS delta,
               CASE WHEN abs((gt - lt) * 1.0 / npairs) < 0.147 THEN 'negligible'
                    WHEN abs((gt - lt) * 1.0 / npairs) < 0.33  THEN 'small'
                    WHEN abs((gt - lt) * 1.0 / npairs) < 0.474 THEN 'medium'
                    ELSE 'large' END AS magnitude
        FROM pairs ORDER BY flag_a, flag_b
    """,
    category="analytics",
)
def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta — the nonparametric effect size that pairs with
    q_mann_whitney_u's significance: δ = [#(x>y) − #(x<y)] / (n₁n₂)
    over all cross-group pairs, here for every pair of return-flag
    groups on quantity, with Romano's magnitude labels (0.147 / 0.33 /
    0.474). A z-score says the groups differ; δ says by how much, on a
    [-1, 1] dominance scale insensitive to outliers.

    Scale shape: quantities collapse to the (flag × qty) CELL grid
    first (≤ 3×50 cells regardless of fact rows), and the all-pairs
    dominance sum runs over cell pairs — counts multiply, rows never
    pair. The theta join is grid×grid (≤ 150×150 combos), constant
    work at any data size; (gt − lt)/npairs is an exact integer ratio
    rounded once."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("int").alias("qty"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    a = cells.select(
        F.col("flag").alias("flag_a"), F.col("qty").alias("qa"), F.col("cnt").alias("ca")
    )
    b = cells.select(
        F.col("flag").alias("flag_b"), F.col("qty").alias("qb"), F.col("cnt").alias("cb")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("flag_a") < F.col("flag_b"))
        .groupBy("flag_a", "flag_b")
        .agg(
            F.sum(
                F.when(F.col("qa") > F.col("qb"), F.col("ca") * F.col("cb")).otherwise(0)
            ).alias("gt"),
            F.sum(
                F.when(F.col("qa") < F.col("qb"), F.col("ca") * F.col("cb")).otherwise(0)
            ).alias("lt"),
            F.sum(F.col("ca") * F.col("cb")).alias("npairs"),
        )
    )
    delta = (F.col("gt") - F.col("lt")) * 1.0 / F.col("npairs")
    return pairs.select(
        "flag_a",
        "flag_b",
        F.col("gt").cast("bigint").alias("n_gt"),
        F.col("lt").cast("bigint").alias("n_lt"),
        F.round(delta, 4).alias("delta"),
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
        .alias("magnitude"),
    ).orderBy("flag_a", "flag_b")


# ---------------------------------------------------------------------------
# Brier-score (Murphy) decomposition


@register(
    "q_brier_decomposition",
    oracle="""
        WITH f AS (
            SELECT (event_id % 1000) / 1000.0 AS p,
                   CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS o,
                   least(CAST(floor((event_id % 1000) / 100) AS INT), 9) AS bin
            FROM events
        ),
        bins AS (
            SELECT bin, count(*) AS nk, avg(p) AS pbar, avg(o) AS obar
            FROM f GROUP BY bin
        ),
        tot AS (
            SELECT sum(nk) AS n, sum(nk * obar) / sum(nk) AS obar_all
            FROM bins
        ),
        parts AS (
            SELECT sum(nk * (pbar - obar) * (pbar - obar)) / max(t.n) AS rel,
                   sum(nk * (obar - t.obar_all) * (obar - t.obar_all)) / max(t.n) AS res,
                   max(t.obar_all) * (1 - max(t.obar_all)) AS unc
            FROM bins, tot t
        ),
        raw AS (SELECT avg((p - o) * (p - o)) AS brier_raw FROM f)
        SELECT round(brier_raw, 4) AS brier_raw,
               round(rel - res + unc, 4) AS brier_binned,
               round(rel, 4) AS reliability,
               round(res, 4) AS resolution,
               round(unc, 4) AS uncertainty
        FROM parts, raw
    """,
    category="analytics",
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score: with a deterministic
    forecast p = (event_id % 1000)/1000 for the outcome "event is a
    purchase", Brier = REL − RES + UNC exactly when forecasts are
    binned to their bin means — reliability (calibration error),
    resolution (how much the bins separate outcomes), uncertainty
    (outcome base-rate variance). brier_raw on the unbinned p is
    reported alongside; the binned identity is what the three parts
    reconstruct.

    One fact pass builds (p, o, bin); a 10-row bin rollup carries
    everything else — the decomposition is algebra over nk/p̄k/ōk, so
    REL/RES/UNC are three expressions over the same 10-row aggregate
    (broadcast 1-row total), no second fact scan for the parts."""
    f = load_table(spark, sf_dir, "events").select(
        ((F.col("event_id") % 1000) / 1000.0).alias("p"),
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("o"),
        F.least(
            F.floor((F.col("event_id") % 1000) / 100).cast("int"), F.lit(9)
        ).alias("bin"),
    )
    bins = f.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nk"),
        F.avg("p").alias("pbar"),
        F.avg("o").alias("obar"),
    )
    tot = bins.agg(
        F.sum("nk").alias("n"),
        (F.sum(F.col("nk") * F.col("obar")) / F.sum("nk")).alias("obar_all"),
    )
    parts = bins.crossJoin(F.broadcast(tot)).agg(
        (
            F.sum(F.col("nk") * (F.col("pbar") - F.col("obar")) ** 2) / F.max("n")
        ).alias("rel"),
        (
            F.sum(F.col("nk") * (F.col("obar") - F.col("obar_all")) ** 2) / F.max("n")
        ).alias("res"),
        (F.max("obar_all") * (1 - F.max("obar_all"))).alias("unc"),
    )
    raw = f.agg(F.avg((F.col("p") - F.col("o")) ** 2).alias("brier_raw"))
    return parts.crossJoin(F.broadcast(raw)).select(
        F.round("brier_raw", 4).alias("brier_raw"),
        F.round(F.col("rel") - F.col("res") + F.col("unc"), 4).alias("brier_binned"),
        F.round("rel", 4).alias("reliability"),
        F.round("res", 4).alias("resolution"),
        F.round("unc", 4).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# h-index per source


@register(
    "q_h_index",
    oracle="""
        WITH cells AS (
            SELECT source, n_chars AS v, count(*) AS cnt
            FROM documents GROUP BY source, n_chars
        ),
        cum AS (
            SELECT source, v,
                   sum(cnt) OVER (PARTITION BY source ORDER BY v DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS n_ge
            FROM cells
        )
        SELECT source,
               CAST(max(n_ge) AS BIGINT) AS n_docs,
               CAST(max(least(n_ge, v)) AS BIGINT) AS h_index
        FROM cum GROUP BY source ORDER BY source
    """,
    category="analytics",
)
def q_h_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h-index per document source on the length scale: the largest h
    such that the source has ≥ h documents of ≥ h characters — the
    bibliometric estimator applied as a corpus-quality signal (a
    source with many long documents scores high; boilerplate farms of
    short snippets score low). h = max over distinct values v of
    min(count(≥v), v), the standard value-grain identity.

    Scale shape: facts collapse to the (source × distinct n_chars)
    cell grid first; the descending cumulative runs over that grid —
    bounded by the char-length domain, never document count — and the
    answer is a plain max per source. No per-document rank anywhere."""
    cells = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # window over the (source x length-domain) cell grid — bounded input
    # (low-card whitelist: char-length value domain, not doc grain)
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn("n_ge", F.sum("cnt").over(w))
    return (
        cum.groupBy("source")
        .agg(
            F.max("n_ge").cast("bigint").alias("n_docs"),
            F.max(F.least(F.col("n_ge"), F.col("v"))).cast("bigint").alias("h_index"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# DFT periodogram + spectral entropy


_N_FREQ = 14  # k = 1..14 (~Nyquist for the ~30-day fixture span)


@register(
    "q_spectral_entropy",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS d, CAST(count(*) AS DOUBLE) AS cnt
            FROM events GROUP BY date_trunc('day', ts)
        ),
        anchor AS (SELECT min(d) AS d0, count(*) AS n FROM daily),
        idx AS (
            SELECT date_diff('day', a.d0, daily.d) AS t, cnt, a.n
            FROM daily, anchor a
        ),
        freqs AS (SELECT unnest(range(1, {_N_FREQ + 1})) AS k),
        spec AS (
            SELECT k,
                   power(sum(cnt * cos(2 * pi() * k * t / n)), 2)
                   + power(sum(cnt * sin(2 * pi() * k * t / n)), 2) AS p,
                   max(n) AS n
            FROM idx, freqs GROUP BY k
        ),
        tot AS (SELECT sum(p) AS ptot FROM spec),
        shares AS (
            SELECT s.k, s.p, s.n, t.ptot, round(s.p / t.ptot, 6) AS share6
            FROM spec s, tot t
        ),
        sm AS (SELECT max(share6) AS share_max FROM shares)
        SELECT CAST(max(s.n) AS BIGINT) AS n_days,
               CAST(min(CASE WHEN s.share6 = m.share_max THEN s.k END)
                    AS INT) AS dom_k,
               round(max(s.n) * 1.0
                     / min(CASE WHEN s.share6 = m.share_max THEN s.k END),
                     4) AS dom_period_days,
               round(-sum((s.p / s.ptot) * ln(s.p / s.ptot))
                     / ln({_N_FREQ}), 4) AS spectral_entropy
        FROM shares s, sm m
    """,
    category="analytics",
)
def q_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT periodogram of the daily event-count series: power at
    frequencies k = 1..14 over the ~30-day span, the dominant period
    (expected ≈ weekly if traffic has day-of-week structure), and the
    normalized spectral entropy −Σ p̂ ln p̂ / ln K — near 1 for white
    noise, low when one frequency dominates. The frequency-domain
    sibling of q_seasonality_strength/q_autocorrelation.

    Scale shape: the fact table collapses to the calendar-bounded day
    table once; the DFT is the day table × a {_N_FREQ}-row frequency
    grid (≤ days×{_N_FREQ} cells, both bounded) aggregated per k — a
    sweep of CELLS from one projection, not {_N_FREQ} plan branches.
    Dominant-k selection compares shares rounded to 6 dp so the argmax
    is summation-order-proof cross-engine; ties break to the lowest k."""
    import math

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    anchor = daily.agg(F.min("d").alias("d0"), F.count(F.lit(1)).alias("n"))
    idx = daily.crossJoin(F.broadcast(anchor)).select(
        F.datediff(F.col("d"), F.col("d0")).alias("t"), "cnt", "n"
    )
    freqs = spark.range(1, _N_FREQ + 1).select(F.col("id").cast("int").alias("k"))
    ang = 2 * math.pi * F.col("k") * F.col("t") / F.col("n")
    spec = (
        idx.crossJoin(F.broadcast(freqs))
        .groupBy("k")
        .agg(
            (
                F.pow(F.sum(F.col("cnt") * F.cos(ang)), 2)
                + F.pow(F.sum(F.col("cnt") * F.sin(ang)), 2)
            ).alias("p"),
            F.max("n").alias("n"),
        )
    )
    tot = spec.agg(F.sum("p").alias("ptot"))
    s = spec.crossJoin(F.broadcast(tot)).withColumn(
        "share6", F.round(F.col("p") / F.col("ptot"), 6)
    )
    # 14-row grid: the empty-frame max is over the bounded frequency grid
    smax = s.withColumn(
        "share_max",
        F.max("share6").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    return smax.agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.min(F.when(F.col("share6") == F.col("share_max"), F.col("k")))
        .cast("int")
        .alias("dom_k"),
        F.round(
            F.max("n")
            * 1.0
            / F.min(F.when(F.col("share6") == F.col("share_max"), F.col("k"))),
            4,
        ).alias("dom_period_days"),
        F.round(
            -F.sum((F.col("p") / F.col("ptot")) * F.log(F.col("p") / F.col("ptot")))
            / math.log(_N_FREQ),
            4,
        ).alias("spectral_entropy"),
    )
