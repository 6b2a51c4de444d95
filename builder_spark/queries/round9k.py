"""Round-9 surface growth, batch 12: feature-hashing collision audit,
Neyman optimal sample allocation, second-order Markov memory gain,
historical VaR/CVaR, Croston intermittent-demand forecast, XYZ
demand-variability classification, rescaled-range Hurst exponent,
SPRT sequential A/B boundary crossing, Bloom-filter FPR sizing sweep,
and token position-bias profiling.

Design rules (unchanged): day/part/vocab-grain collapse first;
cumulative structure rides ``stitched_running``; sweep grids
({{8,16,32,64}} R/S windows, 3 Bloom sizes) explode per AGGREGATE row,
never per fact row; the SPRT log-likelihood ratio is quantized to
integer micro-nats so boundary crossings are exact; one identical
float expression per statistic, rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.partitioning import stitched_running
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"
_LI_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# feature-hashing collision audit


_FH_BUCKETS = 256

_CHARFOLD_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, length(term)+1), "
    "i -> CAST(ascii(substr(term, CAST(i AS INT), 1)) AS BIGINT))), "
    "(a, b) -> (a*31 + b) % 33554432)"
)


@register(
    "q_feature_hashing",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ),
        cnt AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY term
        ),
        b AS (
            SELECT ({_CHARFOLD_SQL}) % {_FH_BUCKETS} AS bkt,
                   CAST(count(*) AS BIGINT) AS n_terms,
                   CAST(sum(c) AS BIGINT) AS mass
            FROM cnt GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(n_terms) AS BIGINT) AS vocab,
                   CAST(count(*) AS BIGINT) AS used
            FROM b
        )
        SELECT CAST({_FH_BUCKETS} AS INT) AS n_buckets, used, vocab,
               CAST(max(n_terms) AS BIGINT) AS max_terms_per_bucket,
               CAST(sum(CASE WHEN n_terms >= 2 THEN n_terms ELSE 0 END)
                    AS BIGINT) AS colliding_terms,
               round(sum(CASE WHEN n_terms >= 2 THEN mass ELSE 0 END)
                     * 1.0 / sum(mass), 4) AS colliding_mass_share
        FROM b CROSS JOIN tot
        GROUP BY used, vocab
    """,
    category="llm-pipeline",
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) collision audit for a 256-bucket
    text featurizer: how many vocabulary terms share a bucket, the
    worst bucket, and — the number that matters — the share of TOKEN
    MASS sitting in colliding buckets (a collision between two rare
    terms is harmless; one involving a head term poisons the
    feature). The sizing check run before shipping hashed bag-of-words
    features, with the same portable charfold hash as the sketch
    family.

    The token stream collapses to vocab grain once; buckets are a
    second combinable aggregate over the vocabulary; all counts exact
    integers to the final share."""
    from builder_spark.operators.dedup import charfold_hash

    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    b = (
        cnt.select(
            F.pmod(charfold_hash("term"), F.lit(_FH_BUCKETS)).alias("bkt"), "c"
        )
        .groupBy("bkt")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("c").cast("bigint").alias("mass"),
        )
    )
    tot = b.agg(
        F.sum("n_terms").cast("bigint").alias("vocab"),
        F.count(F.lit(1)).cast("bigint").alias("used"),
    )
    coll = F.when(F.col("n_terms") >= 2, F.col("n_terms")).otherwise(0)
    coll_mass = F.when(F.col("n_terms") >= 2, F.col("mass")).otherwise(0)
    return (
        b.crossJoin(F.broadcast(tot))
        .groupBy("used", "vocab")
        .agg(
            F.lit(_FH_BUCKETS).cast("int").alias("n_buckets"),
            F.max("n_terms").cast("bigint").alias("max_terms_per_bucket"),
            F.sum(coll).cast("bigint").alias("colliding_terms"),
            F.round(F.sum(coll_mass) * 1.0 / F.sum("mass"), 4).alias(
                "colliding_mass_share"
            ),
        )
        .select(
            "n_buckets",
            "used",
            "vocab",
            "max_terms_per_bucket",
            "colliding_terms",
            "colliding_mass_share",
        )
    )


# ---------------------------------------------------------------------------
# Neyman optimal allocation


_NEYMAN_N = 1000


@register(
    "q_neyman_allocation",
    oracle=f"""
        WITH m AS (
            SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS nh,
                   CAST(sum({_OC.replace("o_totalprice", "c_acctbal")}) AS BIGINT) AS s,
                   CAST(sum({_OC.replace("o_totalprice", "c_acctbal")}
                            * {_OC.replace("o_totalprice", "c_acctbal")}) AS BIGINT) AS ss
            FROM customer GROUP BY c_mktsegment
        ),
        w AS (
            SELECT seg, nh,
                   nh * sqrt((ss - s * 1.0 * s / nh) / (nh - 1)) AS weight
            FROM m WHERE nh > 1
        ),
        tot AS (SELECT sum(weight) AS tw FROM w)
        SELECT seg, nh AS stratum_size,
               CAST(floor({_NEYMAN_N} * weight / tw) AS BIGINT) AS n_alloc,
               round(weight / tw, 4) AS alloc_share,
               round({_NEYMAN_N}.0 * nh / (SELECT sum(nh) FROM w), 1)
                   AS proportional_alloc
        FROM w CROSS JOIN tot
    """,
    category="analytics",
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation of a 1000-unit sample across market
    segments: n_h ∝ N_h·S_h (stratum size × stratum SD of account
    balance) — the survey-sampling allocation that minimizes the
    estimator variance at fixed cost, reported against proportional
    allocation (the naive n_h ∝ N_h baseline it beats exactly when
    strata have unequal spread). The design step upstream of
    q_stratified_sample.

    Per-stratum integer moments in one combinable pass; the SD is the
    closed form; shares are one identical float expression against a
    1-row broadcast total; floor-allocation is deterministic."""
    ac = F.expr("CAST(round(c_acctbal * 100) AS BIGINT)")
    m = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nh"),
            F.sum(ac).cast("bigint").alias("s"),
            F.sum(ac * ac).cast("bigint").alias("ss"),
        )
        .filter(F.col("nh") > 1)
    )
    sd = F.sqrt(
        (F.col("ss") - F.col("s") * 1.0 * F.col("s") / F.col("nh")) / (F.col("nh") - 1)
    )
    w = m.select("seg", "nh", (F.col("nh") * sd).alias("weight"))
    tot = w.agg(F.sum("weight").alias("tw"), F.sum("nh").alias("tn"))
    return w.crossJoin(F.broadcast(tot)).select(
        "seg",
        F.col("nh").alias("stratum_size"),
        F.floor(_NEYMAN_N * F.col("weight") / F.col("tw")).cast("bigint").alias(
            "n_alloc"
        ),
        F.round(F.col("weight") / F.col("tw"), 4).alias("alloc_share"),
        F.round(F.lit(float(_NEYMAN_N)) * F.col("nh") / F.col("tn"), 1).alias(
            "proportional_alloc"
        ),
    )


# ---------------------------------------------------------------------------
# second-order Markov memory gain


@register(
    "q_markov2_memory",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type, 1) OVER w AS p1,
                   lag(event_type, 2) OVER w AS p2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        t2 AS (
            SELECT p2, p1, event_type AS cur, CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE p2 IS NOT NULL GROUP BY p2, p1, event_type
        ),
        grid AS (
            SELECT p2, p1, cur, n,
                   sum(n) OVER (PARTITION BY p2, p1) AS n_ctx,
                   sum(n) OVER (PARTITION BY p1, cur) AS n1_ij,
                   sum(n) OVER (PARTITION BY p1) AS n1_i,
                   sum(n) OVER () AS nn
            FROM t2
        ),
        h AS (
            SELECT sum(-(n * 1.0 / nn) * ln(n * 1.0 / n_ctx)) AS h2,
                   sum(-(n * 1.0 / nn) * ln(n1_ij * 1.0 / n1_i)) AS h1
            FROM grid
        )
        SELECT round(h1, 4) AS h_order1,
               round(h2, 4) AS h_order2,
               round(h1 - h2, 4) AS memory_gain
        FROM h
    """,
    category="analytics",
)
def q_markov2_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much memory do event streams have? The second-order Markov
    entropy rate H(next | prev2, prev1) next to the first-order
    H(next | prev1), both estimated on the SAME trigram counts so the
    difference is a clean conditional-mutual-information
    I(next; prev2 | prev1) ≥ 0 — zero means q_markov_entropy_rate's
    first-order chain already captures the dynamics; large means
    sequence models need context. The order-selection diagnostic for
    behavioral sequence modeling.

    Two stacked lag windows partition on user_id; trigrams collapse
    to the ≤125-cell grid immediately; ALL conditionals are window
    sums over that bounded grid (whitelisted) — one identical
    summation grid on both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    t2 = (
        seq.filter(F.col("p2").isNotNull())
        .groupBy("p2", "p1", F.col("event_type").alias("cur"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    grid = t2.select(
        "n",
        F.sum("n").over(Window.partitionBy("p2", "p1")).alias("n_ctx"),
        F.sum("n").over(Window.partitionBy("p1", "cur")).alias("n1_ij"),
        F.sum("n").over(Window.partitionBy("p1")).alias("n1_i"),
        F.sum("n").over(Window.partitionBy()).alias("nn"),  # 125-cell grid
    )
    p = F.col("n") * 1.0 / F.col("nn")
    h = grid.agg(
        F.sum(-p * F.log(F.col("n") * 1.0 / F.col("n_ctx"))).alias("h2"),
        F.sum(-p * F.log(F.col("n1_ij") * 1.0 / F.col("n1_i"))).alias("h1"),
    )
    return h.select(
        F.round(F.col("h1"), 4).alias("h_order1"),
        F.round(F.col("h2"), 4).alias("h_order2"),
        F.round(F.col("h1") - F.col("h2"), 4).alias("memory_gain"),
    )


# ---------------------------------------------------------------------------
# historical VaR / CVaR


@register(
    "q_var_cvar",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS d,
                   CAST(sum({_OC}) AS BIGINT) AS rev
            FROM orders GROUP BY date_trunc('day', o_orderdate)
        ),
        delta AS (
            SELECT rev - lag(rev) OVER (ORDER BY d) AS chg
            FROM daily
        ),
        r AS (
            SELECT chg,
                   row_number() OVER (ORDER BY chg) AS rn,
                   count(*) OVER () AS n
            FROM delta WHERE chg IS NOT NULL
        )
        SELECT CAST(max(n) AS BIGINT) AS n_days,
               round(min(CASE WHEN rn * 20 >= n THEN chg END) / 100.0, 2)
                   AS var95_dollars,
               round(sum(CASE WHEN rn * 20 < n THEN chg END)
                     / nullif(sum(CASE WHEN rn * 20 < n THEN 1 END), 0)
                     / 100.0, 2) AS cvar95_dollars
        FROM r
    """,
    category="analytics",
)
def q_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical VaR₉₅/CVaR₉₅ of day-over-day revenue changes: the
    5th-percentile worst daily move and the mean of the tail beyond
    it — the risk pair (CVaR is coherent, VaR is the quoted
    threshold) any volume/revenue SLA planning reads off the change
    distribution. Changes are exact integer cents so the tail
    membership rule rn·20 < n is integer-exact.

    The day table is calendar-bounded: the lag and rank windows over
    it are whitelisted bounded-frame windows (the q_autocorrelation
    precedent); the tail aggregate is combinable."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(F.sum(F.expr(_OC)).cast("bigint").alias("rev"))
    )
    wd = Window.orderBy("d")  # day table (whitelisted)
    delta = daily.select((F.col("rev") - F.lag("rev").over(wd)).alias("chg")).filter(
        F.col("chg").isNotNull()
    )
    wr = Window.orderBy("chg")
    r = delta.select(
        "chg",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    in_tail = F.col("rn") * 20 < F.col("n")
    return r.agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.round(
            F.min(F.when(F.col("rn") * 20 >= F.col("n"), F.col("chg"))) / 100.0, 2
        ).alias("var95_dollars"),
        F.round(
            F.sum(F.when(in_tail, F.col("chg")))
            / F.nullif(F.sum(F.when(in_tail, 1)), F.lit(0))
            / 100.0,
            2,
        ).alias("cvar95_dollars"),
    )


# ---------------------------------------------------------------------------
# Croston intermittent-demand forecast


@register(
    "q_croston_intermittent",
    oracle=f"""
        WITH daily AS (
            SELECT l_partkey AS pk, date_trunc('day', l_shipdate) AS d,
                   CAST(sum({_LI_QTY}) AS BIGINT) AS q
            FROM lineitem GROUP BY l_partkey, date_trunc('day', l_shipdate)
        ),
        span AS (
            SELECT pk, CAST(count(*) AS BIGINT) AS n_demand,
                   CAST(sum(q) AS BIGINT) AS total_q,
                   CAST(date_diff('day', min(d), max(d)) + 1 AS BIGINT)
                       AS span_days
            FROM daily GROUP BY pk
            HAVING count(*) >= 4
        )
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               round(avg(total_q * 1.0 / n_demand), 4) AS avg_demand_size,
               round(avg(span_days * 1.0 / n_demand), 4) AS avg_interval_days,
               round(avg((total_q * 1.0 / n_demand)
                         / (span_days * 1.0 / n_demand)), 4)
                   AS croston_rate_per_day,
               CAST(sum(CASE WHEN span_days > n_demand * 2
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_intermittent
        FROM span
    """,
    category="analytics",
)
def q_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand decomposition per part: average
    nonzero demand size z̄, average inter-demand interval p̄, and the
    Croston rate z̄/p̄ — the forecasting identity for sparse demand
    where a plain moving average is biased toward zero days.
    Parts whose interval exceeds 2 days are flagged intermittent (the
    Syntetos–Boylan regime boundary); classic supply-chain sibling of
    q_xyz_variability's variability bands.

    Demand collapses to (part, day) then to part grain — two
    combinable integer aggregates; the simple-average Croston variant
    is closed-form (no exponential recursion), so everything is one
    identical float expression of exact integers."""
    daily = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.date_trunc("day", F.col("l_shipdate")).alias("d"),
        )
        .agg(F.sum(F.expr(_LI_QTY)).cast("bigint").alias("q"))
    )
    span = (
        daily.groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_demand"),
            F.sum("q").cast("bigint").alias("total_q"),
            (
                F.datediff(F.max("d").cast("date"), F.min("d").cast("date")) + 1
            )
            .cast("bigint")
            .alias("span_days"),
        )
        .filter(F.col("n_demand") >= 4)
    )
    z = F.col("total_q") * 1.0 / F.col("n_demand")
    p = F.col("span_days") * 1.0 / F.col("n_demand")
    return span.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(F.avg(z), 4).alias("avg_demand_size"),
        F.round(F.avg(p), 4).alias("avg_interval_days"),
        F.round(F.avg(z / p), 4).alias("croston_rate_per_day"),
        F.sum(F.when(F.col("span_days") > F.col("n_demand") * 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_intermittent"),
    )


# ---------------------------------------------------------------------------
# XYZ demand-variability classification


@register(
    "q_xyz_variability",
    oracle=f"""
        WITH mo AS (
            SELECT l_partkey AS pk, date_trunc('month', l_shipdate) AS m,
                   CAST(sum({_LI_QTY}) AS BIGINT) AS q
            FROM lineitem GROUP BY l_partkey, date_trunc('month', l_shipdate)
        ),
        per AS (
            SELECT pk, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(q) AS BIGINT) AS s,
                   CAST(sum(q * q) AS BIGINT) AS ss
            FROM mo GROUP BY pk HAVING count(*) >= 3
        ),
        cls AS (
            SELECT pk,
                   CASE WHEN sqrt((ss - s * 1.0 * s / n) / (n - 1))
                             / (s * 1.0 / n) < 0.5 THEN 'X'
                        WHEN sqrt((ss - s * 1.0 * s / n) / (n - 1))
                             / (s * 1.0 / n) < 1.0 THEN 'Y'
                        ELSE 'Z' END AS xyz,
                   s
            FROM per
        )
        SELECT xyz, CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(s) AS BIGINT) AS total_qty,
               round(sum(s) * 1.0 / (SELECT sum(s) FROM cls), 4) AS qty_share
        FROM cls GROUP BY xyz
    """,
    category="analytics",
)
def q_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ classification of parts by monthly-demand variability:
    CV < 0.5 → X (stable, forecastable), < 1.0 → Y, else Z (erratic)
    — the variability axis that crosses q_abc_classification's value
    axis into the standard ABC-XYZ planning matrix, and the
    segmentation that decides which parts get statistical forecasts
    (X) vs safety stock (Z).

    Monthly rollup absorbs line grain; per-part integer moments in
    one combinable pass; the CV class is a deterministic CASE on one
    identical float expression; parts with <3 active months are
    excluded by an integer gate."""
    mo = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.date_trunc("month", F.col("l_shipdate")).alias("m"),
        )
        .agg(F.sum(F.expr(_LI_QTY)).cast("bigint").alias("q"))
    )
    per = (
        mo.groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("q").cast("bigint").alias("s"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss"),
        )
        .filter(F.col("n") >= 3)
    )
    cv = F.sqrt(
        (F.col("ss") - F.col("s") * 1.0 * F.col("s") / F.col("n")) / (F.col("n") - 1)
    ) / (F.col("s") * 1.0 / F.col("n"))
    cls = per.select(
        "pk",
        F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z").alias("xyz"),
        "s",
    )
    tot = cls.agg(F.sum("s").cast("bigint").alias("ts"))
    return (
        cls.groupBy("xyz")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("s").cast("bigint").alias("total_qty"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "xyz",
            "n_parts",
            "total_qty",
            F.round(F.col("total_qty") * 1.0 / F.col("ts"), 4).alias("qty_share"),
        )
    )


# ---------------------------------------------------------------------------
# rescaled-range Hurst exponent


_HURST_WINDOWS = [8, 16, 32, 64]


def _hurst_block_sql() -> str:
    parts = [
        f"""
            SELECT {w} AS wsize,
                   CAST(date_diff('day', DATE '1992-01-01', CAST(d AS DATE))
                        // {w} AS BIGINT) AS blk,
                   d, rev
            FROM daily"""
        for w in _HURST_WINDOWS
    ]
    return "\n            UNION ALL\n            ".join(parts)


@register(
    "q_hurst_exponent",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS d,
                   CAST(sum({_OC}) AS BIGINT) AS rev
            FROM orders GROUP BY date_trunc('day', o_orderdate)
        ),
        blocks AS ({_hurst_block_sql()}
        ),
        dev AS (
            SELECT wsize, blk, d, rev,
                   count(*) OVER (PARTITION BY wsize, blk) AS n,
                   avg(rev * 1.0) OVER (PARTITION BY wsize, blk) AS mu,
                   sum(rev) OVER (PARTITION BY wsize, blk ORDER BY d
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
                   row_number() OVER (PARTITION BY wsize, blk ORDER BY d)
                       AS rn
            FROM blocks
        ),
        rs AS (
            SELECT wsize, blk,
                   max(cum - rn * mu) - min(cum - rn * mu) AS r,
                   sqrt(sum((rev - mu) * (rev - mu)) / max(n)) AS s
            FROM dev GROUP BY wsize, blk HAVING max(n) = wsize
        ),
        pts AS (
            SELECT ln(wsize * 1.0) AS lx, ln(avg(r / s)) AS ly
            FROM rs WHERE s > 0 GROUP BY wsize
        )
        SELECT CAST(count(*) AS BIGINT) AS n_scales,
               round(regr_slope(ly, lx), 4) AS hurst
        FROM pts
    """,
    category="analytics",
)
def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) Hurst exponent of daily revenue: split the
    series into blocks of {{8,16,32,64}} days, compute each block's
    range of mean-adjusted cumulative deviations over its SD, and fit
    ln(R/S) ~ ln(window) — H≈0.5 is a random walk, H>0.5 long-memory
    persistence (trends compound), H<0.5 mean reversion. The
    long-memory diagnostic that decides whether q_exp_smoothing-class
    models are even applicable.

    The day rollup absorbs facts; blocks explode per DAY row (4 rows
    per day — calendar-bounded); all block windows partition on
    (wsize, blk) with ≤64 rows each; incomplete blocks are excluded
    by an integer gate; the final fit is regr_slope over 4 points."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(F.sum(F.expr(_OC)).cast("bigint").alias("rev"))
    )
    epoch = F.datediff(F.col("d").cast("date"), F.lit("1992-01-01").cast("date"))
    wsizes = F.explode(
        F.array(*[F.lit(w) for w in _HURST_WINDOWS])
    ).alias("wsize")
    blocks = daily.select("d", "rev", wsizes).select(
        "wsize", F.expr(
            "CAST(datediff(CAST(d AS DATE), DATE '1992-01-01') div wsize AS BIGINT)"
        ).alias("blk"), "d", "rev"
    )
    wb = Window.partitionBy("wsize", "blk")
    wo = wb.orderBy("d")
    dev = blocks.select(
        "wsize",
        "blk",
        "rev",
        F.count(F.lit(1)).over(wb).alias("n"),
        F.avg(F.col("rev") * 1.0).over(wb).alias("mu"),
        F.sum("rev").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(wo).alias("rn"),
    )
    adj = F.col("cum") - F.col("rn") * F.col("mu")
    rs = (
        dev.groupBy("wsize", "blk")
        .agg(
            (F.max(adj) - F.min(adj)).alias("r"),
            F.sqrt(
                F.sum((F.col("rev") - F.col("mu")) * (F.col("rev") - F.col("mu")))
                / F.max("n")
            ).alias("s"),
            F.max("n").alias("nmax"),
        )
        .filter(F.col("nmax") == F.col("wsize"))
    )
    pts = (
        rs.filter(F.col("s") > 0)
        .groupBy("wsize")
        .agg(F.log(F.avg(F.col("r") / F.col("s"))).alias("ly"))
        .select(F.log(F.col("wsize") * 1.0).alias("lx"), "ly")
    )
    return pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scales"),
        F.round(F.expr("regr_slope(ly, lx)"), 4).alias("hurst"),
    )


# ---------------------------------------------------------------------------
# SPRT sequential A/B boundary crossing


_SPRT_P0 = 0.10  # null conversion rate
_SPRT_P1 = 0.15  # alternative
#: integer micro-nat increments: ln(p1/p0), ln((1-p1)/(1-p0))
_SPRT_LLR_HIT = 405465  # round(ln(0.15/0.10) * 1e6)
_SPRT_LLR_MISS = -57158  # round(ln(0.85/0.90) * 1e6)
_SPRT_A = 2944439  # round(ln((1-0.05)/0.05) * 1e6)  upper bound (accept H1)
_SPRT_B = -2944439  # lower bound (accept H0)


@register(
    "q_sprt_sequential",
    oracle=f"""
        WITH s AS (
            SELECT event_id, ts,
                   CASE WHEN event_type = 'purchase' THEN {_SPRT_LLR_HIT}
                        ELSE {_SPRT_LLR_MISS} END AS llr
            FROM events
        ),
        r AS (
            SELECT ts,
                   sum(llr) OVER (ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
                   row_number() OVER (ORDER BY ts, event_id) AS rn
            FROM s
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(CASE WHEN cum >= {_SPRT_A} THEN rn END) AS BIGINT)
                       AS first_accept_h1,
                   CAST(min(CASE WHEN cum <= {_SPRT_B} THEN rn END) AS BIGINT)
                       AS first_accept_h0,
                   CAST(max(cum) AS BIGINT) AS max_llr,
                   CAST(min(cum) AS BIGINT) AS min_llr
            FROM r
        )
        SELECT n_events, first_accept_h1, first_accept_h0, max_llr, min_llr,
               CAST(CASE
                    WHEN first_accept_h1 IS NOT NULL
                         AND (first_accept_h0 IS NULL
                              OR first_accept_h1 < first_accept_h0) THEN 1
                    WHEN first_accept_h0 IS NOT NULL THEN 0
                    END AS INT) AS decision_h1
        FROM agg
    """,
    category="analytics",
)
def q_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT replayed over the event stream: cumulative
    log-likelihood ratio for H1: p(purchase)=0.15 vs H0: p=0.10
    (α=β=0.05 boundaries ±ln 19), reporting the first sample index
    that crosses each boundary and which hypothesis wins — the
    sequential test that stops experiments in a FRACTION of the
    fixed-n sample q_power_analysis prescribes, with exact error
    control. LLR increments are pre-quantized to integer micro-nats,
    so the cumulative walk and both crossing times are EXACT integer
    comparisons — no float drift can move a stopping time.

    The cumulative walk rides ONE stitched running pass over the
    (ts, event_id) order; crossings are combinable conditional mins."""
    s = load_table(spark, sf_dir, "events").select(
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit(_SPRT_LLR_HIT))
        .otherwise(F.lit(_SPRT_LLR_MISS))
        .cast("bigint")
        .alias("llr"),
    )
    r = stitched_running(
        s, ["ts", "event_id"], running={"cum": "llr"}, rank_name="rn"
    )
    agg = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min(F.when(F.col("cum") >= _SPRT_A, F.col("rn")))
        .cast("bigint")
        .alias("first_accept_h1"),
        F.min(F.when(F.col("cum") <= _SPRT_B, F.col("rn")))
        .cast("bigint")
        .alias("first_accept_h0"),
        F.max("cum").cast("bigint").alias("max_llr"),
        F.min("cum").cast("bigint").alias("min_llr"),
    )
    h1, h0 = F.col("first_accept_h1"), F.col("first_accept_h0")
    return agg.select(
        "n_events",
        "first_accept_h1",
        "first_accept_h0",
        "max_llr",
        "min_llr",
        F.when(h1.isNotNull() & (h0.isNull() | (h1 < h0)), 1)
        .when(h0.isNotNull(), 0)
        .cast("int")
        .alias("decision_h1"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter FPR sizing sweep


_BLOOM_BITS = [1024, 4096, 16384]
_BLOOM_K = 2
_BLOOM_A = [1299721, 15485863]
_BLOOM_B = [7, 131]
_BLOOM_P = 2147483647


def _bloom_probe_sql(m: int) -> str:
    """Membership test: both hash positions of the probe term are set
    in the m-bit filter built from train terms."""
    conds = " AND ".join(
        f"""EXISTS (SELECT 1 FROM bits_{m} bt
                    WHERE bt.pos = (p.h * {_BLOOM_A[i]} + {_BLOOM_B[i]})
                                   % {_BLOOM_P} % {m})"""
        for i in range(_BLOOM_K)
    )
    return conds


@register(
    "q_bloom_fpr_sweep",
    oracle=f"""
        WITH tok AS (
            SELECT DISTINCT unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        hashed AS (
            SELECT term, {_CHARFOLD_SQL} AS h,
                   CASE WHEN ({_CHARFOLD_SQL}) % 5 = 0
                        THEN 'probe' ELSE 'member' END AS part
            FROM tok
        ),
        {", ".join(f'''bits_{m} AS (
            SELECT DISTINCT (h * a + b) % {_BLOOM_P} % {m} AS pos
            FROM (SELECT h FROM hashed WHERE part = 'member'),
                 (VALUES ({_BLOOM_A[0]}, {_BLOOM_B[0]}),
                         ({_BLOOM_A[1]}, {_BLOOM_B[1]})) t(a, b)
        )''' for m in _BLOOM_BITS)},
        probes AS (SELECT * FROM hashed WHERE part = 'probe'),
        sweep AS (
            {" UNION ALL ".join(f'''
            SELECT {m} AS n_bits,
                   CAST(count(*) AS BIGINT) AS n_probes,
                   CAST(coalesce(sum(CASE WHEN {_bloom_probe_sql(m)}
                            THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_fp,
                   (SELECT CAST(count(*) AS BIGINT) FROM bits_{m}) AS bits_set
            FROM probes p''' for m in _BLOOM_BITS)}
        )
        SELECT CAST(n_bits AS INT) AS n_bits, n_probes, n_fp, bits_set,
               round(n_fp * 1.0 / nullif(n_probes, 0), 4) AS fpr,
               round(bits_set * 1.0 / n_bits, 4) AS fill_ratio
        FROM sweep
    """,
    category="llm-pipeline",
)
def q_bloom_fpr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing sweep: build k=2 Carter–Wegman filters over
    the 'member' 80% of the vocabulary at {{1k, 4k, 16k}} bits, then
    measure the FALSE-POSITIVE rate on the held-out 20% (true
    non-members by construction — the hash-split is deterministic) —
    the measured FPR-vs-bits curve that sizes q_bloom_membership and
    the bloom-pruned joins, next to the fill ratio that predicts it
    (FPR ≈ fill^k).

    Vocab-grain throughout: the filter's set positions are a DISTINCT
    aggregate over member terms (≤2·V positions, far fewer after
    collisions); each probe tests membership via a position equi-join
    per hash row (never a bitmap on the driver); counts exact."""
    from builder_spark.operators.dedup import charfold_hash

    tok = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.array_distinct(F.split("text", " "))).alias("term"))
        .distinct()
    )
    hashed = tok.select(
        "term", charfold_hash("term").alias("h")
    ).withColumn(
        "part",
        F.when(F.pmod(F.col("h"), F.lit(5)) == 0, "probe").otherwise("member"),
    )
    def cells(df):
        """All (size, hash-row, position) cells in ONE projection —
        the whole sweep explodes per VOCAB row, so neither the member
        nor the probe frame is ever re-printed per (m, i) branch."""
        structs = [
            F.struct(
                F.lit(m).alias("m"),
                F.lit(i).alias("hi"),
                F.pmod(
                    F.pmod(
                        F.col("h") * _BLOOM_A[i] + _BLOOM_B[i], F.lit(_BLOOM_P)
                    ),
                    F.lit(m),
                ).alias("pos"),
            )
            for m in _BLOOM_BITS
            for i in range(_BLOOM_K)
        ]
        return df.select("h", F.explode(F.array(*structs)).alias("c")).select(
            "h", "c.m", "c.hi", "c.pos"
        )

    bits = (
        cells(hashed.filter(F.col("part") == "member"))
        .select("m", "pos")
        .distinct()
        .withColumn("set_flag", F.lit(1))
    )
    probe_cells = cells(hashed.filter(F.col("part") == "probe"))
    hit = probe_cells.join(bits, ["m", "pos"], "left")
    per_probe = hit.groupBy("m", "h").agg(
        F.sum(F.coalesce(F.col("set_flag"), F.lit(0))).alias("n_hit")
    )
    sweep = per_probe.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.when(F.col("n_hit") == _BLOOM_K, 1).otherwise(0))
        .cast("bigint")
        .alias("n_fp"),
    )
    fill = bits.groupBy("m").agg(F.count(F.lit(1)).cast("bigint").alias("bits_set"))
    # literal m spine + left joins: the oracle's UNION ALL branches emit
    # one zero-row per size even over an empty vocabulary (degenerate
    # audit); on any real corpus every m matches and this is a no-op
    spine = spark.range(1).select(
        F.explode(F.array(*[F.lit(m) for m in _BLOOM_BITS])).alias("m")
    )
    n_probes = F.coalesce("n_probes", F.lit(0)).cast("bigint")
    n_fp = F.coalesce("n_fp", F.lit(0)).cast("bigint")
    bits_set = F.coalesce("bits_set", F.lit(0)).cast("bigint")
    return (
        spine.join(sweep, "m", "left")
        .join(F.broadcast(fill), "m", "left")
        .select(
            F.col("m").cast("int").alias("n_bits"),
            n_probes.alias("n_probes"),
            n_fp.alias("n_fp"),
            bits_set.alias("bits_set"),
            F.round(n_fp * 1.0 / F.when(n_probes != 0, n_probes), 4).alias("fpr"),
            F.round(bits_set * 1.0 / F.col("m"), 4).alias("fill_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# token position bias


@register(
    "q_token_position_bias",
    oracle="""
        WITH tok AS (
            SELECT string_split(text, ' ') AS ws FROM documents
        ),
        cnt AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT unnest(ws) AS term FROM tok) GROUP BY term
        ),
        top AS (
            SELECT term, c FROM cnt ORDER BY c DESC, term ASC LIMIT 20
        ),
        pos AS (
            SELECT top.term, top.c,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   sum((list_position(tok.ws, top.term) - 1) * 1.0
                       / greatest(len(tok.ws) - 1, 1)) AS rel_sum
            FROM top JOIN tok ON list_contains(tok.ws, top.term)
            GROUP BY top.term, top.c
        )
        SELECT term, c AS n_occur, n_docs,
               round(rel_sum / n_docs, 4) AS mean_rel_position,
               CAST(CASE WHEN rel_sum / n_docs < 0.35 THEN 1 ELSE 0 END
                    AS INT) AS front_loaded
        FROM pos
    """,
    category="llm-text",
)
def q_token_position_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional bias of the 20 most frequent tokens: the mean
    relative position of each term's FIRST occurrence within its
    documents — head terms that consistently appear in the first
    third (front-loaded flag) are boilerplate/template candidates
    (q_boilerplate_prefix finds shared openings; this finds the WORDS
    that anchor them), and positional skew also breaks
    position-agnostic BoW assumptions.

    The top-20 terms are a TakeOrdered over the vocab-grain counts
    broadcast against the docs; first-occurrence position is a
    per-row O(T) array_position; per-term rollups combinable. The
    position ratio is one identical float expression from integer
    positions."""
    d = load_table(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("ws")
    )
    cnt = (
        d.select(F.explode("ws").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    top = cnt.orderBy(F.col("c").desc(), F.col("term").asc()).limit(20)
    j = d.crossJoin(F.broadcast(top)).filter(
        F.array_contains(F.col("ws"), F.col("term"))
    )
    rel = (F.array_position(F.col("ws"), F.col("term")) - 1) * 1.0 / F.greatest(
        F.size("ws") - 1, F.lit(1)
    )
    pos = j.groupBy("term", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(rel).alias("rel_sum"),
    )
    mean_rel = F.col("rel_sum") / F.col("n_docs")
    return pos.select(
        "term",
        F.col("c").alias("n_occur"),
        "n_docs",
        F.round(mean_rel, 4).alias("mean_rel_position"),
        F.when(mean_rel < 0.35, 1).otherwise(0).cast("int").alias("front_loaded"),
    )
