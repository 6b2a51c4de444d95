"""Round-9 surface growth, batch 10: per-part price dispersion,
negative-binomial overdispersion diagnostics, entity-resolution
blocking audit, Wilcoxon signed-rank paired test, per-user
feature-store assembly, Count-Min-Sketch width calibration sweep, the
quantile shift function between two groups, segment-level delta
contribution analysis, embedding-dimension correlation screening, and
record-breaking-day statistics.

Design rules (unchanged): value/part/vocab-grain collapse before any
ordered pass; cumulative structure rides ``stitched_running``;
sketch hashes are Carter–Wegman over engine-portable integer keys;
one identical float expression per statistic, rounded once; bounded
grids (16 dims, 10 deciles, width sweep {{64,256,1024}}) are the only
pairwise surfaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.partitioning import stitched_running
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"
_LI_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_LI_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"
_AC = "CAST(round(c_acctbal * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# per-part price dispersion


@register(
    "q_price_dispersion",
    oracle=f"""
        WITH u AS (
            SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum({_LI_CENTS}) AS BIGINT) AS s,
                   CAST(sum({_LI_CENTS} * {_LI_CENTS}) AS BIGINT) AS ss,
                   CAST(min({_LI_CENTS}) AS BIGINT) AS mn,
                   CAST(max({_LI_CENTS}) AS BIGINT) AS mx
            FROM lineitem GROUP BY l_partkey
            HAVING count(*) >= 3
        )
        SELECT pk AS partkey, n,
               round(s / (100.0 * n), 2) AS mean_dollars,
               round(sqrt((ss - s * 1.0 * s / n) / (n - 1)) / (s / (n * 1.0)),
                     4) AS cv,
               round((mx - mn) * 1.0 / mn, 4) AS max_markup
        FROM u
        ORDER BY round(sqrt((ss - s * 1.0 * s / n) / (n - 1))
                       / (s / (n * 1.0)), 4) DESC, pk ASC
        LIMIT 15
    """,
    category="analytics",
)
def q_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-discrimination screen: the 15 parts whose line-item
    prices vary most across sales (coefficient of variation of
    extended price, plus the max/min markup spread) — who is paying
    different prices for the same thing. The pricing-analytics
    complement of q_price_elasticity (which wants variation; this
    audits its fairness/consistency).

    One part-grain combinable aggregate of exact integer moments
    (HAVING n≥3 is an integer gate); CV is one identical float
    expression; the board is a TakeOrdered on the ROUNDED cv with a
    partkey tie-break so float dust can't reorder."""
    li = load_table(spark, sf_dir, "lineitem")
    c = F.expr(_LI_CENTS)
    u = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(c).cast("bigint").alias("s"),
            F.sum(c * c).cast("bigint").alias("ss"),
            F.min(c).cast("bigint").alias("mn"),
            F.max(c).cast("bigint").alias("mx"),
        )
        .filter(F.col("n") >= 3)
    )
    mean = F.col("s") / (F.col("n") * 1.0)
    sd = F.sqrt(
        (F.col("ss") - F.col("s") * 1.0 * F.col("s") / F.col("n")) / (F.col("n") - 1)
    )
    out = u.select(
        F.col("pk").alias("partkey"),
        "n",
        F.round(F.col("s") / (100.0 * F.col("n")), 2).alias("mean_dollars"),
        F.round(sd / mean, 4).alias("cv"),
        F.round((F.col("mx") - F.col("mn")) * 1.0 / F.col("mn"), 4).alias(
            "max_markup"
        ),
    )
    return out.orderBy(F.col("cv").desc(), F.col("partkey").asc()).limit(15)


# ---------------------------------------------------------------------------
# negative-binomial overdispersion


@register(
    "q_nb_overdispersion",
    oracle="""
        WITH per AS (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY user_id, event_type
        ),
        s AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(c) AS BIGINT) AS sc,
                   CAST(sum(c * c) AS BIGINT) AS scc
            FROM per GROUP BY event_type
        )
        SELECT event_type, k AS n_users,
               round(sc * 1.0 / k, 4) AS mean_count,
               round((scc - sc * 1.0 * sc / k) / (k - 1), 4) AS var_count,
               round(((scc - sc * 1.0 * sc / k) / (k - 1)) / (sc * 1.0 / k), 4)
                   AS dispersion,
               round(CASE WHEN (scc - sc * 1.0 * sc / k) / (k - 1)
                               > sc * 1.0 / k
                     THEN (sc * 1.0 / k) * (sc * 1.0 / k)
                          / ((scc - sc * 1.0 * sc / k) / (k - 1) - sc * 1.0 / k)
                     ELSE NULL END, 4) AS nb_r
        FROM s WHERE k > 1
    """,
    category="analytics",
)
def q_nb_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-model diagnostic per event type: the Fisher dispersion
    index var/mean of per-user event counts (=1 under Poisson; >1 ⇒
    overdispersed) and the method-of-moments negative-binomial shape
    r = m²/(v−m) when overdispersed — the distribution choice every
    per-user count model (engagement, ads, fraud) starts with; NULL r
    honestly reports "Poisson is fine". Pairs with q_burstiness
    (within-user timing) — this is across-user volume.

    Per-(user,type) counts are one combinable aggregate; the moments
    roll up to the 5-type grid; all statistics are single float
    expressions of exact integers."""
    per = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    s = per.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
    )
    m = F.col("sc") * 1.0 / F.col("k")
    v = (F.col("scc") - F.col("sc") * 1.0 * F.col("sc") / F.col("k")) / (
        F.col("k") - 1
    )
    return s.filter(F.col("k") > 1).select(
        "event_type",
        F.col("k").alias("n_users"),
        F.round(m, 4).alias("mean_count"),
        F.round(v, 4).alias("var_count"),
        F.round(v / m, 4).alias("dispersion"),
        F.round(
            F.when(v > m, m * m / (v - m)).otherwise(F.lit(None)), 4
        ).alias("nb_r"),
    )


# ---------------------------------------------------------------------------
# entity-resolution blocking audit


@register(
    "q_er_blocking",
    oracle=f"""
        WITH b AS (
            SELECT c_nationkey, c_mktsegment, {_AC} // 100000 AS band,
                   CAST(count(*) AS BIGINT) AS nb
            FROM customer
            GROUP BY c_nationkey, c_mktsegment, {_AC} // 100000
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                   CAST(sum(nb) AS BIGINT) AS n_records,
                   CAST(max(nb) AS BIGINT) AS max_block,
                   CAST(sum(nb * (nb - 1) / 2) AS BIGINT) AS cand_pairs
            FROM b
        )
        SELECT n_blocks, n_records, max_block, cand_pairs,
               round(1 - cand_pairs * 2.0 / (n_records * (n_records - 1)), 6)
                   AS reduction_ratio,
               round(cand_pairs * 1.0 / n_blocks, 2) AS avg_pairs_per_block
        FROM s
    """,
    category="llm-pipeline",
)
def q_er_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking audit for the composite key
    (nation, segment, $1000 balance band): block count, the biggest
    block, total candidate pairs ΣC(nᵦ,2), and the reduction ratio
    1 − pairs/C(N,2) — the number that decides whether a dedup/ER
    pass is tractable (RR→1) or quadratic in disguise (one huge
    block). The relational sibling of the MinHash banding audit
    (q_minhash_calibration): same question — "did blocking actually
    bound the candidate set?" — for structured records.

    One combinable integer aggregate to block grain, one 1-row
    rollup; C(nᵦ,2) is exact integer arithmetic; no pair is ever
    materialized — the audit is the point."""
    c = load_table(spark, sf_dir, "customer")
    b = c.groupBy(
        "c_nationkey", "c_mktsegment", F.expr(f"{_AC} div 100000").alias("band")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    s = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("nb").cast("bigint").alias("n_records"),
        F.max("nb").cast("bigint").alias("max_block"),
        F.sum(F.col("nb") * (F.col("nb") - 1) / 2).cast("bigint").alias("cand_pairs"),
    )
    return s.select(
        "n_blocks",
        "n_records",
        "max_block",
        "cand_pairs",
        F.round(
            1
            - F.col("cand_pairs") * 2.0
            / F.when(  # ANSI /0 guard: single-record corpus has no pairs
                F.col("n_records") != 1,
                F.col("n_records") * (F.col("n_records") - 1),
            ),
            6,
        ).alias("reduction_ratio"),
        F.round(F.col("cand_pairs") * 1.0 / F.col("n_blocks"), 2).alias(
            "avg_pairs_per_block"
        ),
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank (paired)


@register(
    "q_wilcoxon_signed_rank",
    oracle=f"""
        WITH py AS (
            SELECT l_partkey AS pk, year(l_shipdate) AS y,
                   sum({_LI_CENTS}) AS cents, sum({_LI_QTY}) AS q
            FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
            GROUP BY l_partkey, year(l_shipdate)
        ),
        d AS (
            SELECT a.pk,
                   b.cents * 1.0 / b.q - a.cents * 1.0 / a.q AS diff
            FROM py a JOIN py b ON a.pk = b.pk AND a.y = 1995 AND b.y = 1996
            WHERE b.cents * 1.0 / b.q <> a.cents * 1.0 / a.q
        ),
        v AS (
            SELECT abs(diff) AS ad,
                   CAST(count(*) AS BIGINT) AS tot,
                   CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS pos
            FROM d GROUP BY abs(diff)
        ),
        r AS (
            SELECT ad, tot, pos,
                   sum(tot) OVER (ORDER BY ad
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
            FROM v
        ),
        agg AS (
            SELECT CAST(sum(tot) AS BIGINT) AS n,
                   sum(pos * ((cum - tot + 1) + (tot - 1) / 2.0)) AS w_plus
            FROM r
        )
        SELECT n, round(w_plus, 1) AS w_plus,
               round((w_plus - n * (n + 1) / 4.0)
                     / sqrt(n * (n + 1.0) * (2 * n + 1) / 24), 4) AS z
        FROM agg
    """,
    category="analytics",
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED unit prices: did the same
    parts get dearer from 1995 to 1996? Rank the |price diffs|
    (average ranks on ties), W⁺ = Σ ranks of positive diffs,
    z = (W⁺ − n(n+1)/4)/√(n(n+1)(2n+1)/24). The paired counterpart
    of q_mann_whitney_u (which compares two independent groups) —
    pairing removes the between-part price spread entirely.

    Unit-price diffs are float divisions of exact integer sums
    (identical per row); zero diffs drop by the standard convention
    via an EXACT comparison of those identical floats. Diffs collapse
    to |diff| VALUE grain first, average ranks come from one stitched
    running count (never a global per-row rank), and W⁺ is a single
    combinable aggregate of exact .5-multiples."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("y", F.year("l_shipdate"))
        .filter(F.col("y").isin(1995, 1996))
        .groupBy(F.col("l_partkey").alias("pk"), "y")
        .agg(F.sum(F.expr(_LI_CENTS)).alias("cents"), F.sum(F.expr(_LI_QTY)).alias("q"))
    )
    a = li.filter(F.col("y") == 1995).select(
        "pk", (F.col("cents") * 1.0 / F.col("q")).alias("p0")
    )
    b = li.filter(F.col("y") == 1996).select(
        F.col("pk").alias("pk_b"), (F.col("cents") * 1.0 / F.col("q")).alias("p1")
    )
    d = (
        a.join(b, F.col("pk") == F.col("pk_b"))
        .filter(F.col("p1") != F.col("p0"))
        .select((F.col("p1") - F.col("p0")).alias("diff"))
    )
    v = d.groupBy(F.abs(F.col("diff")).alias("ad")).agg(
        F.count(F.lit(1)).cast("bigint").alias("tot"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).cast("bigint").alias("pos"),
    )
    r = stitched_running(v, ["ad"], running={"cum": "tot"})
    avg_rank = (F.col("cum") - F.col("tot") + 1) + (F.col("tot") - 1) / F.lit(2.0)
    agg = r.agg(
        F.sum("tot").cast("bigint").alias("n"),
        F.sum(F.col("pos") * avg_rank).alias("w_plus"),
    )
    n = F.col("n")
    z = (F.col("w_plus") - n * (n + 1) / F.lit(4.0)) / F.sqrt(
        n * (n + F.lit(1.0)) * (2 * n + 1) / F.lit(24.0)
    )
    return agg.select(
        "n", F.round(F.col("w_plus"), 1).alias("w_plus"), F.round(z, 4).alias("z")
    )


# ---------------------------------------------------------------------------
# per-user feature-store assembly


@register(
    "q_user_features",
    oracle="""
        WITH mx AS (SELECT max(ts) AS now FROM events),
        per AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                   CAST(round(sum(CASE WHEN event_type = 'purchase'
                                  THEN value ELSE 0 END) * 100) AS BIGINT)
                       AS monetary_cents,
                   CAST(date_diff('day', max(ts), (SELECT now FROM mx))
                        AS BIGINT) AS recency_days,
                   CAST(date_diff('day', min(ts), max(ts)) AS BIGINT)
                       AS tenure_days,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
                   CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT)
                       AS active_days
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_events, n_purchases, monetary_cents,
               recency_days, tenure_days, n_types, active_days,
               round(n_events * 1.0 / (tenure_days + 1), 4) AS events_per_day
        FROM per
    """,
    category="analytics",
)
def q_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store assembly: the per-user modeling row every churn /
    LTV / propensity model starts from — RFM (recency vs the corpus
    horizon, frequency, purchase monetary), tenure, type diversity,
    active days, and rate — all in ONE pass over the event stream.
    The point of the query is the SHAPE: a feature pipeline that
    needs k passes for k features doesn't survive 100 TB; every
    feature here is a combinable aggregate sharing one shuffle.

    Monetary is rounded to exact cents inside the aggregate;
    recency is anchored to max(ts) (a 1-row broadcast), so the
    features are reproducible from the data alone — no wall-clock
    leakage."""
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("now"))
    per = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0)
            )
            * 100
        )
        .cast("bigint")
        .alias("monetary_cents"),
        F.max("ts").alias("last_ts"),
        F.min("ts").alias("first_ts"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.countDistinct(F.date_trunc("day", F.col("ts")))
        .cast("bigint")
        .alias("active_days"),
    )
    j = per.crossJoin(F.broadcast(mx))
    tenure = F.datediff(F.col("last_ts").cast("date"), F.col("first_ts").cast("date"))
    return j.select(
        "user_id",
        "n_events",
        "n_purchases",
        "monetary_cents",
        F.datediff(F.col("now").cast("date"), F.col("last_ts").cast("date"))
        .cast("bigint")
        .alias("recency_days"),
        tenure.cast("bigint").alias("tenure_days"),
        "n_types",
        "active_days",
        F.round(F.col("n_events") * 1.0 / (tenure + 1), 4).alias("events_per_day"),
    )


# ---------------------------------------------------------------------------
# Count-Min-Sketch width calibration sweep


_CMS_WIDTHS = [64, 256, 1024]
_CMS_P = 2147483647
_CMS_ROWS = [(1299721, 7), (15485863, 131)]  # (a, b) Carter-Wegman rows
_CMS_TOPN = 10

_CHARFOLD_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, length(term)+1), "
    "i -> CAST(ascii(substr(term, CAST(i AS INT), 1)) AS BIGINT))), "
    "(a, b) -> (a*31 + b) % 33554432)"
)


def _cms_cells_sql() -> str:
    cells = []
    for w in _CMS_WIDTHS:
        for ri, (a, b) in enumerate(_CMS_ROWS):
            cells.append(
                f"SELECT {w} AS width, {ri} AS row_i, "
                f"(h * {a} + {b}) % {_CMS_P} % {w} AS bkt, c FROM hashed"
            )
    return "\n            UNION ALL\n            ".join(cells)


@register(
    "q_cms_width_sweep",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ),
        cnt AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY term
        ),
        hashed AS (
            SELECT term, c, {_CHARFOLD_SQL} AS h FROM cnt
        ),
        cells AS (
            {_cms_cells_sql()}
        ),
        sketch AS (
            SELECT width, row_i, bkt, CAST(sum(c) AS BIGINT) AS bsum
            FROM cells GROUP BY width, row_i, bkt
        ),
        top AS (
            SELECT term, c, h FROM hashed
            ORDER BY c DESC, term ASC LIMIT {_CMS_TOPN}
        ),
        est AS (
            SELECT top.term, top.c, sketch.width,
                   min(sketch.bsum) AS estimate
            FROM top JOIN sketch
              ON sketch.bkt = (top.h * (CASE sketch.row_i
                                        WHEN 0 THEN {_CMS_ROWS[0][0]}
                                        ELSE {_CMS_ROWS[1][0]} END)
                               + CASE sketch.row_i
                                 WHEN 0 THEN {_CMS_ROWS[0][1]}
                                 ELSE {_CMS_ROWS[1][1]} END)
                              % {_CMS_P} % sketch.width
            GROUP BY top.term, top.c, sketch.width
        )
        SELECT CAST(width AS INT) AS width,
               CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(c) AS BIGINT) AS true_total,
               CAST(sum(estimate) AS BIGINT) AS est_total,
               round(sum(estimate) * 1.0 / sum(c), 4) AS overestimate
        FROM est GROUP BY width
    """,
    category="llm-text",
)
def q_cms_width_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch width calibration: build d=2 CW-hashed
    sketches at widths {64, 256, 1024} from the SAME vocab-grain
    counts, then measure the top-10 terms' aggregate overestimate
    (CMS errors are one-sided: estimate ≥ truth, shrinking ~1/width).
    The sizing experiment behind q_heavy_hitters_cms — how narrow can
    the sketch go before collisions poison the heavy hitters?

    The token stream collapses to vocab grain ONCE; sketch cells
    explode per (width, row) from that bounded vocabulary (6 cells
    per TERM, not per token); bucket sums are combinable integers;
    estimates are a broadcast join of the top-10 terms against the
    bucket table. All hashes are the engine-portable charfold +
    Carter-Wegman pair — bit-identical cross-engine."""
    from builder_spark.operators.dedup import charfold_hash

    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )
    cnt = tok.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    hashed = cnt.select("term", "c", charfold_hash("term").alias("h"))
    cells = None
    for w in _CMS_WIDTHS:
        for ri, (a, b) in enumerate(_CMS_ROWS):
            part = hashed.select(
                F.lit(w).alias("width"),
                F.lit(ri).alias("row_i"),
                F.pmod(F.pmod(F.col("h") * a + b, F.lit(_CMS_P)), F.lit(w)).alias(
                    "bkt"
                ),
                "c",
            )
            cells = part if cells is None else cells.unionByName(part)
    sketch = cells.groupBy("width", "row_i", "bkt").agg(
        F.sum("c").cast("bigint").alias("bsum")
    )
    top = hashed.orderBy(F.col("c").desc(), F.col("term").asc()).limit(_CMS_TOPN)
    a0, b0 = _CMS_ROWS[0]
    a1, b1 = _CMS_ROWS[1]
    probe_bkt = F.pmod(
        F.pmod(
            F.col("h") * F.when(F.col("row_i") == 0, a0).otherwise(a1)
            + F.when(F.col("row_i") == 0, b0).otherwise(b1),
            F.lit(_CMS_P),
        ),
        F.col("width"),
    )
    est = (
        sketch.join(F.broadcast(top), sketch.bkt == probe_bkt)
        .groupBy("term", "c", "width")
        .agg(F.min("bsum").alias("estimate"))
    )
    return est.groupBy(F.col("width").cast("int").alias("width")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("c").cast("bigint").alias("true_total"),
        F.sum("estimate").cast("bigint").alias("est_total"),
        F.round(F.sum("estimate") * 1.0 / F.sum("c"), 4).alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# quantile shift function


@register(
    "q_shift_function",
    oracle=f"""
        WITH x AS (
            SELECT o_orderpriority AS grp, {_OC} AS cents FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        q AS (
            SELECT grp,
                   unnest(range(1, 10)) AS dec,
                   unnest([quantile_cont(cents, 0.1), quantile_cont(cents, 0.2),
                           quantile_cont(cents, 0.3), quantile_cont(cents, 0.4),
                           quantile_cont(cents, 0.5), quantile_cont(cents, 0.6),
                           quantile_cont(cents, 0.7), quantile_cont(cents, 0.8),
                           quantile_cont(cents, 0.9)]) AS qv
            FROM x GROUP BY grp
        )
        SELECT CAST(a.dec AS INT) AS decile,
               round(a.qv / 100.0, 2) AS q_urgent,
               round(b.qv / 100.0, 2) AS q_low,
               round((a.qv - b.qv) / 100.0, 2) AS shift_dollars
        FROM (SELECT * FROM q WHERE grp = '1-URGENT') a
        JOIN (SELECT * FROM q WHERE grp = '5-LOW') b ON a.dec = b.dec
    """,
    category="order-stats",
)
def q_shift_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shift function (Doksum): quantile-by-quantile difference
    between URGENT and LOW order prices at each decile — WHERE in the
    distribution the two groups differ (a mean shift moves all nine
    points equally; a tail effect moves only the top). The robust
    follow-up that q_welch_ttest/q_mann_whitney_u can't answer: they
    say IF the groups differ, this says WHERE.

    Both groups' nine deciles come from the stitched rank selection
    (one pass per group over value order, no buffering percentile);
    the decile join is a 9-row broadcast; interpolated quantiles are
    bit-identical cross-engine (q_percentiles' proof)."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    x = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(F.col("o_orderpriority").alias("grp"), F.expr(_OC).alias("cents"))
    ps = {f"q{i}": i / 10.0 for i in range(1, 10)}
    q = quantile_cont_stitched(x, "cents", ps, ["grp"]).drop("n")
    stack = ", ".join(f"{i}, q{i}" for i in range(1, 10))
    tall = q.select(
        "grp", F.expr(f"stack(9, {stack}) AS (decile, qv)")
    )
    a = tall.filter(F.col("grp") == "1-URGENT").select(
        F.col("decile").alias("dec_a"), F.col("qv").alias("qa")
    )
    b = tall.filter(F.col("grp") == "5-LOW").select(
        F.col("decile").alias("dec_b"), F.col("qv").alias("qb")
    )
    return a.join(F.broadcast(b), F.col("dec_a") == F.col("dec_b")).select(
        F.col("dec_a").cast("int").alias("decile"),
        F.round(F.col("qa") / 100.0, 2).alias("q_urgent"),
        F.round(F.col("qb") / 100.0, 2).alias("q_low"),
        F.round((F.col("qa") - F.col("qb")) / 100.0, 2).alias("shift_dollars"),
    )


# ---------------------------------------------------------------------------
# segment delta contribution analysis


@register(
    "q_delta_contribution",
    oracle=f"""
        WITH seg AS (
            SELECT c_mktsegment AS seg, year(o_orderdate) AS y,
                   CAST(sum({_OC}) AS BIGINT) AS rev
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE year(o_orderdate) IN (1995, 1996)
            GROUP BY c_mktsegment, year(o_orderdate)
        ),
        w AS (
            SELECT seg,
                   CAST(coalesce(sum(CASE WHEN y = 1995 THEN rev END), 0)
                        AS BIGINT) AS r0,
                   CAST(coalesce(sum(CASE WHEN y = 1996 THEN rev END), 0)
                        AS BIGINT) AS r1
            FROM seg GROUP BY seg
        ),
        tot AS (
            SELECT CAST(sum(r1 - r0) AS BIGINT) AS total_delta FROM w
        )
        SELECT seg,
               round(r0 / 100.0, 2) AS rev_base,
               round(r1 / 100.0, 2) AS rev_curr,
               round((r1 - r0) / 100.0, 2) AS delta,
               round((r1 - r0) * 1.0 / total_delta, 4) AS contribution,
               row_number() OVER (ORDER BY abs(r1 - r0) DESC, seg ASC)
                   AS impact_rank
        FROM w CROSS JOIN tot
    """,
    category="analytics",
)
def q_delta_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis: which market segments EXPLAIN the
    1995→1996 revenue change — per-segment delta, its share of the
    total delta (shares sum to 1 exactly — signed shares >1 / <0 are
    the offsetting-movements signal), and an impact rank by |delta|.
    The drill-down a revenue dashboard runs the moment the topline
    moves; q_pvm_decomposition splits the delta by MECHANISM
    (price/volume), this splits it by WHO.

    One (segment, year) combinable integer aggregate behind a
    broadcast dim join; the pivot and shares are exact integer
    arithmetic; the rank window runs over the 5-row segment
    aggregate (whitelisted grain) ordered by an exact integer."""
    o = load_table(spark, sf_dir, "orders").withColumn("y", F.year("o_orderdate"))
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        o.filter(F.col("y").isin(1995, 1996))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), "y")
        .agg(F.sum(F.expr(_OC)).cast("bigint").alias("rev"))
    )
    w = seg.groupBy("seg").agg(
        F.coalesce(F.sum(F.when(F.col("y") == 1995, F.col("rev"))), F.lit(0))
        .cast("bigint")
        .alias("r0"),
        F.coalesce(F.sum(F.when(F.col("y") == 1996, F.col("rev"))), F.lit(0))
        .cast("bigint")
        .alias("r1"),
    )
    tot = w.agg(F.sum(F.col("r1") - F.col("r0")).cast("bigint").alias("total_delta"))
    rk = Window.orderBy(F.abs(F.col("r1") - F.col("r0")).desc(), F.col("seg").asc())
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "seg",
            F.round(F.col("r0") / 100.0, 2).alias("rev_base"),
            F.round(F.col("r1") / 100.0, 2).alias("rev_curr"),
            F.round((F.col("r1") - F.col("r0")) / 100.0, 2).alias("delta"),
            F.round((F.col("r1") - F.col("r0")) * 1.0 / F.col("total_delta"), 4).alias(
                "contribution"
            ),
            F.row_number().over(rk).alias("impact_rank"),
        )
    )


# ---------------------------------------------------------------------------
# embedding-dimension correlation screen


_DC_DIMS = 16  # screen the first 16 dims (120 pairs)


@register(
    "q_dim_correlation",
    oracle=f"""
        WITH u AS (
            SELECT vec_id, i AS dim,
                   CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS x
            FROM embeddings, unnest(range(0, {_DC_DIMS})) t(i)
        ),
        pairs AS (
            SELECT a.dim AS di, b.dim AS dj,
                   CAST(count(*) AS BIGINT) AS n,
                   round(corr(a.x, b.x), 4) AS r
            FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.dim < b.dim
            GROUP BY a.dim, b.dim
        )
        SELECT CAST(di AS INT) AS dim_i, CAST(dj AS INT) AS dim_j, n, r
        FROM pairs
        ORDER BY abs(r) DESC, di ASC, dj ASC
        LIMIT 10
    """,
    category="llm-similarity",
)
def q_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dimension correlation screen: the 10 most correlated
    pairs among the first 16 dimensions — redundant axes that a
    whitening/PCA step would fold together and that inflate
    q_effective_rank's denominator. The pairwise complement of
    q_dim_variance (marginal) and q_effective_rank (global).

    The pair grid is DIM × DIM (120 pairs of a 16-slice), formed by a
    vec_id equi-join of the posexploded slice — fan-out is the
    constant 16 per row, never row×row; corr is per-pair combinable.
    The board ranks round(r,4) with dim tie-breaks."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select(
        "vec_id", F.posexplode(F.slice(F.col("embedding"), 1, _DC_DIMS)).alias("dim", "x")
    ).select("vec_id", "dim", F.col("x").cast("double").alias("x"))
    a = u.select("vec_id", F.col("dim").alias("di"), F.col("x").alias("xa"))
    b = u.select(
        F.col("vec_id").alias("vid_b"), F.col("dim").alias("dj"), F.col("x").alias("xb")
    )
    pairs = (
        a.join(b, (F.col("vec_id") == F.col("vid_b")) & (F.col("di") < F.col("dj")))
        .groupBy("di", "dj")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.corr("xa", "xb"), 4).alias("r"),
        )
    )
    return (
        pairs.select(
            F.col("di").cast("int").alias("dim_i"),
            F.col("dj").cast("int").alias("dim_j"),
            "n",
            "r",
        )
        .orderBy(F.abs(F.col("r")).desc(), F.col("dim_i").asc(), F.col("dim_j").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# record-breaking days


@register(
    "q_record_runs",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS d,
                   CAST(sum({_OC}) AS BIGINT) AS rev
            FROM orders GROUP BY grp, date_trunc('day', o_orderdate)
        ),
        rec AS (
            SELECT grp, d, rev,
                   CASE WHEN rev > coalesce(max(rev) OVER (
                            PARTITION BY grp ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS is_record
            FROM daily
        )
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(is_record) AS BIGINT) AS n_records,
               round(ln(count(*)) + 0.5772, 2) AS expected_iid,
               round(max(CASE WHEN is_record = 1 THEN rev END) / 100.0, 2)
                   AS final_record_dollars
        FROM rec GROUP BY grp
    """,
    category="analytics",
)
def q_record_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-breaking days per revenue series: how often does a day
    set a new all-time high, against the iid expectation H_n ≈ ln n +
    γ (records in an exchangeable series are distribution-free — ~7
    records in 1000 days; materially more means trend, a burst early
    then silence means decay). A neat distribution-free trend
    detector next to q_mann_kendall.

    Integer-exact: the record flag compares summed cents to a
    running max over the PRIOR window (sentinel −1 makes day one a
    record); windows partition on the series key over the day-grain
    rollup; the expectation is a closed form of the day count."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.date_trunc("day", F.col("o_orderdate")).alias("d"),
        )
        .agg(F.sum(F.expr(_OC)).cast("bigint").alias("rev"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rec = daily.select(
        "grp",
        "rev",
        F.when(F.col("rev") > F.coalesce(F.max("rev").over(w), F.lit(-1)), 1)
        .otherwise(0)
        .alias("is_record"),
    )
    return rec.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("is_record").cast("bigint").alias("n_records"),
        F.round(F.log(F.count(F.lit(1))) + 0.5772, 2).alias("expected_iid"),
        F.round(
            F.max(F.when(F.col("is_record") == 1, F.col("rev"))) / 100.0, 2
        ).alias("final_record_dollars"),
    )
