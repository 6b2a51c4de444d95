"""Round-9 surface growth, batch 13: sessionization gap-threshold
sweep, supplier concentration risk, cross-engine table checksums,
competing-risks cumulative incidence, forensic price-ending audit,
source vocabulary uniqueness, return-rate trend, character-bigram
entropy, price stickiness, and empirical-Bayes mean shrinkage.

Design rules (unchanged): parameter sweeps explode per AGGREGATE or
per-event row into a bounded cells frame (never one plan branch per
parameter); checksums/risks/entropies are exact-integer cores; lag
windows partition on entity/part keys over month/day rollups; one
identical float expression per statistic, rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.functions.hashing import KNUTH
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"
_LI_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_LI_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# sessionization gap-threshold sweep


_GAPS_MIN = [5, 15, 30, 60]


@register(
    "q_session_gap_sweep",
    oracle=f"""
        WITH gaps AS (
            SELECT user_id,
                   date_diff('second',
                             lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                             ts) AS gap_s
            FROM events
        ),
        cells AS (
            SELECT t.thr,
                   CASE WHEN gap_s IS NULL OR gap_s > t.thr * 60
                        THEN 1 ELSE 0 END AS starts
            FROM gaps CROSS JOIN (
                SELECT unnest([{", ".join(str(g) for g in _GAPS_MIN)}]) AS thr
            ) t
        )
        SELECT CAST(thr AS INT) AS gap_minutes,
               CAST(sum(starts) AS BIGINT) AS n_sessions,
               round(count(*) * 1.0 / sum(starts), 4) AS events_per_session
        FROM cells GROUP BY thr
    """,
    category="analytics",
)
def q_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization sensitivity sweep: session counts and mean
    session length at inactivity thresholds {5, 15, 30, 60} minutes —
    the tuning curve behind EVERY session metric (a threshold on the
    flat part of this curve is robust; one on the cliff makes every
    downstream KPI an artifact of the parameter). q_win_session picks
    one threshold; this is how you pick it.

    ONE per-user lag window computes the gaps; the four thresholds
    explode per EVENT ROW into a bounded cells frame (4× — never one
    window pass per threshold); session starts are integer
    comparisons, combinable per threshold."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = load_table(spark, sf_dir, "events").select(
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("gap_s")
    )
    thr = F.explode(F.array(*[F.lit(g) for g in _GAPS_MIN])).alias("thr")
    cells = gaps.select("gap_s", thr).select(
        "thr",
        F.when(
            F.col("gap_s").isNull() | (F.col("gap_s") > F.col("thr") * 60), 1
        )
        .otherwise(0)
        .alias("starts"),
    )
    return cells.groupBy(F.col("thr").cast("int").alias("gap_minutes")).agg(
        F.sum("starts").cast("bigint").alias("n_sessions"),
        F.round(F.count(F.lit(1)) * 1.0 / F.sum("starts"), 4).alias(
            "events_per_session"
        ),
    )


# ---------------------------------------------------------------------------
# supplier concentration risk


@register(
    "q_supplier_risk",
    oracle=f"""
        WITH ps AS (
            SELECT l_partkey AS pk, l_suppkey AS sk,
                   CAST(sum({_LI_CENTS}) AS BIGINT) AS rev
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        per AS (
            SELECT pk, CAST(count(*) AS BIGINT) AS n_suppliers,
                   CAST(sum(rev) AS BIGINT) AS total,
                   CAST(max(rev) AS BIGINT) AS top_rev
            FROM ps GROUP BY pk
        ),
        flagged AS (
            SELECT pk, n_suppliers,
                   CASE WHEN top_rev * 2 > total THEN 1 ELSE 0 END
                       AS single_sourced
            FROM per
        )
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               round(avg(n_suppliers * 1.0), 4) AS avg_suppliers,
               CAST(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sole_source,
               CAST(sum(single_sourced) AS BIGINT) AS n_majority_single,
               round(sum(single_sourced) * 1.0 / count(*), 4)
                   AS majority_single_share
        FROM flagged
    """,
    category="analytics",
)
def q_supplier_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration risk: per part the supplier count and
    whether ONE supplier carries the majority of its spend (top
    share > 50%, tested as integer top·2 > total — no float gate),
    rolled up to the procurement dashboard: sole-sourced parts and
    majority-single-supplier share. The supply-chain counterpart of
    q_hhi_concentration's customer-side lens.

    (part, supplier) revenue is one combinable integer aggregate; the
    per-part max/total collapse is a second; the flags are exact
    integer comparisons — a plan with no windows and no joins."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.expr(_LI_CENTS)).cast("bigint").alias("rev"))
    )
    per = ps.groupBy("pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("rev").cast("bigint").alias("total"),
        F.max("rev").cast("bigint").alias("top_rev"),
    )
    single = F.when(F.col("top_rev") * 2 > F.col("total"), 1).otherwise(0)
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(F.avg(F.col("n_suppliers") * 1.0), 4).alias("avg_suppliers"),
        F.sum(F.when(F.col("n_suppliers") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sole_source"),
        F.sum(single).cast("bigint").alias("n_majority_single"),
        F.round(F.sum(single) * 1.0 / F.count(F.lit(1)), 4).alias(
            "majority_single_share"
        ),
    )


# ---------------------------------------------------------------------------
# cross-engine table checksums


@register(
    "q_table_checksums",
    oracle=f"""
        WITH o AS (
            SELECT 'orders' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum((CAST(o_orderkey AS HUGEINT) * {KNUTH})
                            % 4294967296) AS BIGINT) AS key_sum,
                   CAST(sum({_OC}) AS BIGINT) AS value_cents
            FROM orders
        ),
        c AS (
            SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum((CAST(c_custkey AS HUGEINT) * {KNUTH})
                            % 4294967296) AS BIGINT) AS key_sum,
                   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM customer
        ),
        l AS (
            SELECT 'lineitem' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum((CAST(l_orderkey * 8 + l_linenumber AS HUGEINT)
                             * {KNUTH}) % 4294967296) AS BIGINT) AS key_sum,
                   CAST(sum({_LI_CENTS}) AS BIGINT) AS value_cents
            FROM lineitem
        )
        SELECT * FROM o UNION ALL SELECT * FROM c UNION ALL SELECT * FROM l
    """,
    category="analytics",
)
def q_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine table fingerprints: per table the row count, an
    order-independent KEY checksum (sum of Knuth-hashed keys — any
    dropped, duplicated, or corrupted key moves it), and the exact
    value sum in cents — the replication/migration verification row
    a pipeline computes on BOTH sides of every copy. This very
    query's Spark-vs-DuckDB hash match IS the protocol in action.

    Hash sums are commutative, so the checksum is one combinable
    aggregate per table regardless of partitioning or row order; the
    lineitem key folds (orderkey, linenumber) into one integer before
    hashing (linenumber ≤ 7)."""
    oc = F.expr(_OC)
    o = load_table(spark, sf_dir, "orders").agg(
        F.lit("orders").alias("tbl"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.pmod(F.col("o_orderkey").cast("decimal(38,0)") * KNUTH, F.lit(2**32))
        )
        .cast("bigint")
        .alias("key_sum"),
        F.sum(oc).cast("bigint").alias("value_cents"),
    )
    c = load_table(spark, sf_dir, "customer").agg(
        F.lit("customer").alias("tbl"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.pmod(F.col("c_custkey").cast("decimal(38,0)") * KNUTH, F.lit(2**32))
        )
        .cast("bigint")
        .alias("key_sum"),
        F.sum(F.expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
        .cast("bigint")
        .alias("value_cents"),
    )
    li = load_table(spark, sf_dir, "lineitem").agg(
        F.lit("lineitem").alias("tbl"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.pmod(
                (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast(
                    "decimal(38,0)"
                )
                * KNUTH,
                F.lit(2**32),
            )
        )
        .cast("bigint")
        .alias("key_sum"),
        F.sum(F.expr(_LI_CENTS)).cast("bigint").alias("value_cents"),
    )
    return o.unionByName(c).unionByName(li)


# ---------------------------------------------------------------------------
# competing-risks cumulative incidence


@register(
    "q_competing_risks",
    oracle="""
        WITH ranked AS (
            SELECT user_id, event_type, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn,
                   min(date_trunc('week', ts)) OVER (PARTITION BY user_id)
                       AS w0,
                   max(date_trunc('week', ts)) OVER (PARTITION BY user_id)
                       AS w1
            FROM events
        ),
        per AS (
            SELECT user_id, event_type AS last_type,
                   CAST(date_diff('week', w0, w1) AS BIGINT) AS tenure_w
            FROM ranked WHERE rn = 1
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM per),
        haz AS (
            SELECT last_type AS cause, tenure_w,
                   CAST(count(*) AS BIGINT) AS n_exits
            FROM per GROUP BY last_type, tenure_w
        ),
        cum AS (
            SELECT cause, tenure_w, n_exits,
                   sum(n_exits) OVER (PARTITION BY cause ORDER BY tenure_w
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum_exits
            FROM haz
        )
        SELECT cause, CAST(max(tenure_w) AS BIGINT) AS max_week,
               CAST(sum(n_exits) AS BIGINT) AS n_total_exits,
               round(sum(n_exits) * 1.0 / max(nu), 4) AS cif_final
        FROM cum CROSS JOIN tot
        GROUP BY cause
    """,
    category="analytics",
)
def q_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Competing-risks exit analysis: users 'exit' at their last
    active week, attributed to the CAUSE = their final event type
    (error-exits vs purchase-exits are different products' problems);
    per cause the total exits and the final cumulative incidence
    share — CIFs sum to 1 across causes by construction, the identity
    q_churn_hazard's single-cause table can't express.

    The last event per user is the rn=1 row of a per-user
    descending-(ts, event_id) rank (unique order — no max_by struct,
    which DuckDB lacks); the hazard table is cause × tenure-week
    grain (bounded); all windows partition on the user key."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    ranked = e.select(
        "user_id",
        "event_type",
        F.row_number()
        .over(wu.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn"),
        F.date_trunc("week", F.min("ts").over(wu)).alias("w0"),
        F.date_trunc("week", F.max("ts").over(wu)).alias("w1"),
    )
    per = ranked.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("event_type").alias("last_type"),
        (F.datediff(F.col("w1").cast("date"), F.col("w0").cast("date")) / 7)
        .cast("bigint")
        .alias("tenure_w"),
    )
    tot = per.agg(F.count(F.lit(1)).cast("bigint").alias("nu"))
    haz = per.groupBy(F.col("last_type").alias("cause"), "tenure_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exits")
    )
    return (
        haz.crossJoin(F.broadcast(tot))
        .groupBy("cause")
        .agg(
            F.max("tenure_w").cast("bigint").alias("max_week"),
            F.sum("n_exits").cast("bigint").alias("n_total_exits"),
            F.round(F.sum("n_exits") * 1.0 / F.max("nu"), 4).alias("cif_final"),
        )
    )


# ---------------------------------------------------------------------------
# forensic price-ending audit


@register(
    "q_price_endings",
    oracle=f"""
        WITH e AS (
            SELECT {_OC} % 100 AS ending FROM orders
        ),
        c AS (
            SELECT ending, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY ending
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c)
        SELECT CAST(ending AS INT) AS cents_ending, n,
               round(n * 100.0 / nn, 4) AS pct,
               round(n * 100.0 / nn - 1.0, 4) AS excess_vs_uniform
        FROM c CROSS JOIN tot
        ORDER BY n DESC, ending ASC
        LIMIT 10
    """,
    category="analytics",
)
def q_price_endings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forensic price-ending audit: the 10 most common cents endings
    of order totals against the uniform 1% baseline — psychological
    pricing shows up as .99/.95 spikes, fabricated amounts as .00
    spikes (the round-number heuristic auditors pair with q_benford's
    leading-digit test; endings catch what leading digits can't).

    The ending is integer mod 100; the distribution is one combinable
    aggregate over a 100-value domain; the board is a TakeOrdered on
    exact counts with an ending tie-break."""
    e = load_table(spark, sf_dir, "orders").select(
        F.expr(f"{_OC} % 100").alias("ending")
    )
    c = e.groupBy("ending").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("nn"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.col("ending").cast("int").alias("cents_ending"),
            "n",
            F.round(F.col("n") * 100.0 / F.col("nn"), 4).alias("pct"),
            F.round(F.col("n") * 100.0 / F.col("nn") - 1.0, 4).alias(
                "excess_vs_uniform"
            ),
        )
        .orderBy(F.col("n").desc(), F.col("cents_ending").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# source vocabulary uniqueness


@register(
    "q_source_uniqueness",
    oracle="""
        WITH tok AS (
            SELECT DISTINCT source, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        spread AS (
            SELECT term, CAST(count(*) AS BIGINT) AS n_sources
            FROM tok GROUP BY term
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS vocab,
               CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS exclusive_terms,
               round(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 4) AS exclusive_share,
               round(avg(n_sources * 1.0), 4) AS avg_spread
        FROM tok JOIN spread USING (term)
        GROUP BY source
    """,
    category="llm-text",
)
def q_source_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What does each source UNIQUELY contribute? Per source: its
    vocabulary, the terms found nowhere else (exclusive share — the
    marginal value of keeping this source in the mix), and the mean
    spread of its terms across sources. The data-buying complement of
    q_source_vocab_overlap's pairwise view: overlap says who
    duplicates whom, this says who is irreplaceable.

    (source, term) dedups once; term spread is a combinable count at
    vocab grain joined back at vocab grain; per-source rollups
    combinable — token streams never cross the wire twice."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    spread = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources")
    )
    j = tok.join(spread, "term")
    excl = F.when(F.col("n_sources") == 1, 1).otherwise(0)
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(excl).cast("bigint").alias("exclusive_terms"),
        F.round(F.sum(excl) * 1.0 / F.count(F.lit(1)), 4).alias("exclusive_share"),
        F.round(F.avg(F.col("n_sources") * 1.0), 4).alias("avg_spread"),
    )


# ---------------------------------------------------------------------------
# return-rate trend


@register(
    "q_return_rate_trend",
    oracle="""
        WITH mo AS (
            SELECT date_trunc('month', l_shipdate) AS m,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ret
            FROM lineitem GROUP BY date_trunc('month', l_shipdate)
        ),
        keyed AS (
            SELECT n, n_ret,
                   CAST(date_diff('month', DATE '1992-01-01', CAST(m AS DATE))
                        AS BIGINT) AS mi
            FROM mo
        )
        SELECT CAST(count(*) AS BIGINT) AS n_months,
               CAST(sum(n_ret) AS BIGINT) AS n_returned,
               round(sum(n_ret) * 1.0 / sum(n), 4) AS overall_rate,
               round(regr_slope(n_ret * 1.0 / n, mi * 1.0) * 12, 6)
                   AS rate_trend_per_year
        FROM keyed
    """,
    category="analytics",
)
def q_return_rate_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate trend: the monthly share of returned line items and
    its least-squares slope (annualized) — is product quality /
    fulfillment drifting? The classic operations KPI trend, and a
    rate-over-time regression shape (per-month ratios regressed on a
    month index) distinct from q_yoy_growth's level comparison.

    The monthly rollup absorbs line grain (combinable conditional
    counts); the month index is an integer date_diff; the regression
    is one combinable regr_slope over the calendar-bounded month
    table."""
    mo = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("m"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("n_ret"),
        )
    )
    keyed = mo.select(
        "n",
        "n_ret",
        F.months_between(F.col("m").cast("date"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("mi"),
    )
    return keyed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("n_ret").cast("bigint").alias("n_returned"),
        F.round(F.sum("n_ret") * 1.0 / F.sum("n"), 4).alias("overall_rate"),
        F.round(
            F.expr("regr_slope(n_ret * 1.0 / n, mi * 1.0)") * 12, 6
        ).alias("rate_trend_per_year"),
    )


# ---------------------------------------------------------------------------
# character-bigram entropy


@register(
    "q_char_bigram_entropy",
    oracle="""
        WITH big AS (
            SELECT lang,
                   unnest(list_transform(
                       range(1, greatest(length(text) - 1, 0) + 1),
                       i -> substr(text, CAST(i AS INT), 2))) AS bg
            FROM documents
        ),
        cnt AS (
            SELECT lang, bg, CAST(count(*) AS BIGINT) AS n
            FROM big GROUP BY lang, bg
        ),
        tot AS (
            SELECT lang, CAST(sum(n) AS BIGINT) AS nn,
                   CAST(count(*) AS BIGINT) AS n_bigrams
            FROM cnt GROUP BY lang
        )
        SELECT cnt.lang, n_bigrams, nn AS n_chars_pairs,
               round(sum(-(n * 1.0 / nn) * ln(n * 1.0 / nn)), 4)
                   AS h_char_bigram,
               round(sum(-(n * 1.0 / nn) * ln(n * 1.0 / nn))
                     / ln(n_bigrams * 1.0), 4) AS h_normalized
        FROM cnt JOIN tot ON cnt.lang = tot.lang
        GROUP BY cnt.lang, n_bigrams, nn
    """,
    category="llm-text",
)
def q_char_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram entropy per language — the
    compression-estimate / language-complexity statistic (Shannon's
    printed-English measurement): H over the character-pair
    distribution plus the normalized H/ln(support). Low values mean
    repetitive character structure — the CHARACTER-level complement
    of q_token_entropy (tokens) and q_repetition_ratio (n-grams), and
    a cheap proxy for how well the corpus will compress.

    Overlapping char pairs explode per row (O(len) each), collapse
    immediately to (lang, bigram) counts — only the bounded bigram
    alphabet crosses the wire; entropy is a combinable sum over that
    grid."""
    d = load_table(spark, sf_dir, "documents")
    bg = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 1, F.lit(0))),
            lambda i: F.substring(F.col("text"), 0, 0).alias("_")  # replaced below
        )
    )
    # substring with a dynamic start needs expr-form (F.substring takes
    # literal positions only)
    big = d.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 1, 0)),"
                " i -> substring(text, i, 2))"
            )
        ).alias("bg"),
    )
    cnt = big.groupBy("lang", "bg").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cnt.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
    )
    p = F.col("n") * 1.0 / F.col("nn")
    return (
        cnt.join(F.broadcast(tot), "lang")
        .groupBy("lang", "n_bigrams", F.col("nn").alias("n_chars_pairs"))
        .agg(
            F.round(F.sum(-p * F.log(p)), 4).alias("h_char_bigram"),
            F.round(
                F.sum(-p * F.log(p)) / F.log(F.col("n_bigrams") * 1.0), 4
            ).alias("h_normalized"),
        )
        .select(
            "lang", "n_bigrams", "n_chars_pairs", "h_char_bigram", "h_normalized"
        )
    )


# ---------------------------------------------------------------------------
# price stickiness


@register(
    "q_price_stickiness",
    oracle=f"""
        WITH mo AS (
            SELECT l_partkey AS pk, date_trunc('month', l_shipdate) AS m,
                   CAST(sum({_LI_CENTS}) AS BIGINT) AS cents,
                   CAST(sum({_LI_QTY}) AS BIGINT) AS q
            FROM lineitem GROUP BY l_partkey, date_trunc('month', l_shipdate)
        ),
        pr AS (
            SELECT pk, m, cents * 1.0 / q AS p,
                   lag(cents * 1.0 / q) OVER (PARTITION BY pk ORDER BY m)
                       AS p_prev
            FROM mo
        ),
        chg AS (
            SELECT pk,
                   CAST(count(*) AS BIGINT) AS n_trans,
                   CAST(sum(CASE WHEN abs(p - p_prev) * 50 > p_prev
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
            FROM pr WHERE p_prev IS NOT NULL GROUP BY pk
            HAVING count(*) >= 3
        )
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(n_trans) AS BIGINT) AS n_transitions,
               round(sum(n_changes) * 1.0 / sum(n_trans), 4) AS change_rate,
               round(sum(n_trans) * 1.0 / nullif(sum(n_changes), 0), 2)
                   AS avg_spell_months
        FROM chg
    """,
    category="analytics",
)
def q_price_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price stickiness: how often a part's monthly unit price moves
    by more than 2% — the menu-cost statistic (change frequency and
    its reciprocal, the average price-spell duration) from the
    macro/pricing literature; q_price_index asks how much prices
    moved, this asks how OFTEN.

    Unit prices are float divisions of exact monthly integer sums
    (identical per row); the 2% gate is the cross-multiplied integer
    form |Δp|·50 > p_prev — no epsilon. The lag window partitions on
    the PART key over the month rollup; rollups combinable."""
    mo = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.date_trunc("month", F.col("l_shipdate")).alias("m"),
        )
        .agg(
            F.sum(F.expr(_LI_CENTS)).cast("bigint").alias("cents"),
            F.sum(F.expr(_LI_QTY)).cast("bigint").alias("q"),
        )
    )
    w = Window.partitionBy("pk").orderBy("m")
    p = F.col("cents") * 1.0 / F.col("q")
    pr = mo.select("pk", p.alias("p"), F.lag(p).over(w).alias("p_prev"))
    chg = (
        pr.filter(F.col("p_prev").isNotNull())
        .groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trans"),
            F.sum(
                F.when(
                    F.abs(F.col("p") - F.col("p_prev")) * 50 > F.col("p_prev"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_changes"),
        )
        .filter(F.col("n_trans") >= 3)
    )
    return chg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("n_trans").cast("bigint").alias("n_transitions"),
        F.round(F.sum("n_changes") * 1.0 / F.sum("n_trans"), 4).alias("change_rate"),
        F.round(
            F.sum("n_trans") * 1.0 / F.nullif(F.sum("n_changes"), F.lit(0)), 2
        ).alias("avg_spell_months"),
    )


# ---------------------------------------------------------------------------
# empirical-Bayes mean shrinkage


@register(
    "q_eb_shrinkage",
    oracle="""
        WITH per AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS s,
                   CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
            FROM documents GROUP BY source HAVING count(*) > 1
        ),
        g AS (
            SELECT CAST(sum(n) AS BIGINT) AS ng,
                   CAST(sum(s) AS BIGINT) AS sg,
                   CAST(count(*) AS BIGINT) AS k,
                   sum((ss - s * 1.0 * s / n) / (n - 1) / n) AS avg_sem2,
                   sum((s * 1.0 / n) * (s * 1.0 / n)) AS sum_mean2,
                   sum(s * 1.0 / n) AS sum_mean
            FROM per
        ),
        tau AS (
            SELECT ng, sg, k,
                   greatest((sum_mean2 - sum_mean * sum_mean / k) / (k - 1)
                            - avg_sem2 / k, 0.0) AS tau2,
                   avg_sem2 / k AS mean_sem2,
                   sum_mean / k AS grand
            FROM g
        )
        SELECT per.source, per.n,
               round(per.s * 1.0 / per.n, 2) AS raw_mean,
               round(tau2 / (tau2 + (per.ss - per.s * 1.0 * per.s / per.n)
                                    / (per.n - 1) / per.n), 4) AS weight,
               round((tau2 / (tau2 + (per.ss - per.s * 1.0 * per.s / per.n)
                                     / (per.n - 1) / per.n)) * (per.s * 1.0 / per.n)
                     + (1 - tau2 / (tau2 + (per.ss - per.s * 1.0 * per.s / per.n)
                                           / (per.n - 1) / per.n)) * grand, 2)
                   AS shrunk_mean
        FROM per CROSS JOIN tau
    """,
    category="llm-pipeline",
)
def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-source mean document length:
    each source's mean is pulled toward the grand mean with weight
    w = τ²/(τ² + SEM²), where the between-source variance τ² is the
    method-of-moments estimate (variance of raw means minus average
    sampling variance, clamped at 0). The principled version of
    q_target_encoding's fixed-strength smoothing: small/noisy sources
    shrink hard, big ones barely move — the standard fix for
    leaderboards of unevenly-sampled groups.

    Per-source integer moments in one pass; the grand-mean/τ² scalars
    are a 1-row broadcast; weights and shrunk means are identical
    float expressions of exact integers."""
    per = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("n_chars").cast("bigint").alias("s"),
            F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("ss"),
        )
        .filter(F.col("n") > 1)
    )
    mean = F.col("s") * 1.0 / F.col("n")
    sem2 = (
        (F.col("ss") - F.col("s") * 1.0 * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
        / F.col("n")
    )
    g = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(sem2).alias("avg_sem2"),
        F.sum(mean * mean).alias("sum_mean2"),
        F.sum(mean).alias("sum_mean"),
    )
    tau2 = F.greatest(
        (F.col("sum_mean2") - F.col("sum_mean") * F.col("sum_mean") / F.col("k"))
        / (F.col("k") - 1)
        - F.col("avg_sem2") / F.col("k"),
        F.lit(0.0),
    )
    tau = g.select(
        tau2.alias("tau2"), (F.col("sum_mean") / F.col("k")).alias("grand")
    )
    w = F.col("tau2") / (F.col("tau2") + sem2)
    return per.crossJoin(F.broadcast(tau)).select(
        "source",
        "n",
        F.round(mean, 2).alias("raw_mean"),
        F.round(w, 4).alias("weight"),
        F.round(w * mean + (1 - w) * F.col("grand"), 2).alias("shrunk_mean"),
    )
