"""Time-series and query-shape additions: linear-interpolation gap
fill, year-over-year growth, LATERAL per-group top-n, null-preserving
explode_outer, and weighted median.

Determinism notes: the interpolation grid uses integer epoch-day
arithmetic (no datediff sign ambiguity); the weighted-median cumsum
runs over a UNIQUE total order (price, orderkey, linenumber) so both
engines add doubles in the same sequence; YoY ratios round after the
division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register


@register(
    "q_interpolate",
    oracle="""
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   CAST(round(sum(value) * 100) AS BIGINT) AS vc
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ),
        bounds AS (
            SELECT min(day) AS lo, max(day) AS hi FROM daily
        ),
        spine AS (
            SELECT u.user_id, d.day
            FROM (SELECT DISTINCT user_id FROM daily) u
            CROSS JOIN (
                SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
                FROM bounds
            ) d
        ),
        g AS (
            SELECT s.user_id, s.day,
                   date_diff('day', DATE '1970-01-01', CAST(s.day AS DATE)) AS dnum,
                   daily.vc
            FROM spine s LEFT JOIN daily
              ON daily.user_id = s.user_id AND daily.day = s.day
        ),
        ff AS (
            SELECT user_id, day, dnum, vc,
                   last_value(vc IGNORE NULLS) OVER w_prev AS pv,
                   last_value(CASE WHEN vc IS NOT NULL THEN dnum END IGNORE NULLS)
                       OVER w_prev AS pd,
                   first_value(vc IGNORE NULLS) OVER w_next AS nv,
                   first_value(CASE WHEN vc IS NOT NULL THEN dnum END IGNORE NULLS)
                       OVER w_next AS nd
            FROM g
            WINDOW w_prev AS (PARTITION BY user_id ORDER BY dnum
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   w_next AS (PARTITION BY user_id ORDER BY dnum
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, day,
               CASE WHEN vc IS NOT NULL THEN vc
                    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                        (pv * (nd - dnum) + nv * (dnum - pd)) // (nd - pd)
               END AS v_filled_cents,
               (vc IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS interpolated
        FROM ff
    """,
    category="analytics",
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a per-user daily spine: purchase-value
    gaps are filled by the straight line between the nearest known
    days; leading/trailing gaps stay null. Built from two
    IGNORE-NULLS window passes (forward last, backward first) over the
    zero-filled spine — no self-join, no per-gap scan. At 100 TB the
    spine join shuffles on user_id once and the windows reuse that
    partitioning.

    Exactness discipline: values are interpolated in integer CENTS
    with floor division — fixture values carry 2 decimals, so the
    cent totals are exact integers in both engines and the weighted
    average (pv·(nd−d) + nv·(d−pd)) div (nd−pd) involves zero float
    operations. (A float formulation flaked at a round(·,4) boundary:
    engines disagree on half-way rounding of an ulp-noisy quotient.)"""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.round(F.sum("value") * 100).cast("long").alias("vc"))
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    spine = daily.select("user_id").distinct().crossJoin(F.broadcast(days))
    g = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.datediff(F.col("day").cast("date"), F.lit("1970-01-01").cast("date")).alias("dnum"),
        "vc",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("dnum")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("dnum")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ff = g.select(
        "user_id",
        "day",
        "dnum",
        "vc",
        F.last("vc", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(F.when(F.col("vc").isNotNull(), F.col("dnum")), ignorenulls=True)
        .over(w_prev)
        .alias("pd"),
        F.first("vc", ignorenulls=True).over(w_next).alias("nv"),
        F.first(F.when(F.col("vc").isNotNull(), F.col("dnum")), ignorenulls=True)
        .over(w_next)
        .alias("nd"),
    )
    interp = F.expr("(pv * (nd - dnum) + nv * (dnum - pd)) div (nd - pd)")
    return ff.select(
        "user_id",
        "day",
        F.when(F.col("vc").isNotNull(), F.col("vc"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .alias("v_filled_cents"),
        (F.col("vc").isNull() & F.col("pv").isNotNull() & F.col("nv").isNotNull()).alias(
            "interpolated"
        ),
    )


@register(
    "q_yoy_growth",
    oracle="""
        WITH yearly AS (
            SELECT o_orderpriority, year(o_orderdate) AS yr,
                   sum(o_totalprice) AS rev
            FROM orders
            GROUP BY 1, 2
        )
        SELECT o_orderpriority, yr,
               round(rev, 4) AS revenue,
               round(100.0 * (rev - lag(rev) OVER w) / lag(rev) OVER w, 4)
                   AS yoy_pct
        FROM yearly
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY yr)
    """,
    category="analytics",
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per order priority — the lag-based
    growth metric every BI layer needs. First year's growth is null.
    One shuffle for the yearly aggregate; the lag window runs over the
    ≤|priorities|×|years| aggregate. The ratio rounds AFTER division
    of full-precision sums (same-ulp inputs: each year's rev is summed
    in engine order, hence the round on revenue too)."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").alias("yr")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.partitionBy("o_orderpriority").orderBy("yr")
    return yearly.select(
        "o_orderpriority",
        "yr",
        F.round("rev", 4).alias("revenue"),
        F.round(
            100.0 * (F.col("rev") - F.lag("rev").over(w)) / F.lag("rev").over(w), 4
        ).alias("yoy_pct"),
    )


@register(
    "q_lateral_topn",
    oracle="""
        SELECT n.n_name, t.c_name, t.bal
        FROM nation n,
        LATERAL (
            SELECT c_name, round(c_acctbal, 4) AS bal
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey ASC
            LIMIT 2
        ) t
    """,
    category="join",
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: per nation, its top-2 customers by
    balance. Exercises the lateral-join query shape (Spark plans it as
    a rewritten window/join — LateralJoin in the analyzer) rather than
    the explicit row_number formulation graded in
    ``q_window_topk_group``. Ties broken on c_custkey so the LIMIT is
    total-ordered."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_lt_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lt_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.bal
        FROM _lt_nation n,
        LATERAL (
            SELECT c_name, round(c_acctbal, 4) AS bal
            FROM _lt_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey ASC
            LIMIT 2
        ) t
        """
    )


@register(
    "q_explode_outer",
    oracle="""
        SELECT p.p_partkey, u.g
        FROM part p
        LEFT JOIN LATERAL (
            SELECT unnest(regexp_extract_all(p.p_name, 'gear')) AS g
        ) u ON true
    """,
    category="scalar/array",
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode: parts whose name contains no 'gear'
    matches still emit one row with a NULL match — the OUTER variant's
    whole point (an inner explode silently drops them, the classic
    fan-out data-loss bug). Spark ``explode_outer`` ≡ DuckDB
    LEFT JOIN LATERAL unnest."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.explode_outer(F.regexp_extract_all(F.col("p_name"), F.lit("gear"), 0)).alias("g"),
    )


@register(
    "q_weighted_median",
    oracle="""
        WITH w AS (
            SELECT l_returnflag, l_extendedprice, l_quantity,
                   sum(l_quantity) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
                   sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
            FROM lineitem
        )
        SELECT l_returnflag,
               round(min(l_extendedprice), 4) AS weighted_median
        FROM w
        WHERE cw >= tw / 2
        GROUP BY l_returnflag
    """,
    category="aggregation",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the first price
    whose cumulative weight reaches half the total. The running sum
    uses a UNIQUE total order (price, orderkey, linenumber) so both
    engines accumulate doubles in the same sequence — bit-identical
    cumsums; quantities are exact-integer doubles so tw/2 is exact.
    One shuffle on the group key serves both windows and the final
    min-aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    return (
        l.select(
            "l_returnflag",
            "l_extendedprice",
            F.sum("l_quantity").over(w_cum).alias("cw"),
            F.sum("l_quantity").over(w_tot).alias("tw"),
        )
        .filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("l_extendedprice"), 4).alias("weighted_median"))
    )


@register(
    "q_sequence_islands",
    oracle="""
        WITH f AS (
            SELECT o_orderkey AS k,
                   row_number() OVER (ORDER BY o_orderkey) AS rn
            FROM orders WHERE o_orderstatus = 'F'
        ),
        isl AS (
            SELECT k, k - rn AS grp FROM f
        )
        SELECT min(k) AS island_start,
               max(k) AS island_end,
               count(*) AS island_len
        FROM isl
        GROUP BY grp
    """,
    category="analytics",
)
def q_sequence_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive o_orderkey values
    among finished orders, via the classic key-minus-row_number
    grouping trick (consecutive keys share k − rn). One global sort
    window then one aggregate; at 100 TB the global row_number is the
    scale concern — per-partition islands with boundary stitching is
    the distributed variant, noted here because the fixture's key
    space is dense enough for the single window to dominate anyway.
    All-integer arithmetic — no float discipline needed."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    w = Window.orderBy("o_orderkey")
    return (
        o.select(F.col("o_orderkey").alias("k"), F.row_number().over(w).alias("rn"))
        .select("k", (F.col("k") - F.col("rn")).alias("grp"))
        .groupBy("grp")
        .agg(
            F.min("k").alias("island_start"),
            F.max("k").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .drop("grp")
    )


@register(
    "q_gini_concentration",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(round(sum(o_totalprice) * 100) AS BIGINT) // 100
                       AS rev_dollars
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT rev_dollars AS x,
                   row_number() OVER (ORDER BY rev_dollars, o_custkey) AS i,
                   count(*) OVER () AS n,
                   sum(rev_dollars) OVER () AS s0
            FROM per_cust
        )
        SELECT CAST(any_value(n) AS INT) AS n_customers,
               any_value(s0) AS total_dollars,
               (2 * sum(i * x) - (any_value(n) + 1) * any_value(s0)) * 10000
                   // (any_value(n) * any_value(s0)) AS gini_bp
        FROM ranked
    """,
    category="analytics",
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration, in basis
    points. The whole computation is EXACT integer arithmetic: revenue
    → exact cents → floor-dollars, ranks are a unique total order,
    and Gini = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) stays in BIGINT with a
    final integer division ×10⁴ — no float op anywhere, so no
    rounding-boundary risk. Dollar resolution keeps Σi·xᵢ·10⁴ < 2⁶³
    through sf0.1 (at larger n, shift to HUGEINT/decimal or block the
    rank-weighted sum per range partition)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.expr("cast(round(sum(o_totalprice) * 100) as bigint) div 100").alias("rev_dollars")
    )
    w_rank = Window.orderBy("rev_dollars", "o_custkey")
    w_all = Window.partitionBy()
    ranked = per_cust.select(
        F.col("rev_dollars").alias("x"),
        F.row_number().over(w_rank).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("rev_dollars").over(w_all).alias("s0"),
    )
    return ranked.agg(
        F.any_value("n").cast("int").alias("n_customers"),
        F.any_value("s0").alias("total_dollars"),
        F.expr(
            "(2 * sum(i * x) - (any_value(n) + 1) * any_value(s0)) * 10000"
            " div (any_value(n) * any_value(s0))"
        ).alias("gini_bp"),
    )


@register(
    "q_ohlc_hourly",
    oracle="""
        WITH e AS (
            SELECT date_trunc('hour', ts) AS hour, value, ts, event_id
            FROM events WHERE event_type = 'purchase'
        ),
        rn AS (
            SELECT hour, value,
                   row_number() OVER (PARTITION BY hour
                                      ORDER BY ts ASC, event_id ASC) AS rn_a,
                   row_number() OVER (PARTITION BY hour
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM e
        )
        SELECT hour,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               count(*) AS volume
        FROM rn
        GROUP BY hour
    """,
    category="analytics",
)
def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick rollup: hourly open/high/low/close/volume of
    purchase values — the time-series downsampling shape (financial
    bars, metric rollups). Open/close come from row_number over the
    total order (ts, event_id) — not argmin on a possibly-tied
    timestamp — so both engines pick identical rows; the two
    row_numbers share one hour-partitioned sort. Every output is a raw
    value, min/max, or count: zero float accumulation, no rounding
    discipline needed."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    e = e.select(F.date_trunc("hour", F.col("ts")).alias("hour"), "value", "ts", "event_id")
    w_a = Window.partitionBy("hour").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_d = Window.partitionBy("hour").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn_a", F.row_number().over(w_a))
        .withColumn("rn_d", F.row_number().over(w_d))
        .groupBy("hour")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
    )


@register(
    "q_skyline",
    oracle="""
        SELECT p.p_partkey, p.p_name,
               round(p.p_retailprice, 4) AS p_retailprice, p.p_size
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size <= p.p_size
              AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
        )
    """,
    category="analytics",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto front): parts not dominated on (price low, size
    low) — the multi-criteria shortlist operator. Implemented as a
    window sweep, not the naive O(n²) self-join the oracle states:
    aggregate per price group (min size), running-min over strictly
    cheaper groups, then keep rows at their group's min size that beat
    every cheaper group — an O(n log n) plan whose only heavy op is
    one sort over |distinct prices|. A row above its own group's min
    size is dominated at equal price; a group whose min doesn't
    undercut all cheaper groups is dominated outright. Price
    comparisons are raw doubles on both engines (same values, same
    comparisons — no arithmetic)."""
    p = load_table(spark, sf_dir, "part")
    grp_min = p.groupBy("p_retailprice").agg(F.min("p_size").alias("_gmin"))
    w_prev = (
        Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_min = grp_min.withColumn("_pmin", F.min("_gmin").over(w_prev))
    return (
        p.join(prev_min, "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("_gmin"))
            & (F.col("_pmin").isNull() | (F.col("_gmin") < F.col("_pmin")))
        )
        .select(
            "p_partkey",
            "p_name",
            F.round("p_retailprice", 4).alias("p_retailprice"),
            "p_size",
        )
    )


@register(
    "q_benford",
    oracle="""
        WITH c AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS n
            FROM orders WHERE o_totalprice > 0
        ),
        d AS (
            SELECT CAST(substr(CAST(n AS VARCHAR), 1, 1) AS INT) AS digit
            FROM c
        ),
        agg AS (
            SELECT digit, count(*) AS cnt, sum(count(*)) OVER () AS total
            FROM d GROUP BY digit
        )
        SELECT digit, cnt,
               round(cnt / CAST(total AS DOUBLE), 4) AS observed_p,
               round(ln(1.0 + 1.0 / digit) / ln(10.0), 4) AS benford_p
        FROM agg
    """,
    category="analytics",
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen: first-digit distribution of order totals
    vs the ln(1+1/d)/ln(10) expectation — the classic fraud /
    synthetic-data detector. The leading digit comes from the INTEGER
    cents value's string form (integer→string is exact on both
    engines; float→string formatting is NOT and is never used). One
    aggregate over 9 digit groups plus an empty-frame total; ratios
    round after division of identical integers."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    n = F.round(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(n.cast("string"), 1, 1).cast("int")
    w_all = Window.partitionBy()
    agg = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("total", F.sum("cnt").over(w_all))
    )
    return agg.select(
        "digit",
        "cnt",
        F.round(F.col("cnt") / F.col("total").cast("double"), 4).alias("observed_p"),
        F.round(F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)), 4).alias("benford_p"),
    )


@register(
    "q_null_semantics",
    oracle="""
        WITH t AS (
            SELECT c_custkey,
                   CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal,
                   nullif(c_mktsegment, 'BUILDING') AS seg
            FROM customer
        )
        SELECT count(*) AS n_rows,
               count(bal) AS n_bal,
               count(DISTINCT seg) AS n_seg_distinct,
               CAST(sum(CASE WHEN seg IS NOT DISTINCT FROM NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_null_seg,
               CAST(sum(CASE WHEN (bal > 5000.0) IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown_pred,
               round(avg(bal), 4) AS avg_bal_nonnull,
               bool_or(bal IS NULL) AS any_null_bal,
               (SELECT count(*) FROM (SELECT seg FROM t GROUP BY seg))
                   AS n_groups_incl_null
        FROM t
    """,
    category="subquery",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI null-semantics battery, pinned in one row: count(col) skips
    nulls while count(*) doesn't; count(DISTINCT) ignores the null;
    GROUP BY collects all nulls into ONE group; aggregates ignore
    nulls; three-valued logic makes (null > x) UNKNOWN; null-safe
    comparison (<=> / IS NOT DISTINCT FROM) treats null = null as
    true. An engine that diverges on any of these silently corrupts
    every downstream query — this is the canary."""
    t = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("bal"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
    )
    t.createOrReplaceTempView("_ns_t")
    return spark.sql(
        """
        SELECT count(*) AS n_rows,
               count(bal) AS n_bal,
               count(DISTINCT seg) AS n_seg_distinct,
               CAST(sum(CASE WHEN seg <=> NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_seg,
               CAST(sum(CASE WHEN (bal > 5000.0) IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_unknown_pred,
               round(avg(bal), 4) AS avg_bal_nonnull,
               bool_or(bal IS NULL) AS any_null_bal,
               (SELECT count(*) FROM (SELECT seg FROM _ns_t GROUP BY seg))
                   AS n_groups_incl_null
        FROM _ns_t
        """
    )
