"""Operational analytics additions: key-skew diagnostics, day-over-day
movers, cumulative active users, forward-fill (LOCF), exact per-group
medians, and equi-width histograms.

Determinism notes follow the repo conventions: counts and cents are
exact integers; ratios round(·,4) only after division of identical
integers; every ordered selection carries a unique tie-break; windows
run either per-key (user grain) or over bounded day/group aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register


@register(
    "q_skew_metrics",
    oracle="""
        WITH per_key AS (
            SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY l_partkey
        )
        SELECT count(*) AS n_keys,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(max(c) AS BIGINT) AS max_key_rows,
               round(avg(c), 4) AS avg_key_rows,
               round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_key_share,
               round(max(c) / (sum(c) / CAST(count(*) AS DOUBLE)), 4)
                   AS skew_factor
        FROM per_key
    """,
    category="analytics",
)
def q_skew_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic: per-key row counts reduced to the
    numbers that decide a salting/AQE strategy — hottest key's share
    and its multiple of the mean. This is the operator you run BEFORE
    choosing a shuffle plan at 100 TB; one combinable aggregate per
    key, one 1-row reduction, no windows."""
    l = load_table(spark, sf_dir, "lineitem")
    per_key = l.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_key_rows"),
        F.round(F.avg("c"), 4).alias("avg_key_rows"),
        F.round(F.max("c") / F.sum("c").cast("double"), 4).alias("top_key_share"),
        F.round(
            F.max("c") / (F.sum("c") / F.count(F.lit(1)).cast("double")), 4
        ).alias("skew_factor"),
    )


@register(
    "q_day_over_day_movers",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   event_type,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        delta AS (
            SELECT day, event_type, n,
                   lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
            FROM daily
        )
        SELECT day, event_type, n, prev_n,
               CAST(n - prev_n AS BIGINT) AS abs_change,
               round((n - prev_n) / CAST(prev_n AS DOUBLE), 4) AS rel_change
        FROM delta
        WHERE prev_n IS NOT NULL
        ORDER BY abs(n - prev_n) DESC, day ASC, event_type ASC
        LIMIT 10
    """,
    category="analytics",
)
def q_day_over_day_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top day-over-day volume movers per event type — the 'what
    changed yesterday' report. Daily rollup is a combinable aggregate
    (days×types rows); lag + top-10 run over that bounded table with a
    full unique tie-break (abs change, day, type) so the LIMIT is
    deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    delta = daily.withColumn("prev_n", F.lag("n").over(w)).filter(
        F.col("prev_n").isNotNull()
    )
    return (
        delta.select(
            "day",
            "event_type",
            "n",
            "prev_n",
            (F.col("n") - F.col("prev_n")).cast("bigint").alias("abs_change"),
            F.round(
                (F.col("n") - F.col("prev_n")) / F.col("prev_n").cast("double"), 4
            ).alias("rel_change"),
        )
        .orderBy(F.abs(F.col("abs_change")).desc(), F.col("day").asc(), F.col("event_type").asc())
        .limit(10)
    )


@register(
    "q_running_active_users",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS day
            FROM events GROUP BY user_id
        ),
        per_day AS (
            SELECT day, count(*) AS new_users FROM first_seen GROUP BY day
        )
        SELECT day, new_users,
               CAST(sum(new_users) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_users
        FROM per_day
    """,
    category="analytics",
)
def q_running_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — computed the scale-correct
    way: NOT a running COUNT(DISTINCT) window over events (that
    re-scans every prefix), but first-touch attribution (min day per
    user — one combinable agg), then a cumsum over the bounded day
    table. The standard growth-curve query."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date(F.date_trunc("day", F.col("ts")))).alias("day")
    )
    per_day = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


@register(
    "q_ffill_locf",
    oracle="""
        WITH obs AS (
            SELECT event_id, user_id, ts, value,
                   CASE WHEN event_type = 'purchase' THEN value END AS px
            FROM events
        ),
        filled AS (
            SELECT event_id, user_id,
                   last_value(px IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS last_purchase_value
            FROM obs
        )
        SELECT event_id, user_id, round(last_purchase_value, 4) AS last_purchase_value
        FROM filled
        WHERE event_id % 50 = 0 AND last_purchase_value IS NOT NULL
    """,
    category="analytics",
)
def q_ffill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill / last-observation-carried-forward: annotate every
    event with the user's most recent purchase value — the sensor-
    backfill and sparse-feature-propagation primitive. One user-grain
    window (last_value IGNORE NULLS over a unique (ts, event_id)
    order); output sampled to every 50th event id. User grain
    partitions freely at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    px = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.select(
        "event_id",
        "user_id",
        F.last(px, ignorenulls=True).over(w).alias("last_purchase_value"),
    )
    return filled.filter(
        (F.col("event_id") % 50 == 0) & F.col("last_purchase_value").isNotNull()
    ).select(
        "event_id", "user_id", F.round("last_purchase_value", 4).alias("last_purchase_value")
    )


@register(
    "q_group_median_exact",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    category="aggregation",
)
def q_group_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median and p90 (linearly interpolated, the
    quantile_cont / percentile definition both engines share) — the
    per-segment price profile, computed as the stitched RANK SELECTION
    (operators/quantiles.py): 6 groups over fact-grain lineitem would
    otherwise pass through Spark's buffering ``percentile`` aggregate,
    whose value map grows with the distinct-price count. Inputs are
    identical doubles, the interpolation formula is shared, and
    round(·,4) absorbs final-ulp noise."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    l = load_table(spark, sf_dir, "lineitem")
    q = quantile_cont_stitched(
        l, "l_extendedprice", {"median_price": 0.5, "p90_price": 0.9},
        ["l_returnflag", "l_linestatus"],
    )
    return q.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        F.round("median_price", 4).alias("median_price"),
        F.round("p90_price", 4).alias("p90_price"),
    )


@register(
    "q_hist_equiwidth",
    oracle="""
        WITH b AS (
            SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT bucket,
               round(bucket * 25.0, 4) AS lo,
               round((bucket + 1) * 25.0, 4) AS hi,
               count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM b GROUP BY bucket
    """,
    category="analytics",
)
def q_hist_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of purchase values (width 25): the
    profiling/monitoring histogram, computed as a single combinable
    aggregate on floor(value/width) — no sort, no window, scales
    linearly. floor() semantics match across engines (both truncate
    toward −∞ for positive widths); bin edges are exact multiples."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    bucket = F.floor(F.col("value") / 25.0).cast("bigint")
    return (
        ev.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "bucket",
            F.round(F.col("bucket") * 25.0, 4).alias("lo"),
            F.round((F.col("bucket") + 1) * 25.0, 4).alias("hi"),
            "n",
            "sum_value",
        )
    )


@register(
    "q_time_weighted_avg",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000000
                       AS gap_s
            FROM events WINDOW w AS (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        )
        SELECT user_id,
               count(*) AS n_intervals,
               CAST(sum(gap_s) AS BIGINT) AS total_dur_s,
               round(sum(cents * gap_s) / (100.0 * sum(gap_s)), 4) AS twap
        FROM seq
        WHERE gap_s IS NOT NULL
        GROUP BY user_id
        HAVING sum(gap_s) > 0
    """,
    category="analytics",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each observation
    weighted by how long it was current (gap to the next event) — the
    correct average for irregularly sampled series, where the plain
    mean over-weights bursts. Values quantize to exact cents and gaps
    to exact whole seconds (identical epoch-µs arithmetic both
    engines), so the weighted sum is pure int64 and the single
    division rounds once. One user-grain window + one aggregate —
    partitions freely at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_s = F.expr("(unix_micros(_next_ts) - unix_micros(ts)) div 1000000")
    seq = (
        ev.withColumn("_next_ts", F.lead("ts").over(w))
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            gap_s.alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("gap_s").cast("bigint").alias("total_dur_s"),
            F.round(
                F.sum(F.col("cents") * F.col("gap_s"))
                / (F.lit(100.0) * F.sum("gap_s")),
                4,
            ).alias("twap"),
        )
        .filter(F.col("total_dur_s") > 0)
    )


@register(
    "q_session_attribution",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, event_type, value,
                   last_value(CASE WHEN event_type <> 'purchase'
                                   THEN event_type END IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS last_touch
            FROM events
        )
        SELECT last_touch,
               count(*) AS n_purchases,
               round(sum(value), 4) AS attributed_revenue
        FROM seq
        WHERE event_type = 'purchase' AND last_touch IS NOT NULL
        GROUP BY last_touch
    """,
    category="analytics",
)
def q_session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the user's
    most recent PRECEDING non-purchase event type — the marketing
    attribution primitive. One user-grain window with an exclusive
    1-PRECEDING frame (a purchase never attributes to itself, and
    back-to-back purchases attribute to the same earlier touch);
    user grain partitions freely at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        seq.filter((F.col("event_type") == "purchase") & F.col("last_touch").isNotNull())
        .groupBy("last_touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("attributed_revenue"),
        )
    )


@register(
    "q_percentile_by_week",
    oracle="""
        SELECT date_trunc('week', o_orderdate) AS week,
               count(*) AS n,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        FROM orders
        GROUP BY 1
        HAVING count(*) >= 20
    """,
    category="analytics",
)
def q_percentile_by_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly p50/p90 of order value — the time-series distribution
    profile behind latency/price SLO dashboards. Weeks are
    calendar-bounded but a week of data is NOT — so the quantiles are
    grouped stitched rank selections (operators/quantiles.py; the
    offsets table is weeks × partitions rows, still a broadcast).
    Both engines share the linear-interpolation definition; identical
    inputs, one round."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    o = load_table(spark, sf_dir, "orders")
    wk = o.select(
        F.date_trunc("week", F.col("o_orderdate")).alias("week"), "o_totalprice"
    )
    q = quantile_cont_stitched(wk, "o_totalprice", {"p50": 0.5, "p90": 0.9}, ["week"])
    return q.select(
        "week",
        "n",
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
    ).filter(F.col("n") >= 20)


@register(
    "q_winsorized_mean",
    oracle="""
        WITH b AS (
            SELECT quantile_cont(o_totalprice, 0.01) AS lo,
                   quantile_cont(o_totalprice, 0.99) AS hi
            FROM orders
        )
        SELECT count(*) AS n,
               round(avg(o_totalprice), 4) AS raw_mean,
               round(avg(least(greatest(o_totalprice, b.lo), b.hi)), 4)
                   AS winsorized_mean,
               CAST(sum(CASE WHEN o_totalprice < b.lo OR o_totalprice > b.hi
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        FROM orders, b
    """,
    category="analytics",
)
def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean (clip at p1/p99 before averaging) — the robust
    central-tendency metric that survives fat-tailed metrics where a
    plain mean follows the outliers. Two passes: exact percentile
    bounds via the stitched rank selection (a GLOBAL buffering
    percentile over the fact table is the worst case of the
    distinct-value-map hazard), broadcast as one row, then a clipped
    aggregate riding the scan. Both engines share quantile
    interpolation and least/greatest semantics on identical
    doubles."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    o = load_table(spark, sf_dir, "orders")
    bounds = quantile_cont_stitched(
        o, "o_totalprice", {"lo": 0.01, "hi": 0.99}
    ).drop("n")
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    out_of = (F.col("o_totalprice") < F.col("lo")) | (F.col("o_totalprice") > F.col("hi"))
    return o.crossJoin(F.broadcast(bounds)).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("raw_mean"),
        F.round(F.avg(clipped), 4).alias("winsorized_mean"),
        F.sum(F.when(out_of, 1).otherwise(0)).cast("bigint").alias("n_clipped"),
    )


@register(
    "q_weekday_seasonality",
    oracle="""
        WITH t AS (SELECT round(avg(o_totalprice), 4) AS overall FROM orders)
        SELECT CAST(date_part('dow', o_orderdate) AS INT) AS dow,
               count(*) AS n_orders,
               round(avg(o_totalprice), 4) AS avg_price,
               round(avg(o_totalprice) / t.overall, 4) AS seasonality_index
        FROM orders, t
        GROUP BY 1, t.overall
    """,
    category="analytics",
)
def q_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index (per-weekday mean over overall
    mean) — the calendar-pattern readout behind staffing and anomaly
    baselines. DOW normalized to DuckDB's 0=Sunday convention
    (Spark's dayofweek is 1=Sunday → minus 1); index divides two
    rounded averages of identical doubles. 7-row output, one scan +
    broadcast scalar."""
    o = load_table(spark, sf_dir, "orders")
    overall = o.agg(F.round(F.avg("o_totalprice"), 4).alias("overall"))
    return (
        o.crossJoin(F.broadcast(overall))
        .groupBy(
            (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"), "overall"
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.avg("o_totalprice") / F.first("overall"), 4).alias(
                "seasonality_index"
            ),
        )
        .drop("overall")
    )


@register(
    "q_percentile_rank_of_value",
    oracle="""
        WITH g AS (SELECT unnest([10000, 50000, 100000, 200000, 400000]) AS probe_cents),
        n AS (SELECT count(*) AS n FROM orders)
        SELECT g.probe_cents,
               CAST(sum(CASE WHEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                                  <= g.probe_cents THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_below,
               round(sum(CASE WHEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                                   <= g.probe_cents THEN 1 ELSE 0 END)
                     / CAST(any_value(n.n) AS DOUBLE), 4) AS pct_below
        FROM g, n, orders o
        GROUP BY g.probe_cents
    """,
    category="order-stats",
)
def q_percentile_rank_of_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse quantile probe — 'what fraction of orders are at or
    below $X' for a fixed value grid: the ECDF evaluated at chosen
    points (price-ladder and SLO-threshold reporting). Computed as
    conditional sums in ONE scan (no sort, no rank): each probe is a
    pushed-down comparison, so this is the cheap dual of the
    rank-selection quantile queries."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    n_total = o.agg(F.count(F.lit(1)).alias("n"))
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in (10000, 50000, 100000, 200000, 400000)])).alias(
            "probe_cents"
        )
    )
    return (
        o.select(cents.alias("c"))
        .crossJoin(F.broadcast(grid))
        .groupBy("probe_cents")
        .agg(F.sum(F.when(F.col("c") <= F.col("probe_cents"), 1).otherwise(0)).alias("n_below"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "probe_cents",
            F.col("n_below").cast("bigint").alias("n_below"),
            F.round(F.col("n_below") / F.col("n").cast("double"), 4).alias("pct_below"),
        )
    )


@register(
    "q_burstiness",
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   count(*) AS c
            FROM events GROUP BY 1, 2
        ),
        per_user AS (
            -- EXACT integer moments, ONE division each: the engines'
            -- internal avg/var_samp accumulation orders differ at ulp
            -- level, which flips round(,4) for a user landing on a
            -- boundary (surfaced at sf0.1); n*scc - sc*sc is exact
            SELECT user_id,
                   count(*) AS n_days,
                   round(sum(c) / (count(*) * 1.0), 4) AS mean_daily,
                   round((count(*) * sum(c * c) - sum(c) * sum(c))
                         / (count(*) * 1.0 * (count(*) - 1)), 4) AS var_daily,
                   round((count(*) * sum(c * c) - sum(c) * sum(c))
                         / ((count(*) - 1) * 1.0 * sum(c)), 4) AS fano
            FROM daily GROUP BY user_id
            HAVING count(*) >= 5
        )
        SELECT user_id, n_days, mean_daily, var_daily, fano
        FROM per_user
    """,
    category="analytics",
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness (Fano factor: variance/mean of daily event
    counts) — Poisson-like users sit near 1, bots and batch scripts
    blow past it; the standard traffic-shape screen. Two combinable
    aggregates (user×day, then user). Moments are EXACT integer sums
    with one division each (n·Σc² − (Σc)² form) — the engines' builtin
    avg/var_samp accumulate in different orders, and at sf0.1 a user
    landed within that ulp drift of a round(,4) boundary. User grain
    partitions freely."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    n = F.count(F.lit(1))
    sc = F.sum("c")
    scc = F.sum(F.col("c") * F.col("c"))
    return (
        daily.groupBy("user_id")
        .agg(
            n.alias("n_days"),
            F.round(sc / (n * 1.0), 4).alias("mean_daily"),
            F.round((n * scc - sc * sc) / (n * 1.0 * (n - 1)), 4).alias(
                "var_daily"
            ),
            F.round((n * scc - sc * sc) / ((n - 1) * 1.0 * sc), 4).alias("fano"),
        )
        .filter(F.col("n_days") >= 5)
    )
