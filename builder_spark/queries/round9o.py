"""Round-9 surface growth, batch 16 (final): forecast combination,
absorbing-state expected time via unrolled value iteration, revenue
decile migration (rank mobility), and peak-weekday alignment.

Design rules (unchanged): day/decile rollups absorb fact grain;
value iteration is unrolled over the bounded 5×5 transition grid with
broadcast iterates (k more rounds would never rescan the data);
stitched ranks for the year deciles; one identical float expression
per statistic, rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.partitioning import ntile_from_rank, stitched_running
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"


# ---------------------------------------------------------------------------
# forecast combination


@register(
    "q_forecast_combo",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM orders GROUP BY date_trunc('day', o_orderdate)
        ),
        fc AS (
            SELECT cnt,
                   lag(cnt, 1) OVER (ORDER BY d) AS naive,
                   lag(cnt, 7) OVER (ORDER BY d) AS snaive
            FROM daily
        ),
        e AS (
            SELECT cnt, naive, snaive, (naive + snaive) / 2.0 AS combo
            FROM fc WHERE naive IS NOT NULL AND snaive IS NOT NULL
        )
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               round(avg(abs(cnt - naive) * 1.0), 4) AS mae_naive,
               round(avg(abs(cnt - snaive) * 1.0), 4) AS mae_seasonal,
               round(avg(abs(cnt - combo)), 4) AS mae_combo,
               CAST(CASE WHEN avg(abs(cnt - combo))
                              < least(avg(abs(cnt - naive) * 1.0),
                                      avg(abs(cnt - snaive) * 1.0))
                    THEN 1 ELSE 0 END AS INT) AS combo_wins
        FROM e
    """,
    category="analytics",
)
def q_forecast_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forecast-combination puzzle, measured: MAE of the naive
    (yesterday), the seasonal naive (last week), and their simple
    average on daily order counts — the unweighted mean of mediocre
    forecasts routinely beats both parents (the M-competition's most
    replicated finding), and the combo_wins flag records whether it
    does here. The model-selection counterpoint to
    q_mse_decomposition: before building a better model, average the
    ones you have.

    Both base forecasts come from ONE window pass over the
    calendar-bounded day table; errors are exact integers (the combo
    is a .5-multiple); three MAEs in one combinable pass."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.orderBy("d")  # day table (whitelisted)
    fc = daily.select(
        "cnt",
        F.lag("cnt", 1).over(w).alias("naive"),
        F.lag("cnt", 7).over(w).alias("snaive"),
    ).filter(F.col("naive").isNotNull() & F.col("snaive").isNotNull())
    e = fc.withColumn("combo", (F.col("naive") + F.col("snaive")) / 2.0)
    mae_n = F.avg(F.abs(F.col("cnt") - F.col("naive")) * 1.0)
    mae_s = F.avg(F.abs(F.col("cnt") - F.col("snaive")) * 1.0)
    mae_c = F.avg(F.abs(F.col("cnt") - F.col("combo")))
    return e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(mae_n, 4).alias("mae_naive"),
        F.round(mae_s, 4).alias("mae_seasonal"),
        F.round(mae_c, 4).alias("mae_combo"),
        F.when(mae_c < F.least(mae_n, mae_s), 1)
        .otherwise(0)
        .cast("int")
        .alias("combo_wins"),
    )


# ---------------------------------------------------------------------------
# absorbing-state expected time (unrolled value iteration)


_ABS_ROUNDS = 4


@register(
    "q_absorbing_time",
    oracle=f"""
        WITH seq AS (
            SELECT event_type, lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ),
        trans AS (
            SELECT prev, event_type AS cur, CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE prev IS NOT NULL AND prev <> 'purchase'
            GROUP BY prev, event_type
        ),
        prob AS (
            SELECT prev, cur,
                   n * 1.0 / sum(n) OVER (PARTITION BY prev) AS pr
            FROM trans
        ),
        t0 AS (SELECT DISTINCT prev AS s, 0.0 AS t FROM prob),
        {", ".join(
            f'''t{k + 1} AS (
            SELECT p.prev AS s,
                   1 + sum(p.pr * CASE WHEN p.cur = 'purchase' THEN 0.0
                                       ELSE coalesce(tk.t, 0.0) END) AS t
            FROM prob p LEFT JOIN t{k} tk ON p.cur = tk.s
            GROUP BY p.prev
        )''' for k in range(4))}
        SELECT s AS state, round(t, 4) AS expected_steps_lb
        FROM t4
    """,
    category="analytics",
)
def q_absorbing_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected steps to PURCHASE from each event state — four
    unrolled rounds of the absorbing-chain value iteration
    t ← 1 + P·t (t(purchase) = 0), a monotone lower bound that
    converges geometrically. 'How many more actions until this user
    buys, given what they just did' — the planning number behind
    session-depth budgets, and the absorbing-chain companion to
    q_markov_entropy_rate (how predictable) and q_markov2_memory
    (how much context).

    The transition grid is ≤25 rows; conditionals are windows over
    it; each iteration is a broadcast join of the previous 4-row
    iterate against the grid — 100 more rounds would still never
    touch fact data."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    )
    trans = (
        seq.filter(F.col("prev").isNotNull() & (F.col("prev") != "purchase"))
        .groupBy("prev", F.col("event_type").alias("cur"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    prob = trans.select(
        "prev",
        "cur",
        (F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("prev"))).alias("pr"),
    )
    t = prob.select(F.col("prev").alias("s")).distinct().withColumn("t", F.lit(0.0))
    for _ in range(_ABS_ROUNDS):
        t = (
            prob.join(
                F.broadcast(t.select(F.col("s").alias("cur_s"), F.col("t").alias("tk"))),
                F.col("cur") == F.col("cur_s"),
                "left",
            )
            .groupBy(F.col("prev").alias("s"))
            .agg(
                (
                    1
                    + F.sum(
                        F.col("pr")
                        * F.when(F.col("cur") == "purchase", 0.0).otherwise(
                            F.coalesce(F.col("tk"), F.lit(0.0))
                        )
                    )
                ).alias("t")
            )
        )
    return t.select(F.col("s").alias("state"), F.round(F.col("t"), 4).alias("expected_steps_lb"))


# ---------------------------------------------------------------------------
# revenue decile migration (rank mobility)


@register(
    "q_decile_migration",
    oracle=f"""
        WITH per AS (
            SELECT o_custkey AS ck, year(o_orderdate) AS y,
                   CAST(sum({_OC}) AS BIGINT) AS rev
            FROM orders WHERE year(o_orderdate) IN (1995, 1996)
            GROUP BY o_custkey, year(o_orderdate)
        ),
        ranked AS (
            SELECT ck, y, ntile(10) OVER (PARTITION BY y
                                          ORDER BY rev DESC, ck ASC) AS dec
            FROM per
        ),
        j AS (
            SELECT a.dec AS d0, b.dec AS d1
            FROM (SELECT * FROM ranked WHERE y = 1995) a
            JOIN (SELECT * FROM ranked WHERE y = 1996) b ON a.ck = b.ck
        )
        SELECT CAST(count(*) AS BIGINT) AS n_customers,
               round(sum(CASE WHEN d0 = d1 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS stay_rate,
               round(sum(CASE WHEN d1 < d0 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS up_rate,
               round(sum(CASE WHEN d1 > d0 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS down_rate,
               round(avg(abs(d1 - d0) * 1.0), 4) AS mean_abs_move,
               round(corr(d0 * 1.0, d1 * 1.0), 4) AS decile_corr
        FROM j
    """,
    category="analytics",
)
def q_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank mobility: customers' revenue decile in 1995 vs 1996 —
    stay/up/down shares, mean |decile move|, and the decile
    autocorrelation. High stay-rate means the customer hierarchy is
    STRUCTURAL (target the deciles); high churn means last year's
    whales are noise (don't). The longitudinal complement of
    q_topk_drift (top-k sets) and q_pareto_customers (one-period
    concentration) — economists' income-mobility matrix on revenue.

    Per-(customer, year) revenue is one integer aggregate; each
    year's deciles ride the stitched global rank (partitioned per
    year — never a single-reducer NTILE); the migration join is
    customer-grain; all shares integer-exact."""
    per = (
        load_table(spark, sf_dir, "orders")
        .withColumn("y", F.year("o_orderdate"))
        .filter(F.col("y").isin(1995, 1996))
        .groupBy(F.col("o_custkey").alias("ck"), "y")
        .agg(F.sum(F.expr(_OC)).cast("bigint").alias("rev"))
    )
    ranked = stitched_running(
        per.select("ck", "y", (-F.col("rev")).alias("neg_rev")),
        ["neg_rev", "ck"],
        rank_name="rn",
        partition_cols=["y"],
        with_totals=True,
    ).withColumn("dec", ntile_from_rank(10, "rn", "rn_total"))
    a = ranked.filter(F.col("y") == 1995).select("ck", F.col("dec").alias("d0"))
    b = ranked.filter(F.col("y") == 1996).select(
        F.col("ck").alias("ck_b"), F.col("dec").alias("d1")
    )
    j = a.join(b, F.col("ck") == F.col("ck_b"))
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(
            F.sum(F.when(F.col("d0") == F.col("d1"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("stay_rate"),
        F.round(
            F.sum(F.when(F.col("d1") < F.col("d0"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("up_rate"),
        F.round(
            F.sum(F.when(F.col("d1") > F.col("d0"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("down_rate"),
        F.round(F.avg(F.abs(F.col("d1") - F.col("d0")) * 1.0), 4).alias(
            "mean_abs_move"
        ),
        F.round(F.corr(F.col("d0") * 1.0, F.col("d1") * 1.0), 4).alias(
            "decile_corr"
        ),
    )


# ---------------------------------------------------------------------------
# peak-weekday alignment


@register(
    "q_peak_day_alignment",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderpriority AS grp,
                   CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(date_trunc('day', o_orderdate) AS DATE))
                        % 7 AS INT) AS dow,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY grp, 2
        ),
        agg AS (
            SELECT grp, dow, CAST(sum(n) AS BIGINT) AS total
            FROM daily GROUP BY grp, dow
        ),
        peak AS (
            SELECT grp, dow AS peak_dow, total,
                   row_number() OVER (PARTITION BY grp
                                      ORDER BY total DESC, dow ASC) AS rk
            FROM agg
        )
        SELECT CAST(peak_dow AS INT) AS peak_dow,
               CAST(count(*) AS BIGINT) AS n_series,
               round(sum(total) * 1.0 /
                     (SELECT sum(total) FROM agg), 4) AS mass_share
        FROM peak WHERE rk = 1
        GROUP BY peak_dow
    """,
    category="analytics",
)
def q_peak_day_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-weekday alignment: each priority series' busiest weekday
    (epoch-day mod 7 — locale-free) and how many series share each
    peak — aligned peaks mean ONE provisioning calendar serves
    everything; scattered peaks mean per-segment schedules. The
    argmax companion to q_seasonality_strength (is the weekly pattern
    strong) and q_weekday_seasonality (its full profile).

    (series × weekday) is a 35-cell integer grid; the per-series
    argmax is a rank over that grid; the alignment rollup is
    combinable."""
    o = load_table(spark, sf_dir, "orders")
    dow = F.pmod(
        F.datediff(
            F.date_trunc("day", F.col("o_orderdate")).cast("date"),
            F.lit("1970-01-01").cast("date"),
        ),
        F.lit(7),
    ).cast("int")
    agg = o.groupBy(F.col("o_orderpriority").alias("grp"), dow.alias("dow")).agg(
        F.count(F.lit(1)).cast("bigint").alias("total")
    )
    rk = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.col("total").desc(), F.col("dow").asc())
    )
    peak = agg.select("grp", "dow", "total", rk.alias("rk")).filter(F.col("rk") == 1)
    tot = agg.agg(F.sum("total").cast("bigint").alias("gt"))
    return (
        peak.crossJoin(F.broadcast(tot))
        .groupBy(F.col("dow").cast("int").alias("peak_dow"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_series"),
            F.round(F.sum("total") * 1.0 / F.max("gt"), 4).alias("mass_share"),
        )
    )
