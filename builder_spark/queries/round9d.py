"""Round-9 surface growth, batch 5: constrained allocation
(water-filling with caps), nonparametric inference (Wald–Wolfowitz
runs test, Mann–Whitney U with tie correction), association strength
(Cramér's V), model-evaluation gains/lift tables, resampling-free
jackknife variance, ordinal-pattern (permutation) entropy,
Simpson's-paradox detection, additive seasonal decomposition, and
boilerplate-prefix detection on the documents table.

Design rules (same as the rest of the graded surface):
- integer-exact cores wherever possible (counts, cents via the
  repo-standard ``CAST(round(x * 100) AS BIGINT)``); floats only
  through one identical expression tree on both engines, then
  ``round(·, 4)``;
- deterministic total orders under every window/rank (tie-break on a
  unique key);
- scale-shaped plans: per-entity windows partition on the entity key
  over day-grain rollups, exact global deciles ride
  ``stitched_running`` (never a single-partition NTILE), global
  scalars travel as 1-row broadcast cross joins, and the only
  empty-partition frames run over constant-bounded aggregates
  (25 nations / 10 deciles / the calendar day table) — each is
  whitelisted with its grain in tests/test_window_audit.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.partitioning import ntile_from_rank, stitched_running
from builder_spark.registry import register

#: repo-standard exact-cents encodings (identical text on both engines)
_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"
_AC = "CAST(round(c_acctbal * 100) AS BIGINT)"


def _region_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(region × day) order counts — the shared day-grain rollup for
    the runs-test / permutation-entropy series queries. Dimension
    joins (customer→nation→region) broadcast; the aggregate is
    map-side combinable on (r_name, day)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("day", F.col("o_orderdate")).alias("d")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "d")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_REGION_DAILY_SQL = """
        SELECT r_name, date_trunc('day', o_orderdate) AS d, count(*) AS cnt
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, date_trunc('day', o_orderdate)
"""


# ---------------------------------------------------------------------------
# water-filling allocation with caps


@register(
    "q_capped_allocation",
    oracle="""
        WITH base AS (
            SELECT c_nationkey AS nk, count(*) AS w,
                   sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS cap
            FROM customer GROUP BY c_nationkey
        ),
        tot AS (
            SELECT sum(w) AS tw, sum(cap) AS tc, (sum(cap) * 4) // 5 AS b
            FROM base
        ),
        rk AS (
            SELECT nk, w, cap, tw, tc, b,
                   cap * 1.0 / w AS r,
                   row_number() OVER (ORDER BY cap * 1.0 / w, nk) AS idx,
                   sum(cap) OVER (ORDER BY cap * 1.0 / w, nk
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cumcap,
                   sum(w) OVER (ORDER BY cap * 1.0 / w, nk
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cumw
            FROM base CROSS JOIN tot
        ),
        flag AS (
            SELECT *,
                   CASE WHEN tw > cumw
                             AND r <= (b - cumcap) * 1.0 / (tw - cumw)
                        THEN 1 ELSE 0 END AS bind
            FROM rk
        ),
        kv AS (
            SELECT coalesce(max(CASE WHEN bind = 1 THEN idx END), 0) AS k
            FROM flag
        ),
        ts AS (
            SELECT coalesce(
                       max(CASE WHEN idx = k
                                THEN (b - cumcap) * 1.0 / (tw - cumw) END),
                       max(b * 1.0 / tw)) AS t
            FROM flag CROSS JOIN kv
        )
        SELECT n_name AS nation,
               CAST(w AS BIGINT) AS w, CAST(cap AS BIGINT) AS cap,
               CAST(CASE WHEN idx <= k THEN 1 ELSE 0 END AS INT) AS binding,
               round(CASE WHEN idx <= k THEN cap * 1.0 ELSE t * w END, 4)
                   AS alloc
        FROM flag CROSS JOIN kv CROSS JOIN ts
        JOIN nation ON nk = n_nationkey
    """,
    category="analytics",
)
def q_capped_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling budget allocation with per-group caps — the
    classic constrained-proportional-share problem (quota systems,
    bandwidth allocation, sampling budgets): distribute a global
    budget B across nations proportionally to demand weight w_i, but
    never above the nation's capacity cap_i; budget freed by capped
    groups flows to the rest. Closed form, no iteration: sort groups
    by cap_i/w_i ascending; the binding set is the maximal prefix
    where r_i ≤ t_i with t_i = (B − cumcap_i)/(W − cumw_i), and the
    water level t* = t_k makes Σ min(cap_i, t*·w_i) = B exactly.

    Exactness: w/cap/B are integers; every ratio is one float
    division of exact integers — bit-identical cross-engine, so the
    binding comparison and the final allocation agree exactly (then
    round 4). Scale: the customer scan aggregates to nation grain
    (combinable); the ordered window runs over 25 nation rows
    (whitelisted bounded frame); B/W/C travel as a 1-row broadcast."""
    base = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("w"),
            F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0)).alias("cap"),
        )
    )
    tot = base.agg(
        F.sum("w").alias("tw"),
        F.sum("cap").alias("tc"),
        F.expr("(sum(cap) * 4) div 5").alias("b"),
    )
    rk_w = Window.orderBy(F.col("r"), F.col("nk"))
    cum_w = rk_w.rowsBetween(Window.unboundedPreceding, 0)
    rk = (
        base.crossJoin(F.broadcast(tot))
        .withColumn("r", F.col("cap") * 1.0 / F.col("w"))
        .withColumn("idx", F.row_number().over(rk_w))
        .withColumn("cumcap", F.sum("cap").over(cum_w))
        .withColumn("cumw", F.sum("w").over(cum_w))
    )
    flag = rk.withColumn(
        "bind",
        F.when(
            (F.col("tw") > F.col("cumw"))
            & (
                F.col("r")
                <= (F.col("b") - F.col("cumcap")) * 1.0 / (F.col("tw") - F.col("cumw"))
            ),
            1,
        ).otherwise(0),
    )
    kv = flag.agg(
        F.coalesce(F.max(F.when(F.col("bind") == 1, F.col("idx"))), F.lit(0)).alias("k")
    )
    ts = (
        flag.crossJoin(F.broadcast(kv))
        .agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("idx") == F.col("k"),
                        (F.col("b") - F.col("cumcap"))
                        * 1.0
                        / (F.col("tw") - F.col("cumw")),
                    )
                ),
                F.max(F.col("b") * 1.0 / F.col("tw")),
            ).alias("t")
        )
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        flag.crossJoin(F.broadcast(kv))
        .crossJoin(F.broadcast(ts))
        .join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("w").cast("bigint").alias("w"),
            F.col("cap").cast("bigint").alias("cap"),
            F.when(F.col("idx") <= F.col("k"), 1).otherwise(0).cast("int").alias("binding"),
            F.round(
                F.when(F.col("idx") <= F.col("k"), F.col("cap") * 1.0).otherwise(
                    F.col("t") * F.col("w")
                ),
                4,
            ).alias("alloc"),
        )
    )


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test


@register(
    "q_runs_test",
    oracle=f"""
        WITH daily AS ({_REGION_DAILY_SQL}),
        diffs AS (
            SELECT r_name, d,
                   cnt - lag(cnt) OVER (PARTITION BY r_name ORDER BY d) AS df
            FROM daily
        ),
        ud AS (
            SELECT r_name, d, CASE WHEN df > 0 THEN 1 ELSE 0 END AS up
            FROM diffs WHERE df IS NOT NULL AND df <> 0
        ),
        rr AS (
            SELECT r_name, up,
                   CASE WHEN lag(up) OVER (PARTITION BY r_name ORDER BY d)
                             IS DISTINCT FROM up
                        THEN 1 ELSE 0 END AS new_run
            FROM ud
        ),
        s AS (
            SELECT r_name,
                   CAST(sum(up) AS BIGINT) AS n_up,
                   CAST(count(*) - sum(up) AS BIGINT) AS n_down,
                   CAST(sum(new_run) AS BIGINT) AS runs
            FROM rr GROUP BY r_name
        )
        SELECT r_name, n_up, n_down, runs,
               round(CASE WHEN n_up > 0 AND n_down > 0
                               AND (n_up + n_down) > 1
                     THEN (runs - (1 + 2.0 * n_up * n_down / (n_up + n_down)))
                          / sqrt((2.0 * n_up * n_down)
                                 * (2.0 * n_up * n_down - (n_up + n_down))
                                 / ((n_up + n_down) * (n_up + n_down) * 1.0
                                    * (n_up + n_down - 1)))
                     ELSE NULL END, 4) AS z
        FROM s
    """,
    category="analytics",
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of each region's daily
    order-count direction: day-over-day up/down signs (zeros dropped),
    count of sign runs, and the normal-approximation z statistic
    z = (R − μ)/σ with μ = 1 + 2·n₁n₂/n and
    σ² = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)). A significantly small R means
    trending (momentum), large R means oscillation.

    Exactness: the series is integer counts, so signs and run counts
    are exact; z is one identical float expression over three exact
    integers. Scale: windows partition on region over the day-grain
    rollup (calendar-bounded per region — whitelisted low-card
    window); the rollup itself is map-side combinable."""
    daily = _region_daily_orders(spark, sf_dir)
    w = Window.partitionBy("r_name").orderBy("d")
    ud = (
        daily.withColumn("df", F.col("cnt") - F.lag("cnt").over(w))
        .filter(F.col("df").isNotNull() & (F.col("df") != 0))
        .withColumn("up", F.when(F.col("df") > 0, 1).otherwise(0))
    )
    rr = ud.withColumn(
        "new_run",
        F.when(~F.lag("up").over(w).eqNullSafe(F.col("up")), 1).otherwise(0),
    )
    s = rr.groupBy("r_name").agg(
        F.sum("up").cast("bigint").alias("n_up"),
        (F.count(F.lit(1)) - F.sum("up")).cast("bigint").alias("n_down"),
        F.sum("new_run").cast("bigint").alias("runs"),
    )
    n_up, n_down, runs = F.col("n_up"), F.col("n_down"), F.col("runs")
    n = n_up + n_down
    z = (runs - (F.lit(1) + F.lit(2.0) * n_up * n_down / n)) / F.sqrt(
        (F.lit(2.0) * n_up * n_down)
        * (F.lit(2.0) * n_up * n_down - n)
        / (n * n * F.lit(1.0) * (n - F.lit(1)))
    )
    return s.select(
        "r_name",
        "n_up",
        "n_down",
        "runs",
        F.round(
            F.when((n_up > 0) & (n_down > 0) & (n > 1), z).otherwise(F.lit(None)), 4
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Cramér's V association strength


@register(
    "q_cramers_v",
    oracle="""
        WITH cells AS (
            SELECT c_nationkey AS nk, c_mktsegment AS seg, count(*) AS n
            FROM customer GROUP BY c_nationkey, c_mktsegment
        ),
        rt AS (SELECT nk, sum(n) AS rtot FROM cells GROUP BY nk),
        ct AS (SELECT seg, sum(n) AS ctot FROM cells GROUP BY seg),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM cells),
        lv AS (
            SELECT (SELECT count(*) FROM rt) AS r_levels,
                   (SELECT count(*) FROM ct) AS c_levels
        ),
        obs AS (
            SELECT g.rtot, g.ctot, coalesce(c.n, 0) AS o
            FROM (SELECT * FROM rt CROSS JOIN ct) g
            LEFT JOIN cells c ON g.nk = c.nk AND g.seg = c.seg
        ),
        chi AS (
            SELECT sum((o - rtot * ctot * 1.0 / n)
                       * (o - rtot * ctot * 1.0 / n)
                       / (rtot * ctot * 1.0 / n)) AS chi2
            FROM obs CROSS JOIN tot
        )
        SELECT n, CAST(r_levels AS BIGINT) AS r_levels,
               CAST(c_levels AS BIGINT) AS c_levels,
               round(chi2, 4) AS chi2,
               round(sqrt(chi2 / (n * (least(r_levels, c_levels) - 1))), 4)
                   AS cramers_v
        FROM chi CROSS JOIN tot CROSS JOIN lv
    """,
    category="analytics",
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1]-normalized association strength between
    two categoricals (nation × market segment), √(χ²/(n·(min(r,c)−1))).
    Unlike raw χ² (q_chisq_independence's statistic on another pair),
    V is comparable across tables of different shape — the standard
    feature-redundancy screen in feature stores.

    The χ² includes EMPTY cells (observed 0 still contributes its
    expectation): the cell grid is the cross of the row/column
    marginals — a 25×5 broadcast cross of two tiny aggregates, with
    observed counts left-joined in. All marginals are integers;
    expected counts and χ² terms are one identical float expression.
    No windows at all — aggregates and broadcast joins only."""
    cells = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rt = cells.groupBy("nk").agg(F.sum("n").alias("rtot"))
    ct = cells.groupBy("seg").agg(F.sum("n").alias("ctot"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("n"))
    lv = rt.agg(F.count(F.lit(1)).alias("r_levels")).crossJoin(
        F.broadcast(ct.agg(F.count(F.lit(1)).alias("c_levels")))
    )
    grid = rt.crossJoin(F.broadcast(ct))
    obs = grid.join(F.broadcast(cells), ["nk", "seg"], "left").select(
        "rtot", "ctot", F.coalesce(F.col("n"), F.lit(0)).alias("o")
    )
    e = F.col("rtot") * F.col("ctot") * 1.0 / F.col("n")
    chi = (
        obs.crossJoin(F.broadcast(tot))
        .agg(F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2"))
    )
    return (
        chi.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(lv))
        .select(
            "n",
            F.col("r_levels").cast("bigint").alias("r_levels"),
            F.col("c_levels").cast("bigint").alias("c_levels"),
            F.round(F.col("chi2"), 4).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / F.when(  # ANSI /0 guard: 1x1 contingency table
                        F.col("n") * (F.least("r_levels", "c_levels") - F.lit(1))
                        != 0,
                        F.col("n") * (F.least("r_levels", "c_levels") - F.lit(1)),
                    )
                ),
                4,
            ).alias("cramers_v"),
        )
    )


# ---------------------------------------------------------------------------
# gains / lift table


@register(
    "q_gains_table",
    oracle=f"""
        WITH lab AS (
            SELECT c_custkey, {_AC} AS cents,
                   CASE WHEN coalesce(o.n, 0) >= 3 THEN 1 ELSE 0 END AS pos
            FROM customer LEFT JOIN (
                SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
            ) o ON c_custkey = o_custkey
        ),
        d AS (
            SELECT pos,
                   ntile(10) OVER (ORDER BY cents DESC, c_custkey) AS decile
            FROM lab
        ),
        agg AS (
            SELECT decile, count(*) AS n, sum(pos) AS n_pos
            FROM d GROUP BY decile
        ),
        tot AS (SELECT sum(n) * 1.0 AS tn, sum(n_pos) * 1.0 AS tp FROM agg)
        SELECT CAST(decile AS INT) AS decile,
               CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
               round(n_pos * 1.0 / n, 4) AS pos_rate,
               round(sum(n_pos) OVER (ORDER BY decile
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) / tp, 4) AS cum_capture,
               round((n_pos * 1.0 / n) / (tp / tn), 4) AS lift
        FROM agg CROSS JOIN tot
    """,
    category="analytics",
)
def q_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table — the model-evaluation staple: rank
    customers by a score (account balance, desc), split into exact
    global deciles, and report per decile the positive rate (label =
    placed ≥ 3 orders), cumulative capture of all positives, and lift
    over the base rate.

    The exact global NTILE(10) is the scale trap: a naive window
    sorts the world in one reducer. Here the rank comes from
    ``stitched_running`` over (−cents, custkey) — range-exchange +
    local windows + a partition-count offsets frame — and the tile
    from closed-form ``ntile_from_rank``; the only empty-partition
    window left runs over the 10 decile rows (whitelisted). The
    label join is a key-grain aggregate joined on custkey."""
    ords = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_ord"))
    )
    lab = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", F.expr(_AC).alias("cents"))
        .join(ords, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "cents",
            F.when(F.coalesce(F.col("n_ord"), F.lit(0)) >= 3, 1).otherwise(0).alias("pos"),
            (-F.col("cents")).alias("neg_cents"),
        )
    )
    ranked = stitched_running(
        lab, ["neg_cents", "c_custkey"], rank_name="rn", with_totals=True
    )
    agg = (
        ranked.withColumn("decile", ntile_from_rank(10, "rn", "rn_total"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos"))
    )
    tot = agg.agg(
        (F.sum("n") * 1.0).alias("tn"), (F.sum("n_pos") * 1.0).alias("tp")
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        agg.crossJoin(F.broadcast(tot))
        .withColumn("cum_pos", F.sum("n_pos").over(w_cum))
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("n").cast("bigint").alias("n"),
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.round(F.col("n_pos") * 1.0 / F.col("n"), 4).alias("pos_rate"),
            # ANSI /0 guards: a no-positives corpus has tp == 0
            F.round(
                F.col("cum_pos") / F.when(F.col("tp") != 0, F.col("tp")), 4
            ).alias("cum_capture"),
            F.round(
                (F.col("n_pos") * 1.0 / F.col("n"))
                / F.when(F.col("tp") != 0, F.col("tp") / F.col("tn")),
                4,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Mann–Whitney U (rank-sum) test


@register(
    "q_mann_whitney_u",
    oracle=f"""
        WITH s AS (
            SELECT {_OC} AS cents,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ga
            FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        v AS (SELECT cents, sum(ga) AS n_a, count(*) AS tot FROM s GROUP BY cents),
        r AS (
            SELECT n_a, tot,
                   sum(tot) OVER (ORDER BY cents
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum_tot
            FROM v
        ),
        agg AS (
            SELECT sum(n_a * ((cum_tot - tot + 1) + (tot - 1) / 2.0)) AS r1,
                   sum(n_a) AS n1, sum(tot - n_a) AS n2,
                   sum(tot * tot * tot - tot) AS tsum
            FROM r
        )
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               round(r1 - n1 * (n1 + 1) / 2.0, 1) AS u1,
               round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                     / sqrt(n1 * n2 / 12.0
                            * ((n1 + n2 + 1)
                               - tsum * 1.0 / ((n1 + n2) * (n1 + n2 - 1.0)))),
                     4) AS z
        FROM agg
    """,
    category="analytics",
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test with tie correction:
    do URGENT and LOW priority orders draw from the same price
    distribution? U₁ = R₁ − n₁(n₁+1)/2 from the urgent group's
    average-rank sum, z against μ = n₁n₂/2 and the tie-corrected
    σ² = (n₁n₂/12)·[(n+1) − Σ(t³−t)/(n(n−1))]. The nonparametric
    sibling of q_welch_ttest — no normality assumption.

    The scale shape: prices collapse to VALUE grain first (exact
    cents, combinable counts per group), average ranks come from one
    stitched running count over the value order — never a global
    per-row rank — and the rest is a single aggregate. Average ranks
    are exact .5-multiples and every partial sum stays < 2⁵³, so R₁
    is order-independent and bit-identical cross-engine."""
    s = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.expr(_OC).alias("cents"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("ga"),
        )
    )
    v = s.groupBy("cents").agg(
        F.sum("ga").alias("n_a"), F.count(F.lit(1)).alias("tot")
    )
    r = stitched_running(v, ["cents"], running={"cum_tot": "tot"})
    avg_rank = (F.col("cum_tot") - F.col("tot") + 1) + (F.col("tot") - 1) / F.lit(2.0)
    agg = r.agg(
        F.sum(F.col("n_a") * avg_rank).alias("r1"),
        F.sum("n_a").alias("n1"),
        F.sum(F.col("tot") - F.col("n_a")).alias("n2"),
        F.sum(F.col("tot") * F.col("tot") * F.col("tot") - F.col("tot")).alias("tsum"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = F.col("r1") - n1 * (n1 + 1) / F.lit(2.0)
    z = (u1 - n1 * n2 / F.lit(2.0)) / F.sqrt(
        n1 * n2 / F.lit(12.0)
        * ((n1 + n2 + 1) - F.col("tsum") * 1.0 / ((n1 + n2) * (n1 + n2 - F.lit(1.0))))
    )
    return agg.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        F.round(u1, 1).alias("u1"),
        F.round(z, 4).alias("z"),
    )


# ---------------------------------------------------------------------------
# delete-one-group jackknife


@register(
    "q_jackknife_variance",
    oracle=f"""
        WITH per AS (
            SELECT n_name, sum({_OC}) AS s_i, count(*) AS n_i
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        ),
        tot AS (SELECT sum(s_i) AS s, sum(n_i) AS n, count(*) AS g FROM per),
        th AS (
            SELECT n_name, (s - s_i) / ((n - n_i) * 100.0) AS theta
            FROM per CROSS JOIN tot
        ),
        bar AS (SELECT avg(theta) AS tb FROM th),
        ss AS (
            SELECT sum((theta - tb) * (theta - tb)) AS ssq
            FROM th CROSS JOIN bar
        )
        SELECT CAST(g AS BIGINT) AS g,
               round(s / (n * 100.0), 4) AS theta_full,
               round(tb, 4) AS theta_jack_mean,
               round(sqrt((g - 1.0) / g * ssq), 4) AS se_jack
        FROM tot CROSS JOIN bar CROSS JOIN ss
    """,
    category="analytics",
)
def q_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife standard error for a ratio metric
    (mean order value in dollars): θ₍ᵢ₎ recomputed with nation i's
    orders removed, SE² = (g−1)/g · Σ(θ₍ᵢ₎ − θ̄)². The block-jackknife
    is the cluster-robust uncertainty estimate for pipeline metrics
    where rows within a group are correlated — and unlike the
    bootstrap (q_poisson_bootstrap) it is deterministic and needs
    exactly one pass over group-grain sums.

    Every leave-one-out value is CLOSED-FORM from the per-group
    (Σcents, n) — integer-exact — so no resampling and no O(g·N)
    recomputation: the whole statistic is 25 group rows + two 1-row
    broadcast aggregates."""
    per = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(F.expr(_OC)).alias("s_i"), F.count(F.lit(1)).alias("n_i"))
    )
    tot = per.agg(
        F.sum("s_i").alias("s"), F.sum("n_i").alias("n"), F.count(F.lit(1)).alias("g")
    )
    th = per.crossJoin(F.broadcast(tot)).select(
        "n_name",
        (  # ANSI /0 guard: leave-one-out of a single-group corpus
            (F.col("s") - F.col("s_i"))
            / F.when(
                F.col("n") != F.col("n_i"),
                (F.col("n") - F.col("n_i")) * F.lit(100.0),
            )
        ).alias("theta"),
    )
    bar = th.agg(F.avg("theta").alias("tb"))
    ss = (
        th.crossJoin(F.broadcast(bar))
        .agg(F.sum((F.col("theta") - F.col("tb")) * (F.col("theta") - F.col("tb"))).alias("ssq"))
    )
    return (
        tot.crossJoin(F.broadcast(bar))
        .crossJoin(F.broadcast(ss))
        .select(
            F.col("g").cast("bigint").alias("g"),
            # ANSI /0 guards: empty corpus (n == 0, g == 0)
            F.round(
                F.col("s") / F.when(F.col("n") != 0, F.col("n") * F.lit(100.0)), 4
            ).alias("theta_full"),
            F.round(F.col("tb"), 4).alias("theta_jack_mean"),
            F.round(
                F.sqrt(
                    (F.col("g") - F.lit(1.0))
                    / F.when(F.col("g") != 0, F.col("g"))
                    * F.col("ssq")
                ),
                4,
            ).alias("se_jack"),
        )
    )


# ---------------------------------------------------------------------------
# permutation (ordinal-pattern) entropy


@register(
    "q_permutation_entropy",
    oracle=f"""
        WITH daily AS ({_REGION_DAILY_SQL}),
        tr AS (
            SELECT r_name, cnt AS a,
                   lead(cnt, 1) OVER (PARTITION BY r_name ORDER BY d) AS b,
                   lead(cnt, 2) OVER (PARTITION BY r_name ORDER BY d) AS c
            FROM daily
        ),
        pat AS (
            SELECT r_name,
                   4 * (CASE WHEN a <= b THEN 1 ELSE 0 END)
                   + 2 * (CASE WHEN a <= c THEN 1 ELSE 0 END)
                   + (CASE WHEN b <= c THEN 1 ELSE 0 END) AS p
            FROM tr WHERE c IS NOT NULL
        ),
        cnts AS (SELECT r_name, p, count(*) AS c FROM pat GROUP BY r_name, p),
        tot AS (SELECT r_name, sum(c) AS nw, count(*) AS np FROM cnts GROUP BY r_name),
        e AS (
            SELECT cnts.r_name,
                   sum(-(c * 1.0 / nw) * ln(c * 1.0 / nw)) AS h
            FROM cnts JOIN tot ON cnts.r_name = tot.r_name
            GROUP BY cnts.r_name
        )
        SELECT t.r_name, CAST(nw AS BIGINT) AS n_windows,
               CAST(np AS BIGINT) AS n_patterns,
               round(h / ln(6), 4) AS pe
        FROM tot t JOIN e ON t.r_name = e.r_name
    """,
    category="analytics",
)
def q_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (Bandt–Pompe, order 3) of each region's
    daily order-count series: slide a 3-sample window, map each to
    its ordinal pattern (ties broken toward the earlier index, the
    standard convention), and report the Shannon entropy of the
    6-pattern distribution normalized by ln 6 — 1.0 for white noise,
    low for regular/trending dynamics. The complexity measure that,
    unlike autocorrelation (q_autocorrelation), is invariant to any
    monotone transform of the series.

    Integer comparisons make every pattern exact; the entropy is a
    ≤6-term identical float sum per region. Windows partition on
    region over the day-grain rollup (calendar-bounded, whitelisted
    low-card window); pattern counting is a combinable aggregate."""
    daily = _region_daily_orders(spark, sf_dir)
    w = Window.partitionBy("r_name").orderBy("d")
    tr = daily.select(
        "r_name",
        F.col("cnt").alias("a"),
        F.lead("cnt", 1).over(w).alias("b"),
        F.lead("cnt", 2).over(w).alias("c"),
    ).filter(F.col("c").isNotNull())
    pat = tr.select(
        "r_name",
        (
            4 * F.when(F.col("a") <= F.col("b"), 1).otherwise(0)
            + 2 * F.when(F.col("a") <= F.col("c"), 1).otherwise(0)
            + F.when(F.col("b") <= F.col("c"), 1).otherwise(0)
        ).alias("p"),
    )
    cnts = pat.groupBy("r_name", "p").agg(F.count(F.lit(1)).alias("c"))
    tot = cnts.groupBy("r_name").agg(
        F.sum("c").alias("nw"), F.count(F.lit(1)).alias("np")
    )
    pr = F.col("c") * 1.0 / F.col("nw")
    e = (
        cnts.join(tot, "r_name")
        .groupBy("r_name")
        .agg(F.sum(-pr * F.log(pr)).alias("h"))
    )
    return tot.join(e, "r_name").select(
        "r_name",
        F.col("nw").cast("bigint").alias("n_windows"),
        F.col("np").cast("bigint").alias("n_patterns"),
        F.round(F.col("h") / F.log(F.lit(6.0)), 4).alias("pe"),
    )


# ---------------------------------------------------------------------------
# Simpson's paradox screen


@register(
    "q_simpson_check",
    oracle=f"""
        WITH spend AS (
            SELECT o_custkey, sum({_OC}) / 100.0 AS y
            FROM orders GROUP BY o_custkey
        ),
        pts AS (
            SELECT n_name, c_acctbal AS x, y
            FROM spend
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
        ),
        per AS (
            SELECT n_name, regr_slope(y, x) AS slope, count(*) AS n_pts
            FROM pts GROUP BY n_name
        ),
        pool AS (SELECT regr_slope(y, x) AS pooled FROM pts)
        SELECT n_name, CAST(n_pts AS BIGINT) AS n_pts,
               round(slope, 4) AS slope,
               round(pooled, 4) AS pooled_slope,
               CAST(CASE WHEN slope * pooled < 0
                              AND abs(slope) > 1e-6 AND abs(pooled) > 1e-6
                    THEN 1 ELSE 0 END AS INT) AS sign_flip
        FROM per CROSS JOIN pool
    """,
    category="analytics",
)
def q_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: the pooled regression slope of
    customer spend vs account balance against each nation's
    within-group slope, flagging groups whose sign disagrees with
    the pooled trend — the aggregation-reversal hazard every
    segment-level metric rollup needs to check before reporting a
    'global' effect.

    Spend is exact cents → dollars; slopes use the engines' native
    ``regr_slope`` (both compute the same population moments — the
    q_regression family pins cross-engine agreement) and the flag
    carries a 1e-6 dead-zone so it can never flip on float dust.
    Shape: one key-grain aggregate, one broadcast dim join, two
    combinable regression aggregates, a 1-row broadcast cross."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg((F.sum(F.expr(_OC)) / F.lit(100.0)).alias("y"))
    )
    pts = (
        spend.join(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_nationkey", F.col("c_acctbal").alias("x")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "x", "y")
    )
    per = pts.groupBy("n_name").agg(
        F.expr("regr_slope(y, x)").alias("slope"), F.count(F.lit(1)).alias("n_pts")
    )
    pool = pts.agg(F.expr("regr_slope(y, x)").alias("pooled"))
    return per.crossJoin(F.broadcast(pool)).select(
        "n_name",
        F.col("n_pts").cast("bigint").alias("n_pts"),
        F.round(F.col("slope"), 4).alias("slope"),
        F.round(F.col("pooled"), 4).alias("pooled_slope"),
        F.when(
            (F.col("slope") * F.col("pooled") < 0)
            & (F.abs(F.col("slope")) > 1e-6)
            & (F.abs(F.col("pooled")) > 1e-6),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("sign_flip"),
    )


# ---------------------------------------------------------------------------
# additive seasonal decomposition


@register(
    "q_seasonal_decompose",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', o_orderdate) AS d, count(*) AS cnt
            FROM orders GROUP BY date_trunc('day', o_orderdate)
        ),
        tr AS (
            SELECT d, cnt, sum(cnt) OVER w AS s7, count(*) OVER w AS c7
            FROM daily
            WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        det AS (
            SELECT date_diff('day', DATE '1970-01-01', CAST(d AS DATE)) % 7
                       AS dow,
                   cnt - s7 / 7.0 AS det
            FROM tr WHERE c7 = 7
        )
        SELECT CAST(dow AS INT) AS dow,
               CAST(count(*) AS BIGINT) AS n_days,
               round(avg(det), 4) AS seasonal,
               round(avg(abs(det)), 4) AS mean_abs_det
        FROM det GROUP BY dow
    """,
    category="analytics",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily order-count
    series, classical moving-average form: trend = centered 7-row
    moving average (full windows only), detrended = count − trend,
    and the weekly seasonal component = mean detrended value per
    day-of-week (epoch-day mod 7 — an engine-neutral weekday that
    dodges the dayofweek()/isodow() convention split). mean_abs_det
    bounds how much of the signal the weekly component can explain.

    The trend window is row-based over the global DAY table —
    calendar-bounded grain (whitelisted); counts are integers so
    every detrended value is the same exact int − int/7.0 expression
    on both engines."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    det = (
        daily.withColumn("s7", F.sum("cnt").over(w7))
        .withColumn("c7", F.count(F.lit(1)).over(w7))
        .filter(F.col("c7") == 7)
        .select(
            (F.datediff(F.col("d").cast("date"), F.lit("1970-01-01").cast("date")) % 7).alias(
                "dow"
            ),
            (F.col("cnt") - F.col("s7") / F.lit(7.0)).alias("det"),
        )
    )
    return det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.avg("det"), 4).alias("seasonal"),
        F.round(F.avg(F.abs(F.col("det"))), 4).alias("mean_abs_det"),
    ).select(
        F.col("dow").cast("int").alias("dow"), "n_days", "seasonal", "mean_abs_det"
    )


# ---------------------------------------------------------------------------
# boilerplate-prefix detection


@register(
    "q_boilerplate_prefix",
    oracle="""
        WITH p AS (
            SELECT doc_id, source,
                   md5(lower(regexp_replace(substring(text, 1, 80),
                                            '\\s+', ' ', 'g'))) AS k
            FROM documents
        ),
        g AS (SELECT k, count(*) AS grp_n FROM p GROUP BY k)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT p.k) AS BIGINT) AS n_prefixes,
               CAST(sum(CASE WHEN grp_n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boiler_docs,
               round(sum(CASE WHEN grp_n >= 2 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS boiler_rate
        FROM p JOIN g ON p.k = g.k
        GROUP BY source
    """,
    category="llm-dedup",
)
def q_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix detection — the training-data cleaning op
    that catches shared headers/templates (license banners, scraped
    nav chrome) which full-document dedup misses: normalize each
    document's first 80 chars (lowercase, whitespace-collapsed),
    fingerprint with md5, and report per source how many documents
    share their prefix with at least one other document.

    Documents never move — only 32-hex prefix keys do. The group
    size joins back on the md5 key (uniform by construction, no
    skew), and the per-source rollup is a combinable aggregate with
    one exact distinct count over the key space."""
    p = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(
            F.lower(F.regexp_replace(F.substring(F.col("text"), 1, 80), r"\s+", " "))
        ).alias("k"),
    )
    g = p.groupBy("k").agg(F.count(F.lit(1)).alias("grp_n"))
    boiler = F.when(F.col("grp_n") >= 2, 1).otherwise(0)
    return (
        p.join(g, "k")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("k").cast("bigint").alias("n_prefixes"),
            F.sum(boiler).cast("bigint").alias("n_boiler_docs"),
            F.round(F.sum(boiler) * 1.0 / F.count(F.lit(1)), 4).alias("boiler_rate"),
        )
    )
