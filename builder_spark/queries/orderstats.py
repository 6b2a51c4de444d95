"""Fact-grain order statistics — exact global quantiles, deciles, and
rank fractions computed WITHOUT a single-partition sort.

These are the queries that make the stitched-rank primitive
(``operators/partitioning.py::stitched_running``) a first-class
operator: every global ``ORDER BY`` here runs as range-partitioned
local ranks + broadcast prefix offsets, so the same plan computes an
exact median over 100 TB of rows. Values quantize to exact integer
cents before ranking — rank selection and tile arithmetic are then
pure int64, bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.partitioning import ntile_from_rank, stitched_running
from builder_spark.registry import register

_LI_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_O_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


@register(
    "q_decile_stats",
    oracle=f"""
        WITH c AS (
            SELECT {_LI_CENTS} AS cents, l_orderkey, l_linenumber FROM lineitem
        ),
        r AS (
            SELECT cents,
                   ntile(10) OVER (ORDER BY cents, l_orderkey, l_linenumber)
                       AS decile
            FROM c
        )
        SELECT decile, count(*) AS n,
               CAST(min(cents) AS BIGINT) AS min_cents,
               CAST(max(cents) AS BIGINT) AS max_cents,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM r GROUP BY decile
    """,
    category="order-stats",
)
def q_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile stats of line-item price over the FULL fact table —
    the feature-binning / monotone-calibration primitive. ntile(10) is
    reproduced exactly from a stitched global rank plus closed-form
    tile arithmetic (first N%10 deciles get one extra row); no stage
    ever sorts more than one range partition.

    TIE-INSENSITIVE: rows with equal cents are interchangeable for
    per-decile count/min/max/sum of cents (whichever tied row straddles
    a decile boundary, both deciles see the same value), so the oracle's
    (l_orderkey, l_linenumber) tie-break need not ride the shuffle —
    ranking on cents alone halves the shuffle width and sorts one key."""
    l = load_table(spark, sf_dir, "lineitem")
    sel = l.select(F.expr(_LI_CENTS).alias("cents"))
    ranked = stitched_running(sel, ["cents"], rank_name="rn", with_totals=True)
    return (
        ranked.withColumn("decile", ntile_from_rank(10, "rn", "rn_total"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").alias("sum_cents"),
        )
    )


@register(
    "q_global_median_exact",
    oracle=f"""
        WITH c AS (SELECT {_O_CENTS} AS cents, o_orderkey FROM orders),
        r AS (
            SELECT cents,
                   row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
                   count(*) OVER () AS n
            FROM c
        )
        SELECT round(avg(cents) / 100.0, 4) AS median_price,
               CAST(any_value(n) AS BIGINT) AS n_orders
        FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
    """,
    category="order-stats",
)
def q_global_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median (not approx) of order value at fact grain:
    stitched rank + broadcast count, then select the middle row (odd n)
    or average the two middle rows (even n). The standard exact-median-
    at-scale recipe — an order-statistic SELECTION, so only rank
    arithmetic crosses partitions, never a global sort."""
    o = load_table(spark, sf_dir, "orders")
    sel = o.select(F.expr(_O_CENTS).alias("cents"), "o_orderkey")
    ranked = stitched_running(
        sel, ["cents", "o_orderkey"], rank_name="rn", with_totals=True
    )
    return ranked.filter(
        (F.col("rn") == F.expr("(rn_total + 1) div 2"))
        | (F.col("rn") == F.expr("rn_total div 2 + 1"))
    ).agg(
        F.round(F.avg("cents") / 100.0, 4).alias("median_price"),
        F.any_value("rn_total").alias("n_orders"),
    )


@register(
    "q_percentile_grid_exact",
    oracle=f"""
        WITH c AS (
            SELECT {_LI_CENTS} AS cents, l_orderkey, l_linenumber FROM lineitem
        ),
        r AS (
            SELECT cents,
                   row_number() OVER (ORDER BY cents, l_orderkey, l_linenumber)
                       AS rn
            FROM c
        ),
        n AS (SELECT count(*) AS n FROM c),
        g AS (SELECT unnest([10, 25, 50, 75, 90]) AS pct)
        SELECT g.pct, round(r.cents / 100.0, 4) AS value
        FROM g, n, r
        WHERE r.rn = (g.pct * n.n + 99) // 100
    """,
    category="order-stats",
)
def q_percentile_grid_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p10/p25/p50/p75/p90 of line-item price (lower/type-1
    quantile: the value at rank ceil(p·n)) — the quality-report grid a
    data pipeline publishes per snapshot. One stitched rank over the
    fact, then 5 broadcast rank probes; ceil is the integer form
    (p·n + 99) div 100 on both engines. TIE-INSENSITIVE: the value at
    a given rank is identical under any permutation of equal-cents
    rows, so the tie-break columns stay out of the shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    sel = l.select(F.expr(_LI_CENTS).alias("cents"))
    ranked = stitched_running(sel, ["cents"], rank_name="rn", with_totals=True)
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in (10, 25, 50, 75, 90)])).alias("pct")
    )
    return (
        ranked.crossJoin(F.broadcast(grid))
        .filter(F.col("rn") == F.expr("(pct * rn_total + 99) div 100"))
        .select("pct", F.round(F.col("cents") / 100.0, 4).alias("value"))
    )


@register(
    "q_cume_dist_global",
    oracle=f"""
        WITH c AS (SELECT o_orderkey, {_O_CENTS} AS cents FROM orders),
        r AS (
            SELECT o_orderkey, cents,
                   round(percent_rank() OVER w, 4) AS pct_rank,
                   round(cume_dist() OVER w, 4) AS cdist,
                   ntile(100) OVER w AS centile
            FROM c WINDOW w AS (ORDER BY cents, o_orderkey)
        )
        SELECT o_orderkey, cents, pct_rank, cdist, centile
        FROM r WHERE o_orderkey % 100 = 0
    """,
    category="order-stats",
)
def q_cume_dist_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank fractions — percent_rank, cume_dist, percentile
    bucket — for a sampled subset of orders, computed over the FULL
    table via one stitched rank (the ordering is unique, so
    percent_rank = (rn−1)/(n−1) and cume_dist = rn/n exactly). The
    'where does this row sit in the whole distribution' annotation,
    distributed."""
    o = load_table(spark, sf_dir, "orders")
    sel = o.select("o_orderkey", F.expr(_O_CENTS).alias("cents"))
    ranked = stitched_running(
        sel, ["cents", "o_orderkey"], rank_name="rn", with_totals=True
    )
    return ranked.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "cents",
        # n=1 guard: percent_rank() is 0 on a single-row frame, not 0/0
        F.round(
            F.when(
                F.col("rn_total") > 1,
                (F.col("rn") - 1) / (F.col("rn_total") - 1).cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("pct_rank"),
        F.round(F.col("rn") / F.col("rn_total").cast("double"), 4).alias("cdist"),
        ntile_from_rank(100, "rn", "rn_total").alias("centile"),
    )


@register(
    "q_group_decile_bands",
    oracle=f"""
        WITH c AS (
            SELECT l_returnflag, {_LI_CENTS} AS cents, l_orderkey, l_linenumber
            FROM lineitem
        ),
        r AS (
            SELECT l_returnflag, cents,
                   ntile(10) OVER (PARTITION BY l_returnflag
                       ORDER BY cents, l_orderkey, l_linenumber) AS decile
            FROM c
        )
        SELECT l_returnflag, decile, count(*) AS n,
               CAST(min(cents) AS BIGINT) AS min_cents,
               CAST(max(cents) AS BIGINT) AS max_cents
        FROM r GROUP BY l_returnflag, decile
    """,
    category="order-stats",
)
def q_group_decile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP decile bands over the fact table where the group key
    has only 3 values — the case where a plain PARTITION BY window
    serializes a third of 100 TB per reducer. Uses the GROUPED stitch
    (ranges over (flag, price…), per-(partition, flag) offsets) for a
    distributed per-group rank, plus a broadcast per-group count for
    the closed-form ntile. The per-segment price-band report, at fact
    grain. TIE-INSENSITIVE like q_decile_stats: per-(group, decile)
    count/min/max of cents don't depend on which equal-cents row takes
    which rank, so the tie-break columns stay out of the shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    sel = l.select("l_returnflag", F.expr(_LI_CENTS).alias("cents"))
    ranked = stitched_running(
        sel,
        ["cents"],
        rank_name="rn",
        partition_cols=["l_returnflag"],
        with_totals=True,
    )
    return (
        ranked.withColumn("decile", ntile_from_rank(10, "rn", "rn_total"))
        .groupBy("l_returnflag", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )
