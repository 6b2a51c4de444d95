"""Relational core: scan, filter, project, distinct, aggregate.

SURVEY.md §2.B rows 1-13. Everything is plain DataFrame API so Catalyst
handles pushdown/pruning; aggregates are hash aggregates with map-side
partial aggregation for free. Floating aggregates are rounded to 4
decimals on BOTH engines (summation order differs → raw doubles never
hash-match; SURVEY.md §2 conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register


@register(
    "q_scan_project",
    oracle="SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice FROM lineitem",
    category="scan",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection pushes column pruning into the parquet scan (ReadSchema
    shows only the 4 columns; at 100 TB that is the whole ballgame)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@register(
    "q_filter_pred",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        FROM lineitem
        WHERE l_quantity BETWEEN 25 AND 40
          AND l_returnflag IN ('A', 'R')
          AND (l_discount > 0.05 OR l_tax < 0.03)
          AND NOT (l_linestatus IS NULL)
    """,
    category="filter",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate (AND/OR/NOT/BETWEEN/IN/IS NULL) — all pushed to
    the scan as PushedFilters where parquet stats allow row-group skip."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(25, 40)
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_discount") > 0.05) | (F.col("l_tax") < 0.03))
        & ~F.col("l_linestatus").isNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "q_filter_like",
    oracle="""
        SELECT p_partkey, p_name, p_type
        FROM part
        WHERE p_type LIKE '%ECO%' OR p_name LIKE 'red %'
    """,
    category="filter",
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-pattern predicate pushed to the scan (PushedFilters carries the StringContains/StartsWith)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_type").like("%ECO%") | F.col("p_name").like("red %")).select(
        "p_partkey", "p_name", "p_type"
    )


@register(
    "q_project_expr",
    oracle="""
        SELECT
            o_orderkey,
            o_totalprice * 1.1 AS inflated,
            CASE WHEN o_totalprice > 200000 THEN 'big'
                 WHEN o_totalprice > 50000 THEN 'mid'
                 ELSE 'small' END AS bucket,
            coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
            greatest(o_totalprice, 100000.0) AS floored,
            CAST(floor(o_totalprice) AS BIGINT) AS price_int
        FROM orders
    """,
    category="project",
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projections: arithmetic, CASE WHEN, coalesce/nullif,
    greatest, cast. Pure codegen — stays in one WholeStageCodegen span."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("inflated"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floored"),
        # floor, not a raw cast: DuckDB rounds double→int, Spark truncates
        F.floor(F.col("o_totalprice")).cast("bigint").alias("price_int"),
    )


@register(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
    category="dedup",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct = hash aggregate on all projected cols (one shuffle on the
    composite key; AQE coalesces post-shuffle partitions)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_shipdate"
    ).distinct()


@register(
    "q_agg_global",
    oracle="""
        SELECT
            round(sum(l_quantity), 4) AS sum_qty,
            round(avg(l_extendedprice), 4) AS avg_price,
            round(min(l_discount), 4) AS min_disc,
            round(max(l_tax), 4) AS max_tax,
            count(*) AS n_rows
        FROM lineitem
    """,
    category="agg",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table aggregate (no GROUP BY): one combinable pass, 1-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_discount"), 4).alias("min_disc"),
        F.round(F.max("l_tax"), 4).alias("max_tax"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_agg_group",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            round(sum(l_quantity), 4) AS sum_qty,
            -- EXACT fixed-point sums: the price aggregates top 5e9 at
            -- sf0.1, where double summation order reaches the rounded
            -- 4th decimal (the q_salted_join class — flips BETWEEN
            -- runs). price = 2 decimals, *(1-disc) = 4, *(1+tax) = 6;
            -- HUGEINT/decimal sums are exact, ONE cast back to double.
            round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS DOUBLE) / 100.0, 4) AS sum_base_price,
            round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                      * 10000) AS BIGINT)) AS DOUBLE)
                  / 10000.0, 4) AS sum_disc_price,
            round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                      * (1 + l_tax) * 1000000) AS BIGINT))
                       AS DOUBLE) / 1000000.0, 4) AS sum_charge,
            round(avg(l_quantity), 4) AS avg_qty,
            round(avg(l_extendedprice), 4) AS avg_price,
            round(avg(l_discount), 4) AS avg_disc,
            count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    category="agg",
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (the flagship query). Hash agg with
    map-side combine; only |groups| rows cross the shuffle — scales to
    any fact-table size. Price sums run in EXACT fixed point (cents /
    1e-4 / 1e-6 units, decimal-widened) because at sf0.1+ magnitudes a
    double sum's partition order is no longer absorbed by round(,4)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def fx(expr, scale: int):
        # int64 sums to scale 1e4 (exact past sf100: 6e18 < 2^63);
        # the 1e-6-unit charge sum needs the wide decimal
        t = "bigint" if scale <= 10000 else "decimal(25,0)"
        return F.round(
            F.sum(F.round(expr * scale).cast(t)).cast("double") / float(scale),
            4,
        )

    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        fx(F.col("l_extendedprice"), 100).alias("sum_base_price"),
        fx(disc_price, 10000).alias("sum_disc_price"),
        fx(charge, 1000000).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_agg_having",
    oracle="""
        SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 4) AS spend
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 12 AND sum(o_totalprice) > 1000000
    """,
    category="agg",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY with a post-aggregation HAVING filter (filter on the aggregate, not the rows)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("spend"),
            F.sum("o_totalprice").alias("_raw_spend"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("_raw_spend") > 1000000))
        .drop("_raw_spend")
    )


@register(
    "q_agg_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps
        FROM lineitem
        GROUP BY l_returnflag
    """,
    category="agg",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi distinct-agg: Spark plans an Expand + two-phase agg; exact
    and scalable (no driver-side dedup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "q_agg_approx",
    oracle=None,  # approx sketches differ across engines → rows-only check;
    # q_agg_distinct_users is the exact graded twin
    category="agg",
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    distinct-user counts: constant memory per group vs exact distinct's
    shuffle of every key."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


@register(
    "q_agg_distinct_users",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
    """,
    category="agg",
)
def q_agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact graded twin of q_agg_approx."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


@register(
    "q_agg_stats",
    oracle="""
        SELECT
            l_returnflag,
            round(stddev_samp(l_quantity), 4) AS sd_qty,
            round(var_samp(l_extendedprice), 4) AS var_price,
            round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    category="agg",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group descriptive statistics (min/max/avg/stddev) in one combinable pass; floats rounded to 4 per the parity conventions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_extendedprice"), 4).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )


@register(
    "q_agg_condsum",
    oracle="""
        SELECT
            user_id,
            round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0), 4) AS purchase_value,
            round(coalesce(sum(value) FILTER (WHERE event_type = 'click'), 0), 4) AS click_value,
            count(*) FILTER (WHERE event_type = 'error') AS n_errors
        FROM events
        GROUP BY user_id
    """,
    category="agg",
)
def q_agg_condsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation — one pass, no join/pivot
    shuffle fan-out."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(
            F.coalesce(F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), F.lit(0.0)), 4
        ).alias("purchase_value"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("event_type") == "click", F.col("value"))), F.lit(0.0)), 4
        ).alias("click_value"),
        F.count(F.when(F.col("event_type") == "error", F.lit(1))).alias("n_errors"),
    )


@register(
    "q_agg_collect",
    oracle="""
        SELECT n_regionkey,
               array_to_string(list_sort(list(n_name)), ',') AS nations
        FROM nation
        GROUP BY n_regionkey
    """,
    category="agg",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is unordered across partitions → array_sort makes it
    deterministic (SURVEY.md §2 conventions). Output is the joined string,
    not array<string>: the driver's canonicalizer hashes scalar columns only
    (lists are unhashable in pandas — CORRECTNESS_r01 crash)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
    )
