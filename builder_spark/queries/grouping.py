"""Grouping sets: rollup / cube / explicit GROUPING SETS — rows 14-16.

Parity trap (SURVEY.md §2 trap 4): DuckDB's GROUPING(col) is
per-column while Spark's grouping_id() is a bitmask — so both sides
emit per-column ``F.grouping(col)`` / ``GROUPING(col)`` flags, which
agree. NULL grouping keys from the rollup are real NULLs on both
engines and hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from builder_spark.catalog import load_table, register_views
from builder_spark.registry import register


@register(
    "q_rollup",
    oracle="""
        SELECT r_name, n_name,
               GROUPING(r_name) AS g_r, GROUPING(n_name) AS g_n,
               count(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        -- Spark emits NO grand-total row over empty input (0 rows
        -- from every grouping set); encode that engine semantic so
        -- degenerate slices agree — no-op whenever input has rows
        HAVING count(*) > 0
    """,
    category="grouping",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: per-(status, priority) plus per-status and grand-total rows in ONE pass (Expand operator), NULL-marked subtotal levels."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = n.join(r, n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("bigint").alias("g_r"),
        F.grouping("n_name").cast("bigint").alias("g_n"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_cube",
    oracle="""
        SELECT c_mktsegment, o_orderpriority,
               GROUPING(c_mktsegment) AS g_seg, GROUPING(o_orderpriority) AS g_pri,
               count(*) AS n_orders,
               -- exact cents sum: the grand-total cell tops 3.7e10 at
               -- sf0.1 (q_salted_join class: double order flips 4th dp)
               round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY CUBE (c_mktsegment, o_orderpriority)
        HAVING count(*) > 0  -- Spark: no () row over empty input
    """,
    category="grouping",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube = 2^n grouping sets in one pass (Expand operator, single
    shuffle) — never n separate group-bys unioned."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    return joined.cube("c_mktsegment", "o_orderpriority").agg(
        F.grouping("c_mktsegment").cast("bigint").alias("g_seg"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_pri"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(  # exact cents sum (grand-total cell: 3.7e10 at sf0.1)
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("double") / 100.0, 4
        ).alias("total"),
    )


@register(
    "q_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, round(sum(l_quantity), 4) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        HAVING count(*) > 0  -- Spark: no () row over empty input
    """,
    category="grouping",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL (the DataFrame API has no direct
    grouping-sets builder; rollup/cube cover the common shapes)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, round(sum(l_quantity), 4) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )
