"""Sort/limit, top-k, and set operations — SURVEY.md §2.B rows 34-39.

Parity notes: ANSI UNION/INTERSECT/EXCEPT are DISTINCT-semantics;
Spark's ``.union`` is bag (UNION ALL) so the distinct variants use
``.distinct()`` / ``.intersect`` / ``.subtract`` (SURVEY.md §2 trap 6).
Every LIMIT carries a total order with a unique tie-break key so the
result set is well-defined on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register


@register(
    "q_sort_limit",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    category="sort",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit plans as TakeOrderedAndProject — per-partition top-N
    then a driver merge of N·partitions rows, never a full global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


@register(
    "q_topk_global",
    oracle="""
        SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        GROUP BY l_partkey
        ORDER BY revenue DESC, l_partkey ASC
        LIMIT 10
    """,
    category="sort",
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 revenue parts. Ordering on the ROUNDED value (both sides)
    keeps tie behavior identical across engines; l_partkey breaks ties."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_partkey").asc())
        .limit(10)
    )


@register(
    "q_union_all",
    oracle="""
        SELECT o_orderkey, o_totalprice, 'big' AS src FROM orders WHERE o_totalprice > 450000
        UNION ALL
        SELECT o_orderkey, o_totalprice, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    category="setop",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — overlapping rows appear twice (tagged by src)."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 450000).select(
        "o_orderkey", "o_totalprice", F.lit("big").alias("src")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("urgent").alias("src")
    )
    return big.unionByName(urgent)


@register(
    "q_union_distinct",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        UNION
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    category="setop",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics: union + one dedup hash aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("custkey"))
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return a.unionByName(b).distinct()


@register(
    "q_intersect",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
    """,
    category="setop",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set intersection) — one hash-aggregate semi-join shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersect(b)  # INTERSECT DISTINCT semantics, matches ANSI


@register(
    "q_except",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
    """,
    category="setop",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference with distinct semantics) — one hash-aggregate anti-join shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    b = o.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.subtract(b)  # EXCEPT DISTINCT semantics (not exceptAll)
