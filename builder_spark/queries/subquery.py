"""Subqueries — SURVEY.md §2.B rows 49-51.

Expressed through spark.sql over registered temp views: Catalyst's
analyzer rewrites IN → left-semi join, scalar subqueries → one-row
broadcast, and correlated predicates → decorrelated joins. No manual
rewriting needed — the declarative form IS the scalable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from builder_spark.catalog import register_views
from builder_spark.registry import register

_IN_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
"""

_SCALAR_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
"""

_CORR_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
          AND o.o_totalprice > 350000
    )
"""


@register("q_subquery_in", oracle=_IN_SQL, category="subquery")
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (uncorrelated subquery) — planned as a left semi join, never a collected list literal."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SQL)


@register("q_subquery_scalar", oracle=_SCALAR_SQL, category="subquery")
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: the 1-row aggregate is computed once and
    broadcast into the filter — no per-row re-evaluation."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


@register("q_corr_subquery", oracle=_CORR_SQL, category="subquery")
def q_corr_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst decorrelates to a left-semi join."""
    register_views(spark, sf_dir)
    return spark.sql(_CORR_SQL)
