"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``builder_spark.registry`` — every operator from
SURVEY.md §2 registers a (PySpark impl, DuckDB oracle) pair there; this
module re-exports them in the driver's shape. The driver runs
``entry(spark)`` as a smoke check, then each ``queries()[name]`` at
sf=0.01 against ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from builder_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    qs = load_all()
    return qs["q_agg_group"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys get a rows-only check."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
