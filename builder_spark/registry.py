"""Query registry — the single source of truth for the graded surface.

Every operator from SURVEY.md §2.B registers here with:
- a PySpark implementation ``fn(spark, sf_dir) -> DataFrame``
- an optional DuckDB oracle SQL string (omitted only for genuinely
  non-SQL-expressible ops — streaming, approx sketches — which the
  driver then checks rows-only).

``__spark_entry__.py`` re-exports this registry as the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str


#: name → Query; populated by importing builder_spark.queries
QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, category: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a graded query (and its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return the registry."""
    import builder_spark.queries  # noqa: F401  (import triggers registration)

    return QUERIES
