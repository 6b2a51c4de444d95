"""builder_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the deepfield/builder pipeline framework (reference surveyed in SURVEY.md;
the reference checkout was empty — citations are public-knowledge
``pub:builder/...`` symbols, see SURVEY.md §0), re-expressed Spark-first:

- Layer A (pipeline framework): ``builder_spark.pipeline`` — Job/Target/
  Expander/BuildGraph/Executor equivalents over partitioned parquet.
- Layer B (analytics operators): ``builder_spark.queries`` — the full
  relational / window / scalar / LLM-data / UDF / streaming operator
  surface, each registered as a named query with a DuckDB oracle.

Everything is DataFrame-API-first so Catalyst/AQE own the physical plan;
Python UDFs appear only in the UDF-surface operators themselves.
"""

from builder_spark.catalog import TABLES, load_table, register_views
from builder_spark.registry import QUERIES, Query, register
from builder_spark.session import get_spark

__all__ = [
    "TABLES",
    "QUERIES",
    "Query",
    "get_spark",
    "load_table",
    "register",
    "register_views",
]
