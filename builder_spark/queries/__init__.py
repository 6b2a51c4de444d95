"""Graded query modules — ``load_modules()`` registers every query.

Module map (SURVEY.md §2.B rows):
- relational/relational2: scan/filter/project/distinct/agg/pivot/percentile
- grouping:   rollup/cube/grouping sets
- joins:      inner/outer/semi/anti/theta/asof/temporal/salted/bloom-pruned
- setops, window, scalar, subquery: set ops, frames, functions, subqueries
- tpch/tpch2: the 22 TPC-H composites
- llmdata/llmscale/llmdata3/textops: dedup, similarity, multimodal,
  text analysis, corpus curation
- winbatch/analytics2/analytics3: stream-on-batch windows + analytics
- orderstats: exact fact-grain order statistics via stitched ranks
- udf:        Python/pandas UDF surface + sinks
- sourcesink: csv/json/orc/text/binaryFile/bucketed/partitioned/
  schema-evolution ingest + layout maintenance

This package is import-LAZY (r11 verdict: registry_import_sec grew
linearly with the surface — 0.23s to eagerly compile ~35 modules every
bench/driver startup). ``builder_spark.registry.load_all()`` resolves
names through the generated ``builder_spark._query_index`` and imports
a module only when one of its queries is actually touched; call
``load_modules()`` to force the full eager registration (tests, index
regeneration). MODULES is the registration order — it drives the
driver's grading rotation (never-graded queries first), so earlier-
round backlog must reach a CORRECTNESS window before brand-new
queries do: new round modules append LAST, always.
"""

MODULES: tuple[str, ...] = (
    # base surface — EXACT former eager-import order (registration
    # order is rotation-load-bearing; never reorder)
    "builder_spark.queries.analytics2",
    "builder_spark.queries.analytics3",
    "builder_spark.queries.grouping",
    "builder_spark.queries.joins",
    "builder_spark.queries.llmdata",
    "builder_spark.queries.llmdata3",
    "builder_spark.queries.llmscale",
    "builder_spark.queries.orderstats",
    "builder_spark.queries.relational",
    "builder_spark.queries.relational2",
    "builder_spark.queries.scalar",
    "builder_spark.queries.setops",
    "builder_spark.queries.sourcesink",
    "builder_spark.queries.subquery",
    "builder_spark.queries.textops",
    "builder_spark.queries.tpch",
    "builder_spark.queries.tpch2",
    "builder_spark.queries.udf",
    "builder_spark.queries.winbatch",
    "builder_spark.queries.window",
    # streaming rows 62-64, 82-84, 107-108, 135 register here
    "builder_spark.streaming.jobs",
    # round-5+ additions import LAST (see module docstring)
    "builder_spark.queries.round5",
    "builder_spark.queries.round6",
    "builder_spark.queries.round7",
    "builder_spark.queries.round9",
    "builder_spark.queries.round9b",
    "builder_spark.queries.round9c",
    "builder_spark.queries.round9d",
    "builder_spark.queries.round9e",
    "builder_spark.queries.round9f",
    "builder_spark.queries.round9g",
    "builder_spark.queries.round9h",
    "builder_spark.queries.round9i",
    "builder_spark.queries.round9j",
    "builder_spark.queries.round9k",
    "builder_spark.queries.round9l",
    "builder_spark.queries.round9m",
    "builder_spark.queries.round9n",
    "builder_spark.queries.round9o",
    "builder_spark.queries.round10",
    "builder_spark.queries.round11",
    "builder_spark.queries.round12",
    "builder_spark.queries.round12b",
    "builder_spark.queries.round14",
)


def load_modules() -> None:
    """Import every query module unconditionally (registration side
    effect). A broken module raises HERE, loudly — nothing is skipped."""
    import importlib

    for mod in MODULES:
        importlib.import_module(mod)
