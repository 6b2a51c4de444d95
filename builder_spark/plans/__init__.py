"""Physical-plan inspection: the evidence layer for the scale story.

Every operator family has a plan shape it SHOULD produce (filters
pushed to the scan, dimensions broadcast, one exchange per aggregation,
codegen over the hot path). ``inspect.py`` extracts those facts from
the formatted plan so tests can assert them — a perf regression that
adds a shuffle fails CI before anyone runs a benchmark.
"""

from builder_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
    wholestage_codegen_spans,
)
