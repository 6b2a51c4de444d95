"""Graded query modules — importing this package registers every query.

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
"""

from builder_spark.queries import (  # noqa: F401
    analytics2,
    analytics3,
    grouping,
    joins,
    llmdata,
    llmdata3,
    llmscale,
    orderstats,
    relational,
    relational2,
    scalar,
    setops,
    sourcesink,
    subquery,
    textops,
    tpch,
    tpch2,
    udf,
    winbatch,
    window,
)

import builder_spark.streaming.jobs  # noqa: E402,F401  (rows 62-64 register here)

# round-5/6 additions import LAST: registration order drives the
# driver's grading rotation (never-graded queries first), and the
# earlier-round backlog must reach a CORRECTNESS window before
# brand-new queries do (r6: 47 backlog + 3 new = exactly one window)
from builder_spark.queries import round5  # noqa: E402,F401
from builder_spark.queries import round6  # noqa: E402,F401
from builder_spark.queries import round7  # noqa: E402,F401
from builder_spark.queries import round9  # noqa: E402,F401
from builder_spark.queries import round9b  # noqa: E402,F401
from builder_spark.queries import round9c  # noqa: E402,F401
from builder_spark.queries import round9d  # noqa: E402,F401
from builder_spark.queries import round9e  # noqa: E402,F401
from builder_spark.queries import round9f  # noqa: E402,F401
from builder_spark.queries import round9g  # noqa: E402,F401
from builder_spark.queries import round9h  # noqa: E402,F401
from builder_spark.queries import round9i  # noqa: E402,F401
from builder_spark.queries import round9j  # noqa: E402,F401
from builder_spark.queries import round9k  # noqa: E402,F401
from builder_spark.queries import round9l  # noqa: E402,F401
from builder_spark.queries import round9m  # noqa: E402,F401
from builder_spark.queries import round9n  # noqa: E402,F401
from builder_spark.queries import round9o  # noqa: E402,F401
from builder_spark.queries import round10  # noqa: E402,F401
from builder_spark.queries import round11  # noqa: E402,F401
