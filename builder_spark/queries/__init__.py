"""Graded query modules — importing this package registers every query.

Module map (SURVEY.md §2.B rows):
- relational: scan/filter/project/distinct/agg/join/sort/set ops (1-13, 17-26, 34-39)
- grouping:   rollup/cube/grouping sets (14-16)
- window:     ranking/lag/frames (27-33)
- scalar:     string/date/math/json/array functions (40-48)
- subquery:   IN/scalar/correlated subqueries (49-51)
- llmdata:    dedup/similarity/multimodal/text stats (52-58)
- winbatch:   tumbling/sliding/session windows on batch (59-61)
- udf:        Python/pandas UDF surface + sinks (65-70)
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
