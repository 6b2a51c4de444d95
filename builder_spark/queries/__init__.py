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

from builder_spark.queries import relational  # noqa: F401

for _mod in (
    "relational2",
    "tpch",
    "tpch2",
    "joins",
    "setops",
    "grouping",
    "window",
    "scalar",
    "subquery",
    "llmdata",
    "llmscale",
    "textops",
    "winbatch",
    "analytics2",
    "udf",
    "sourcesink",
):
    try:  # modules land incrementally; missing ones are not an error mid-build
        __import__(f"builder_spark.queries.{_mod}")
    except ImportError:
        pass

import builder_spark.streaming.jobs  # noqa: E402,F401  (rows 62-64 register here)
