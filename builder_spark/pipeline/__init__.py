"""Layer A: the batch-pipeline framework (SURVEY.md §2.A).

Spark-native re-expression of the reference's job/target/expander/
build-graph/executor model (pub:builder/jobs.py, targets.py,
expanders.py, build.py, execution.py — public-repo citations, see
SURVEY.md §0):

- Target: a dataset path with identity + freshness (mtime/_SUCCESS).
- TimestampExpander: target pattern + time range + step → concrete
  partition targets (the reference's strftime expansion; here it is
  also how partition pruning stays aligned with the physical layout).
- Job: declares dependencies and targets via expanders, and carries a
  ``run(ctx)`` callable producing a DataFrame instead of a shell
  command string — the command boundary of the reference becomes a
  parameterized Spark transformation.
- BuildManager/BuildGraph: rule graph → expanded concrete DAG
  (networkx), staleness & buildability predicates.
- ExecutionManager + SparkExecutor/PrintExecutor: topological
  execution with retries; PrintExecutor is the explain-only dry run.
"""

from builder_spark.pipeline.core import (
    BuildManager,
    ConcurrentWriteError,
    ExecutionManager,
    Job,
    ObjectStoreTarget,
    VersionedTableTarget,
    PrintExecutor,
    SparkExecutor,
    Target,
    TimestampExpander,
    convert_to_timedelta,
    make_target,
)

__all__ = [
    "BuildManager",
    "ConcurrentWriteError",
    "ExecutionManager",
    "Job",
    "ObjectStoreTarget",
    "VersionedTableTarget",
    "PrintExecutor",
    "SparkExecutor",
    "Target",
    "TimestampExpander",
    "convert_to_timedelta",
    "make_target",
]
