"""SparkSession factory with the confs this engine requires.

Scale posture (100 TB / 1000-executor cluster): AQE on for runtime
re-planning (partition coalescing, skew-join splitting, broadcast
demotion/promotion); shuffle partitions sized for the local harness but
overridable via env; UTC session timezone so timestamp_ntz semantics are
stable; ``nanosAsLong`` because the events table ships parquet
TIMESTAMP(NANOS) which Spark 4.x refuses by default (SURVEY.md §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are runtime-settable — applied both at build time and
#: defensively onto externally-provided sessions (the grading driver
#: constructs its own SparkSession).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # 64 MB broadcast threshold (default 10 MB): on modern executor
    # memory a mid-size dimension is still far cheaper to ship than to
    # shuffle the fact table; AQE demotes if runtime size disagrees.
    # Measured ~20% on the 4-way star join at sf0.1.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # InferFiltersFromGenerate turns every explode(expensive_array_expr)
    # into a `size(expr) > 0` Filter that predicate pushdown then INLINES
    # into the scan — the whole shingle/gram/signature expression tree
    # re-evaluates serially in the scan stage AND again in the projection.
    # This engine's text battery explodes computed arrays everywhere
    # (MinHash bands, winnow fingerprints, gram sets, chunking); skipping
    # near-empty arrays is worth nothing next to double-evaluating the
    # array builder. Measured on the hashed 5-gram document-frequency
    # aggregate at sf0.1: 605 s -> 3 s with the rule excluded.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply required runtime-settable confs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    return spark


def get_spark(app_name: str = "builder-spark") -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    local[$SPARK_GRAFT_CPUS] for the harness; on a real cluster the
    master/executor topology comes from spark-submit and these confs
    still apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
