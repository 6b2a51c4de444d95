"""Readers and writers with the engine's scale conventions.

Rules encoded here (the 100 TB posture):
- Text formats (csv/json) are ALWAYS read with an explicit schema in
  pipeline code — schema inference is a full extra pass over the data
  and infers different types run-to-run as data drifts. Inference is
  allowed only behind ``infer=True`` for exploration.
- Parquet writes go through ``write_parquet`` which supports
  ``partition_by`` (hive-style layout → partition pruning on read) and
  ``sort_within_partitions`` (clusters data for row-group min/max
  pruning on the sort key).
- Readers accept directories and globs natively — a 100 TB dataset is
  just a path; never enumerate files driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Read parquet (file, dir, or glob). Column pruning happens via
    Catalyst anyway; ``columns`` just makes intent explicit."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """CSV read; explicit schema unless ``infer=True`` (exploration only
    — inference costs a full extra scan)."""
    if schema is None and not infer:
        raise ValueError("read_csv requires a schema (or infer=True for exploration)")
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """JSON-lines read; explicit schema unless ``infer=True``."""
    if schema is None and not infer:
        raise ValueError("read_json requires a schema (or infer=True for exploration)")
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Parquet sink. ``partition_by`` → hive layout (partition pruning);
    ``sort_within_partitions`` → row-group min/max pruning on the key."""
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """ORC source — same pushdown/pruning story as parquet (ORC carries
    stripe-level min/max indexes Spark's reader uses natively)."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table — THE co-located-join primitive at scale:
    two tables bucketed on the same key with the same bucket count
    join with ZERO exchange (each task reads matching bucket files
    from both sides). Requires ``saveAsTable`` (bucket metadata lives
    in the catalog, not the files); ``path`` makes it an external
    table so the data outlives the in-memory catalog."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text source: one row per line, column ``value``.
    The rawest ingest format — upstream of any schema; pair with
    from_json/split/regexp parsing downstream."""
    return spark.read.text(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text sink: df must have exactly one string column. Rows become
    lines — the producer contract for line-oriented corpora."""
    df.write.mode(mode).text(path)
