"""Source/sink connectors: parquet, csv, json, partitioned datasets.

Spark's DataFrameReader/Writer already speaks every format this engine
needs; this layer pins the engine's conventions (schema-explicit
text-format reads, overwrite discipline, partition layout) instead of
re-implementing I/O. See ``io.py``.
"""

from builder_spark.sources.io import (  # noqa: F401
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    write_bucketed,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_text,
)
