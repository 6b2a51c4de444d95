"""Partitioning utilities: parallelism repair and skew handling.

Two distinct scale problems live here:

1. **Under-partitioned inputs** (``spread``): a parquet scan yields one
   partition per row-group byte-range, so a small file — or a huge one
   with one row group — serializes every downstream per-row computation
   onto one core. Compute-heavy operators (hashing, shingling, vector
   math, Pandas UDFs) call ``spread`` first: it repartitions UP to the
   cluster's parallelism only when the input has fewer partitions, and
   is a no-op on well-partitioned data (a 100 TB scan with thousands of
   splits is never reshuffled by this).

2. **Skewed keys** (``with_salt`` / ``replicate_for_salted_join``): a
   hot key sends its whole group to one reducer. Salting splits each
   key into ``n`` subkeys: aggregations become two-phase (partial per
   salted key, final per key — both map-side combinable), joins
   replicate the small side once per salt bucket. AQE's skew-join
   splitting handles sort-merge joins automatically; salting is for
   aggregations and for joins AQE can't split (e.g. bucketed tables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, *keys: str, target: int | None = None) -> DataFrame:
    """Repartition UP to ``target`` (default: cluster parallelism) when
    the input is under-partitioned; no-op otherwise.

    With ``keys``, hash-partitions on them — downstream groupBy/join on
    the same keys then reuses the exchange instead of adding one.
    Without keys, round-robin for even load.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *[F.col(k) for k in keys]) if keys else df.repartition(target)


def with_salt(df: DataFrame, n: int, col_name: str = "_salt") -> DataFrame:
    """Add a salt in [0, n) that splits rows of the SAME key across
    reducers. Row-position based (deterministic per partition layout,
    uniform) — not key-based, which would defeat the purpose."""
    return df.withColumn(col_name, F.pmod(F.monotonically_increasing_id(), F.lit(n)))


def salted_sum_count(
    df: DataFrame, group_cols: list[str], value_col: str, n: int = 16
) -> DataFrame:
    """Two-phase salted aggregation for sum/count under key skew:
    phase 1 aggregates (key, salt) — the hot key spreads over n
    reducers — phase 2 merges the n partials per key. Returns
    (group_cols..., sum_<value>, count_<value>).

    Note: plain groupBy already does map-side partial aggregation; use
    this only when the DISTINCT (key, ...) cardinality per partition is
    so low that partials can't compress the hot key — the classic
    "one key is 30% of the data" shape.
    """
    salted = with_salt(df, n)
    phase1 = salted.groupBy(*group_cols, "_salt").agg(
        F.sum(value_col).alias("_s"), F.count(F.lit(1)).alias("_c")
    )
    return phase1.groupBy(*group_cols).agg(
        F.sum("_s").alias(f"sum_{value_col}"), F.sum("_c").alias(f"count_{value_col}")
    )


def replicate_for_salted_join(small: DataFrame, n: int, col_name: str = "_salt") -> DataFrame:
    """Explode the SMALL side of a skewed join once per salt bucket.
    Join condition becomes (key, _salt) vs the salted big side — the
    hot key's rows land on n reducers instead of one. Small side grows
    n×, which is fine exactly when it was small enough to consider
    broadcasting anyway."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    return small.withColumn(col_name, salts)


def partition_report(df: DataFrame) -> dict[str, int]:
    """Partition-count diagnostic (triggers partition planning, cheap)."""
    n = df.rdd.getNumPartitions()
    return {"num_partitions": n, "default_parallelism": df.sparkSession.sparkContext.defaultParallelism}
