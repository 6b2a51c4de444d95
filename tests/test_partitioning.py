"""Unit tests for parallelism repair and skew-handling helpers."""

from __future__ import annotations

from pyspark.sql import functions as F

from builder_spark.operators.partitioning import (
    replicate_for_salted_join,
    salted_sum_count,
    spread,
    with_salt,
)


def _skewed(spark):
    # 10_000 rows, 90% on key 'hot'
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_spread_raises_partition_count(spark):
    df = spark.range(100).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 100


def test_spread_noop_when_well_partitioned(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 4)
    assert spread(df) is df


def test_with_salt_splits_hot_key(spark):
    df = with_salt(spread(_skewed(spark)), 8)
    per_salt = df.filter(F.col("k") == "hot").groupBy("_salt").count().collect()
    assert len(per_salt) == 8  # hot key spread over all salt buckets


def test_salted_sum_count_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")).collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["count_v"])
        for r in salted_sum_count(df, ["k"], "v", n=8).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert abs(plain[k][0] - salted[k][0]) < 1e-6
        assert plain[k][1] == salted[k][1]


def test_replicated_salted_join_matches_plain_join(spark):
    big = with_salt(_skewed(spark), 4)
    small = spark.createDataFrame([("hot", 1.5), ("cold", 2.5)], ["k", "w"])
    plain = _skewed(spark).join(small, "k").agg(F.round(F.sum(F.col("v") * F.col("w")), 4)).collect()[0][0]
    salted = (
        big.join(replicate_for_salted_join(small, 4), ["k", "_salt"])
        .agg(F.round(F.sum(F.col("v") * F.col("w")), 4))
        .collect()[0][0]
    )
    assert plain == salted
