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


# ---- stitched_running boundary-mode hardening (round 6) ----------------

import datetime

import pytest
from pyspark.sql import Window

from builder_spark.operators.partitioning import _simple_order, stitched_running


def test_simple_order_rendering_pinned():
    """_simple_order parses Column._jc.toString() — a private rendering
    that can change across Spark versions. Pin the expected forms so an
    upgrade SURFACES a silent demotion of every stitched query to the
    sampled fallback instead of letting it happen quietly."""
    assert _simple_order("x") == ("x", True)
    assert _simple_order(F.col("x")) == ("x", True)
    assert _simple_order(F.col("x").asc()) == ("x", True)
    assert _simple_order(F.col("x").desc()) == ("x", False)
    # complex / custom-NULLS shapes must NOT parse (they need the fallback)
    assert _simple_order(F.col("x") + 1) is None
    assert _simple_order(F.col("x").desc_nulls_first()) is None
    assert _simple_order(F.col("x").asc_nulls_last()) is None


def _naive(df, order_exprs, running_src, rank=True):
    w = Window.orderBy(*order_exprs)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.withColumn("rv", F.sum(running_src).over(wf).cast("bigint"))
    if rank:
        out = out.withColumn("rn", F.row_number().over(w).cast("bigint"))
    return out


def _same(a, b, cols):
    sa, sb = a.select(*cols), b.select(*cols)
    assert sa.exceptAll(sb).count() == 0 and sb.exceptAll(sa).count() == 0


def test_stitched_string_order_is_deterministic_and_exact(spark):
    """Bare STRING first order column: deterministic literal-cut mode
    (no sampled range exchange in the plan), exact vs the naive
    window — ASC and DESC."""
    rows = [(f"s{(i * 17) % 37:03d}", i) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, v int").repartition(4)
    got = stitched_running(df, ["k", "v"], running={"rv": "v"}, rank_name="rn",
                           num_partitions=4)
    assert "rangepartitioning" not in got._jdf.queryExecution().executedPlan().toString()
    _same(got, _naive(df, [F.col("k").asc(), F.col("v").asc()], "v"),
          ["k", "v", "rv", "rn"])

    got_d = stitched_running(df, [F.col("k").desc(), F.col("v").asc()],
                             rank_name="rn", num_partitions=4)
    want_d = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("k").desc(), F.col("v").asc())).cast("bigint")
    )
    _same(got_d, want_d, ["k", "v", "rn"])


def test_stitched_date_and_timestamp_order_deterministic(spark):
    """date / timestamp first order columns use the order-preserving
    numeric encoding (unix_date / unix_micros) — deterministic mode,
    exact vs the naive window."""
    rows = [(datetime.date(2020, 1, 1) + datetime.timedelta(days=(i * 7) % 90), i)
            for i in range(400)]
    df = spark.createDataFrame(rows, "d date, v int").repartition(4)
    got = stitched_running(df, ["d", "v"], rank_name="rn", num_partitions=4)
    assert "rangepartitioning" not in got._jdf.queryExecution().executedPlan().toString()
    want = df.withColumn("rn", F.row_number().over(Window.orderBy("d", "v")).cast("bigint"))
    _same(got, want, ["d", "v", "rn"])

    ts = df.select(F.col("d").cast("timestamp").alias("t"), "v")
    got_t = stitched_running(ts, ["t", "v"], rank_name="rn", num_partitions=4)
    assert "rangepartitioning" not in got_t._jdf.queryExecution().executedPlan().toString()
    want_t = ts.withColumn("rn", F.row_number().over(Window.orderBy("t", "v")).cast("bigint"))
    _same(got_t, want_t, ["t", "v", "rn"])


def test_stitched_fallback_needs_exchange_reuse(spark):
    """Complex first-order expressions take the sampled-range fallback,
    whose correctness rests on both subplans sharing ONE range
    exchange. With spark.sql.exchange.reuse=false that guarantee is
    gone — the stitch must refuse instead of risking two executions
    sampling different boundaries. Deterministic modes (numeric,
    string, date) have literal pid expressions and must keep working
    with reuse disabled."""
    rows = [(i, (i * 13) % 40, f"p{i % 5}") for i in range(300)]
    df = spark.createDataFrame(rows, "id int, v int, payload string").repartition(4)
    order = [(F.col("v") * 2 + 1).asc(), F.col("id").asc()]

    # fallback is exact while reuse is on (the default)
    got = stitched_running(df, order, running={"rv": "v"}, rank_name="rn",
                           num_partitions=4)
    _same(got, _naive(df, order, "v"), ["id", "v", "payload", "rv", "rn"])

    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        with pytest.raises(ValueError, match="exchange.reuse"):
            stitched_running(df, order, rank_name="rn")
        det = stitched_running(df, ["v", "id"], rank_name="rn", num_partitions=4)
        want = df.withColumn("rn", F.row_number().over(Window.orderBy("v", "id")).cast("bigint"))
        _same(det, want, ["id", "v", "rn"])
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")


def test_stitched_covered_projection_reuses_exchange(spark):
    """The offsets aggregate consumes the same explicit (_pid)
    repartition the local window reads, with a pruning guard pinning
    every column into both branches — so the final adaptive plan holds
    a ReusedExchange and the input is scanned and shuffled ONCE (the
    r6 double-scan fix). Exercised on a parquet-backed frame: the
    guard relies on count(col) staying un-rewritten, which holds for
    NULLABLE columns (parquet defaults); non-nullable sources (e.g.
    spark.range) legitimately fall back to two pruned scans."""
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", (F.col("o_orderkey") % 7).alias("v")
    )
    out = stitched_running(df, ["o_orderkey"], running={"rv": "v"}, rank_name="rn")
    out.collect()  # collect: the df's OWN QueryExecution reaches the AQE-final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, "offsets subplan no longer shares the window exchange"
    # within the FINAL plan section, exactly one live scan (the
    # pre-reuse "Initial Plan" section below it legitimately shows two)
    final_section = plan.split("== Initial Plan ==")[0]
    assert final_section.count("FileScan") == 1


def test_stitched_fallback_rejects_map_payload(spark):
    """Map-typed payload columns can't be range keys, and silently
    dropping them from the shared-exchange keys would reopen the
    pruning-divergence hazard — the fallback must refuse with
    guidance (r6 review finding)."""
    df = spark.createDataFrame(
        [(1, 2, {"a": 1})], "id int, v int, m map<string,int>"
    )
    with pytest.raises(ValueError, match="map-typed"):
        stitched_running(df, [(F.col("v") * 2).asc(), F.col("id").asc()], rank_name="rn")
