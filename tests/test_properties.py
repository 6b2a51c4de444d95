"""Property-based tests (hypothesis): operator invariants that must
hold on ANY data, not just the fixtures. Examples are kept small and
few — each one is a Spark round trip."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from builder_spark.operators.dedup import exact_dedup, jaccard_pairs
from builder_spark.operators.partitioning import salted_sum_count

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(data=rows)
def test_running_sum_final_row_equals_group_sum(spark, data):
    df = spark.createDataFrame(
        [(i, k, float(v)) for i, (k, v) in enumerate(data)], ["id", "k", "v"]
    )
    w = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = df.withColumn("rs", F.sum("v").over(w))
    last = running.groupBy("k").agg(F.max_by("rs", "id").alias("final_rs"))
    plain = df.groupBy("k").agg(F.sum("v").alias("total"))
    joined = last.join(plain, "k").collect()
    for r in joined:
        assert abs(r.final_rs - r.total) < 1e-6


@_settings
@given(data=rows)
def test_salted_agg_equals_plain_agg(spark, data):
    df = spark.createDataFrame([(k, float(v)) for k, v in data], ["k", "v"])
    plain = {r.k: (r.s, r.c) for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")).collect()}
    salted = {r.k: (r.sum_v, r.count_v) for r in salted_sum_count(df, ["k"], "v", n=4).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert abs(plain[k][0] - salted[k][0]) < 1e-6
        assert plain[k][1] == salted[k][1]


@_settings
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=20).filter(lambda s: s.strip()),
        min_size=2,
        max_size=10,
    )
)
def test_jaccard_bounds_and_identity(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    pairs = jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()
    for p in pairs:
        assert 0.0 <= p.jaccard <= 1.0
    # identical token sets must appear as jaccard == 1 pairs.
    # NB: split(' ') KEEPS empty tokens in Spark, DuckDB, and Python
    # alike ("a " -> ["a",""]) — the reference model must too.
    toksets = [frozenset(t.split(" ")) for t in texts]
    expected_ones = {
        (i, j)
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if toksets[i] == toksets[j] and toksets[i]
    }
    got_ones = {(p.id_a, p.id_b) for p in pairs if p.jaccard == 1.0}
    assert expected_ones <= got_ones


@_settings
@given(data=rows)
def test_exact_dedup_keeps_one_row_per_key(spark, data):
    df = spark.createDataFrame(
        [(i, k) for i, (k, _) in enumerate(data)], ["id", "k"]
    )
    out = exact_dedup(df, key="k", order_col="id")
    rows_out = out.collect()
    assert len(rows_out) == df.select("k").distinct().count()
    # keeps the MIN id per key, and is idempotent
    mins = {r.k: r.m for r in df.groupBy("k").agg(F.min("id").alias("m")).collect()}
    for r in rows_out:
        assert r.id == mins[r.k]
    assert exact_dedup(out, key="k", order_col="id").count() == len(rows_out)
