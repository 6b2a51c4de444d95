"""Parity of the vectorized sign-bit LSH kernel (r15) with the
interpreted expression form it replaced.

`with_lsh_buckets` must be BIT-IDENTICAL to `lsh_bucket` per band —
the graded oracles replay the same ±1 planes in SQL, so any sign-bit
divergence is a wrong answer, not a speed bug. The kernel's claims:
exact ±1 products over the exactly-cast float32 elements, a strict
left-to-right accumulation equal to ``aggregate(…, 0.0, acc + x)``,
Spark's NaN-above-everything comparison on the sign test, and bucket 0
for every degenerate row (null vector, null element, length ≠ plane
dim) — the value the when/otherwise expression yields there.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.similarity import (
    hyperplanes,
    lsh_bucket,
    with_lsh_buckets,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _expr_buckets(df, planes, n_bands):
    per = len(planes) // n_bands
    return df.select(
        "vec_id",
        *[
            lsh_bucket("embedding", planes[i * per : (i + 1) * per]).alias(f"_b{i}")
            for i in range(n_bands)
        ],
    )


def _kernel_buckets(df, planes, n_bands):
    return with_lsh_buckets(
        df.select("vec_id", "embedding"), planes, n_bands, "embedding"
    ).drop("embedding")


def _assert_identical(df, planes, n_bands):
    old = _expr_buckets(df, planes, n_bands)
    new = _kernel_buckets(df, planes, n_bands)
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_kernel_matches_expression_on_fixture(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    # the two graded plane sets: banded near-dup (16 planes / 4 bands)
    # and the ANN bucket (8 planes / 1 band)
    _assert_identical(e, hyperplanes(dim=64, n_planes=16, seed=7), 4)
    _assert_identical(e, hyperplanes(), 1)


def test_kernel_matches_expression_on_degenerate_rows(spark):
    rows = [
        (1, [1.0] * 64),                                  # plain
        (2, None),                                        # null vector
        (3, [1.0] * 10),                                  # too short
        (4, [1.0] * 70),                                  # too long
        (5, [1.0] * 30 + [None] + [1.0] * 33),            # null element
        (6, [float("nan")] * 64),                         # NaN > 0 is TRUE in Spark SQL
        (7, [0.0] * 64),                                  # exact zero dots
        (8, [-1e-30] * 64),                               # tiny magnitudes
        (9, [1e30, -1e30] * 32),                          # cancellation
        (10, [-0.0] * 64),                                # signed zero
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    _assert_identical(df, hyperplanes(dim=64, n_planes=16, seed=7), 4)


def test_kernel_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert _kernel_buckets(df, hyperplanes(), 1).count() == 0
