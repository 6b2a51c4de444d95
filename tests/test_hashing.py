"""knuth_bucket: overflow safety across the whole int64 key domain.

The old inline form multiplied an int64 key by 2654435761 in BIGINT —
ARITHMETIC_OVERFLOW under ANSI mode for keys > ~3.47e9, i.e. exactly
the id ranges a 100 TB corpus has, while the DuckDB oracle (HUGEINT)
kept working. The decimal(38,0) form must match the oracle's value for
small AND huge keys.
"""

from __future__ import annotations

from builder_spark.functions.hashing import KNUTH, knuth_bucket


def _expected(key: int, m: int) -> int:
    return (key * KNUTH) % 2**32 % m


def test_knuth_bucket_matches_reference_small_and_huge(spark):
    keys = [0, 1, 17, 3_470_000_000, 2**40 + 123, 2**62 + 7, 2**63 - 1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", knuth_bucket("k", 100).alias("b")).collect()
    }
    assert got == {k: _expected(k, 100) for k in keys}


def test_knuth_bucket_is_long_typed(spark):
    df = spark.createDataFrame([(5,)], "k long")
    out = df.select(knuth_bucket("k", 10).alias("b"))
    assert dict(out.dtypes)["b"] == "bigint"
