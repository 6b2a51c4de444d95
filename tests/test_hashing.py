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


def test_charfold_kgram_composition_is_bit_identical(spark):
    """The token-composed shingle hash (charfold_token_hp +
    kgram_hashes_from_hp) must equal charfold_hash of every space-
    joined k-gram string — the concatenation-linearity identity the r6
    MinHash speedup rests on. Checked for k=2 and k=3 over real fixture
    text (covers empty-ish tokens, short docs, multi-byte-free ASCII)."""
    import os

    from pyspark.sql import functions as F

    from builder_spark.operators.dedup import (
        charfold_hash,
        charfold_token_hp,
        kgram_hashes_from_hp,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    fixture = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    # adversarial rows: consecutive/leading/trailing spaces make EMPTY
    # tokens from split(' ') — the r6 review found sequence(1, 0)'s
    # descending [1, 0] folded phantom chars into the p accumulator
    adversarial = spark.createDataFrame(
        [(100001, "a  b c"), (100002, " leading"), (100003, "trailing "),
         (100004, "a b  c  d"), (100005, ""), (100006, "x"),
         (100007, "   "), (100008, "nor mal text")],
        "doc_id bigint, text string",
    )
    df = fixture.unionByName(adversarial)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    for k in (2, 3):
        # same empty-guard the library uses: sequence(1, 0) is [1, 0]
        idx = F.when(n >= F.lit(k), F.sequence(F.lit(1), n - (k - 1))).otherwise(
            F.array().cast("array<int>")
        )
        joined = F.transform(
            idx,
            lambda i: charfold_hash(
                F.concat_ws(
                    " ", *[F.element_at(toks, i + F.lit(j)) for j in range(k)]
                )
            ),
        )
        got = (
            df.select("doc_id", charfold_token_hp(toks).alias("_hp"), joined.alias("_ref"))
            .select(
                "doc_id",
                (kgram_hashes_from_hp(F.col("_hp"), k) == F.col("_ref")).alias("same"),
            )
        )
        assert got.filter(~F.col("same")).count() == 0, f"k={k} diverged"
