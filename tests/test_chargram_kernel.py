"""Parity of the char-gram Arrow kernels (r15) with the expression
forms they replaced.

`char_gram_items_gen` / `winnow_fp_gen` must be VALUE-IDENTICAL to the
materialized-codepoint expression pipeline (`char_codepoints` +
`charfold_gram_hashes_from_cps` + the window-min transform) — the
graded DuckDB oracles replay the same charfold polynomial, so any
divergence is a wrong answer. The pinned edge semantics: empty text
hashes as one gram of the [0, 0] codepoint artifact (fold 0), sub-k
texts hash as ONE truncated gram, null texts yield a [null] gram array
(items) / one null-fp row (winnow), trailing winnow windows clamp, and
fewer-than-w-gram docs emit their single whole-array min.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.arrowkern import char_gram_items_gen, winnow_fp_gen
from builder_spark.operators.dedup import (
    char_codepoints,
    charfold_gram_hashes_from_cps,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
K, W = 5, 4


def _expr_items(df):
    base = df.select(F.col("doc_id").alias("_id"), char_codepoints("text").alias("_cps"))
    # array_sort: the kernel emits ascending sets, the expression form
    # first-occurrence order — consumers are set-shaped, so sorted
    # comparison is the right equivalence
    return base.select(
        "_id",
        F.array_sort(
            F.array_distinct(charfold_gram_hashes_from_cps("_cps", K))
        ).alias("_arr"),
    )


def _kern_items(df):
    return df.select(F.col("doc_id").alias("_id"), "text").mapInArrow(
        char_gram_items_gen(K, "_id"), "_id long, _arr array<long>"
    )


def _expr_winnow(df):
    base = df.select("doc_id", char_codepoints("text").alias("_cps"))
    hashed = base.select(
        "doc_id", charfold_gram_hashes_from_cps("_cps", K).alias("_g")
    )
    n_wins = F.greatest(F.size(F.col("_g")) - (W - 1), F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda j: F.array_min(F.slice(F.col("_g"), j, W)),
    )
    return hashed.select("doc_id", F.explode(F.array_distinct(wins)).alias("fp"))


def _kern_winnow(df):
    return df.select("doc_id", "text").mapInArrow(
        winnow_fp_gen(K, W, "doc_id"), "doc_id long, fp long"
    )


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_chargram_kernels_match_expressions_on_fixture(spark):
    d = load_table(spark, SF_DIR, "documents")
    _assert_same(_expr_items(d), _kern_items(d))
    _assert_same(_expr_winnow(d), _kern_winnow(d))


def test_charfold_strings_gen_matches_charfold_hash(spark):
    from builder_spark.operators.arrowkern import charfold_strings_gen
    from builder_spark.operators.dedup import charfold_hash

    rows = [
        (0, ""), (1, "a"), (2, "abc def"), (3, "héllo wörld"),
        (4, "\U0001F600ab"), (5, "x" * 500), (6, "a b c d e f g"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, _w string")
    expr = df.select("doc_id", charfold_hash("_w").alias("_th"))
    kern = df.mapInArrow(charfold_strings_gen("_th"), "doc_id long, _th long")
    assert expr.exceptAll(kern).count() == 0
    assert kern.exceptAll(expr).count() == 0


def test_chargram_kernels_match_on_edge_texts(spark):
    rows = [
        (0, ""),                      # cps [0, 0] -> one gram, fold 0
        (1, "a"),                     # sub-k: one truncated gram
        (2, "abcd"),                  # len k-1
        (3, "abcde"),                 # exactly k: one full gram
        (4, "abcdefgh"),              # k-1 < len < k+w-1: < w grams
        (5, "abcdefghijkl"),          # >= w grams
        (6, "héllo wörld"),           # non-ASCII BMP
        (7, "\U0001F600ab\U0001F600de"),  # non-BMP codepoints
        (8, None),                    # null text
        (9, "aa" * 200),              # repetitive: heavy dedup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _assert_same(_expr_items(df), _kern_items(df))
    _assert_same(_expr_winnow(df), _kern_winnow(df))
