"""Property tests for the sketch/layout arithmetic behind the graded
queries — pure Python replicas of the exact-integer expressions, so
hypothesis can sweep the key space without a Spark session.

The replicas intentionally re-implement the math from the constants
(not by importing the Column-building helpers): a typo in either copy
breaks the property, which is the cross-check."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from builder_spark.queries.textops import _BLOOM_M, _CMS_P, _CMS_PLANES

WORDS = _BLOOM_M // 63


def _bloom_bits(key: int) -> list[tuple[int, int]]:
    out = []
    for a, b in _CMS_PLANES:
        h = ((a * key + b) % _CMS_P) % _BLOOM_M
        out.append((h // 63, h % 63))
    return out


def _bloom_build(keys: list[int]) -> dict[int, int]:
    words: dict[int, int] = {}
    for k in keys:
        for w, bit in _bloom_bits(k):
            words[w] = words.get(w, 0) | (1 << bit)
    return words


def _bloom_probe(words: dict[int, int], key: int) -> bool:
    return all(words.get(w, 0) & (1 << bit) for w, bit in _bloom_bits(key))


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
@settings(max_examples=200)
def test_bloom_has_no_false_negatives(keys):
    words = _bloom_build(keys)
    assert all(_bloom_probe(words, k) for k in keys)


@given(st.integers(min_value=0, max_value=2**40))
def test_bloom_bits_in_range(key):
    for w, bit in _bloom_bits(key):
        assert 0 <= w < WORDS
        assert 0 <= bit <= 62  # sign bit of the int64 word never set


def _z_interleave(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
def test_zorder_interleave_is_bijective(a, b):
    z = _z_interleave(a, b)
    back_a = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    back_b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (back_a, back_b) == (a, b)
    assert 0 <= z < 2**32


@given(st.integers(min_value=0, max_value=65535))
def test_zorder_is_monotone_on_each_axis_alone(v):
    # fixing one coordinate at 0, z is monotone in the other — the
    # property that makes z-ranges usable for single-column pruning
    assert _z_interleave(v, 0) <= _z_interleave(65535, 0)
    assert _z_interleave(0, v) <= _z_interleave(0, 65535)


def _cms_bucket(h: int, d: int) -> int:
    a, b = _CMS_PLANES[d]
    return ((a * h + b) % _CMS_P) % 256


@given(st.integers(min_value=0, max_value=(1 << 25) - 1))
def test_cms_buckets_in_range_and_rows_differ(h):
    buckets = [_cms_bucket(h, d) for d in range(len(_CMS_PLANES))]
    assert all(0 <= b < 256 for b in buckets)


def test_hll_union_estimate_within_tolerance(spark):
    """q_hll_sketch_union is rows-only for the driver (DataSketches HLL
    is Spark-specific); its accuracy contract lives here: the unioned
    per-type estimate must sit within ±5% of the exact distinct user
    count (lgK=14 gives ~0.8% standard error — 5% is >6 sigma)."""
    import os

    from pyspark.sql import functions as F

    from builder_spark.registry import load_all

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    got = {
        r.event_type: r.approx_users
        for r in load_all()["q_hll_sketch_union"].fn(spark, sf).collect()
    }
    exact = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for k in exact:
        assert abs(got[k] - exact[k]) <= max(2, 0.05 * exact[k]), (k, got[k], exact[k])
