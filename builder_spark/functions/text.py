"""Text analysis column helpers — tokenization, shingling, fingerprints.

The fixture corpus is single-space-separated lowercase words, so
``split(text, ' ')`` is the parity-safe tokenizer (FIXTURES.md); the
regex tokenizer handles messier input. Fingerprints use md5 (present
and identical in Spark and DuckDB) rather than xxhash64/murmur (which
are engine-specific).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (exact parity with SQL string_split)."""
    return F.split(_c(text), " ")


def regex_tokens(text: Column | str, pattern: str = r"[^a-z0-9]+") -> Column:
    """Regex tokenizer for messy text (BPE-ish pre-tokenization)."""
    return F.split(_c(text), pattern)


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles as strings (input to MinHash).

    Built with sequence+transform — arrays stay JVM-side. A document of
    w words yields max(w-n+1, 0) shingles.
    """
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]))
    )


def fingerprint_md5(text: Column | str, normalized: bool = False) -> Column:
    """Content fingerprint. ``normalized=True`` hashes the sorted set of
    words — stable under word reordering (bag-of-words identity)."""
    t = _c(text)
    if normalized:
        t = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(t))))
    return F.md5(t)


def token_stats(text: Column | str) -> dict[str, Column]:
    """Cheap quality signals: token count, distinct ratio, mean word len."""
    toks = tokens(text)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    mean_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
    ) / n.cast("double")
    return {
        "n_tokens": n,
        "n_distinct": n_distinct,
        "distinct_ratio": n_distinct.cast("double") / n.cast("double"),
        "mean_word_len": mean_len,
    }
