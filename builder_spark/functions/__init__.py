"""Column-level function library (JVM-side expressions only).

Everything here returns pyspark Column objects built from built-in
functions — usable inside any DataFrame plan with full codegen, no
Python UDF cost.
"""

from builder_spark.functions.text import (
    fingerprint_md5,
    tokens,
    word_shingles,
)
from builder_spark.functions.vectors import cosine_sim, dot_f64, l2_norm

__all__ = [
    "cosine_sim",
    "dot_f64",
    "fingerprint_md5",
    "l2_norm",
    "tokens",
    "word_shingles",
]
