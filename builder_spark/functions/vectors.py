"""Vector math over array<float> columns — pure built-in expressions.

All accumulation happens in DOUBLE regardless of the array element
type (the fixture embeddings are float32; summing in float32 loses
precision and breaks cross-engine parity). ``zip_with`` + ``aggregate``
evaluate element-wise inside codegen — no UDF, no Python.

Scale: these are per-row expressions — they parallelize with the scan
and never shuffle. A brute-force top-k over N vectors × K queries is
K·N rows of this expression; see operators/similarity.py for the
blocked / LSH strategies when K·N gets large.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_f64(a: Column | str, b: Column | str) -> Column:
    """Dot product accumulated in double, sequential left-to-right."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v: Column | str) -> Column:
    """Euclidean norm, double accumulation."""
    v = F.col(v) if isinstance(v, str) else v
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision."""
    return dot_f64(a, b) / (l2_norm(a) * l2_norm(b))


def quantize_i8(v: Column | str, scale: Column) -> Column:
    """Symmetric int8 quantization: q = clamp(floor(x·scale + 0.5), ±127).

    floor(x+0.5) instead of round(): explicit half-up-toward-+inf is
    bit-identical across engines, while round()'s half-away/half-even
    modes differ between SQL dialects.
    """
    v = F.col(v) if isinstance(v, str) else v
    return F.transform(
        v,
        lambda x: F.least(
            F.greatest(F.floor(x.cast("double") * scale + 0.5), F.lit(-127.0)), F.lit(127.0)
        ).cast("long"),
    )


def dequantize(q: Column | str, scale: Column) -> Column:
    """Inverse of quantize_i8 (lossy): x̂ = q / scale."""
    q = F.col(q) if isinstance(q, str) else q
    return F.transform(q, lambda x: x.cast("double") / scale)
