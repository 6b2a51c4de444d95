"""Engine-portable deterministic hashing for sampling / splits.

The Knuth multiplicative hash ``(key * 2654435761) % 2^32 % m`` is the
repo's standard RNG-free sampler: it pushes into the parquet scan as a
plain filter, and the DuckDB oracles replay it in HUGEINT arithmetic.

The multiply is done in DECIMAL(38,0): an int64 key times the 2^32/φ
constant reaches ~2^95 for the largest ids, which overflows BIGINT —
under Spark 4's default ANSI mode that is an ARITHMETIC_OVERFLOW error
at exactly the id ranges a 100 TB corpus has (and in legacy mode a
silent wraparound that diverges from the oracle's HUGEINT). Decimal
matches HUGEINT digit-for-digit across the whole int64 domain, and the
per-row cost is one widened multiply on a column the filter consumes
anyway.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2^32 / φ — Knuth's multiplicative hashing constant
KNUTH = 2654435761


def knuth_bucket(key: Column | str, m: int) -> Column:
    """``(key * KNUTH) % 2^32 % m`` as an overflow-safe int column —
    identical to the oracle-side ``(CAST(key AS HUGEINT) * KNUTH) %
    4294967296 % m`` for every int64 key."""
    key = F.col(key) if isinstance(key, str) else key
    wide = key.cast("decimal(38,0)") * F.lit(KNUTH)
    return F.pmod(F.pmod(wide, F.lit(2**32)), F.lit(m)).cast("long")


def knuth_top_bit(key: Column | str) -> Column:
    """The TOP bit of ``(key * KNUTH) % 2^32`` as 0/1 — the
    well-mixed bit of a multiplicative hash. ``knuth_bucket(key, 2)``
    is the BOTTOM bit, which a multiply-mod-2^32 by an odd constant
    leaves equal to the key's own parity (useless as a pseudo-random
    sign; it burned q_jl_projection's sign matrix down to rank 1
    before this helper existed). Oracle-side equivalent:
    ``((CAST(key AS HUGEINT) * KNUTH) % 4294967296) // 2147483648``."""
    key = F.col(key) if isinstance(key, str) else key
    wide = key.cast("decimal(38,0)") * F.lit(KNUTH)
    return (F.pmod(wide, F.lit(2**32)) / F.lit(2**31)).cast("long")
