"""Exact interpolated quantiles (quantile_cont / percentile
semantics) at fact grain, without the buffering aggregate.

Spark's exact ``percentile`` aggregate accumulates a value→count map
per group — memory grows with the DISTINCT value count, which for
continuous doubles is the row count: a few-group percentile over a
fact table serializes the group through one aggregation buffer, the
same hazard class as an empty-PARTITION-BY window. This module
computes the identical interpolated values as a RANK SELECTION over
the stitched rank (`stitched_running`):

1. rank every row within its group by the value (ties share a value,
   so value-at-rank is well defined without a tie-break column);
2. keep only the rows at ranks floor(pos)+1 / ceil(pos)+1 for each
   requested p, where pos = (n−1)·p — at most 2·|ps| rows per group
   survive the filter;
3. interpolate with the EXACT convex-combination association both
   engines use — ``lo·(1−frac) + hi·frac`` (probed: DuckDB's
   quantile_cont and Spark's Percentile agree on this form;
   ``lo + frac·(hi−lo)`` differs in the last ulp, which a
   round(·, 4) can land on).

The stitch never sorts a group on one reducer and pins no storage, so
the same plan answers "exact p99 per flag over 100 TB of lineitem".
Grouped mode inherits `stitched_running`'s constraint: the offsets
table is (partitions × groups) rows and must stay broadcastable —
fine for enum-like and calendar-bounded group keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from builder_spark.operators.partitioning import stitched_running


def quantile_cont_stitched(
    df: DataFrame,
    value_col: str,
    ps: dict[str, float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group exact interpolated quantiles of ``value_col``.

    ``ps`` maps output column name → percentile in [0, 1]. Returns one
    row per group: ``group_cols`` + ``n`` (count of NON-NULL values,
    bigint) + one DOUBLE column per ``ps`` entry. With no
    ``group_cols``, one global row.

    NULL handling matches the null-IGNORING aggregate semantics of
    Spark's ``percentile`` and DuckDB's ``quantile_cont``: NULL values
    are filtered before ranking, so they neither inflate ``n`` nor
    shift the rank positions. One documented divergence: a group whose
    values are ALL NULL is omitted from the output (the builtins would
    return that group with NULL quantiles); left-join the group spine
    back if that shape matters.
    """
    gc = list(group_cols or [])
    ranked = stitched_running(
        df.select(*gc, value_col).filter(F.col(value_col).isNotNull()),
        [value_col],
        rank_name="_qr",
        partition_cols=gc or None,
        with_totals=True,
    )
    n = F.col("_qr_total")

    def pos(p: float) -> Column:
        return (n - 1).cast("double") * F.lit(p)

    keep = None
    for p in ps.values():
        hit = (F.col("_qr") == F.floor(pos(p)) + 1) | (F.col("_qr") == F.ceil(pos(p)) + 1)
        keep = hit if keep is None else (keep | hit)
    picked = ranked.filter(keep)

    aggs = [F.max("_qr_total").cast("bigint").alias("n")]
    for out, p in ps.items():
        lo = F.max(F.when(F.col("_qr") == F.floor(pos(p)) + 1, F.col(value_col)))
        hi = F.max(F.when(F.col("_qr") == F.ceil(pos(p)) + 1, F.col(value_col)))
        aggs.append(lo.alias(f"_lo_{out}"))
        aggs.append(hi.alias(f"_hi_{out}"))
    out_df = picked.groupBy(*gc).agg(*aggs) if gc else picked.groupBy().agg(*aggs)

    n2 = F.col("n")
    for out, p in ps.items():
        posn = (n2 - 1).cast("double") * F.lit(p)
        frac = posn - F.floor(posn)
        lo, hi = F.col(f"_lo_{out}"), F.coalesce(F.col(f"_hi_{out}"), F.col(f"_lo_{out}"))
        out_df = out_df.withColumn(
            out, lo * (F.lit(1.0) - frac) + hi * frac
        )
    return out_df.drop(
        *[c for out in ps for c in (f"_lo_{out}", f"_hi_{out}")]
    )
