"""Query registry — the single source of truth for the graded surface.

Every operator from SURVEY.md §2.B registers here with:
- a PySpark implementation ``fn(spark, sf_dir) -> DataFrame``
- an optional DuckDB oracle SQL string (omitted only for genuinely
  non-SQL-expressible ops — streaming, approx sketches — which the
  driver then checks rows-only).

``__spark_entry__.py`` re-exports this registry as the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str


#: name → Query; populated by importing builder_spark.queries
QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, category: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a graded query (and its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def _last_graded_ok_round() -> dict[str, int]:
    """name → the most recent driver CORRECTNESS round that graded it green.

    The driver grades the first ~50 registry entries each round. A query
    counts as graded-green for a round when rows/schema/hash all matched,
    or when it is rows-only by design (``err == "no_oracle"``) and
    produced rows. A LATER failing grade evicts the entry — failed or
    crashed queries go back to the front for immediate re-grading.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_ok: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                results = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, r in results.items():
            if not isinstance(r, dict):
                continue
            if r.get("rows_match") and r.get("schema_match") and r.get("hash_match"):
                last_ok[name] = rnd
            elif r.get("err") == "no_oracle" and (r.get("spark_rows") or 0) >= 0:
                last_ok[name] = rnd
            else:
                last_ok.pop(name, None)
    return last_ok


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return
    the registry, ordered never-graded / last-graded-failing first, then
    green queries LEAST-recently-graded first. With the never-graded
    backlog empty (every query green since r8), this makes the driver's
    ~50-query window a rotation that re-verifies the longest-unchecked
    verdicts each round instead of regrading the same insertion-order
    prefix forever — r1-era greens get rechecked against later refactors.
    Insertion order breaks ties, so the rotation is stable within a round
    vintage.
    """
    import builder_spark.queries  # noqa: F401  (import triggers registration)

    last_ok = _last_graded_ok_round()
    order = list(QUERIES)
    pos = {n: i for i, n in enumerate(order)}
    order.sort(key=lambda n: (last_ok.get(n, -1), pos[n]))
    return {n: QUERIES[n] for n in order}
