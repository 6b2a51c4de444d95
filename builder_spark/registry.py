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

    def _round_of(path: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        return int(m.group(1)) if m else 0

    # numeric round order, NOT lexical path order: eviction semantics
    # ("a LATER failing grade evicts") depend on processing rounds in
    # sequence, and a future unpadded CORRECTNESS_r100.json would sort
    # lexically between r09 and r11.
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")), key=_round_of):
        rnd = _round_of(path)
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


class _LazyQuery:
    """Query proxy that imports its defining module on first attribute
    access. Keeps ``load_all()`` O(index) instead of O(35 modules) —
    the bench touches ~19 queries, the driver touches all, and each
    pays only for what it touches (r11 verdict: registry_import_sec
    crept linearly with surface size under the eager import)."""

    __slots__ = ("name", "module")

    def __init__(self, name: str, module: str) -> None:
        self.name = name
        self.module = module

    def _real(self) -> Query:
        q = QUERIES.get(self.name)
        if q is None:
            import importlib

            importlib.import_module(self.module)
            q = QUERIES.get(self.name)
            if q is None:
                raise RuntimeError(
                    f"stale builder_spark/_query_index.py: {self.name!r} not "
                    f"registered by {self.module} — regenerate with "
                    "tools/gen_registry_index.py"
                )
        return q

    @property
    def fn(self) -> QueryFn:
        return self._real().fn

    @property
    def oracle(self) -> str | None:
        return self._real().oracle

    @property
    def category(self) -> str:
        return self._real().category


def _ordered(entries: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Rotation order: never-graded / last-graded-failing first, then
    green queries LEAST-recently-graded first; registration order breaks
    ties. This makes the driver's ~50-query window a rotation that
    re-verifies the longest-unchecked verdicts each round instead of
    regrading the same insertion-order prefix forever."""
    last_ok = _last_graded_ok_round()
    pos = {n: i for i, (n, _) in enumerate(entries)}
    return sorted(entries, key=lambda e: (last_ok.get(e[0], -1), pos[e[0]]))


def load_all() -> dict[str, Query]:
    """Return the full graded registry in rotation order (see _ordered).

    Fast path: resolve names through the GENERATED
    ``builder_spark._query_index`` (kept fresh by
    tests/test_registry_surface.py::test_registry_index_is_fresh) and
    hand out lazy proxies — no query module is imported until one of
    its queries is touched. Fallback (index missing): eager-import
    everything, exactly the pre-r12 behavior."""
    try:
        from builder_spark._query_index import ENTRIES
    except ImportError:
        ENTRIES = None
    if ENTRIES is not None:
        return {
            n: QUERIES.get(n) or _LazyQuery(n, mod)
            for n, mod in _ordered(list(ENTRIES))
        }
    import builder_spark.queries

    builder_spark.queries.load_modules()
    entries = [(n, q.fn.__module__) for n, q in QUERIES.items()]
    return {n: QUERIES[n] for n, _ in _ordered(entries)}
