#!/usr/bin/env python
"""Repo-wide unpartitioned-window audit.

Walks every registered query's OPTIMIZED logical plan and extracts
window specs with an EMPTY partition clause (the single-partition
scale hazard). Textual signature: in
``windowspecdefinition(p1, ..., o1 ASC NULLS FIRST, ..., frame)``
partition columns come first WITHOUT sort direction markers — so a
first argument carrying ASC/DESC means the partition spec is empty.

Classification:
- ordered by ``_pid`` → a stitched-offsets frame (bounded by the
  partition COUNT, by construction) — fine;
- anything else is reported with its first order column, to be held
  against the bounded-frame whitelist in tests/test_window_audit.py.

Usage: python tools/window_audit.py [query ...]
"""

from __future__ import annotations

import contextlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: nesting depth of checkpoints_disabled — the global monkeypatch is
#: NOT thread-safe; the guard makes nested entry (an audit helper
#: calling another audit helper) patch once and restore only at the
#: outermost exit, so an inner exit can never un-patch a still-active
#: outer context.
_ckpt_patch_depth = 0


@contextlib.contextmanager
def checkpoints_disabled():
    """Identity-patch DataFrame.localCheckpoint/checkpoint while building
    audited plans. An eager localCheckpoint truncates the optimized plan,
    so a window UPSTREAM of the checkpoint is invisible to this audit —
    which would let a genuinely unbounded window hide behind lineage
    truncation (r12 ADVICE: q_hl_shift_ci ranks a ~3M-row Walsh table
    with an unpartitioned window that the checkpoint then hid). Audits
    must construct query DataFrames inside this context so the FULL
    logical plan, checkpoints elided, is what gets walked.

    Re-entrant (depth-counted, single-threaded only). Covers every
    concrete DataFrame class so no session flavor reverts silently to
    truncated lineage (r13 ADVICE item 2)."""
    global _ckpt_patch_depth
    # patch every concrete DataFrame class: PySpark 4 routes classic
    # queries through pyspark.sql.classic.dataframe.DataFrame and
    # Connect sessions through pyspark.sql.connect.dataframe.DataFrame,
    # both of which OVERRIDE the base pyspark.sql.DataFrame methods —
    # patching only the base class silently does nothing (verified:
    # the checkpoint survived)
    import pyspark.sql

    classes = [pyspark.sql.DataFrame]
    for mod, cls in (
        ("pyspark.sql.classic.dataframe", "DataFrame"),
        ("pyspark.sql.connect.dataframe", "DataFrame"),
    ):
        try:
            import importlib

            classes.append(getattr(importlib.import_module(mod), cls))
        except Exception:  # noqa: BLE001 - flavor not installed/importable
            pass
    _ckpt_patch_depth += 1
    saved = None
    if _ckpt_patch_depth == 1:
        saved = [(c, c.localCheckpoint, c.checkpoint) for c in classes]
        for c in classes:
            c.localCheckpoint = lambda self, *a, **k: self
            c.checkpoint = lambda self, *a, **k: self
    try:
        yield
    finally:
        _ckpt_patch_depth -= 1
        if saved is not None:
            for c, orig_local, orig_ckpt in saved:
                c.localCheckpoint = orig_local
                c.checkpoint = orig_ckpt

def _spec_args(plan: str) -> list[str]:
    """Balanced-paren extraction of every windowspecdefinition(...)
    argument string (specs nest parens two deep: specifiedwindowframe
    contains unboundedpreceding$() etc., so a regex won't do)."""
    marker = "windowspecdefinition("
    out = []
    i = 0
    while True:
        i = plan.find(marker, i)
        if i < 0:
            return out
        j = i + len(marker)
        depth = 1
        while j < len(plan) and depth:
            if plan[j] == "(":
                depth += 1
            elif plan[j] == ")":
                depth -= 1
            j += 1
        out.append(plan[i + len(marker) : j - 1])
        i = j


def unpartitioned_windows(df) -> list[str]:
    """First order column of every empty-partition ORDERED window spec
    in the optimized plan (stitched `_pid` offsets frames excluded).
    Unordered empty-partition specs (plain OVER ()) are global
    aggregates over already-reduced frames — reported separately as
    '<unordered>'."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    out = []
    for line in plan.splitlines():
        for args in _spec_args(line):
            first = args.split(",", 1)[0].strip()
            # partition columns print bare; order columns carry a direction
            if " ASC" in first or " DESC" in first:
                col = first.split(" ")[0].split("#")[0]
                if col != "_pid":
                    out.append(col)
            elif first.startswith("specifiedwindowframe"):
                # stitched frames operate on the offsets aggregate: the
                # enclosing Window node aggregates columns literally
                # named _t_* (partition-count-sized by construction) —
                # bounded, not a hazard. Match a COLUMN REFERENCE
                # `(_t_x#id` / `, _t_x#id`, not a bare substring, so a
                # user alias merely containing '_t_' is still flagged.
                if not re.search(r"[(, ]_t_\w*#\d", line):
                    out.append("<unordered>")
    return out


#: columns whose domain is structurally tiny (enum-like) in the data
#: model — a window PARTITIONed only by these over unbounded-grain
#: input serializes an unbounded slice per reducer, the same hazard as
#: an empty PARTITION BY with a fig leaf
LOW_CARDINALITY_COLS = {
    "lang",
    "source",
    "event_type",
    "split",
    "label",
    "l_returnflag",
    "l_linestatus",
    "o_orderstatus",
    "o_orderpriority",
    "c_mktsegment",
    "r_name",
    "n_name",
    "p_brand",
    "p_container",
}


def low_card_partition_windows(df) -> list[str]:
    """Ordered window specs whose partition key set is entirely
    low-cardinality enum-like columns — flagged because the per-reducer
    slice then grows with the DATA, not the key space. Queries where
    the window input is itself a bounded aggregate justify themselves
    in the test-side whitelist."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    out = []
    for args in _spec_args(plan):
        parts: list[str] = []
        ordered = False
        for arg in args.split(","):
            arg = arg.strip()
            if arg.startswith("specifiedwindowframe"):
                break
            if " ASC" in arg or " DESC" in arg:
                # a stitched offsets frame (ordered by _pid) is bounded
                # by the partition count per group — not a hazard
                ordered = not arg.startswith("_pid#")
                break
            parts.append(arg.split("#")[0])
        if ordered and parts and all(p in LOW_CARDINALITY_COLS for p in parts):
            out.append("+".join(parts))
    return out


# --- incremental cache (r14 verdict task 3) --------------------------------
#
# A full-surface plan walk builds 650+ un-checkpointed DataFrames and
# exceeded 10 min under load. Plans are a pure function of SOURCE, so
# the CLI caches each query's audit result keyed by a fingerprint of
# (its defining module, this tool, and the shared plan-shaping modules)
# and re-audits only queries whose fingerprint changed. `--full`
# ignores the cache (the close-out / CI path; the pytest ratchet in
# tests/test_window_audit.py always builds every plan itself).

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_PATH = os.path.join(_REPO_ROOT, ".window_audit_cache.json")

#: modules whose source shapes EVERY audited plan — any change here
#: invalidates the whole cache (conservative by design: a stitched
#: helper or session conf edit can move window specs in any query)
_SHARED_SOURCE_DIRS = (
    os.path.join(_REPO_ROOT, "builder_spark", "operators"),
    os.path.join(_REPO_ROOT, "builder_spark", "functions"),
)
_SHARED_SOURCE_FILES = (
    os.path.abspath(__file__),
    os.path.join(_REPO_ROOT, "builder_spark", "session.py"),
    os.path.join(_REPO_ROOT, "builder_spark", "catalog.py"),
)


def _sha_files(paths) -> str:
    import hashlib

    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(p.encode())
        try:
            with open(p, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(b"<missing>")
    return h.hexdigest()


def shared_fingerprint() -> str:
    files = list(_SHARED_SOURCE_FILES)
    for d in _SHARED_SOURCE_DIRS:
        for root, _dirs, fnames in os.walk(d):
            files.extend(os.path.join(root, f) for f in fnames if f.endswith(".py"))
    return _sha_files(files)


def module_fingerprint(module: str, shared: str) -> str:
    import importlib.util

    spec = importlib.util.find_spec(module)
    origin = spec.origin if spec and spec.origin else "<none>"
    return shared + ":" + _sha_files([origin])


def audit_query(spark, q, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    """All three plan sweeps for one query, checkpoints elided."""
    with checkpoints_disabled():
        df = q.fn(spark, sf_dir)
    return {
        "unpartitioned": unpartitioned_windows(df),
        "low_card": low_card_partition_windows(df),
        "percentiles": buffering_percentiles(df),
    }


def main(argv: list[str] | None = None) -> int:
    import argparse
    import json
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all batch)")
    ap.add_argument("--full", action="store_true",
                    help="ignore the cache and re-audit everything")
    args = ap.parse_args(argv)

    from builder_spark.registry import load_all

    reg = load_all()
    names = args.names or [n for n in reg if not n.startswith("q_stream_")]

    cache: dict = {}
    if not args.full:
        try:
            with open(CACHE_PATH) as f:
                cache = json.load(f)
        except (OSError, ValueError):
            cache = {}

    shared = shared_fingerprint()
    t0 = time.perf_counter()
    results: dict[str, dict] = {}
    stale = []
    for name in names:
        mod = getattr(reg[name], "module", None) or reg[name].fn.__module__
        fp = module_fingerprint(mod, shared)
        hit = cache.get(name)
        if not args.full and hit and hit.get("fp") == fp:
            results[name] = hit["result"]
        else:
            stale.append((name, fp))

    spark = None
    if stale:
        from builder_spark.session import get_spark

        spark = get_spark("window-audit")
    def _flush() -> None:
        try:
            with open(CACHE_PATH, "w") as f:
                json.dump(cache, f, sort_keys=True)
        except OSError:
            pass

    n_err = 0
    for i, (name, fp) in enumerate(stale):
        try:
            res = audit_query(spark, reg[name])
        except Exception as exc:  # noqa: BLE001 - audit tool, report and move on
            print(f"ERR  {name}: {exc}")
            n_err += 1
            continue
        results[name] = res
        cache[name] = {"fp": fp, "result": res}
        if i % 25 == 24:
            _flush()  # a killed long walk keeps its progress

    flagged = 0
    for name in sorted(results):
        res = results[name]
        if res["unpartitioned"]:
            flagged += 1
            print(f"FLAG {name}: {res['unpartitioned']}")
        if res["low_card"]:
            print(f"LOWCARD {name}: {res['low_card']}")
        if res["percentiles"]:
            print(f"PCTL {name}: {res['percentiles']}")
    _flush()
    dt = time.perf_counter() - t0
    print(
        f"\n{flagged} queries with non-stitched unpartitioned windows "
        f"({len(results)} audited: {len(results) - len(stale) + n_err} cached, "
        f"{len(stale) - n_err} rebuilt, {n_err} errors; {dt:.1f}s)"
    )
    return 1 if n_err else 0




def buffering_percentiles(df) -> list[str]:
    """Exact ``percentile``/``median`` AGGREGATE calls in the optimized
    plan — the buffering quantile: its per-group value→count map grows
    with the distinct-value count (the row count, for continuous
    doubles). Fact-grain uses must go through the stitched rank
    selection (operators/quantiles.py); queries whose aggregate input
    is itself bounded justify themselves in the test-side whitelist.
    ``percentile_approx`` (constant-size sketch) is not flagged."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    out = []
    for m in re.finditer(r"\b(percentile|median)\((?!_approx)", plan):
        out.append(m.group(1))
    return out


if __name__ == "__main__":
    sys.exit(main())
