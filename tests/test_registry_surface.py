"""Guard the graded surface: registry size, SURVEY.md consistency, loud imports.

The driver grades exactly what ``load_all()`` returns; a silent import failure
or a SURVEY/registry drift would shrink the graded surface without any error.
These tests make both failure modes loud.
"""

import re
from pathlib import Path

from builder_spark.registry import QUERIES, load_all

ROOT = Path(__file__).resolve().parent.parent

EXPECTED_COUNT = 671


def _survey_keys() -> set[str]:
    """Parse the §2.B inventory table: rows look like ``| 17 | `q_join_inner` | ...``."""
    text = (ROOT / "SURVEY.md").read_text()
    keys = set()
    for m in re.finditer(r"^\|\s*\d+\s*\|\s*`(q_[a-z0-9_]+)`", text, re.M):
        keys.add(m.group(1))
    return keys


def test_registry_count_exact():
    reg = load_all()
    assert len(reg) == EXPECTED_COUNT, (
        f"registry has {len(reg)} queries, expected {EXPECTED_COUNT} — "
        "a query module failed to import or register"
    )


def test_registry_matches_survey():
    reg = set(load_all())
    survey = _survey_keys()
    assert len(survey) == EXPECTED_COUNT, f"SURVEY.md table has {len(survey)} rows"
    assert reg == survey, (
        f"registry-only: {sorted(reg - survey)}; survey-only: {sorted(survey - reg)}"
    )


def test_rotation_least_recently_graded_first():
    """Never-graded (or last-graded-failing) queries come first, then green
    queries in ascending last-green-round order — so the driver's ~50-query
    window rotates through the longest-unchecked verdicts each round instead
    of regrading the same insertion-order prefix forever."""
    from builder_spark.registry import _last_graded_ok_round

    last_ok = _last_graded_ok_round()
    rounds = [last_ok.get(k, -1) for k in load_all()]
    assert rounds == sorted(rounds), "rotation not least-recently-graded-first"


def test_rotation_failing_grade_evicts():
    """A later failing grade must pull a query back to the front (never-green),
    overriding any earlier green verdict. Runs the real parser against a
    synthetic CORRECTNESS journal via a patched module __file__."""
    import json
    import os
    import tempfile
    import unittest.mock as mock

    from builder_spark import registry

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    bad = {"rows_match": True, "schema_match": True, "hash_match": False}
    with tempfile.TemporaryDirectory() as td:
        (Path(td) / "CORRECTNESS_r01.json").write_text(
            json.dumps({"q_a": green, "q_b": green})
        )
        (Path(td) / "CORRECTNESS_r02.json").write_text(
            json.dumps({"q_b": bad, "q_c": green})
        )
        with mock.patch.object(registry, "__file__", os.path.join(td, "pkg", "registry.py")):
            last_ok = registry._last_graded_ok_round()
    assert last_ok == {"q_a": 1, "q_c": 2}, last_ok


def test_rotation_parser_and_order_against_hand_built_fixture():
    """r13 ADVICE item 1: the structural rotation assert derives both
    sides from the same parser, so it cannot catch a parser bug. This
    test feeds a synthetic CORRECTNESS journal through the REAL parser
    (_last_graded_ok_round) and the REAL sort (_ordered) and compares
    against a fully hand-built expectation, covering: green grades,
    later-failure eviction, rows-only no_oracle grades, non-dict rows,
    a corrupt JSON file (skipped whole), names absent from the
    registry, and UNPADDED round filenames (r2 vs r10 — numeric round
    order must win over lexical path order, else the r10 eviction of a
    query r2 graded green is processed backwards and the query stays
    green)."""
    import json
    import os
    import tempfile
    import unittest.mock as mock

    from builder_spark import registry

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    bad = {"rows_match": True, "schema_match": True, "hash_match": False}
    rows_only = {"rows_match": False, "schema_match": False, "hash_match": False,
                 "spark_rows": 7, "err": "no_oracle"}
    with tempfile.TemporaryDirectory() as td:
        (Path(td) / "CORRECTNESS_r2.json").write_text(json.dumps({
            "q_a": green,          # green, evicted by r9
            "q_b": bad,            # failed -> never-green
            "q_c": rows_only,      # rows-only by design -> counts as graded r2
            "q_d": green,          # green, evicted by r10
            "q_junk": "not-a-dict",  # ignored
            "q_ghost": green,      # parser records it; _ordered never sees it
        }))
        (Path(td) / "CORRECTNESS_r9.json").write_text(json.dumps({
            "q_a": bad,            # eviction
            "q_e": green,
        }))
        (Path(td) / "CORRECTNESS_r10.json").write_text(json.dumps({
            "q_d": bad,            # eviction AFTER r2's green (numeric order)
            "q_c": green,          # upgraded to full green at r10
        }))
        (Path(td) / "CORRECTNESS_r11.json").write_text("{corrupt json!")
        with mock.patch.object(registry, "__file__", os.path.join(td, "pkg", "registry.py")):
            last_ok = registry._last_graded_ok_round()
            entries = [(n, "mod") for n in ["q_a", "q_b", "q_c", "q_d", "q_e", "q_f"]]
            ordered = [n for n, _ in registry._ordered(entries)]
    assert last_ok == {"q_c": 10, "q_e": 9, "q_ghost": 2}, last_ok
    # hand-built: never-graded/evicted first in registration order
    # (a, b, d, f), then green ascending by round (e@9 before c@10)
    assert ordered == ["q_a", "q_b", "q_d", "q_f", "q_e", "q_c"], ordered


def test_query_module_imports_are_loud():
    """load_modules() must not swallow ImportError: every module in the
    package is listed in MODULES and imported unconditionally when the
    eager path runs (this test, gen tools, the differential suite)."""
    src = (ROOT / "builder_spark" / "queries" / "__init__.py").read_text()
    assert "except ImportError" not in src
    # every .py module in the package is listed in the package __init__
    pkg = ROOT / "builder_spark" / "queries"
    for mod in pkg.glob("*.py"):
        if mod.name == "__init__.py":
            continue
        assert mod.stem in src, f"queries/{mod.name} not listed in queries/__init__.py"


def test_registry_index_is_fresh():
    """builder_spark/_query_index.py is generated; a query added/moved
    without regenerating (python tools/gen_registry_index.py) would make
    the lazy load_all() serve a stale surface — eager-load everything
    and compare name order AND module attribution exactly. This is also
    the loud-import gate for the lazy era: a broken query module raises
    right here."""
    import builder_spark.queries
    from builder_spark._query_index import ENTRIES

    builder_spark.queries.load_modules()
    pairs = [(n, q.fn.__module__) for n, q in QUERIES.items()]
    assert set(pairs) == set(ENTRIES), (
        "stale builder_spark/_query_index.py — regenerate with "
        f"tools/gen_registry_index.py; index-only: "
        f"{sorted(set(ENTRIES) - set(pairs))}; registry-only: "
        f"{sorted(set(pairs) - set(ENTRIES))}"
    )
    # Registration-ORDER check. QUERIES insertion order in this pytest
    # process is polluted by whichever test imported a query module
    # first, but within-module order always equals file order — so the
    # canonical global order is the MODULES-order concatenation of the
    # per-module subsequences. That is exactly what a fresh interpreter
    # produces and what the index must pin (rotation-load-bearing).
    per_mod: dict[str, list[str]] = {}
    for n, m in pairs:
        per_mod.setdefault(m, []).append(n)
    canonical = tuple(
        (n, m) for m in builder_spark.queries.MODULES for n in per_mod.get(m, [])
    )
    assert canonical == ENTRIES, (
        "registration order drifted from builder_spark/_query_index.py — "
        "regenerate with tools/gen_registry_index.py"
    )


def test_lazy_load_all_matches_eager_order():
    """The index-backed lazy path and the eager fallback must produce the
    same rotation order — registration order is rotation-load-bearing."""
    import builder_spark.queries
    from builder_spark import registry

    lazy_order = list(load_all())
    builder_spark.queries.load_modules()
    # canonical registration order (QUERIES insertion order in THIS
    # process is polluted by test-import history — reconstruct it from
    # MODULES order × within-module order, as a fresh interpreter sees)
    per_mod: dict[str, list[str]] = {}
    for n, q in QUERIES.items():
        per_mod.setdefault(q.fn.__module__, []).append(n)
    entries = [
        (n, m) for m in builder_spark.queries.MODULES for n in per_mod.get(m, [])
    ]
    eager_order = [n for n, _ in registry._ordered(entries)]
    assert lazy_order == eager_order


def test_all_registered_queries_have_category_fn():
    load_all()
    for name, q in QUERIES.items():
        assert callable(q.fn), name
        assert q.name == name


def test_query_index_doc_is_fresh():
    """docs/QUERIES.md is generated from the registry; a query added
    without regenerating (python tools/gen_query_index.py) leaves the
    index stale — compare the name set."""
    text = (ROOT / "docs" / "QUERIES.md").read_text()
    doc_names = set(re.findall(r"^\| `(q_[a-z0-9_]+)` \|", text, re.M))
    reg = set(load_all())
    assert doc_names == reg, (
        f"stale docs/QUERIES.md — regenerate with tools/gen_query_index.py; "
        f"doc-only: {sorted(doc_names - reg)}; registry-only: {sorted(reg - doc_names)}"
    )
