"""Driver-parseability pin for bench.py's stdout contract.

BENCH_r12.json recorded ``"parsed": null`` — the first ever — because
the single JSON line bench.py printed outgrew the driver's stdout tail
window once the warm-median and noop-reference fields landed: the tail
captured a line whose HEAD was cut off, so ``json.loads`` failed.  The
r12 verdict (item 2) orders the fix pinned: the FINAL stdout line must
be a compact summary that parses clean and stays under ~2 KB, with the
three per-query maps on a preceding line / sidecar.  These tests build
the summary through the real ``bench.build_reports`` with the full
19-query headline set (worst-case key lengths) and assert the size and
field contract without needing Spark.
"""

from __future__ import annotations

import json

import bench


#: distinct per-query values and a noop floor that is NOT one of them —
#: r13 ADVICE item 3: feeding 123.456 everywhere made the minus-floors
#: assertion check 0.0 == 0.0, so a dropped len() factor or sign error
#: still passed. These make every derived total a distinct nonzero
#: number that pins the formula's coefficients.
_TIMINGS = {name: round(10.0 + 0.111 * i, 3) for i, name in enumerate(bench.HEADLINE)}
_WARM = {name: round(2.0 + 0.07 * i, 3) for i, name in enumerate(bench.HEADLINE)}
_WARM_MEDIAN = {name: round(1.5 + 0.05 * i, 3) for i, name in enumerate(bench.HEADLINE)}
_NOOP_WARM = 0.37


def _reports():
    return bench.build_reports(
        timings=dict(_TIMINGS),
        warm=dict(_WARM),
        warm_median=dict(_WARM_MEDIAN),
        session_up_sec=5.5,
        registry_import_sec=0.012,
        noop_action_sec=2.8,
        noop_warm_sec=_NOOP_WARM,
        warmup_sec=7.7,
        sf=0.1,
    )


def test_summary_line_fits_driver_tail_window():
    _detail, summary = _reports()
    line = json.dumps(summary)
    # The driver keeps only a tail of stdout; BENCH_r12's captured tail
    # was ~2 KB and cut the 4.4 KB single line mid-object. Budget the
    # final line at 2000 bytes with headroom for value drift.
    assert len(line) < 2000, f"summary line {len(line)}B >= 2000B tail budget"
    assert json.loads(line) == summary


def test_summary_has_driver_contract_fields():
    _detail, summary = _reports()
    for field in ("metric", "value", "unit", "queries", "sf"):
        assert field in summary, field
    assert summary["unit"] == "sec"
    assert set(summary["queries"]) == set(bench.HEADLINE)
    # the 2x-gate fields the r12 verdict wants visible on the final line
    for field in (
        "warm_median_total_sec",
        "warm_median_total_minus_floors_sec",
        "host_startup_load_x",
        "host_steady_load_x",
    ):
        assert field in summary, field


def test_detail_carries_per_query_maps_and_refs():
    detail, summary = _reports()
    assert set(detail["queries_warm"]) == set(bench.HEADLINE)
    assert set(detail["queries_warm_median"]) == set(bench.HEADLINE)
    assert detail["noop_refs_quiet_host"] == bench.NOOP_REFS
    # the maps moved OFF the summary line — keep them off
    assert "queries_warm" not in summary
    assert "queries_warm_median" not in summary
    assert "noop_refs_quiet_host" not in summary


def test_summary_totals_consistent():
    _detail, summary = _reports()
    n = len(bench.HEADLINE)
    assert summary["value"] == round(sum(_TIMINGS.values()), 3)
    assert summary["warm_total_sec"] == round(sum(_WARM.values()), 3)
    assert summary["warm_median_total_sec"] == round(sum(_WARM_MEDIAN.values()), 3)
    # non-degenerate: distinct warm-median values and a floor that is
    # not any of them, so the expected number pins BOTH the sum term
    # and the n * noop_warm coefficient (~6.02 for the 19-query set)
    expected_minus_floors = round(sum(_WARM_MEDIAN.values()) - n * _NOOP_WARM, 3)
    assert expected_minus_floors != 0.0
    assert summary["warm_median_total_minus_floors_sec"] == expected_minus_floors
    assert summary["host_steady_load_x"] == round(
        _NOOP_WARM / bench.NOOP_REFS["noop_warm_sec"], 2
    )


# --- quiet-window evidence artifact (r14 verdict task 2) -------------------

#: the r9 quiet-host warm-median reference the 2x perf gate is argued
#: against (VERDICT r9/r13/r14: 11.16 s on an idle box at sf0.1)
R9_QUIET_WARM_MEDIAN_SEC = 11.16


def test_quiet_artifact_gating(tmp_path):
    """maybe_write_quiet_artifact writes ONLY for a quiet, standard-
    config run — loaded host, wrong sf, or a partial headline set must
    all refuse (a subset run would record a vacuously fast total)."""
    _detail, summary = _reports()
    wm = dict(_WARM_MEDIAN)
    # _reports() uses noop_warm 0.37 -> steady 3.08x: must refuse
    assert summary["host_steady_load_x"] > bench.QUIET_ACCEPT_LOAD_X
    assert not bench.maybe_write_quiet_artifact(summary, wm, str(tmp_path))
    quiet = dict(summary, host_steady_load_x=1.2)
    assert not bench.maybe_write_quiet_artifact(dict(quiet, sf=0.01), wm, str(tmp_path))
    partial = {k: v for k, v in wm.items() if k != "q_agg_group"}
    assert not bench.maybe_write_quiet_artifact(quiet, partial, str(tmp_path))
    assert not (tmp_path / "bench_quiet.json").exists()
    assert bench.maybe_write_quiet_artifact(quiet, wm, str(tmp_path))
    art = json.loads((tmp_path / "bench_quiet.json").read_text())
    assert art["quiet_accept_threshold_x"] == bench.QUIET_ACCEPT_LOAD_X
    assert art["queries_warm_median"] == wm
    assert art["warm_median_total_sec"] == summary["warm_median_total_sec"]


def test_quiet_artifact_schema_and_gate():
    """The committed bench_quiet.json is the raw evidence for the 2x
    perf gate: it must carry the full parsed-summary schema, have been
    accepted under its own recorded threshold, and its warm-median
    total must be within 2x the r9 quiet-host reference."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench_quiet.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("bench_quiet.json not yet captured — needs a quiet host window")
    with open(path) as f:
        art = json.load(f)
    for field in (
        "metric", "value", "unit", "queries", "sf",
        "warm_median_total_sec", "warm_median_total_minus_floors_sec",
        "host_steady_load_x", "quiet_accept_threshold_x",
        "queries_warm_median", "recorded_unix",
    ):
        assert field in art, field
    assert art["sf"] == 0.1
    assert art["host_steady_load_x"] <= art["quiet_accept_threshold_x"]
    assert set(art["queries_warm_median"]) >= set(bench.HEADLINE)
    assert art["warm_median_total_sec"] <= 2 * R9_QUIET_WARM_MEDIAN_SEC
