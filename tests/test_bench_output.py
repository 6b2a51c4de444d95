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


def _reports():
    fake = {name: 123.456 for name in bench.HEADLINE}
    return bench.build_reports(
        timings=dict(fake),
        warm=dict(fake),
        warm_median=dict(fake),
        session_up_sec=123.456,
        registry_import_sec=123.456,
        noop_action_sec=123.456,
        noop_warm_sec=123.456,
        warmup_sec=123.456,
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
    assert summary["value"] == round(123.456 * n, 3)
    assert summary["warm_median_total_minus_floors_sec"] == round(
        123.456 * n - n * 123.456, 3
    )
