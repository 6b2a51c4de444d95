"""Bench contract guard: BENCH_r02 was rc=1 because a headline query
broke between rounds (fixture schema drift) and nothing local failed
fast. Pin the two cheap invariants: every HEADLINE name resolves in the
registry, and each headline query builds AND executes at test scale."""

from __future__ import annotations

import importlib.util
import os

from builder_spark.registry import load_all

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)


def test_headline_names_registered():
    reg = load_all()
    missing = [n for n in _bench.HEADLINE if n not in reg]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"


def test_headline_queries_execute(spark):
    reg = load_all()
    for name in _bench.HEADLINE:
        # .count() = the exact action bench takes; a plan-build or
        # execution error here is the r02 failure mode
        reg[name].fn(spark, SF_DIR).count()


def test_join_multi_dims_stay_broadcast(spark):
    """r03 bench showed a nominal q_join_multi cold regression; the
    risk worth guarding is AQE demoting the dimension broadcasts to
    shuffle joins. Pin: after execution, the final (AQE) plan contains
    NO sort-merge or shuffled-hash join — every join in the star is a
    BroadcastHashJoin at bench scale. (The residual cold delta is
    JIT/IO noise: warm time is unchanged round-over-round.)"""
    reg = load_all()
    df = reg["q_join_multi"].fn(spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final, "dimension broadcast was demoted"
    assert "ShuffledHashJoin" not in final, "dimension broadcast was demoted"


def test_comparable_set_is_fixed_headline_subset():
    """COMPARABLE is the frozen cross-round comparison basket: it must
    stay a subset of HEADLINE (so both totals come from one run) and
    keep its r04 membership — growing it would silently break
    round-over-round deltas."""
    assert set(_bench.COMPARABLE) <= set(_bench.HEADLINE)
    assert len(_bench.COMPARABLE) == 12
