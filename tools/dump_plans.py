#!/usr/bin/env python
"""Dump per-query plan artifacts for the optimization rounds.

Usage: python tools/dump_plans.py --out plans/r16 --suffix before [--executed] q1 q2 ...

Writes ``<out>/<query>_<suffix>.txt`` with the EXPLAIN FORMATTED output
(static, pre-execution) and, with ``--executed``, additionally
``<query>_<suffix>_executed.txt`` with the POST-EXECUTION (AQE-final)
plan — the only artifact that shows runtime exchange/stage reuse and
AQEShuffleRead coalescing (r16 verdict item 6). The executed dump runs
the query once (collect) at $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from builder_spark.plans import executed_plan, formatted_plan  # noqa: E402
from builder_spark.registry import load_all  # noqa: E402
from builder_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--executed", action="store_true")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("builder-spark-plandump")
    registry = load_all()
    for name in args.names:
        df = registry[name].fn(spark, args.sf)
        with open(os.path.join(args.out, f"{name}_{args.suffix}.txt"), "w") as f:
            f.write(formatted_plan(df))
        if args.executed:
            spark.sparkContext.setJobDescription(f"plandump: {name}")
            plan = executed_plan(df)
            with open(
                os.path.join(args.out, f"{name}_{args.suffix}_executed.txt"), "w"
            ) as f:
                f.write(plan)
        print(f"dumped {name} ({args.suffix})")


if __name__ == "__main__":
    main()
