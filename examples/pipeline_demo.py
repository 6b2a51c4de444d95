#!/usr/bin/env python
"""End-to-end Layer-A demo: an incremental, staleness-pruned daily
pipeline over the events fixture — the workflow a deepfield/builder
user runs today, expressed on Spark.

Two jobs:
  1. ``hourly_rollup``  — events → per-hour event-type counts/sums,
     one parquet target per DAY (the job's file_step), written with
     overwrite so a re-run replaces exactly its slice.
  2. ``daily_top_types`` — depends on the hourly target pattern;
     produces the top event types per day.

The demo runs the build three times to show the scheduler semantics:
  run 1: cold — everything builds.
  run 2: warm — every target fresh → every job SKIPPED (staleness
         pruning; zero Spark actions happen).
  run 3: one upstream day's target is touched → exactly that day's
         downstream job re-runs (incremental rebuild).
Then a PrintExecutor pass shows the dry-run (explain-only) mode.

Usage: python examples/pipeline_demo.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from builder_spark.catalog import load_table  # noqa: E402
from builder_spark.pipeline import (  # noqa: E402
    BuildManager,
    ExecutionManager,
    PrintExecutor,
    SparkExecutor,
)
from builder_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pipeline-demo")
    root = tempfile.mkdtemp(prefix="builder_spark_demo_")
    hourly_pat = os.path.join(root, "hourly", "%Y-%m-%d")
    daily_pat = os.path.join(root, "daily_top", "%Y-%m-%d")

    bm = BuildManager()

    @bm.job(targets=hourly_pat, file_step="1 day")
    def hourly_rollup(ctx):
        e = load_table(ctx.spark, sf_dir, "events")
        day = (F.col("ts") >= F.lit(ctx.start)) & (F.col("ts") < F.lit(ctx.end))
        return (
            e.filter(day)
            .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        )

    @bm.job(targets=daily_pat, depends=[hourly_pat], file_step="1 day", retries=1)
    def daily_top_types(ctx):
        hourly = ctx.spark.read.parquet(*ctx.dep_paths[hourly_pat])
        return (
            hourly.groupBy("event_type")
            .agg(F.sum("n").alias("events"), F.round(F.sum("total"), 4).alias("value"))
            .orderBy(F.col("events").desc(), F.col("event_type"))
            .limit(3)
        )

    start, end = datetime(2024, 1, 1), datetime(2024, 1, 4)  # 3 day buckets

    def run(tag: str) -> dict[str, str]:
        res = ExecutionManager(bm, SparkExecutor(spark)).start_execution(start, end)
        ran = sorted(k for k, v in res.items() if v == "ran")
        skipped = sorted(k for k, v in res.items() if v == "skipped")
        print(f"[{tag}] ran={len(ran)} skipped={len(skipped)}")
        for k in ran:
            print(f"         ran: {k}")
        return res

    r1 = run("cold  ")  # 6 jobs run (2 jobs × 3 days)
    assert sum(v == "ran" for v in r1.values()) == 6, r1

    r2 = run("warm  ")  # everything fresh → all skipped
    assert all(v == "skipped" for v in r2.values()), r2

    # invalidate ONE upstream day: its downstream day must rebuild,
    # the other two days stay skipped
    touched = datetime(2024, 1, 2).strftime(hourly_pat)
    now = time.time() + 10
    for dirpath, _dirs, files in os.walk(touched):
        for f in files:
            os.utime(os.path.join(dirpath, f), (now, now))
    r3 = run("incr  ")
    ran3 = {k for k, v in r3.items() if v == "ran"}
    assert ran3 == {"daily_top_types@2024-01-02T00:00:00"}, ran3

    print("\n[dry-run] PrintExecutor (explain-only, writes nothing):")
    pe = PrintExecutor(spark)
    bg = bm.expand(start, datetime(2024, 1, 2))
    for cj in bg.topological():
        if cj.job.name == "hourly_rollup":
            pe.execute(cj)
            break

    # forced backfill, wave-parallel: day buckets of hourly_rollup are
    # independent, so max_workers=4 overlaps their Spark jobs; each
    # daily_top_types bucket still waits for its producer bucket
    t0 = time.time()
    r4 = ExecutionManager(bm, SparkExecutor(spark)).start_execution(
        start, end, force=True, max_workers=4
    )
    assert sum(v == "ran" for v in r4.values()) == 6, r4
    print(f"[parallel] forced 3-day backfill, max_workers=4: {time.time() - t0:.1f}s")

    shutil.rmtree(root, ignore_errors=True)
    print(
        "\ndemo OK: cold build, staleness skip, incremental rebuild, "
        "dry run, parallel backfill"
    )


if __name__ == "__main__":
    main()
