#!/usr/bin/env python
"""Layer A × Layer B integration demo: the LLM corpus-curation
pipeline (dedup → quality gate → split → pack) run as an incremental
BUILD GRAPH — the two halves of this repo doing the job they were
built for, together.

Jobs (each a time-partitioned target; the fixture has no ingest dates,
so one logical 'snapshot day' stands in for the increment):

  1. ``deduped``   — exact dedup (keep lowest doc_id per content
                     fingerprint) + length gate over documents.
  2. ``splits``    — deterministic Knuth-hash 80/10/10
                     train/val/test assignment of the deduped corpus.
  3. ``packed``    — stitched sequence packing (1024-token bins) of
                     the train split only.

Rebuild semantics demonstrated exactly like pipeline_demo.py: cold
build → all three run; warm re-run → all SKIPPED (staleness pruning);
touch ``deduped`` → ``splits`` and ``packed`` rebuild, proving the
dependency chain prunes correctly.

Usage: python examples/curation_pipeline.py [sf_dir]  # default sf0.001
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from builder_spark.catalog import load_table
from builder_spark.functions.hashing import knuth_bucket  # noqa: E402
from builder_spark.operators.partitioning import stitched_running  # noqa: E402
from builder_spark.pipeline import (  # noqa: E402
    BuildManager,
    ExecutionManager,
    SparkExecutor,
)
from builder_spark.session import get_spark  # noqa: E402

_KNUTH = 2654435761

D0 = datetime(2024, 1, 1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-pipeline")
    root = tempfile.mkdtemp(prefix="builder_spark_curation_")
    dedup_pat = os.path.join(root, "deduped", "%Y-%m-%d")
    split_pat = os.path.join(root, "splits", "%Y-%m-%d")
    packed_pat = os.path.join(root, "packed", "%Y-%m-%d")

    bm = BuildManager()

    @bm.job(targets=dedup_pat, file_step="1 day")
    def deduped(ctx):
        d = load_table(ctx.spark, sf_dir, "documents")
        w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
        return (
            d.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("n_chars") >= 80))
            .drop("_rn")
        )

    @bm.job(targets=split_pat, depends=[dedup_pat], file_step="1 day")
    def splits(ctx):
        d = ctx.spark.read.parquet(*ctx.dep_paths[dedup_pat])
        bucket = knuth_bucket("doc_id", 100)
        return d.withColumn(
            "split",
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
        )

    @bm.job(targets=packed_pat, depends=[split_pat], file_step="1 day")
    def packed(ctx):
        train = ctx.spark.read.parquet(*ctx.dep_paths[split_pat]).filter(
            F.col("split") == "train"
        )
        toks = train.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
        cum = stitched_running(toks, ["doc_id"], running={"_cum": "n_tok"})
        return cum.withColumn(
            "bin_id",
            F.floor((F.col("_cum") - F.col("n_tok")) / 1024.0).cast("bigint"),
        ).select("doc_id", "n_tok", "bin_id")

    end = datetime(2024, 1, 2)

    em = ExecutionManager(bm, SparkExecutor(spark))
    r1 = em.start_execution(D0, end)
    print("run 1 (cold):   ", sorted(r1.values()))
    assert sorted(r1.values()) == ["ran", "ran", "ran"]

    r2 = ExecutionManager(bm, SparkExecutor(spark)).start_execution(D0, end)
    print("run 2 (fresh):  ", sorted(r2.values()))
    assert sorted(r2.values()) == ["skipped", "skipped", "skipped"]

    # upstream refresh: dedup target touched → downstream chain rebuilds
    time.sleep(0.01)
    marker = os.path.join(root, "deduped", "2024-01-01", "_SUCCESS")
    os.utime(marker, (time.time() + 60, time.time() + 60))
    r3 = ExecutionManager(bm, SparkExecutor(spark)).start_execution(D0, end)
    print("run 3 (touched):", sorted(r3.values()))
    assert sorted(r3.values()) == ["ran", "ran", "skipped"]

    n_bins = spark.read.parquet(os.path.join(root, "packed", "2024-01-01")).select(
        "bin_id"
    ).distinct().count()
    print(f"packed train split into {n_bins} bins of ≤1024 tokens — demo OK")


if __name__ == "__main__":
    main()
