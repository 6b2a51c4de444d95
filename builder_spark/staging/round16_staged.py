"""STAGED round-16 operators — NOT registered, NOT graded this round.

The r14 verdict (task 1) freezes the graded surface at 671 until
CORRECTNESS_r15 lands full driver coverage, and spends the next growth
budget (task 4) on the thinnest §2.B categories: columnar-layout
maintenance beyond q_zorder_layout. These three operators are staged
here so r16 can register them on day one:

- the module is absent from ``builder_spark.queries.MODULES`` and from
  the generated ``_query_index`` — ``load_all()`` cannot see it;
- nothing here calls ``registry.register`` (a stray import in a test
  process must not mutate the graded registry);
- each operator ships with its DuckDB oracle in ``STAGED_ORACLES`` and
  is hash-checked by tests/test_round16_staged.py at sf0.01 exactly
  the way tools/check.py will once registered.

r16 registration checklist (per entry): wrap with ``@register``,
append this module LAST in MODULES, regenerate the index
(tools/gen_registry_index.py), add the q_compaction_planner /
q_clustering_depth whitelist notes if the plan audit flags their
bounded inventory windows, and re-run the sf0.01 + sf0.1 checks.

Avro note (the other gap the verdict named): an Avro roundtrip is NOT
implementable in this sandbox — pyspark 4.1.2 ships only the
transitive ``avro-1.12.1`` core jars, not the ``spark-avro`` external
module, there is no network to fetch it, and no Python avro codec is
installed (verified round 15: ``spark.read.format("avro")`` raises
FAILED_TO_FIND_DATA_SOURCE and ``import fastavro`` fails). Documented
here rather than stubbed: a fake Avro writer would grade as a
roundtrip without testing one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.partitioning import stitched_running

#: compaction bin target = ceil(total_bytes / _TARGET_BINS): scale-free
#: so the packing is non-degenerate at every sf (a fixed byte constant
#: collapses to one bin at sf0.01 AND sf0.1 — caught staging this);
#: both engines derive the identical integer target from the inventory
_TARGET_BINS = 10


def q_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-size-targeting compaction plan (Delta/Iceberg OPTIMIZE
    shape): pack a file inventory into ~target-size output bins and
    report each bin's membership and fill.

    The inventory is the (source, lang) partition listing of the
    documents corpus with summed byte sizes (n_chars as the byte
    proxy — the sandbox's tables are single files, so the partition
    grain stands in for the small-file listing a lake table would
    return). Packing is the PREFIX-SUM chain: files ordered
    (bytes DESC, source, lang), bin = floor(running_bytes_before /
    target) — the linear approximation OPTIMIZE-style planners use
    (exact greedy close-on-overflow is a sequential recursion; the
    prefix form is one window over the inventory and within 1 file of
    greedy fill per bin).

    100 TB shape: the inventory is METADATA grain — O(#files), never
    O(bytes); one bounded window over it (inventory rows ≪ facts; at
    1000 executors the listing itself is the driver-side metadata
    call, as ObjectStoreTarget does). The fact scan contributes one
    combinable group-by only.
    """
    d = load_table(spark, sf_dir, "documents")
    inv = d.groupBy("source", "lang").agg(
        F.sum("n_chars").alias("bytes"), F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.orderBy(F.col("bytes").desc(), F.col("source").asc(), F.col("lang").asc())
    packed = (
        inv.withColumn(
            "cum_before",
            F.coalesce(
                F.sum("bytes").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "target",
            F.greatest(
                F.ceil(F.sum("bytes").over(Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )) / F.lit(float(_TARGET_BINS))),
                F.lit(1),
            ),
        )
        .withColumn("bin_id", F.floor(F.col("cum_before") / F.col("target")))
    )
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").alias("bin_bytes"),
            F.max("bytes").alias("largest_file_bytes"),
            F.sum("n_docs").alias("n_docs"),
        )
        .select(
            F.col("bin_id").cast("bigint").alias("bin_id"),
            F.col("n_files").cast("bigint").alias("n_files"),
            F.col("bin_bytes").cast("bigint").alias("bin_bytes"),
            F.col("largest_file_bytes").cast("bigint").alias("largest_file_bytes"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
        )
    )


def q_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality metric for a columnar layout: per-file
    (min, max) key ranges and the count of OVERLAPPING file pairs —
    the Iceberg/Delta "clustering depth" that predicts how much data
    skipping a range predicate gets. Two logical 8-file layouts of
    documents by doc_id are compared: ``clustered`` (contiguous rank
    ranges — what a sorted/z-ordered write produces) and ``hashed``
    (doc_id % 8 — what an unsorted shuffled write produces). A
    clustered layout has 0 overlapping pairs; the hashed one
    interleaves every file.

    The global rank comes from the stitched distributed rank (house
    pattern — never a single-partition row_number over the corpus);
    the overlap join runs on the 8-row-per-layout range table (≤ C(8,2)
    pairs — metadata grain, broadcastable at any corpus size).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    per_file = (n + 7) // 8
    rk = stitched_running(d, ["doc_id"], rank_name="r")
    assigned = rk.select(
        "doc_id",
        F.floor((F.col("r") - 1) / F.lit(per_file)).alias("f_clustered"),
        (F.col("doc_id") % 8).alias("f_hashed"),
    )
    out = None
    for layout, col in (("clustered", "f_clustered"), ("hashed", "f_hashed")):
        ranges = assigned.groupBy(F.col(col).alias("f")).agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        )
        a, b = ranges.alias("a"), ranges.alias("b")
        pairs = a.join(
            F.broadcast(b),
            (F.col("a.f") < F.col("b.f"))
            & (F.col("a.lo") <= F.col("b.hi"))
            & (F.col("b.lo") <= F.col("a.hi")),
        )
        row = ranges.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.round(F.avg(F.col("hi") - F.col("lo")), 4).alias("avg_range_width"),
        ).crossJoin(
            F.broadcast(
                pairs.agg(F.count(F.lit(1)).cast("bigint").alias("overlapping_pairs"))
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.select("layout", "n_files", "overlapping_pairs", "avg_range_width")


def q_file_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-skew audit for a hash-bucketed layout: rows and bytes per
    bucket (doc_id % 16 — the deterministic stand-in for a 16-file
    shuffled write), reporting max/avg skew ratios for both. The
    straggler predictor: a 100 TB write whose max/avg bytes ratio is 3
    has one task doing 3x the median work. One combinable group-by at
    fact grain; the 16-row bucket table aggregates to a single row.
    """
    d = load_table(spark, sf_dir, "documents")
    b = d.groupBy((F.col("doc_id") % 16).alias("bucket")).agg(
        F.count(F.lit(1)).alias("rows"), F.sum("n_chars").alias("bytes")
    )
    return b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("rows").cast("bigint").alias("total_rows"),
        F.round(F.max("rows") / F.avg("rows"), 4).alias("row_skew_x"),
        F.round(F.max("bytes") / F.avg("bytes"), 4).alias("byte_skew_x"),
        F.round(F.stddev_pop("bytes") / F.avg("bytes"), 4).alias("byte_cv"),
    )


STAGED_QUERIES = {
    "q_compaction_planner": q_compaction_planner,
    "q_clustering_depth": q_clustering_depth,
    "q_file_skew_audit": q_file_skew_audit,
}

STAGED_ORACLES = {
    "q_compaction_planner": f"""
        WITH inv AS (
            SELECT source, lang, sum(n_chars) AS bytes,
                   count(*) AS n_docs
            FROM documents GROUP BY source, lang
        ),
        packed AS (
            SELECT *,
                   coalesce(sum(bytes) OVER (
                       ORDER BY bytes DESC, source ASC, lang ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before,
                   greatest(ceil(sum(bytes) OVER () / {_TARGET_BINS}.0), 1)
                       AS target
            FROM inv
        )
        SELECT CAST(floor(cum_before / target) AS BIGINT) AS bin_id,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(bytes) AS BIGINT) AS bin_bytes,
               CAST(max(bytes) AS BIGINT) AS largest_file_bytes,
               CAST(sum(n_docs) AS BIGINT) AS n_docs
        FROM packed GROUP BY 1
    """,
    "q_clustering_depth": """
        WITH rk AS (
            SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS r,
                   count(*) OVER () AS n
            FROM documents
        ),
        assigned AS (
            SELECT doc_id,
                   CAST(floor((r - 1) / ceil(n / 8.0)) AS BIGINT)
                       AS f_clustered,
                   doc_id % 8 AS f_hashed
            FROM rk
        ),
        rc AS (
            SELECT f_clustered AS f, min(doc_id) AS lo, max(doc_id) AS hi
            FROM assigned GROUP BY 1
        ),
        rh AS (
            SELECT f_hashed AS f, min(doc_id) AS lo, max(doc_id) AS hi
            FROM assigned GROUP BY 1
        ),
        oc AS (
            SELECT count(*) AS p FROM rc a JOIN rc b
              ON a.f < b.f AND a.lo <= b.hi AND b.lo <= a.hi
        ),
        oh AS (
            SELECT count(*) AS p FROM rh a JOIN rh b
              ON a.f < b.f AND a.lo <= b.hi AND b.lo <= a.hi
        )
        SELECT 'clustered' AS layout,
               CAST((SELECT count(*) FROM rc) AS BIGINT) AS n_files,
               CAST((SELECT p FROM oc) AS BIGINT) AS overlapping_pairs,
               round((SELECT avg(hi - lo) FROM rc), 4) AS avg_range_width
        UNION ALL
        SELECT 'hashed',
               CAST((SELECT count(*) FROM rh) AS BIGINT),
               CAST((SELECT p FROM oh) AS BIGINT),
               round((SELECT avg(hi - lo) FROM rh), 4)
    """,
    "q_file_skew_audit": """
        WITH b AS (
            SELECT doc_id % 16 AS bucket, count(*) AS nr,
                   sum(n_chars) AS bytes
            FROM documents GROUP BY 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(nr) AS BIGINT) AS total_rows,
               round(max(nr) / avg(nr), 4) AS row_skew_x,
               round(max(bytes) / avg(bytes), 4) AS byte_skew_x,
               round(stddev_pop(bytes) / avg(bytes), 4) AS byte_cv
        FROM b
    """,
}
