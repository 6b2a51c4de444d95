"""Source/sink connector queries: csv and json roundtrips (SURVEY.md
§2.B rows 75-76; parquet roundtrip is q_write_roundtrip in udf.py).

Each writes a fixture slice through builder_spark.sources, reads it
back with an EXPLICIT schema (text formats never infer in pipeline
code), and aggregates; the oracle aggregates the ORIGINAL table, so a
hash-match proves the sink+source pair is lossless for every type that
crossed the text boundary (bigint, double, string).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.partitioning import stitched_running
from builder_spark.registry import register
from builder_spark.scratch import scratch_dir
from builder_spark.sources import (
    read_csv,
    read_json,
    read_orc,
    write_bucketed,
    write_csv,
    write_json,
    write_orc,
)


@register(
    "q_csv_roundtrip",
    oracle="""
        SELECT o_orderstatus,
               count(*) AS n,
               CAST(sum(o_custkey) AS BIGINT) AS custkey_sum,
               round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4) AS total  -- exact cents: 1.3e10 cells
        FROM orders
        GROUP BY o_orderstatus
    """,
    category="source-sink",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source roundtrip on orders (bigint/string/double cross
    the text boundary; Spark writes shortest-roundtrip doubles, so the
    re-read values are bit-identical)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    out = scratch_dir("csv_roundtrip")
    write_csv(o, out)
    back = read_csv(
        spark,
        out,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_custkey").alias("custkey_sum"),
        F.round(  # exact cents sum (1.3e10-magnitude cells at sf0.1)
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("double") / 100.0, 4
        ).alias("total"),
    )


@register(
    "q_json_roundtrip",
    oracle="""
        SELECT p_size,
               count(*) AS n,
               round(sum(p_retailprice), 4) AS retail_total,
               count(DISTINCT p_type) AS n_types
        FROM part
        GROUP BY p_size
    """,
    category="source-sink",
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+source roundtrip on part (int/double/string)."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_size", "p_retailprice"
    )
    out = scratch_dir("json_roundtrip")
    write_json(p, out)
    back = read_json(
        spark, out, schema="p_partkey bigint, p_type string, p_size int, p_retailprice double"
    )
    return back.groupBy("p_size").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("p_retailprice"), 4).alias("retail_total"),
        F.countDistinct("p_type").alias("n_types"),
    )


@register(
    "q_orc_roundtrip",
    oracle="""
        SELECT c_mktsegment,
               count(*) AS n,
               CAST(sum(c_nationkey) AS BIGINT) AS nation_sum,
               round(sum(c_acctbal), 4) AS acctbal_total
        FROM customer
        GROUP BY c_mktsegment
    """,
    category="source-sink",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source roundtrip on customer — the third columnar
    format next to parquet (same stripe-stat pushdown machinery in
    Spark's native reader). Binary columnar format, so the roundtrip
    is bit-lossless by construction; the oracle runs the same agg on
    the ORIGINAL table, proving it."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    out = scratch_dir("orc_roundtrip")
    write_orc(c, out)
    back = read_orc(spark, out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c_nationkey").alias("nation_sum"),
        F.round(F.sum("c_acctbal"), 4).alias("acctbal_total"),
    )


@register(
    "q_join_bucketed",
    oracle="""
        SELECT c.c_mktsegment,
               count(*) AS n_orders,
               round(CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4) AS total  -- exact cents: 7.7e9 cells
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    category="source-sink",
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join over two tables bucketed on the join key — the co-located
    join that replaces the fact⨝fact shuffle at 100 TB (bucket layout
    is computed once at write time, then every subsequent join on the
    key is exchange-free; tests/test_plans.py asserts zero Exchange
    with broadcast disabled). Bucket counts MUST match on both sides.
    The oracle joins the original tables, proving the bucketed layout
    is a pure physical transform."""
    base = scratch_dir("bucketed")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(o, "bkt_orders", ["o_custkey"], 8, sort_cols=["o_custkey"],
                   path=os.path.join(base, "orders"))
    write_bucketed(c, "bkt_customer", ["c_custkey"], 8, sort_cols=["c_custkey"],
                   path=os.path.join(base, "customer"))
    ob, cb = spark.table("bkt_orders"), spark.table("bkt_customer")
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(  # exact cents sum (7.7e9-magnitude cells at sf0.1)
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("double") / 100.0, 4
            ).alias("total"),
        )
    )


@register(
    "q_text_roundtrip",
    oracle="""
        SELECT count(*) AS n_lines,
               CAST(sum(length(text)) AS BIGINT) AS total_cp,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_lines
        FROM documents
    """,
    category="source-sink",
)
def q_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text sink+source roundtrip: the documents corpus
    written as raw lines (the rawest corpus interchange format) and
    read back with ``spark.read.text``. Fixture text is newline-free
    single-space words, so line framing is lossless; the hash-match
    against stats on the ORIGINAL table proves it. At 100 TB the text
    source splits on line boundaries within files — fully parallel
    ingest with no schema inference cost."""
    from builder_spark.sources import read_text, write_text

    d = load_table(spark, sf_dir, "documents").select("text")
    out = scratch_dir("text_roundtrip")
    write_text(d, out)
    back = read_text(spark, out)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_cp"),
        F.countDistinct(F.md5("value")).alias("distinct_lines"),
    )


@register(
    "q_binaryfile_source",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents
        WHERE doc_id < 200
    """,
    category="source-sink",
)
def q_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal INGEST path: opaque files read through Spark's
    ``binaryFile`` source — (path, modificationTime, length, content)
    rows with the payload as a binary column, which is exactly how
    images/audio/video enter a 100 TB pipeline (one row per object,
    pathGlobFilter + recursiveFileLookup prune the listing, each file
    is one task — no line-splitting assumption on opaque bytes).

    Files are staged executor-side (foreachPartition, no driver
    collect) with payload = utf-8 bytes of the document text, so the
    oracle can recompute every checksum from the ORIGINAL table:
    a hash-match proves the write→list→read→checksum chain is
    byte-lossless. doc_id round-trips through the file NAME
    (regexp_extract on path) — the id-in-path pattern object stores
    rely on."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    out = scratch_dir("binaryfile_src")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def write_files(rows) -> None:
        for r in rows:
            with open(os.path.join(out, f"doc_{r['doc_id']}.bin"), "wb") as f:
                f.write(r["text"].encode("utf-8"))

    d.select("doc_id", "text").foreachPartition(write_files)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
    )
    return back.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@register(
    "q_compaction",
    oracle="""
        SELECT count(*) AS n_rows,
               CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
               round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4) AS price_sum,  -- exact cents: 3.2e9
               TRUE AS layout_compacted
        FROM lineitem
        WHERE l_orderkey % 10 = 0
    """,
    category="source-sink",
)
def q_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance job every 100 TB
    dataset needs (streaming sinks and over-parallel writes fragment
    tables into files far below the row-group sweet spot; reads then
    pay per-file open/footer costs and lose row-group statistics).
    Writes a deliberately fragmented copy (repartition(64)), compacts
    with a single repartition(4) rewrite, and proves BOTH invariants
    the real job must hold: content identity (row count + key/price
    checksums vs the ORIGINAL table — the graded hash) and layout
    change, graded as the INVARIANT ``files_after < files_before AND
    1 <= files_after <= 4`` rather than exact counts — Spark writes
    no file for an empty partition, so absolute counts depend on row
    volume per scale factor. At scale the same rewrite runs per
    partition-slice with dynamic partition overwrite so compaction is
    incremental and replay-idempotent."""
    import glob as _glob
    import shutil

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    frag = scratch_dir("compact_frag")
    tight = scratch_dir("compact_tight")
    for p in (frag, tight):
        shutil.rmtree(p, ignore_errors=True)
    li.repartition(64).write.mode("overwrite").parquet(frag)
    files_before = len(_glob.glob(os.path.join(frag, "*.parquet")))
    # explicit schemas: a degenerate (0/1-row) input writes 0/1 part
    # files — inference would fail on the empty dir, and the invariant
    # below degrades to "already at most 4 files" when there was
    # nothing to compact (files_before <= 4)
    spark.read.schema(li.schema).parquet(frag).repartition(4).write.mode(
        "overwrite"
    ).parquet(tight)
    files_after = len(_glob.glob(os.path.join(tight, "*.parquet")))
    back = spark.read.schema(li.schema).parquet(tight)
    compacted = files_after <= 4 and (files_after < files_before or files_before <= 4)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").cast("bigint").alias("key_sum"),
        F.round(  # exact cents sum (3.2e9 magnitude at sf0.1)
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("double") / 100.0, 4
        ).alias("price_sum"),
        F.lit(compacted).alias("layout_compacted"),
    )


_Z_INTERLEAVE = "(((a >> 0) & 1) << 0) + (((b >> 0) & 1) << 1) + (((a >> 1) & 1) << 2) + (((b >> 1) & 1) << 3) + (((a >> 2) & 1) << 4) + (((b >> 2) & 1) << 5) + (((a >> 3) & 1) << 6) + (((b >> 3) & 1) << 7) + (((a >> 4) & 1) << 8) + (((b >> 4) & 1) << 9) + (((a >> 5) & 1) << 10) + (((b >> 5) & 1) << 11) + (((a >> 6) & 1) << 12) + (((b >> 6) & 1) << 13) + (((a >> 7) & 1) << 14) + (((b >> 7) & 1) << 15) + (((a >> 8) & 1) << 16) + (((b >> 8) & 1) << 17) + (((a >> 9) & 1) << 18) + (((b >> 9) & 1) << 19) + (((a >> 10) & 1) << 20) + (((b >> 10) & 1) << 21) + (((a >> 11) & 1) << 22) + (((b >> 11) & 1) << 23) + (((a >> 12) & 1) << 24) + (((b >> 12) & 1) << 25) + (((a >> 13) & 1) << 26) + (((b >> 13) & 1) << 27) + (((a >> 14) & 1) << 28) + (((b >> 14) & 1) << 29) + (((a >> 15) & 1) << 30) + (((b >> 15) & 1) << 31)"


@register(
    "q_zorder_layout",
    oracle="""
        WITH z AS (
            SELECT o_orderkey,
                   o_custkey % 65536 AS a,
                   CAST(floor(o_totalprice) AS BIGINT) % 65536 AS b
            FROM orders
        ),
        zv AS (
            SELECT o_orderkey, a, b, {Z} AS zval FROM z
        ),
        bucketed AS (
            SELECT a, b, ntile(32) OVER (ORDER BY zval ASC, o_orderkey ASC) AS bucket
            FROM zv
        )
        SELECT bucket, count(*) AS n,
               CAST(min(a) AS BIGINT) AS min_cust, CAST(max(a) AS BIGINT) AS max_cust,
               CAST(min(b) AS BIGINT) AS min_price, CAST(max(b) AS BIGINT) AS max_price
        FROM bucketed
        GROUP BY bucket
    """.replace("{Z}", _Z_INTERLEAVE),
    category="source-sink",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key — the data-layout primitive behind
    OPTIMIZE ZORDER / multi-dimensional data skipping: interleaving the
    bits of two columns gives ONE sort key under which file-sized runs
    of rows have narrow min/max ranges on BOTH columns, so parquet
    row-group stats can prune scans filtered on either. The query
    computes the 32-bit interleave (exact int64 bit ops, identical in
    both engines), splits the z-sorted order into 32 file-sized
    buckets, and returns each bucket's per-column ranges — the
    quantity data skipping actually consumes. Writing would be
    ``df.repartitionByRange(32, zval).sortWithinPartitions(zval)``.

    The bucket assignment reproduces ``ntile(32)`` EXACTLY but
    distributed: the global z-order rank comes from range-partition
    stitching (``stitched_running`` — local rank per sorted range +
    broadcast prefix offsets, no single-partition window), and ntile's
    first-(N mod k)-buckets-get-one-extra rule is closed-form integer
    arithmetic on (rank, N)."""
    o = load_table(spark, sf_dir, "orders")
    z = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("a"),
        (F.floor(F.col("o_totalprice")).cast("bigint") % 65536).alias("b"),
    ).withColumn("zval", F.expr(_Z_INTERLEAVE))
    ranked = stitched_running(
        z, ["zval", "o_orderkey"], rank_name="rn", with_totals=True
    ).withColumnRenamed("rn_total", "_n")
    # ntile(k): first r = N % k buckets hold q+1 rows (q = N div k)
    bucket = F.expr(
        "CASE WHEN rn <= (_n % 32) * (_n div 32 + 1)"
        "     THEN (rn - 1) div (_n div 32 + 1) + 1"
        "     ELSE (_n % 32) + (rn - (_n % 32) * (_n div 32 + 1) - 1) div (_n div 32) + 1 END"
    ).cast("int")
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("a").cast("bigint").alias("min_cust"),
            F.max("a").cast("bigint").alias("max_cust"),
            F.min("b").cast("bigint").alias("min_price"),
            F.max("b").cast("bigint").alias("max_price"),
        )
    )


@register(
    "q_hive_partitioned_source",
    oracle="""
        SELECT count(*) AS n_rows,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               round(sum(value), 4) AS sum_value
        FROM events WHERE event_type = 'purchase'
    """,
    category="source-sink",
)
def q_hive_partitioned_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout roundtrip: write events
    partitioned by event_type (directory-per-value), read back with a
    partition filter, and aggregate — a hash-match proves the
    partition column survives the directory encoding and the pruned
    read sees exactly the original slice. At 100 TB the filtered scan
    reads ONE directory out of five; tests/test_plans.py asserts the
    pruned file listing (partition pruning happens at planning time)."""
    import shutil

    ev = load_table(spark, sf_dir, "events")
    path = scratch_dir("hive_part")
    shutil.rmtree(path, ignore_errors=True)
    sel = ev.select("event_id", "user_id", "value", "event_type")
    sel.write.mode("overwrite").partitionBy("event_type").parquet(path)
    # explicit read schema: an empty input writes no partition dirs and
    # schema inference fails (UNABLE_TO_INFER_SCHEMA) — degenerate audit
    back = spark.read.schema(sel.schema).parquet(path).filter(
        F.col("event_type") == "purchase"
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register(
    "q_schema_evolution_merge",
    oracle="""
        SELECT coalesce(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
                             THEN o_orderpriority END, '(absent)') AS priority,
               count(*) AS n,
               round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4) AS total_price  -- exact cents: 7.5e9
        FROM orders GROUP BY 1
    """,
    category="source-sink",
)
def q_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution ingest: an old batch written WITHOUT
    o_orderpriority and a new batch WITH it, read together under
    ``mergeSchema=true`` — the added column null-fills for old rows
    and the '(absent)' group in the output counts EXACTLY the old
    batch, proving the merge didn't smear values across batches. This
    is the append-only table evolution every long-lived dataset goes
    through; schema merging is a footer-union at planning time, no
    data rewrite."""
    import shutil

    o = load_table(spark, sf_dir, "orders")
    base = scratch_dir("schema_evo")
    shutil.rmtree(base, ignore_errors=True)
    cut = F.col("o_orderdate") >= "1995-01-01"
    o.filter(~cut).select("o_orderkey", "o_totalprice", "o_orderdate").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "batch=old"))
    o.filter(cut).select(
        "o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority"
    ).write.mode("overwrite").parquet(os.path.join(base, "batch=new"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "batch=old"), os.path.join(base, "batch=new")
    )
    return merged.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("(absent)")).alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(  # exact cents sum (7.5e9-magnitude cells at sf0.1)
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("double") / 100.0, 4
        ).alias("total_price"),
    )
