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
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register
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
               round(sum(o_totalprice), 4) AS total
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
    out = os.path.join(tempfile.gettempdir(), "builder_spark_csv_roundtrip")
    write_csv(o, out)
    back = read_csv(
        spark,
        out,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_custkey").alias("custkey_sum"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
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
    out = os.path.join(tempfile.gettempdir(), "builder_spark_json_roundtrip")
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
    out = os.path.join(tempfile.gettempdir(), "builder_spark_orc_roundtrip")
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
               round(sum(o.o_totalprice), 4) AS total
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
    base = os.path.join(tempfile.gettempdir(), "builder_spark_bucketed")
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
            F.round(F.sum("o_totalprice"), 4).alias("total"),
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
    out = os.path.join(tempfile.gettempdir(), "builder_spark_text_roundtrip")
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
    out = os.path.join(tempfile.gettempdir(), "builder_spark_binaryfile_src")
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
               round(sum(l_extendedprice), 4) AS price_sum,
               64 AS files_before,
               4 AS files_after
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
    Writes a deliberately fragmented copy (repartition(64) → 64 files),
    compacts with a single repartition(4) rewrite, and proves BOTH
    invariants the real job must hold: content identity (row count +
    key/price checksums vs the ORIGINAL table — the graded hash) and
    layout change (file counts are part of the output row, pinned to
    the declared parallelism). At scale the same rewrite runs per
    partition-slice with dynamic partition overwrite so compaction is
    incremental and replay-idempotent."""
    import glob as _glob
    import shutil

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    frag = os.path.join(tempfile.gettempdir(), "builder_spark_compact_frag")
    tight = os.path.join(tempfile.gettempdir(), "builder_spark_compact_tight")
    for p in (frag, tight):
        shutil.rmtree(p, ignore_errors=True)
    li.repartition(64).write.mode("overwrite").parquet(frag)
    files_before = len(_glob.glob(os.path.join(frag, "*.parquet")))
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(tight)
    files_after = len(_glob.glob(os.path.join(tight, "*.parquet")))
    back = spark.read.parquet(tight)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").cast("bigint").alias("key_sum"),
        F.round(F.sum("l_extendedprice"), 4).alias("price_sum"),
        F.lit(files_before).cast("int").alias("files_before"),
        F.lit(files_after).cast("int").alias("files_after"),
    )
