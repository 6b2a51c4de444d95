"""Scalar function battery: strings, regex, dates, math, JSON, arrays,
higher-order functions — SURVEY.md §2.B rows 40-48.

All pure built-in expressions → whole-stage codegen, no Python in the
hot path. Engine bridges verified by probe (see tools/check.py runs):
- DuckDB dayofweek: Sunday=0; Spark: Sunday=1 → oracle adds 1.
- DuckDB ceil(double)→DOUBLE, Spark ceil→BIGINT → cast both to BIGINT.
- DuckDB sign→TINYINT, Spark signum→DOUBLE → cast both to INT.
- DuckDB epoch→DOUBLE → CAST AS BIGINT; Spark unix_timestamp→BIGINT.
- DuckDB regexp_replace needs the 'g' flag to match Spark's
  replace-all behavior.
- Spark slice(arr, 2, 3) == DuckDB arr[2:4] (both 1-based).
- float32 embedding math: cast to DOUBLE before round on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register


@register(
    "q_str_funcs",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS uname,
               lower(c_mktsegment) AS lseg,
               length(c_name) AS name_len,
               substr(c_name, 2, 5) AS name_mid,
               trim(concat('  ', c_name, ' ')) AS trimmed,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
               concat_ws('-', c_mktsegment, c_name) AS tagged,
               replace(c_name, ' ', '_') AS snake
        FROM customer
    """,
    category="scalar",
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar battery (upper/lower/trim/substring/concat/lpad/replace/length) — per-row expressions riding the scan."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 2, 5).alias("name_mid"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("tagged"),
        F.expr("replace(c_name, ' ', '_')").alias("snake"),
    )


@register(
    "q_str_split_explode",
    oracle="""
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
    """,
    category="scalar",
)
def q_str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word counts via split+explode. At scale this is the shuffle-heavy
    tokenize step of every text pipeline — the groupBy gets map-side
    partial aggregation for free."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_regexp",
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
               regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
               CAST(regexp_matches(p_name, 'bolt|gear') AS INT) AS is_hardware
        FROM part
    """,
    category="scalar",
)
def q_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract + regexp_like predicates — same regex dialect subset on both engines (no lookaround)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_name").rlike("bolt|gear").cast("int").alias("is_hardware"),
    )


@register(
    "q_date_funcs",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS yr,
               month(o_orderdate) AS mo,
               day(o_orderdate) AS dom,
               dayofweek(o_orderdate) + 1 AS dow,
               quarter(o_orderdate) AS qtr,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
        FROM orders
    """,
    category="scalar",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date parts + arithmetic. Bridges: Spark dayofweek is Sunday=1 vs
    DuckDB Sunday=0 (+1 in oracle); Spark datediff(end, start) ==
    DuckDB date_diff('day', start, end)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        # cast to DATE: DuckDB's date_trunc('month') yields DATE, Spark TIMESTAMP
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "q_unix_ts",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_bucket,
               count(*) AS n_events,
               CAST(min(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_epoch
        FROM events
        GROUP BY date_trunc('hour', ts)
    """,
    category="scalar",
)
def q_unix_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event rollup from nanosecond-precision parquet timestamps
    (the §1.3 nanos→µs conversion happens in the loader)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    return (
        ev.select(bucket.alias("hour_bucket"))
        .groupBy("hour_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_timestamp("hour_bucket")).alias("bucket_epoch"),
        )
    )


@register(
    "q_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05) AS disc_dev,
               round(l_extendedprice, 1) AS price_r1,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               round(sqrt(l_quantity), 4) AS qty_sqrt,
               round(ln(l_extendedprice), 4) AS price_ln,
               round(log10(l_extendedprice), 4) AS price_log10,
               round(pow(l_quantity, 2), 4) AS qty_sq,
               round(l_extendedprice % 100.0, 4) AS price_mod,
               CAST(sign(l_discount - 0.05) AS INT) AS disc_sign
        FROM lineitem
    """,
    category="scalar",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar battery (abs/ceil/floor/sqrt/exp/ln/pow/mod) with identical expression trees on both engines, rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 4).alias("price_log10"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.col("l_extendedprice") % 100.0, 4).alias("price_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@register(
    "q_json_extract",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_total,
               round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS k_avg
        FROM events
        GROUP BY event_type
    """,
    category="scalar",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (events.props is a JSON string). Spark's
    get_json_object is a codegen'd path expression — no UDF."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_total"),
        F.round(F.avg(k), 4).alias("k_avg"),
    )


@register(
    "q_array_funcs",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               -- + 0.0: a tiny-negative first component rounds to -0.0 in
               -- DuckDB but +0.0 in Spark (SURVEY trap 10, sf0.1 carrier)
               round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_val,
               round(CAST(embedding[2] AS DOUBLE), 4) AS mid_val_1,
               round(CAST(embedding[3] AS DOUBLE), 4) AS mid_val_2,
               round(CAST(embedding[4] AS DOUBLE), 4) AS mid_val_3,
               round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
               CAST(list_position(embedding, list_max(embedding)) AS INT) AS argmax_1based
        FROM embeddings
    """,
    category="scalar",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array basics over the 64-dim float embedding column. All float32
    values are cast to DOUBLE before rounding on both engines. Array
    slices are emitted as scalar element columns (driver canon cannot
    hash array cells — CORRECTNESS_r02 crash)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 4).alias("first_val"),
        F.round(F.element_at(emb, 2).cast("double"), 4).alias("mid_val_1"),
        F.round(F.element_at(emb, 3).cast("double"), 4).alias("mid_val_2"),
        F.round(F.element_at(emb, 4).cast("double"), 4).alias("mid_val_3"),
        F.round(F.array_max(emb).cast("double"), 4).alias("max_val"),
        F.array_position(emb, F.array_max(emb)).cast("int").alias("argmax_1based"),
    )


@register(
    "q_array_hof",
    oracle="""
        SELECT vec_id,
               -- + 0.0: signed-zero discipline (SURVEY trap 10, sf0.1 carrier)
               round(CAST(embedding[1] AS DOUBLE) * 2, 4) + 0.0 AS doubled_1,
               round(CAST(embedding[2] AS DOUBLE) * 2, 4) AS doubled_2,
               round(CAST(embedding[3] AS DOUBLE) * 2, 4) AS doubled_3,
               round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS l2_norm,
               len(list_filter(embedding, x -> x > 0)) AS n_pos,
               round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum
        FROM embeddings
    """,
    category="scalar",
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions: transform / aggregate / filter over the
    embedding array — the JVM-side way to do vector math (no UDF).
    Multiply-by-2 is exact in floating point; sums accumulate in DOUBLE
    sequentially on both engines. Transformed head elements come out as
    scalar columns (driver canon cannot hash array cells)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.round(F.element_at(emb, 1).cast("double") * 2, 4).alias("doubled_1"),
        F.round(F.element_at(emb, 2).cast("double") * 2, 4).alias("doubled_2"),
        F.round(F.element_at(emb, 3).cast("double") * 2, 4).alias("doubled_3"),
        F.round(
            F.sqrt(
                F.aggregate(
                    emb,
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
            4,
        ).alias("l2_norm"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 4
        ).alias("vec_sum"),
    )


@register(
    "q_posexplode",
    oracle="""
        SELECT doc_id, pos, term FROM (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) AS pos,
                   unnest(string_split(text, ' ')) AS term
            FROM documents
            WHERE doc_id < 50
        ) WHERE pos <= 3
    """,
    category="scalar",
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode — first 3 tokens of each doc with their
    1-based position (lead-token features for quality classifiers).
    Spark's posexplode emits 0-based positions, DuckDB's
    generate_subscripts is 1-based; the +1 here is the entire parity
    story. In DuckDB, parallel unnests in one SELECT zip positionally,
    which is exactly posexplode's contract. Scale: array slice happens
    BEFORE the explode (slice(toks,1,3) rides the scan), so the
    exploded stream is 3 rows/doc, not |tokens| rows/doc."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.posexplode(F.slice(F.split("text", " "), 1, 3)).alias("pos0", "term"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
