"""LLM-data pipeline additions: filter-funnel observability, embedding
norm profiles, brand co-occurrence (market basket), and per-source
corpus quality matrices.

Float discipline: per-row ratios divide identical exact integers;
vector folds are LEFT folds in both engines (Spark ``F.aggregate`` and
DuckDB ``list_reduce`` both reduce sequentially) over float→double
promoted values, so intermediate roundings coincide; group averages of
doubles round(·,4) to absorb summation-order ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register


@register(
    "q_length_filter_funnel",
    oracle="""
        SELECT count(*) AS n_total,
               CAST(sum(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_len_ok,
               CAST(sum(CASE WHEN len(string_split(text, ' ')) >= 20
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_tok_ok,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_lang_ok,
               CAST(sum(CASE WHEN n_chars >= 100
                             AND len(string_split(text, ' ')) >= 20
                             AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pass
        FROM documents
    """,
    category="llm-pipeline",
)
def q_length_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel observability: how many documents survive
    each gate (length, token count, language) and their conjunction —
    the per-snapshot report every corpus-curation pipeline publishes
    before a training run. One pass, conditional sums, no shuffle
    beyond the final 1-row reduce."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    len_ok = F.col("n_chars") >= 100
    tok_ok = toks >= 20
    lang_ok = F.col("lang") == "en"
    as_int = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return d.agg(
        F.count(F.lit(1)).alias("n_total"),
        as_int(len_ok).alias("n_len_ok"),
        as_int(tok_ok).alias("n_tok_ok"),
        as_int(lang_ok).alias("n_lang_ok"),
        as_int(len_ok & tok_ok & lang_ok).alias("n_pass"),
    )


@register(
    "q_embed_norm_hist",
    oracle="""
        WITH n AS (
            SELECT vec_id,
                   CAST(floor(sqrt(list_reduce(
                       list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
                       (a, b) -> a + b)) * 1000) AS BIGINT) AS norm_milli
            FROM embeddings
        )
        SELECT norm_milli // 500 AS bucket,
               count(*) AS n,
               CAST(min(norm_milli) AS BIGINT) AS min_milli,
               CAST(max(norm_milli) AS BIGINT) AS max_milli
        FROM n GROUP BY 1
    """,
    category="llm-similarity",
)
def q_embed_norm_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm histogram of the embedding column — the first sanity
    check on any vector corpus (un-normalized vectors break cosine
    ANN; a bimodal norm profile reveals mixed encoders). The squared
    norm is a LEFT fold (same order both engines), quantized to
    integer milli-units before bucketing so bucket edges are exact.
    Rides the scan: no shuffle until the tiny bucket aggregate."""
    e = load_table(spark, sf_dir, "embeddings")
    sumsq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x,
    )
    norm_milli = F.floor(F.sqrt(sumsq) * 1000).cast("bigint")
    return (
        e.select(norm_milli.alias("norm_milli"))
        .groupBy(F.expr("norm_milli div 500").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("norm_milli").alias("min_milli"),
            F.max("norm_milli").alias("max_milli"),
        )
    )


@register(
    "q_market_basket",
    oracle="""
        WITH lp AS (
            SELECT DISTINCT l.l_orderkey, p.p_brand
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        ),
        pairs AS (
            SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                   count(*) AS n_orders
            FROM lp a JOIN lp b
              ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
            GROUP BY 1, 2
        ),
        bo AS (SELECT p_brand, count(*) AS c FROM lp GROUP BY p_brand),
        t AS (SELECT count(DISTINCT l_orderkey) AS t FROM lineitem)
        SELECT pairs.brand_a, pairs.brand_b, pairs.n_orders,
               round(pairs.n_orders * t.t
                     / (CAST(ba.c AS DOUBLE) * bb.c), 4) AS lift
        FROM pairs
        JOIN bo ba ON ba.p_brand = pairs.brand_a
        JOIN bo bb ON bb.p_brand = pairs.brand_b
        CROSS JOIN t
        WHERE pairs.n_orders >= 5
    """,
    category="analytics",
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand co-occurrence with lift — market-basket association
    mining. The pair join is keyed on l_orderkey with a bounded
    per-order fan-out (items-per-order choose 2), never all-pairs
    across orders; brand totals and the order count are broadcast.
    Lift = n_ab·T/(n_a·n_b) divides exact integers, rounded once."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    lp = (
        l.join(F.broadcast(p.select("p_partkey", "p_brand")), l.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = lp.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = lp.select(F.col("l_orderkey").alias("_ok2"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, (a.l_orderkey == b._ok2) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 5)
    )
    bo = lp.groupBy("p_brand").agg(F.count(F.lit(1)).alias("c"))
    t = l.agg(F.countDistinct("l_orderkey").alias("t"))
    return (
        pairs.join(F.broadcast(bo.withColumnRenamed("p_brand", "brand_a").withColumnRenamed("c", "ca")), "brand_a")
        .join(F.broadcast(bo.withColumnRenamed("p_brand", "brand_b").withColumnRenamed("c", "cb")), "brand_b")
        .crossJoin(F.broadcast(t))
        .select(
            "brand_a",
            "brand_b",
            "n_orders",
            F.round(
                F.col("n_orders") * F.col("t") / (F.col("ca").cast("double") * F.col("cb")),
                4,
            ).alias("lift"),
        )
    )


@register(
    "q_source_quality_matrix",
    oracle="""
        SELECT source, lang,
               count(*) AS n_docs,
               round(avg(n_chars), 4) AS avg_chars,
               round(avg(len(list_distinct(string_split(text, ' ')))
                     / CAST(len(string_split(text, ' ')) AS DOUBLE)), 4)
                   AS avg_distinct_ratio
        FROM documents
        GROUP BY source, lang
    """,
    category="llm-text",
)
def q_source_quality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source × language) corpus quality matrix: volume, average
    length, and lexical diversity (distinct-token ratio) — the grid a
    curation pipeline uses to set per-source sampling weights. Per-doc
    ratios divide identical integers; the group average rounds once.
    Single combinable aggregate over the scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    ratio = F.size(F.array_distinct(toks)) / F.size(toks).cast("double")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(ratio), 4).alias("avg_distinct_ratio"),
    )
