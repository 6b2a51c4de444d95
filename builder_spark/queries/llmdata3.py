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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.functions.hashing import knuth_bucket
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


_KNUTH = 2654435761  # 2^32 / φ — engine-portable multiplicative hash


@register(
    "q_reservoir_sample_det",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               md5(CAST(l_orderkey AS VARCHAR) || '_'
                   || CAST(l_linenumber AS VARCHAR)) AS h
        FROM lineitem
        ORDER BY h ASC, l_orderkey ASC, l_linenumber ASC
        LIMIT 100
    """,
    category="llm-pipeline",
)
def q_reservoir_sample_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k sample (the distributed reservoir): rank
    every row by an engine-portable hash of its key and keep the k
    smallest. Unlike rand()-based reservoirs the selection is
    reproducible across engines, runs, and partitionings; unlike a
    global sort it executes as TakeOrderedAndProject — each partition
    keeps its local top-k and only k·partitions rows reach the driver
    merge (plan-tested). The standard 'fixed-size eval slice at 100
    TB' primitive."""
    l = load_table(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat_ws("_", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    )
    return (
        l.select("l_orderkey", "l_linenumber", h.alias("h"))
        .orderBy(F.col("h").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(100)
    )


@register(
    "q_incremental_dedup",
    oracle="""
        WITH corpus AS (
            SELECT DISTINCT md5(text) AS f FROM documents WHERE doc_id % 2 = 0
        ),
        batch AS (
            SELECT doc_id, md5(text) AS f FROM documents WHERE doc_id % 2 = 1
        )
        -- count(CASE...) not sum(CASE...): counts must be 0 (not NULL)
        -- over an empty batch, matching Spark's count() (degenerate audit)
        SELECT count(*) AS n_batch,
               CAST(count(CASE WHEN f IN (SELECT f FROM corpus)
                          THEN 1 END) AS BIGINT) AS n_dup_vs_corpus,
               CAST(count(CASE WHEN f NOT IN (SELECT f FROM corpus)
                          THEN 1 END) AS BIGINT) AS n_new,
               CAST(count(DISTINCT CASE WHEN f NOT IN (SELECT f FROM corpus)
                          THEN f END) AS BIGINT) AS n_new_distinct
        FROM batch
    """,
    category="llm-dedup",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a new batch screened against the
    existing corpus by content fingerprint — the shape every append-
    only corpus pipeline runs per increment (dedup against history
    WITHOUT rescanning history's text). Only 16-byte md5 fingerprints
    cross the join; the corpus side is a distinct-fingerprint set
    (broadcastable when small, shuffle-by-fingerprint when not), and
    the batch needs one semi/anti-join pass."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 2 == 0).select(F.md5("text").alias("f")).distinct()
    batch = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", F.md5("text").alias("f"))
    dup = batch.join(corpus, "f", "left_semi")
    new = batch.join(corpus, "f", "left_anti")
    n_batch = batch.agg(F.count(F.lit(1)).alias("n_batch"))
    n_dup = dup.agg(F.count(F.lit(1)).alias("n_dup_vs_corpus"))
    n_new = new.agg(
        F.count(F.lit(1)).alias("n_new"),
        F.countDistinct("f").alias("n_new_distinct"),
    )
    return n_batch.crossJoin(F.broadcast(n_dup)).crossJoin(F.broadcast(n_new))


@register(
    "q_sample_bias_check",
    oracle=f"""
        WITH agg AS (
            SELECT event_type,
                   count(*) AS nf,
                   sum(CASE WHEN (CAST(event_id AS HUGEINT) * {_KNUTH})
                            % 4294967296 % 100 < 10 THEN 1 ELSE 0 END) AS ns
            FROM events GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(sum(nf) AS BIGINT) AS tf, CAST(sum(ns) AS BIGINT) AS ts
            FROM agg
        )
        SELECT agg.event_type,
               CAST(agg.nf AS BIGINT) AS n_full,
               CAST(agg.ns AS BIGINT) AS n_sample,
               round(agg.nf / CAST(tot.tf AS DOUBLE), 4) AS share_full,
               round(agg.ns / CAST(tot.ts AS DOUBLE), 4) AS share_sample,
               round(abs(agg.nf / CAST(tot.tf AS DOUBLE)
                         - agg.ns / CAST(tot.ts AS DOUBLE)), 4) AS share_gap
        FROM agg, tot
    """,
    category="llm-pipeline",
)
def q_sample_bias_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-bias audit: does the deterministic 10% hash sample
    preserve the category distribution? Per event type, the full-data
    share vs the sampled share and their gap — the check a pipeline
    runs before trusting sampled metrics. One scan computes both
    (conditional sum), totals come from the 5-row aggregate; shares
    divide exact integers and round once."""
    ev = load_table(spark, sf_dir, "events")
    in_sample = (
        knuth_bucket("event_id", 100) < 10
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nf"),
        F.sum(F.when(in_sample, 1).otherwise(0)).alias("ns"),
    )
    tot = agg.agg(
        F.sum("nf").cast("bigint").alias("tf"), F.sum("ns").cast("bigint").alias("ts")
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("nf").cast("bigint").alias("n_full"),
        F.col("ns").cast("bigint").alias("n_sample"),
        F.round(F.col("nf") / F.col("tf").cast("double"), 4).alias("share_full"),
        F.round(F.col("ns") / F.col("ts").cast("double"), 4).alias("share_sample"),
        F.round(
            F.abs(
                F.col("nf") / F.col("tf").cast("double")
                - F.col("ns") / F.col("ts").cast("double")
            ),
            4,
        ).alias("share_gap"),
    )


@register(
    "q_dup_cluster_sizes",
    oracle="""
        WITH grp AS (
            SELECT md5(text) AS f, count(*) AS sz FROM documents GROUP BY md5(text)
        )
        SELECT sz AS cluster_size,
               count(*) AS n_clusters,
               CAST(sum(sz) AS BIGINT) AS n_docs
        FROM grp GROUP BY sz
    """,
    category="llm-dedup",
)
def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram: how many exact-content
    clusters exist at each multiplicity — the observability readout
    that tells a dedup pipeline whether duplication is a few huge
    clusters (one viral page) or a long tail (boilerplate). Two
    combinable aggregates over 16-byte fingerprints; text never
    shuffles."""
    d = load_table(spark, sf_dir, "documents")
    grp = d.groupBy(F.md5("text").alias("f")).agg(F.count(F.lit(1)).alias("sz"))
    return grp.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs"),
    )


@register(
    "q_lang_mix_entropy",
    oracle="""
        WITH cnt AS (
            SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang
        ),
        tot AS (SELECT source, sum(c) AS t FROM cnt GROUP BY source)
        SELECT cnt.source,
               CAST(any_value(tot.t) AS BIGINT) AS n_docs,
               count(*) AS n_langs,
               -- + 0.0: monolingual source gives -sum(0) = -0.0 in DuckDB
               -- (signed-zero trap 10, surfaced by the degenerate audit)
               round(-sum((cnt.c / CAST(tot.t AS DOUBLE))
                          * ln(cnt.c / CAST(tot.t AS DOUBLE))), 4) + 0.0
                   AS lang_entropy
        FROM cnt JOIN tot ON tot.source = cnt.source
        GROUP BY cnt.source
    """,
    category="llm-text",
)
def q_lang_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix entropy per source: 0 for monolingual sources,
    ln(k) for a uniform k-language mix — the curation signal for
    routing sources to language-specific pipelines. Probabilities
    divide exact integers; the entropy sum runs over ≤|langs| terms
    per source and rounds once. Aggregate sizes: sources×langs."""
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t").cast("double")
    return (
        cnt.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.any_value("t").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 4).alias("lang_entropy"),
        )
    )


@register(
    "q_triangle_count",
    oracle="""
        WITH lp AS (
            SELECT DISTINCT l.l_orderkey, p.p_brand
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        ),
        e AS (
            SELECT a.p_brand AS u, b.p_brand AS v
            FROM lp a JOIN lp b
              ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
            GROUP BY 1, 2
            HAVING count(*) >= 20
        )
        SELECT count(*) AS n_triangles,
               CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges
        FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3
          ON e3.u = e1.u AND e3.v = e2.v
    """,
    category="analytics",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the brand co-purchase graph — the graph-
    density primitive behind community detection and link spam
    screens. Edges are oriented u<v so each triangle is counted ONCE
    (the standard node-iterator dedup); the two joins are equi-joins
    on vertex keys — at real graph scale the same plan shuffles by
    vertex, with high-degree vertices handled by degree-ordering
    (orient edges low-degree → high-degree) instead of a hub
    blowup."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    lp = (
        l.join(F.broadcast(p.select("p_partkey", "p_brand")), l.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = lp.select("l_orderkey", F.col("p_brand").alias("u"))
    b = lp.select(F.col("l_orderkey").alias("_ok"), F.col("p_brand").alias("v"))
    e = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 20)
        .select("u", "v")
    )
    e1 = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = e.select(F.col("u").alias("y2"), F.col("v").alias("z"))
    e3 = e.select(F.col("u").alias("x3"), F.col("v").alias("z3"))
    tri = (
        e1.join(e2, e1.y == e2.y2)
        .join(e3, (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")))
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return tri.agg(F.count(F.lit(1)).alias("n_triangles")).crossJoin(
        F.broadcast(n_edges)
    )


@register(
    "q_pipeline_dedup_split",
    oracle=f"""
        WITH kept AS (
            SELECT doc_id, text, n_chars
            FROM documents
            QUALIFY row_number() OVER (PARTITION BY md5(text)
                                       ORDER BY doc_id ASC) = 1
        ),
        q AS (SELECT * FROM kept WHERE n_chars >= 80),
        s AS (
            SELECT doc_id, n_chars,
                   CASE WHEN (CAST(doc_id AS HUGEINT) * {_KNUTH})
                             % 4294967296 % 100 < 80 THEN 'train'
                        WHEN (CAST(doc_id AS HUGEINT) * {_KNUTH})
                             % 4294967296 % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM q
        )
        SELECT split, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(doc_id) AS BIGINT) AS id_checksum
        FROM s GROUP BY split
    """,
    category="llm-pipeline",
)
def q_pipeline_dedup_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation pipeline in one graded query: exact dedup
    (keep lowest doc_id per content fingerprint) → length gate →
    deterministic 80/10/10 train/val/test split — the minimal shape of
    every pretraining-data job, with per-split counts and an id
    checksum so the grade proves membership, not just cardinality.
    Dedup shuffles 16-byte fingerprints; the split is a pushed-down
    Knuth-hash filter; nothing sorts globally."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
    kept = (
        d.select("doc_id", "n_chars", F.row_number().over(w).alias("_rn"))
        .filter((F.col("_rn") == 1) & (F.col("n_chars") >= 80))
    )
    bucket = knuth_bucket("doc_id", 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        kept.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


@register(
    "q_split_leakage_check",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, md5(text) AS f,
                   CASE WHEN (CAST(doc_id AS HUGEINT) * {_KNUTH})
                             % 4294967296 % 100 < 80 THEN 'train'
                        WHEN (CAST(doc_id AS HUGEINT) * {_KNUTH})
                             % 4294967296 % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        ),
        train_f AS (SELECT DISTINCT f FROM s WHERE split = 'train'),
        holdout AS (SELECT * FROM s WHERE split <> 'train')
        SELECT holdout.split,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN f IN (SELECT f FROM train_f)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
               round(sum(CASE WHEN f IN (SELECT f FROM train_f)
                         THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4)
                   AS leak_rate
        FROM holdout GROUP BY holdout.split
    """,
    category="llm-pipeline",
)
def q_split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→holdout contamination audit: how many val/test documents
    share an exact content fingerprint with ANY train document — the
    leakage number that invalidates an eval if nonzero (the split was
    taken BEFORE dedup here, which is exactly the mistake this query
    exists to catch). Only 16-byte fingerprints join; the train
    fingerprint set is a semi-join side, broadcastable or
    shuffle-by-fingerprint at scale."""
    d = load_table(spark, sf_dir, "documents")
    bucket = knuth_bucket("doc_id", 100)
    s = d.select(
        "doc_id",
        F.md5("text").alias("f"),
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias(
            "split"
        ),
    )
    train_f = s.filter(F.col("split") == "train").select("f").distinct()
    holdout = s.filter(F.col("split") != "train")
    leaked = holdout.join(train_f, "f", "left_semi").groupBy("split").agg(
        F.count(F.lit(1)).alias("n_leaked")
    )
    return (
        holdout.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(leaked, "split", "left")
        .select(
            "split",
            "n_docs",
            F.coalesce(F.col("n_leaked"), F.lit(0)).cast("bigint").alias("n_leaked"),
            F.round(
                F.coalesce(F.col("n_leaked"), F.lit(0)) / F.col("n_docs").cast("double"),
                4,
            ).alias("leak_rate"),
        )
    )
