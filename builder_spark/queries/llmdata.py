"""LLM training-data pipeline operators — SURVEY.md §2.B rows 52-58
plus the text-analysis battery (token counting, quality scoring,
fingerprinting) from the north-star mandate.

Thin wrappers over builder_spark.operators / builder_spark.functions;
see those modules for the scale design. Oracles replicate the exact
double-precision math (DuckDB list_zip + DOUBLE casts ↔ Spark
zip_with + aggregate), so similarity scores hash-match bit-for-bit
after round(·,4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.functions.text import fingerprint_md5, token_stats, tokens
from builder_spark.operators.dedup import jaccard_pairs, minhash_near_dupes
from builder_spark.operators.topk import grouped_topk
from builder_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dupes_lsh,
    hyperplanes,
    knn_majority_label,
)
from builder_spark.registry import register

# DuckDB double-precision cosine, shared by the vector oracles
_DD_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_DD_NORM = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * x)))"


@register(
    "q_dedup_exact",
    oracle="""
        SELECT doc_id, lang, source, n_chars FROM (
            SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id ASC) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    category="llm-dedup",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on text, keep min doc_id. At 100 TB dedup on
    md5(text) so the shuffle key is 16 bytes, not the document."""
    from builder_spark.operators.dedup import exact_dedup

    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, key="text", order_col="doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "q_dedup_fingerprint",
    oracle="""
        WITH fp AS (
            SELECT doc_id,
                   md5(text) AS fp_exact,
                   md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp_bow
            FROM documents
        )
        SELECT doc_id, fp_exact, fp_bow,
               count(*) OVER (PARTITION BY fp_bow) AS bow_group_size
        FROM fp
    """,
    category="llm-dedup",
)
def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of raw text (exact identity) and of
    the sorted word set (order-insensitive bag-of-words identity).
    md5 is identical across engines, unlike xxhash/murmur."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        fingerprint_md5("text").alias("fp_exact"),
        fingerprint_md5("text", normalized=True).alias("fp_bow"),
    )
    w = Window.partitionBy("fp_bow")
    return fp.withColumn("bow_group_size", F.count(F.lit(1)).over(w))


@register("q_dedup_fuzzy", oracle=None, category="llm-dedup")
def q_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup detection (rows-only: LSH banding isn't
    SQL-expressible in DuckDB; the exact-Jaccard twin q_jaccard_pairs
    is the graded equivalent). Deterministic: fixed hash constants,
    no RNG — same candidates on every run and cluster."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_near_dupes(d, "doc_id", "text", threshold=0.4, k=16, bands=8)


@register(
    "q_jaccard_pairs",
    oracle="""
        WITH tok AS (
            SELECT doc_id AS _id, unnest(list_distinct(string_split(text, ' '))) AS _w
            FROM documents
        ),
        sizes AS (SELECT _id, count(*) AS _sz FROM tok GROUP BY _id),
        inter AS (
            SELECT a._id AS id_a, b._id AS id_b, count(*) AS _inter
            FROM tok a JOIN tok b ON a._w = b._w AND a._id < b._id
            GROUP BY a._id, b._id
        )
        SELECT id_a, id_b,
               round(_inter / CAST(sa._sz + sb._sz - _inter AS DOUBLE), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa._id = id_a
        JOIN sizes sb ON sb._id = id_b
        WHERE round(_inter / CAST(sa._sz + sb._sz - _inter AS DOUBLE), 4) >= 0.6
    """,
    category="llm-dedup",
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard ≥ 0.6 (graded twin of the LSH pipeline).
    Candidate generation is PPJoin PREFIX FILTERING (operators/
    dedup.py::prefix_filter_candidates), NOT a common-token join: only
    the |d|−⌈τ|d|⌉+1 globally-rarest tokens per doc enter the join, so
    hot tokens ("the"-class, the f² blowup) never generate candidates.
    Complete for Jaccard ≥ τ — result equals the all-pairs answer,
    which is why the simple full-join oracle still hash-matches."""
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(d, "doc_id", "text", threshold=0.6)


@register(
    "q_cosine_topk",
    oracle=f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 20),
        pairs AS (
            SELECT q.q_id, e.vec_id,
                   round({_DD_DOT.format(a="q.q_emb", b="e.embedding")}
                   / ({_DD_NORM.format(v="q.q_emb")} * {_DD_NORM.format(v="e.embedding")}), 4) AS cos_sim
            FROM q, embeddings e
            WHERE e.vec_id <> q.q_id
        )
        SELECT q_id, vec_id, cos_sim,
               row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        FROM pairs
        QUALIFY rank <= 5
    """,
    category="llm-similarity",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the first 20 query vectors via the
    Arrow-batched numpy matmul path (blocked_topk_pandas): one BLAS
    GEMM per candidate batch, per-batch top-k emission, so the final
    window ranks K·n_batches·k rows instead of K·N — the r01 graded
    expression form shuffled all K·N pairs into K partitions. Round-
    then-rank keeps rank parity with the sequential-reduction oracle
    (see blocked_topk_pandas docstring)."""
    from builder_spark.operators.similarity import blocked_topk_pandas

    e = load_table(spark, sf_dir, "embeddings")
    return blocked_topk_pandas(e.filter(F.col("vec_id") < 20), e, k=5)


@register(
    "q_knn_label",
    oracle=f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 50),
        c AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id >= 50),
        pairs AS (
            SELECT q.q_id, c.vec_id, c.label,
                   {_DD_DOT.format(a="q.q_emb", b="c.embedding")}
                   / ({_DD_NORM.format(v="q.q_emb")} * {_DD_NORM.format(v="c.embedding")}) AS sim
            FROM q, c
        ),
        topk AS (
            SELECT q_id, label FROM pairs
            QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) <= 5
        ),
        votes AS (SELECT q_id, label, count(*) AS n_votes FROM topk GROUP BY q_id, label)
        SELECT q_id, label AS pred_label, n_votes FROM votes
        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY n_votes DESC, label ASC) = 1
    """,
    category="llm-similarity",
)
def q_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority label: queries = vec_id<50, candidates = rest."""
    e = load_table(spark, sf_dir, "embeddings")
    return knn_majority_label(
        e.filter(F.col("vec_id") < 50), e.filter(F.col("vec_id") >= 50), k=5
    )


#: Banded-LSH config for q_dedup_embed — 16 deterministic ±1 planes cut
#: into 4 bands of 4; shared with the oracle so both engines compute
#: identical buckets (same parity pattern q_ann_lsh proved).
_ND_PLANES = hyperplanes(dim=64, n_planes=16, seed=7)
_ND_BANDS = 4


def _near_dupes_oracle(planes: list[list[float]], n_bands: int, threshold: float) -> str:
    per = len(planes) // n_bands

    def dot(plane: list[float]) -> str:
        lits = ", ".join(str(x) for x in plane)
        return (
            f"list_sum(list_transform(list_zip(embedding, CAST([{lits}] AS DOUBLE[])),"
            " p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )

    def bucket(band: int) -> str:
        sl = planes[band * per : (band + 1) * per]
        return " + ".join(
            f"(CASE WHEN {dot(p)} > 0 THEN {1 << j} ELSE 0 END)" for j, p in enumerate(sl)
        )

    bcols = ",\n                   ".join(
        f"CAST({bucket(i)} AS BIGINT) AS b{i}" for i in range(n_bands)
    )
    band_match = " OR ".join(f"a.b{i} = c.b{i}" for i in range(n_bands))
    pair_dot = (
        "list_sum(list_transform(list_zip(a.embedding, c.embedding),"
        " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )
    sim = f"round({pair_dot} / (a.nrm * c.nrm), 4)"
    return f"""
        WITH b AS (
            SELECT vec_id, embedding, {_DD_NORM.format(v="embedding")} AS nrm,
                   {bcols}
            FROM embeddings
        )
        SELECT a.vec_id AS id_a, c.vec_id AS id_b, {sim} AS cos_sim
        FROM b a JOIN b c ON a.vec_id < c.vec_id AND ({band_match})
        WHERE {sim} >= {threshold}
    """


@register(
    "q_dedup_embed",
    oracle=_near_dupes_oracle(_ND_PLANES, _ND_BANDS, threshold=0.3),
    category="llm-similarity",
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.3) via banded
    sign-bit LSH — candidates from a (band, bucket) equi-join, never
    the all-pairs nested loop (the r01 graded path was O(n²); the plan
    test now forbids BroadcastNestedLoopJoin here). Oracle replays the
    identical ±1 planes, so both engines agree on the candidate set."""
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dupes_lsh(
        e, threshold=0.3, planes=_ND_PLANES, n_bands=_ND_BANDS
    )


@register(
    "q_text_stats",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               round(avg(n_chars), 4) AS avg_chars,
               round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
               round(avg(len(list_distinct(string_split(text, ' ')))), 4) AS avg_distinct_tokens
        FROM documents
        GROUP BY lang
    """,
    category="llm-text",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus length statistics (docs, chars, avg length) — one combinable groupBy(lang)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.size(toks)), 4).alias("avg_tokens"),
        F.round(F.avg(F.size(F.array_distinct(toks))), 4).alias("avg_distinct_tokens"),
    )


@register(
    "q_text_quality",
    oracle="""
        WITH s AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' ')))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio,
                   list_sum(list_transform(string_split(text, ' '), w -> CAST(length(w) AS DOUBLE)))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
            FROM documents
        )
        SELECT doc_id, lang, n_tokens,
               round(distinct_ratio, 4) AS distinct_ratio,
               round(mean_word_len, 4) AS mean_word_len,
               round(0.5 * distinct_ratio + 0.5 * least(n_tokens / 50.0, 1.0), 4) AS quality,
               CAST(0.5 * distinct_ratio + 0.5 * least(n_tokens / 50.0, 1.0) < 0.6 AS INT) AS is_low_quality
        FROM s
    """,
    category="llm-text",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring from cheap signals (token count,
    repetition ratio, mean word length) — the filter stage of a
    training-data pipeline. Pure expressions, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    st = token_stats("text")
    quality = 0.5 * st["distinct_ratio"] + 0.5 * F.least(
        st["n_tokens"] / F.lit(50.0), F.lit(1.0)
    )
    return d.select(
        "doc_id",
        "lang",
        st["n_tokens"].alias("n_tokens"),
        F.round(st["distinct_ratio"], 4).alias("distinct_ratio"),
        F.round(st["mean_word_len"], 4).alias("mean_word_len"),
        F.round(quality, 4).alias("quality"),
        (quality < 0.6).cast("int").alias("is_low_quality"),
    )


@register(
    "q_token_count",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_ws_tokens,
               len(string_split_regex(text, '[^a-z0-9]+')) AS n_regex_tokens,
               CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_bpe_tokens
        FROM documents
    """,
    category="llm-text",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, regex pre-tokenization,
    and the chars/4 BPE estimate used for quick corpus sizing."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.split("text", "[^a-z0-9]+")).alias("n_regex_tokens"),
        F.ceil(F.col("n_chars") / 4.0).alias("est_bpe_tokens"),
    )


@register(
    "q_multimodal_cols",
    oracle=f"""
        SELECT lang, label,
               count(*) AS n,
               round(avg(n_chars), 4) AS avg_chars,
               round(avg({_DD_NORM.format(v="embedding")}), 4) AS avg_l2_norm
        FROM documents JOIN embeddings ON doc_id = vec_id
        GROUP BY lang, label
    """,
    category="llm-multimodal",
)
def q_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text + vector + label in one table (documents⨝embeddings) with
    per-(lang,label) stats — the multimodal-column join pattern."""
    from builder_spark.functions.vectors import l2_norm

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id)
    return joined.groupBy("lang", "label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(l2_norm("embedding")), 4).alias("avg_l2_norm"),
    )


@register(
    "q_doc_len_hist",
    oracle="""
        SELECT length(text) // 100 AS bucket,
               count(*) AS n_docs,
               round(avg(CAST(length(text) AS DOUBLE)), 4) AS avg_len
        FROM documents
        GROUP BY 1
    """,
    category="llm-text",
)
def q_doc_len_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram in 100-char buckets — the first-look
    corpus profile before length-based quality filtering. Bucket id is
    integer floor-division (identical semantics both engines on
    non-negative lengths); length() counts codepoints in both. Scale:
    single map-side-combinable agg, bucket cardinality tiny."""
    d = load_table(spark, sf_dir, "documents")
    ln = F.length("text")
    return d.groupBy(F.floor(ln / 100).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(ln.cast("double")), 4).alias("avg_len"),
    )


@register(
    "q_vocab_stats",
    oracle="""
        WITH tok AS (
            SELECT lang, unnest(string_split(text, ' ')) AS term
            FROM documents
        )
        SELECT lang,
               count(*) AS n_tokens,
               count(DISTINCT term) AS vocab,
               round(count(DISTINCT term) / CAST(count(*) AS DOUBLE), 4)
                   AS type_token_ratio
        FROM tok
        GROUP BY lang
    """,
    category="llm-text",
)
def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus vocabulary profile: token volume, distinct
    vocabulary size, and type-token ratio (lexical diversity — a
    standard corpus-quality signal). Fixture text is single-spaced so
    whitespace split agrees between engines. Scale: explode then one
    map-side-combined agg over (lang, term) — only the vocabulary
    (≪ token stream) crosses the wire — then a per-lang rollup."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("term"))
    # one map-side-combined agg over (lang, term) — the vocabulary —
    # then a tiny rollup; avoids countDistinct's two-phase shuffle of
    # the raw token stream.
    per_term = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    return per_term.groupBy("lang").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.round(F.count(F.lit(1)) / F.sum("n").cast("double"), 4).alias(
            "type_token_ratio"
        ),
    )


@register(
    "q_top_bigrams",
    oracle="""
        WITH tok AS (
            SELECT lang, string_split(text, ' ') AS toks
            FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ),
        bg AS (
            SELECT lang,
                   unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i + 1]))
                       AS bigram
            FROM tok
        ),
        cnt AS (
            SELECT lang, bigram, count(*) AS n
            FROM bg GROUP BY lang, bigram
        )
        SELECT lang, bigram, n,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n DESC, bigram ASC) AS rnk
        FROM cnt
        QUALIFY rnk <= 5
    """,
    category="llm-text",
)
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language — collocation mining for
    boilerplate detection (repeated bigrams flag templated text).
    Bigram arrays are built with 1-based element_at over a 1..n-1
    index sequence — identical indexing to DuckDB's list_transform
    over range(1, len) — rather than a self-zip, so each token is
    touched once. Ties rank alphabetically after the count. Scale:
    the bigram construction rides the scan (no shuffle); the count
    agg shuffles distinct (lang, bigram) pairs post map-side combine;
    the per-lang top-5 goes through ``grouped_topk``'s two-phase
    prune — a plain PARTITION BY lang window would serialize a whole
    language's bigram vocabulary per reducer."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    docs = d.select("lang", toks.alias("toks")).filter(F.size("toks") >= 2)
    bigrams = docs.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                ),
            )
        ).alias("bigram"),
    )
    cnt = bigrams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    return grouped_topk(cnt, ["lang"], [F.col("n").desc(), F.col("bigram").asc()], 5)


@register(
    "q_repetition_ratio",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks
            FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ),
        bg AS (
            SELECT doc_id, lang,
                   len(list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i + 1]))
                       AS n_bigrams,
                   len(list_distinct(list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i + 1])))
                       AS n_distinct
            FROM tok
        )
        SELECT lang,
               count(*) AS n_docs,
               round(avg(1.0 - n_distinct / CAST(n_bigrams AS DOUBLE)), 4)
                   AS avg_repetition,
               CAST(sum(CASE WHEN 1.0 - n_distinct / CAST(n_bigrams AS DOUBLE) > 0.2
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
        FROM bg
        GROUP BY lang
    """,
    category="llm-text",
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repeated-bigram fraction (the Gopher repetition family
    of quality rules: templated/spammy text repeats n-grams), rolled
    up per language with a >0.2 repetitive-doc count. All per-doc
    work is array expressions riding the scan — no explode, so no
    token-stream shuffle at all; the only exchange is the final
    per-lang agg. Flag threshold compares exact small-integer ratios,
    round() only on the final avg."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", "lang", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 2
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
    )
    per_doc = docs.select(
        "lang",
        F.size(bigrams).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct"),
    )
    rep = F.lit(1.0) - F.col("n_distinct") / F.col("n_bigrams").cast("double")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(rep), 4).alias("avg_repetition"),
        F.sum(F.when(rep > 0.2, 1).otherwise(0)).alias("n_repetitive"),
    )


@register(
    "q_seq_packing",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
            FROM documents
        ),
        packed AS (
            SELECT doc_id, lang, n_tok,
                   CAST(floor((sum(n_tok) OVER (
                       ORDER BY doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_tok) / 1024.0) AS BIGINT) AS bin_id
            FROM toks
        )
        SELECT bin_id,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
               count(DISTINCT lang) AS n_langs
        FROM packed
        GROUP BY bin_id
    """,
    category="llm-pipeline",
)
def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining: assign docs (in stable
    doc_id order) to ~1024-token training bins by cumulative token
    count — bin = floor(tokens_before_this_doc / 1024), the
    deterministic streaming-concat packing rule. Integer token counts
    make the cumsum exact, so bin edges are identical across engines
    with no rounding discipline needed. Scale: the global-order cumsum
    is the serial ORDER, not a serial stage — the running token sum
    over doc order is STITCHED (range partitions + broadcast prefix
    offsets), so the same exact bin assignment computes fully
    distributed at 100 TB."""
    from builder_spark.operators.partitioning import stitched_running

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok")
    )
    packed = stitched_running(
        toks, ["doc_id"], running={"_cum": "n_tok"}
    ).withColumn(
        "bin_id",
        F.floor((F.col("_cum") - F.col("n_tok")) / 1024.0).cast("bigint"),
    )
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "q_edit_distance",
    oracle="""
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM part a
        JOIN part b
          ON a.p_type = b.p_type
         AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
         AND abs(length(a.p_name) - length(b.p_name)) <= 2
        WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    category="llm-dedup",
)
def q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance fuzzy matching (typo-level name dedup).
    Levenshtein is O(len²) per pair, so NEVER all-pairs: the join
    blocks on (p_type, p_size) and a ±2 length band — the band is a
    correct prefilter because |len(a)−len(b)| lower-bounds the edit
    distance. Both engines implement textbook unit-cost Levenshtein,
    so distances are exact integers. Scale: block keys are the shuffle
    key; block size bounds the quadratic term, the same shape as the
    LSH-bucketed joins."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_type", "p_size")
    a = p.select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_name").alias("_na"),
        "p_type",
        "p_size",
    )
    b = p.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("_nb"),
        "p_type",
        "p_size",
    )
    return (
        a.join(b, ["p_type", "p_size"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.length("_na") - F.length("_nb")) <= 2)
        )
        .withColumn("dist", F.levenshtein("_na", "_nb"))
        .filter(F.col("dist") <= 3)
        .select("id_a", "id_b", "dist")
    )
