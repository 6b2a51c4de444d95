"""Additional LLM-pipeline text operators: a GRADED deterministic
MinHash (the hash-matchable twin of the rows-only ``q_dedup_fuzzy``,
which uses engine-specific xxhash64), token-window document chunking
(the context-window prep step every training pipeline needs), and a
Zipf-fit corpus diagnostic.

Portability discipline: the MinHash shingle hash is the same charfold
polynomial (acc*31 + codepoint mod 2^25) the SimHash/winnowing family
uses — bit-identical in Spark and DuckDB — and the k permutations are
fixed prime multipliers under the 2^31-1 Mersenne modulus, so products
stay < 2^57 (no BIGINT overflow in either engine).

Scale notes (100 TB): signatures are one explode + one groupBy(doc)
with k min-aggregates (map-side combined → k longs per doc on the
wire); banding joins on (band, band_val) so the all-pairs problem
never materializes; chunking is pure per-row array math that rides
the scan (zero shuffle); the Zipf fit aggregates the token stream
once and windows over |lang|×|vocab| rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.operators.dedup import CHARFOLD_MOD, charfold_hash
from builder_spark.registry import register

#: Carter-Wegman permutations h_i(x) = (A[i]*x + B[i]) mod P over the
#: charfold hash (< 2^25). Primes; A[i]*x < 2^27 * 2^25 = 2^52.
_P = 2147483647
_A = [1299721, 15485863, 32452843, 49979687, 67867967, 86028121, 104395301, 122949823]
_B = [7, 131, 523, 1031, 2053, 4099, 8209, 16411]
_K = len(_A)
_BANDS = 4  # 2 rows per band
_MIN_MATCH = 3  # report pairs with >= 3/8 matching signature slots


def _minhash_oracle() -> str:
    mins = ",\n                   ".join(
        f"min((h * {_A[i]} + {_B[i]}) % {_P}) AS s{i}" for i in range(_K)
    )
    band_case = " ".join(
        f"WHEN {b} THEN s{2 * b} * {_P} + s{2 * b + 1}" for b in range(_BANDS)
    )
    band_vals = ", ".join(str(b) for b in range(_BANDS))
    n_match = " + ".join(f"(CASE WHEN x.s{i} = y.s{i} THEN 1 ELSE 0 END)" for i in range(_K))
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1] || ' ' ||
                            string_split(text, ' ')[i+2]))) AS w
            FROM documents
        ),
        th AS (
            SELECT doc_id,
                   list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(range(1, length(w)+1),
                               i -> CAST(ascii(substr(w, CAST(i AS INT), 1)) AS BIGINT))),
                       (a, b) -> (a*31 + b) % {CHARFOLD_MOD}) AS h
            FROM tok
        ),
        sig AS (
            SELECT doc_id,
                   {mins}
            FROM th GROUP BY doc_id
        ),
        bk AS (
            SELECT doc_id, band, CASE band {band_case} END AS val
            FROM sig CROSS JOIN (SELECT unnest([{band_vals}]) AS band)
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bk a JOIN bk b ON a.band = b.band AND a.val = b.val
                               AND a.doc_id < b.doc_id
        )
        SELECT p.id_a, p.id_b,
               {n_match} AS n_match,
               round(({n_match}) / {float(_K)}, 4) AS est_jaccard
        FROM pairs p
        JOIN sig x ON x.doc_id = p.id_a
        JOIN sig y ON y.doc_id = p.id_b
        WHERE {n_match} >= {_MIN_MATCH}
    """


@register("q_minhash_banded", oracle=_minhash_oracle(), category="llm-dedup")
def q_minhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MinHash near-dup pairs, fully hash-matchable: the
    graded twin of ``q_dedup_fuzzy``. 8-permutation signatures over
    charfold-hashed 3-word shingles, 4 bands × 2 rows for candidate
    generation, pairs reported when ≥3/8 signature slots agree
    (estimated Jaccard ≥ 0.375).

    Plan: explode shingles → ONE groupBy(doc) with 8 min-aggregates
    (partial aggregation collapses the token stream map-side) →
    band-explode (4 rows/doc) → self-equi-join on (band, val) →
    distinct pairs → signature rejoin. No O(n²) stage anywhere."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 2, F.lit(0))),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        )
    )
    h = charfold_hash(F.col("w"))
    sig = (
        d.select("doc_id", F.explode(sh).alias("w"))
        .select("doc_id", h.alias("h"))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(F.pmod(F.col("h") * F.lit(_A[i]) + F.lit(_B[i]), F.lit(_P))).alias(f"s{i}")
                for i in range(_K)
            ]
        )
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (F.col(f"s{2 * b}") * F.lit(_P) + F.col(f"s{2 * b + 1}")).alias("val"),
            )
            for b in range(_BANDS)
        ]
    )
    bk = sig.select("doc_id", F.explode(bands).alias("bv")).select(
        "doc_id", F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
    )
    a = bk.alias("a")
    b = bk.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    x = sig.alias("x")
    y = sig.alias("y")
    n_match = sum(
        F.when(F.col(f"x.s{i}") == F.col(f"y.s{i}"), 1).otherwise(0) for i in range(_K)
    )
    return (
        pairs.join(x, F.col("id_a") == F.col("x.doc_id"))
        .join(y, F.col("id_b") == F.col("y.doc_id"))
        .select(
            "id_a",
            "id_b",
            n_match.alias("n_match"),
            F.round(n_match / float(_K), 4).alias("est_jaccard"),
        )
        .filter(F.col("n_match") >= _MIN_MATCH)
    )


_CHUNK = 40  # tokens per chunk
_STRIDE = 30  # chunk start step (overlap = CHUNK - STRIDE = 10 tokens)


@register(
    "q_doc_chunking",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ),
        c AS (
            SELECT doc_id, unnest(range(1, n + 1, {_STRIDE})) AS s, toks, n
            FROM t
        )
        SELECT doc_id,
               CAST((s - 1) // {_STRIDE} AS INT) AS chunk_idx,
               CAST(least(CAST({_CHUNK} AS BIGINT), n - s + 1) AS INT) AS n_tokens,
               array_to_string(list_slice(toks, s, s + {_CHUNK - 1}), ' ') AS chunk_text
        FROM c
    """,
    category="llm-pipeline",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking for context-length prep: overlapping
    40-token chunks every 30 tokens (10-token overlap), trailing
    partial chunk kept. Pure per-row array expressions — the chunker
    rides the parquet scan with zero shuffle, and at 100 TB it stays
    embarrassingly parallel (explode fan-out ≈ n_tokens/30 per doc).
    chunk_idx derives from the start offset ((s-1)/30), so no
    positional explode state is needed."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), n, F.lit(_STRIDE))
    return (
        d.select("doc_id", toks.alias("toks"), n.alias("n"), F.explode(starts).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / _STRIDE).cast("int").alias("chunk_idx"),
            F.least(F.lit(_CHUNK), F.col("n") - F.col("s") + 1).cast("int").alias("n_tokens"),
            F.array_join(F.slice(F.col("toks"), F.col("s"), _CHUNK), " ").alias("chunk_text"),
        )
    )


@register(
    "q_zipf_slope",
    oracle="""
        WITH tf AS (
            SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        freq AS (
            SELECT lang, w, count(*) AS freq FROM tf GROUP BY 1, 2
        ),
        rk AS (
            SELECT lang, freq,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY freq DESC, w ASC) AS rnk
            FROM freq
        )
        SELECT lang,
               round(regr_slope(ln(freq), ln(rnk)), 4) AS zipf_slope,
               round(regr_r2(ln(freq), ln(rnk)), 4) AS zipf_r2,
               count(*) AS n_terms
        FROM rk WHERE rnk <= 100
        GROUP BY lang
    """,
    category="llm-text",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: log-log regression of term
    frequency against frequency rank over the top-100 terms. A corpus
    whose slope is far from ~-1 is a quality signal (templated or
    synthetic text). Rank ties break alphabetically so both engines
    rank identically; ln() inputs are exact integers so the regression
    sums differ only in order → round(·,4). One token-stream shuffle
    (the tf aggregate); the window and regression run over ≤|lang|×
    |vocab| aggregated rows."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), F.col("w").asc())
    return (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 100)
        .groupBy("lang")
        .agg(
            F.round(F.regr_slope(F.log(F.col("freq")), F.log(F.col("rnk"))), 4).alias("zipf_slope"),
            F.round(F.regr_r2(F.log(F.col("freq")), F.log(F.col("rnk"))), 4).alias("zipf_r2"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
