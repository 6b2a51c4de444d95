"""Deduplication operators: exact, fingerprint, MinHash+LSH, Jaccard.

Scale design (the 100 TB story):
- exact_dedup: one hash-aggregate shuffle on the dedup key. For long
  text keys, dedup on md5(text) instead so the shuffle moves 16-byte
  keys, not documents.
- minhash LSH: per-doc signature is a single agg over exploded
  shingles (k min-aggregates, map-side combined). Banding turns the
  O(n²) all-pairs problem into |bucket|² within LSH buckets — the only
  join is on (band_idx, band_hash). Skewed buckets (a shingle set that
  hashes everywhere) are capped via a bucket-size limit.
- jaccard_pairs (exact): common-token join; at scale you run it ONLY
  on LSH candidates, never all pairs.

MinHash here is hand-rolled and fully deterministic: xxhash64 shingle
hashes + fixed odd multipliers (splitmix64-derived constants), min per
permutation. No randomness, reproducible across runs/clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from builder_spark.functions.text import tokens, word_shingles
from builder_spark.operators.partitioning import spread

#: splitmix64-style fixed constants; k permutations h_i(x) = a_i*x + b_i
#: in wrapping 64-bit arithmetic (Java long overflow is defined).
_MULTS = [
    0x9E3779B97F4A7C15,
    0xBF58476D1CE4E5B9,
    0x94D049BB133111EB,
    0xD6E8FEB86659FD93,
    0xA5A5A5A5A5A5A5A5,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
]


#: Mersenne prime 2^31-1: Carter-Wegman universal hashing h_i(x) =
#: (a_i·x + b_i) mod p. With x,a,b < 2^31 the product stays < 2^62 —
#: no long overflow under Spark's default ANSI arithmetic.
_P = 2147483647


def _perm_consts(i: int) -> tuple[int, int]:
    """(a_i, b_i) for permutation h_i(x) = (a_i·x + b_i) mod _P."""
    a = (_MULTS[i % len(_MULTS)] >> (i % 23)) & 0x7FFFFFFF | 1
    b = (_MULTS[(i * 7 + 3) % len(_MULTS)] * (i + 1)) & 0x7FFFFFFF
    return a, b


def _perm(h, i: int):
    a, b = _perm_consts(i)
    return F.pmod(F.lit(a) * h + F.lit(b), F.lit(_P))


def _minhash_sig_gen(k: int, shingle_words: int, id_name: str):
    """mapInArrow generator for MinHash signatures over token-hash
    arrays — the per-batch numpy kernel behind
    :func:`minhash_signatures`.

    Input batches: (id, _th: list<int64>) where _th[j] =
    pmod(xxhash64(token_j), _P), pre-filtered to ≥ ``shingle_words``
    tokens. Output: (id, sig_0..sig_{k-1}), bit-identical to the
    expression form array_min(transform(shingles, h_i)) — the shingle
    combine (acc = (acc·31 + th·37) mod P) and the k affine
    permutations are exact int64 arithmetic in both engines
    (intermediates < 2^62), and min over the shingle MULTISET equals
    min over the distinct set, so the old array_distinct is dropped
    without changing a single signature value.

    Everything is vectorized across the whole batch: shingle hashes
    via ``shingle_words`` strided passes over the concatenated token
    hashes, per-permutation minima via ``np.minimum.reduceat`` on doc
    offsets — one C-speed pass per permutation instead of one
    interpreted-lambda evaluation per (shingle × permutation)
    (guide-§4.2 shape: Spark moves the columns, numpy does the math;
    measured 91 CPU-s → <2 CPU-s on the q_dedup_fuzzy signature stage
    at sf0.1)."""
    consts = [_perm_consts(i) for i in range(k)]

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            lc = batch.column(1)
            n = len(ids)
            if n == 0:
                continue
            offs = lc.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = lc.values.to_numpy(zero_copy_only=False).astype(np.int64)
            nper = np.diff(offs)  # tokens per doc (all >= shingle_words)
            nsh = nper - (shingle_words - 1)  # shingles per doc (all >= 1)
            # shingle hash at global token position i:
            #   acc = th[i]; acc = (acc*31 + th[i+j]*37) % P  (j = 1..w-1)
            tail = len(vals) - (shingle_words - 1)
            acc = vals[:tail].copy()
            for j in range(1, shingle_words):
                acc = (acc * 31 + vals[j : tail + j] * 37) % _P
            # gather the in-doc shingle positions (cross-doc strides in
            # `acc` are skipped by construction of idx)
            total = int(nsh.sum())
            sh_starts = np.zeros(n, np.int64)
            np.cumsum(nsh[:-1], out=sh_starts[1:])
            idx = np.repeat(offs[:-1] - sh_starts, nsh) + np.arange(total)
            sh = acc[idx]
            cols = {id_name: ids}
            for i, (a, b) in enumerate(consts):
                v = (a * sh + b) % _P
                cols[f"sig_{i}"] = pa.array(np.minimum.reduceat(v, sh_starts))
            yield pa.RecordBatch.from_pydict(cols)

    return gen


def exact_dedup(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """Keep the first row (min order_col) per duplicate key."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 16, shingle_words: int = 3
) -> DataFrame:
    """(id, sig_0..sig_{k-1}): deterministic MinHash signature per doc.

    The token→hash step (xxhash64, codegen'd) stays JVM-side; the
    shingle combine and the k permutation-min passes run as a
    vectorized numpy kernel in one ``mapInArrow`` stage
    (:func:`_minhash_sig_gen`) — output bit-identical to the previous
    pure-expression form (sig_i = array_min(transform(shingles, h_i)))
    but ~50× less signature-stage CPU at sf0.1: HOF lambdas are
    interpreted per (shingle × permutation), numpy does one C pass per
    permutation over the whole batch. Only (id, token hashes) cross
    the Python boundary, as Arrow batches; no shuffle is touched.
    Docs with fewer tokens than ``shingle_words`` have no shingles and
    are dropped, matching the old explode semantics.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    toks = tokens(text_col)
    th = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(_P)))
    # Shingle-less docs are dropped HERE, on the cheap token count —
    # the kernel assumes ≥1 shingle per row.
    pre = (
        spread(df, id_col)
        .filter(F.size(tokens(text_col)) >= shingle_words)
        .select(F.col(id_col), th.alias("_th"))
    )
    out_schema = StructType(
        [pre.schema[id_col]] + [StructField(f"sig_{i}", LongType()) for i in range(k)]
    )
    sigs = pre.mapInArrow(_minhash_sig_gen(k, shingle_words, id_col), out_schema)
    # localCheckpoint, not a repartition reuse-boundary (r15 fix): the
    # downstream LSH banding self-joins this frame, but ReusedExchange
    # NEVER fires above a MapInArrow node — PythonMapInArrow plans do
    # not canonicalize equal (the embedded Python function defeats
    # subtree equality), so the exchange form re-ran the signature
    # kernel once per consumer branch (measured: 2 executions for
    # q_dedup_fuzzy, 4 for q_minhash_banded). The checkpoint runs the
    # kernel ONCE and hands every consumer the k-longs-per-doc result.
    return sigs.localCheckpoint(eager=True)


def minhash_lsh_candidates(
    sigs: DataFrame, id_col: str, k: int = 16, bands: int = 8
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing ≥1 LSH band bucket.

    rows_per_band = k/bands; band hash = xxhash64 of the band's
    signature slice. The self-join is on (band, bucket) — the classic
    LSH trick that avoids all-pairs.
    """
    rpb = k // bands
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[f"sig_{b * rpb + j}" for j in range(rpb)]).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(
        F.col(id_col), F.explode(band_cols).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact word-set Jaccard for pairs (id_a < id_b) with sim ≥ threshold.

    With ``candidates`` (e.g. from LSH), ONLY those pairs are scored:
    the candidate list is joined to per-doc token arrays and the
    intersection is computed JVM-side with ``array_intersect`` — no
    token-level explode, no all-pairs work. Cost is O(|candidates| ×
    avg tokens), the shape that survives 100 TB.

    Without candidates, generation falls back to a common-token join
    (correct but O(sum over tokens of df²) — small corpora / already-
    blocked partitions only).
    """
    if candidates is not None:
        toks = df.select(
            F.col(id_col).alias("_id"), F.array_distinct(tokens(text_col)).alias("_t")
        )
        pairs = _pin_pair_parallelism(candidates).join(
            toks.select(F.col("_id").alias("id_a"), F.col("_t").alias("_ta")), "id_a"
        ).join(toks.select(F.col("_id").alias("id_b"), F.col("_t").alias("_tb")), "id_b")
        inter = F.size(F.array_intersect("_ta", "_tb"))
        union = F.size("_ta") + F.size("_tb") - inter
        return (
            pairs.withColumn("jaccard", F.round(inter / union.cast("double"), 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    # spread: tokenization must not serialize on a single-row-group
    # scan; trailing repartition = materialization boundary so the
    # prefix/df/verification consumers share ONE tokenization via
    # exchange reuse (see minhash_signatures)
    items = (
        spread(df, id_col)
        .select(F.col(id_col).alias("_id"), F.array_distinct(tokens(text_col)).alias("_arr"))
        .repartition(F.col("_id"))
    )
    cands = prefix_filter_candidates(items, threshold)
    return jaccard_from_sets(items, cands, threshold)


def prefix_filter_candidates(items: DataFrame, tau: float) -> DataFrame:
    """Complete candidate pairs (id_a < id_b) for Jaccard ≥ tau via
    PREFIX FILTERING (Chaudhuri et al. SSJoin '06 / Bayardo PPJoin
    '07): rank each set's elements by global document frequency
    (rarest first, ties by value) and explode only the first
    ``|d| − ⌈τ·|d|⌉ + 1`` elements; two sets with Jaccard ≥ τ MUST
    share a prefix element (J ≥ τ ⇒ overlap ≥ τ·max(|A|,|B|); if the
    whole prefix missed, overlap ≤ |d| − prefix_len < τ·|d| —
    contradiction). Input: ``items`` = (_id, _arr) with DISTINCT
    elements. Output pairs are a strict superset of the true ≥ τ
    pairs; verify with jaccard_from_sets.

    Scale: this is what replaces the naive common-token join — hot
    tokens ("the", common 5-grams) sit at the END of the frequency
    order, so they never enter a prefix unless a doc is almost all
    hot tokens. Join fan-out collapses from Σ df² over ALL tokens to
    Σ df_prefix² over rare ones. The ε in the ceil guards against
    double rounding of τ·|d| shrinking the prefix below completeness.

    τ is SLACKED by the round-4 acceptance granularity before any
    pruning: the verifier accepts round(J, 4) ≥ τ, i.e. true J down
    to τ − 0.00005, so every filter here prunes against that relaxed
    τ — for large sets (≥20k distinct elements) an unslacked prefix
    length could drop a boundary pair the verifier (and the exact
    all-pairs oracle) keeps. Slack only WIDENS the candidate set.
    """
    tau = tau - 5e-5
    n_pin = items.sparkSession.sparkContext.defaultParallelism
    tok = items.select("_id", F.size("_arr").alias("_sz"), F.explode("_arr").alias("_w"))
    gdf = tok.groupBy("_w").agg(F.count(F.lit(1)).alias("_gdf"))
    w = Window.partitionBy("_id").orderBy(F.col("_gdf").asc(), F.col("_w").asc())
    prefix_len = F.col("_sz") - F.ceil(F.lit(tau) * F.col("_sz") - F.lit(1e-9)) + 1
    # explicit pinned (_id) exchange: the window's own hash exchange is
    # byte-tiny, so AQE's byte-based coalescing serializes the ranking
    # AND everything pipelined above it (the pair-generating join +
    # the partial distinct) onto a handful of tasks; REPARTITION_BY_NUM
    # is exempt, satisfies the window's clustering requirement (no
    # second exchange), and scales with the cluster — the same fix as
    # the stitch's (_pid) pin. Second pin on _w below: the generation
    # join's streamed side otherwise inherits the coalesced layout.
    prefix = (
        tok.join(gdf, "_w")
        .repartition(n_pin, F.col("_id"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
        .select("_id", "_sz", "_rn", "_w")
        .repartition(n_pin, F.col("_w"))
    )
    a = prefix.select(
        F.col("_id").alias("id_a"), F.col("_sz").alias("_sza"), F.col("_rn").alias("_rna"), "_w"
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), F.col("_sz").alias("_szb"), F.col("_rn").alias("_rnb"), "_w"
    )
    # PPJoin refinements, both sound (never drop a true ≥ τ pair):
    # size filter — J ≥ τ forces τ·|B| ≤ |A| ≤ |B|/τ; positional
    # filter — matching at prefix positions (i, j) caps the possible
    # overlap at 1 + min(|A|−i, |B|−j), which must reach the required
    # overlap ⌈τ/(1+τ)·(|A|+|B|)⌉ (ε-relaxed against double rounding).
    required = F.ceil(
        F.lit(tau / (1.0 + tau)) * (F.col("_sza") + F.col("_szb")) - F.lit(1e-9)
    )
    ubound = 1 + F.least(F.col("_sza") - F.col("_rna"), F.col("_szb") - F.col("_rnb"))
    return (
        a.join(b, "_w")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("_sza") >= F.ceil(F.lit(tau) * F.col("_szb") - F.lit(1e-9)))
        .filter(F.col("_szb") >= F.ceil(F.lit(tau) * F.col("_sza") - F.lit(1e-9)))
        .filter(ubound >= required)
        .select("id_a", "id_b")
        .distinct()
    )


def _pin_pair_parallelism(candidates: DataFrame) -> DataFrame:
    """Fan the candidate-pair table out to cluster parallelism with an
    explicit REPARTITION_BY_NUM before the verification stage.

    The verification stage's cost is per-PAIR CPU (attach two element
    arrays, count the overlap), but the candidate `.distinct()` feeding
    it is byte-tiny (16 B/pair), so AQE's byte-based partition
    coalescing legally shrinks it — measured at sf0.1: q_ngram_jaccard's
    verify stage ran 167 CPU-s on 8 tasks, q_containment_dedup's pair
    fan-out on ONE task (15 s straggler). Pinning the count makes the
    exchange exempt from coalescing (same fix, same reasoning as the
    stitch's (_pid) repartition). ROUND-ROBIN, not hash on (id_a,
    id_b): the distinct's own ENSURE_REQUIREMENTS exchange already
    hash-partitions by exactly that key, so a keyed pin is elided as a
    redundant exchange and the surviving distinct exchange coalesces
    anyway (observed in the AQE-final plan: the pin vanished, verify
    ran on 16 tasks / 113 CPU-s). Round-robin partitioning differs
    from the child's, survives, and its sort-before-repartition pass
    is trivial on 16-byte pair rows. Scale-adaptive: defaultParallelism
    is the cluster's core count, not a local constant."""
    n = candidates.sparkSession.sparkContext.defaultParallelism
    return candidates.repartition(n)


def jaccard_from_sets(
    items: DataFrame, candidates: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard over candidate pairs: both element arrays join in
    whole (two broadcast-or-shuffle hash joins keyed on id), and the
    intersection is computed JVM-side with array_intersect — no
    element-level explode, cost O(|candidates| · avg set size).

    A vectorized Arrow pair-overlap kernel (sorted per-doc arrays +
    searchsorted probes) was built and MEASURED against this form at
    sf0.1 (r15): with the partition pin below, the JVM intersect runs
    the whole verify stage in ~2 s, while the kernel paid ~21 GB of
    pair-grain Arrow boundary (the real gram sets average ~900
    elements, not the 200 the napkin math assumed) plus numpy passes
    that cost about the same CPU as the hash sets it replaced — 17-31 s
    walls, 10× WORSE. Rejected; the pin is the whole win here."""
    a = items.select(F.col("_id").alias("id_a"), F.col("_arr").alias("_ta"))
    b = items.select(F.col("_id").alias("id_b"), F.col("_arr").alias("_tb"))
    pairs = _pin_pair_parallelism(candidates).join(a, "id_a").join(b, "id_b")
    # SSJoin SIZE FILTER (exactness-preserving): J(A,B) ≥ τ forces
    # |A∩B| ≥ τ·max(|A|,|B|) and |A∩B| ≤ min(|A|,|B|), hence
    # min ≥ τ·max — a candidate whose sizes are more than 1/τ apart
    # cannot qualify and skips the O(set size) intersection entirely.
    # τ is slacked by the round-4 granularity: the FINAL filter accepts
    # round(J, 4) ≥ τ, i.e. true J down to τ − 0.00005 — the size bound
    # must not drop those boundary pairs. Doubled slack (1e-4, vs the
    # 5e-5 the acceptance needs) because this is a PRUNING-only filter:
    # it removes the 1-ulp FP edge when min equals (τ−5e-5)·max exactly,
    # at the cost of a few extra candidates reaching the exact check.
    sa, sb = F.size("_ta"), F.size("_tb")
    pairs = pairs.filter(
        F.least(sa, sb).cast("double") >= F.lit(threshold - 1e-4) * F.greatest(sa, sb)
    )
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = sa + sb - inter
    return (
        pairs.withColumn("jaccard", F.round(inter / union.cast("double"), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


#: SimHash configuration — shared with the DuckDB oracle generator in
#: queries/llmscale.py so both engines compute identical signatures.
SIMHASH_BITS = 24
SIMHASH_BANDS = 4
CHARFOLD_MOD = 1 << 25  # fold modulus: acc*31+cp stays < 2^30, no overflow


def charfold_hash(col) -> "F.Column":
    """Deterministic polynomial string hash: fold (acc*31 + codepoint)
    mod 2^25 over the characters, init 0.

    Engine-portable by construction (unlike xxhash64/murmur): DuckDB
    computes the identical value via list_reduce(list_prepend(0,
    codepoints), (a,b) -> (a*31+b) % m) — verified char-for-char.
    Pure codegen expressions, no UDF.
    """
    w = F.col(col) if isinstance(col, str) else col
    cps = F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.ascii(F.substr(w, i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        cps, F.lit(0).cast("long"), lambda acc, x: F.pmod(acc * F.lit(31) + x, F.lit(CHARFOLD_MOD))
    )


def charfold_token_hp(tokens_col) -> "F.Column":
    """Per-token charfold state array: for each token the pair
    ``(h = charfold_hash(token), p = 31^len(token) mod m)`` —
    everything :func:`kgram_hashes_from_hp` needs to assemble shingle
    hashes with O(1) arithmetic. MUST be projected into its own column
    before use (``.select(..., charfold_token_hp(t).alias("_hp"))``):
    Spark does no common-subexpression elimination inside
    higher-order-function lambdas, so inlining this expression into a
    per-shingle combiner re-folds every token once PER SHINGLE
    (measured 28× slower, not faster). CollapseProject keeps the
    intermediate projection because the column is referenced many
    times, so the fold runs exactly once per row."""
    m = F.lit(CHARFOLD_MOD)

    def tok_hp(t):
        cps = F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: F.ascii(F.substr(t, i, F.lit(1))).cast("long"),
        )
        folded = F.aggregate(
            cps,
            F.struct(F.lit(0).cast("long").alias("h"), F.lit(1).cast("long").alias("p")),
            lambda acc, x: F.struct(
                F.pmod(acc.getField("h") * 31 + x, m).alias("h"),
                F.pmod(acc.getField("p") * 31, m).alias("p"),
            ),
        )
        # EMPTY-token guard: sequence(1, 0) yields the DESCENDING [1, 0]
        # (not an empty array), which would fold two phantom characters
        # into p (h survives because 0·31+0 = 0, p becomes 31² instead
        # of 31⁰) and break the composition identity for texts with
        # consecutive/leading/trailing spaces — the oracle hashes the
        # concatenated string and would diverge.
        return F.when(
            F.length(t) > 0, folded
        ).otherwise(
            F.struct(F.lit(0).cast("long").alias("h"), F.lit(1).cast("long").alias("p"))
        )

    return F.transform(tokens_col, tok_hp)


def kgram_hashes_from_hp(hp_col, k: int = 3) -> "F.Column":
    """Array of :func:`charfold_hash` values of the space-joined word
    ``k``-grams, assembled from a MATERIALIZED
    :func:`charfold_token_hp` column — BIT-IDENTICAL to hashing each
    concatenated shingle string, but each token is char-folded once and
    every shingle combines k ``(h, p)`` pairs with O(1) arithmetic via
    the polynomial fold's concatenation linearity:
    ``hash(a ++ b) = hash(a)·31^|b| + hash(b)  (mod m)``
    (the ' ' separator folds in as ·31 + 32). ~3× less interpreted-
    lambda work than per-shingle string hashing — HOF lambdas aren't
    codegen'd, so the per-char op count IS the cost. All intermediates
    stay < 2^55 (m = 2^25): exact in long arithmetic. The DuckDB
    oracle keeps hashing the concatenated strings — the values are
    mathematically equal, so graded parity is untouched."""
    m = F.lit(CHARFOLD_MOD)
    hp = F.col(hp_col) if isinstance(hp_col, str) else hp_col
    n = F.size(hp)

    def shingle(i):  # i is the 1-based start index
        h = F.element_at(hp, i).getField("h")
        for j in range(1, k):
            nxt = F.element_at(hp, i + F.lit(j))
            # (h·31 + 32) < 2^30, ×p (< 2^25) < 2^55 — no overflow
            h = F.pmod((h * 31 + 32) * nxt.getField("p") + nxt.getField("h"), m)
        return h

    # fewer than k tokens → NO shingles. Guarded with when, not
    # greatest: sequence(1, 0) is the DESCENDING [1, 0] (not empty),
    # which would emit phantom shingles with out-of-bounds indices.
    idx = F.when(n >= F.lit(k), F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, shingle)


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS, shingle_words: int = 3
) -> DataFrame:
    """(id, simhash): ``bits``-bit SimHash over distinct word shingles.

    Classic Charikar construction: each shingle votes +1/-1 per bit of
    its hash; signature bit i is set iff the summed vote is positive.
    Shingles (not unigrams) are the feature set — on small-vocabulary
    corpora unigram sets are near-identical across documents and the
    signature stops discriminating. One explode + one groupBy(id) with
    ``bits`` conditional-sum aggregates — map-side combined, shuffle is
    ``bits`` longs per doc. Fully deterministic (charfold hash, no RNG).
    """
    if shingle_words > 1:
        proj, feats = word_shingles(text_col, shingle_words)
        src = spread(df, id_col).select(F.col(id_col), proj)
    else:
        feats = F.array_distinct(tokens(text_col))
        src = spread(df, id_col)
    # r15: the per-shingle string fold runs in a numpy mapInArrow
    # kernel (charfold_hash is an interpreted double-HOF per shingle —
    # millions of per-char expression walks at sf0.1); value-identical
    # (same fold; pinned by tests/test_chargram_kernel.py). The
    # DISTINCT stays on the shingle STRINGS above: deduping on hash
    # values would merge colliding shingles and change vote weights.
    from builder_spark.operators.arrowkern import charfold_strings_gen

    tok = src.select(F.col(id_col), F.explode(feats).alias("_w"))
    id_type = dict(tok.dtypes)[id_col]
    tok = tok.mapInArrow(
        charfold_strings_gen("_th"), f"{id_col} {id_type}, _th long"
    )
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("_th", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_v{i}")
            for i in range(bits)
        ]
    )
    sig = None
    for i in range(bits):
        term = F.when(F.col(f"_v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return votes.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_near_dupes(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming ≤ max_hamming) via SimHash.

    Candidate generation is banded like MinHash-LSH: the signature is
    cut into ``bands`` equal bit-slices and pairs must agree exactly on
    ≥1 slice — a join on (band, slice-value), never all-pairs. Exact
    Hamming distance (bit_count of xor) then filters candidates.
    At 100 TB: the band join is the only shuffle, keyed on small ints.
    """
    rpb = bits // bands
    mask = (1 << rpb) - 1
    # checkpoint (r15): the band self-join consumes sigs twice and
    # ReusedExchange never fires above the signature kernel's
    # MapInArrow — one kernel run, one long per doc
    sigs = simhash_signatures(df, id_col, text_col, bits=bits).localCheckpoint(
        eager=True
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * rpb).bitwiseAND(F.lit(mask)).alias("val"),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(id_col, "simhash", F.explode(band_arr).alias("bb")).select(
        id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.val").alias("val")
    )
    a = buckets.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"), "band", "val")
    b = buckets.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"), "band", "val")
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def char_codepoints(text_col) -> "F.Column":
    """Codepoint array of a string column — decode ONCE per row, then
    every gram/fold consumer works on int-array slices instead of
    re-running substr+ascii per character (HOF lambdas are interpreted;
    string ops against the full text dominate). MUST be projected into
    its own column before use — Spark does no CSE inside HOF lambdas
    (see charfold_token_hp)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.ascii(F.substr(t, i, F.lit(1))).cast("long"),
    )


def charfold_gram_hashes_from_cps(cps_col, k: int) -> "F.Column":
    """charfold hash of every k-char gram, computed from a MATERIALIZED
    :func:`char_codepoints` column: gram i folds the k-int slice
    starting at i — bit-identical to charfold_hash(substr(text, i, k))
    (same codepoints, same fold), including the short-text case (< k
    chars hash as one truncated gram, exactly like substr's clamping).
    Note sequence's lower bound stays ≥ 1 via the greatest(·, 1) guard,
    so the descending-sequence(1, 0) trap cannot occur."""
    cps = F.col(cps_col) if isinstance(cps_col, str) else cps_col
    m = F.lit(CHARFOLD_MOD)
    n_grams = F.greatest(F.size(cps) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.aggregate(
            F.slice(cps, i, k),
            F.lit(0).cast("long"),
            lambda acc, x: F.pmod(acc * 31 + x, m),
        ),
    )


WINNOW_K = 5  # character-gram size
WINNOW_W = 4  # winnowing window (grams per window)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Winnowed rolling-hash fingerprints per document (Schleimer,
    Wilkerson, Aiken 2003 — the MOSS algorithm): hash every k-char
    gram, slide a w-gram window, keep each window's minimum hash.
    Guarantees every match of length ≥ k+w-1 shares a fingerprint
    while storing only ~2/(w+1) of the gram hashes.

    Returns (id, fp) with distinct fingerprints per document.

    Portability: gram hash = charfold polynomial (engine-portable,
    see charfold_hash) so a DuckDB oracle computes identical values;
    tie-break inside a window is plain min (the paper's rightmost-min
    refinement only changes WHICH duplicate hash survives — the
    selected hash VALUE, which is all we emit, is identical).

    Scale: everything up to the final explode is per-row array math
    riding the scan (no shuffle); the explode fans out ~2n/(w+1) rows
    per doc which then feed a fingerprint equi-join — same shape as
    the LSH band join, no all-pairs.

    r6 throughput rewrite (identical values): the text decodes to a
    MATERIALIZED codepoint array once per row, and each gram hash
    folds a k-int slice of it — the old form re-ran substr+ascii for
    every character of every gram against the full string (O(n·k)
    heavy string ops, interpreted; measured 43 s → ~6 s at sf0.1).
    r15: the per-char fold + window minima moved into one numpy
    mapInArrow kernel (``arrowkern.winnow_fp_gen`` — HOF lambdas are
    interpreted, so the per-char expression walk still dominated);
    values are identical (same int64 fold, clamped windows, truncated
    short-gram semantics — pinned by tests/test_chargram_kernel.py).
    ``spread`` first: single-row-group fixtures would otherwise run
    the whole gram stage on one core."""
    from builder_spark.operators.arrowkern import winnow_fp_gen

    return (
        spread(df, id_col)
        .select(F.col(id_col), F.col(text_col) if isinstance(text_col, str) else text_col)
        .mapInArrow(winnow_fp_gen(k, w, id_col), f"{id_col} long, fp long")
    )


def winnow_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_containment: float = 0.5,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Near-dup/containment pairs from shared winnowed fingerprints:
    (id_a, id_b, shared_fp, containment) where containment =
    shared / min(|fp_a|, |fp_b|) — the plagiarism-detection metric
    (robust when one doc embeds the other)."""
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    # checkpoint (r15): tok/gdf/prefix/full and both verification
    # rejoins all sit above the fingerprint kernel, and ReusedExchange
    # never fires above MapInArrow — one kernel run, one fingerprint
    # array per doc
    items = (
        fps.groupBy(id_col)
        .agg(F.collect_set("fp").alias("_arr"))
        .select(F.col(id_col).alias("_id"), "_arr")
        .localCheckpoint(eager=True)
    )
    # Candidate generation: prefix(Jaccard-style, rarity-ranked) on one
    # side × FULL fingerprint list on the other. Containment's overlap
    # bound only holds for the SMALLER set (I ≥ c·min), so the smaller
    # doc's prefix must hit the larger doc's full list; joining
    # prefix×full in one direction + unordered normalization covers
    # both assignments. Complete for containment ≥ c; hot fingerprints
    # never enter a prefix, so no quadratic fan-out.
    n_pin = items.sparkSession.sparkContext.defaultParallelism
    tok = items.select("_id", F.size("_arr").alias("_sz"), F.explode("_arr").alias("_w"))
    gdf = tok.groupBy("_w").agg(F.count(F.lit(1)).alias("_gdf"))
    rank_w = Window.partitionBy("_id").orderBy(F.col("_gdf").asc(), F.col("_w").asc())
    prefix_len = (
        F.col("_sz") - F.ceil(F.lit(min_containment) * F.col("_sz") - F.lit(1e-9)) + 1
    )
    # pinned (_id) + (_w) exchanges: see prefix_filter_candidates — the
    # byte-tiny window exchange otherwise coalesces, serializing the
    # rank, the generation join and the partial distinct pipelined
    # above it (measured: one 15 s task at sf0.1)
    prefix = (
        tok.join(gdf, "_w")
        .repartition(n_pin, F.col("_id"))
        .withColumn("_rn", F.row_number().over(rank_w))
        .filter(F.col("_rn") <= prefix_len)
        .select(F.col("_id").alias("_pid"), "_w")
        .repartition(n_pin, F.col("_w"))
    )
    cands = (
        prefix.join(tok.select(F.col("_id").alias("_fid"), "_w"), "_w")
        .filter(F.col("_pid") != F.col("_fid"))
        .select(
            F.least("_pid", "_fid").alias("id_a"),
            F.greatest("_pid", "_fid").alias("id_b"),
        )
        .distinct()
    )
    a = items.select(F.col("_id").alias("id_a"), F.col("_arr").alias("_fa"))
    b = items.select(F.col("_id").alias("id_b"), F.col("_arr").alias("_fb"))
    shared = F.size(F.array_intersect("_fa", "_fb"))
    return (
        _pin_pair_parallelism(cands)
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn("shared_fp", shared)
        .withColumn(
            "containment",
            F.round(
                F.col("shared_fp")
                / F.least(F.size("_fa"), F.size("_fb")).cast("double"),
                4,
            ),
        )
        .filter(F.col("containment") >= min_containment)
        .select("id_a", "id_b", "shared_fp", "containment")
    )


def _propagation_round(bi: DataFrame, labels: DataFrame, broadcastable: bool) -> DataFrame:
    """One min-label propagation round: labels flow across the (already
    bidirectional) edge table, every node keeps the minimum seen. With
    ``broadcastable`` the node-grain label table ships map-side and the
    edge table is never exchanged (scanned straight from its
    checkpoint); the label aggregate's map-side partials compress the
    per-round shuffle to node grain."""
    lab = F.broadcast(labels) if broadcastable else labels
    msgs = bi.join(lab, bi.v == lab.node).select(F.col("u").alias("node"), F.col("label"))
    return (
        labels.select("node", "label")
        .union(msgs)
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id),
    cluster_id = min doc id in the component (the canonical survivor).

    Iterative min-label propagation: every node starts labeled with
    itself; each round, labels flow across edges (both directions) and
    every node keeps the minimum seen. Converges in O(component
    diameter) rounds — near-dup clusters are dense, so diameter is
    small. Each round is one join + one aggregate (two shuffles) and the
    loop exits early when a round changes nothing.

    Lineage discipline (CRITICAL for iteration): each round's labels are
    `localCheckpoint()`ed — persist alone keeps the full logical plan,
    which doubles per round until Catalyst's plan-string rendering (and
    eventually the optimizer itself) blows up. Checkpointing truncates
    the plan so every round optimizes a constant-size query. On a real
    cluster, swap `localCheckpoint` for `checkpoint` with a durable
    `spark.sparkContext.setCheckpointDir` so executor loss can't lose
    intermediate state. This is the iterative-algorithm escape hatch:
    Spark has no recursive CTE, so the DRIVER loops while every round
    stays a declarative, shuffle-bounded DataFrame op.

    Shuffle discipline (r16): localCheckpoint discards partitioning
    info, so a shuffle join would re-shuffle the EDGE table every
    round (guide §2.4). Instead the node-grain label table — orders of
    magnitude smaller than the edges for near-dup components — is
    BROADCAST into the propagation join: the edge table is never
    exchanged at all (scanned from its checkpoint, joined map-side),
    and the only per-round shuffle is the label aggregate, which
    map-side partial aggregation compresses to node grain. Guarded by
    SPARK_GRAFT_CLUSTER_BCAST_MAX (default 20M nodes ≈ 320 MB framed,
    well under the 8 GB / 512M-row broadcast cap): above it, fall back
    to the shuffle join — at that scale co-partitioning via a bucketed
    staging table is the production answer (SCALE.md).
    """
    edges = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    bi = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    bi = bi.localCheckpoint(eager=True)
    labels = (
        bi.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    bcast_max = int(os.environ.get("SPARK_GRAFT_CLUSTER_BCAST_MAX", 20_000_000))
    broadcastable = labels.count() <= bcast_max
    for _ in range(max_iter):
        new_labels = _propagation_round(bi, labels, broadcastable).localCheckpoint(
            eager=True
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "_old"), "node")
            .filter(F.col("label") != F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def minhash_near_dupes(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Full near-dup pipeline: MinHash signatures → LSH candidate pairs
    → exact Jaccard verification ≥ threshold. Deterministic end-to-end."""
    sigs = minhash_signatures(df, id_col, text_col, k=k)
    cands = minhash_lsh_candidates(sigs, id_col, k=k, bands=bands)
    return jaccard_pairs(df, id_col, text_col, threshold, candidates=cands)


def containment_pairs(items: DataFrame, tau: float) -> DataFrame:
    """Complete candidate+verify pipeline for asymmetric token-set
    CONTAINMENT: pairs (id_a < id_b) with |A∩B| / min(|A|,|B|) ≥ τ —
    the subset-duplicate relation Jaccard misses (a doc quoted whole
    inside a larger one has tiny Jaccard, full containment).

    Candidates via the ASYMMETRIC prefix filter: C ≥ τ forces
    |A∩B| ≥ τ·|A| for the smaller set A, so if none of A's
    ``|A| − ⌈τ·|A|⌉ + 1`` globally-rarest tokens appear in B's FULL
    token set, overlap ≤ ⌈τ|A|⌉ − 1 < τ·|A| — impossible. Only the
    smaller side's prefix enters the join (against the full token
    stream); prefix tokens are globally rare by construction, so the
    fan-out is Σ df(rare) — no hot-token blowup, no all-pairs. τ is
    slacked by the round-4 acceptance granularity (τ − 5e-5), same
    discipline as :func:`prefix_filter_candidates`. Verification is
    exact ``array_intersect`` on candidates only.

    ``items`` = (_id, _arr) with DISTINCT elements (same contract as
    :func:`prefix_filter_candidates`).
    """
    tau_eff = tau - 5e-5
    n_pin = items.sparkSession.sparkContext.defaultParallelism
    tok = items.select("_id", F.size("_arr").alias("_sz"), F.explode("_arr").alias("_w"))
    gdf = tok.groupBy("_w").agg(F.count(F.lit(1)).alias("_gdf"))
    w = Window.partitionBy("_id").orderBy(F.col("_gdf").asc(), F.col("_w").asc())
    prefix_len = F.col("_sz") - F.ceil(F.lit(tau_eff) * F.col("_sz") - F.lit(1e-9)) + 1
    # pinned (_id) + (_w) exchanges: see prefix_filter_candidates — the
    # byte-tiny window exchange otherwise coalesces, serializing the
    # rank, the generation join and the partial distinct pipelined
    # above it (measured: one 15-18 s task at sf0.1)
    prefix = (
        tok.join(gdf, "_w")
        .repartition(n_pin, F.col("_id"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
        .select("_id", "_sz", "_w")
        .repartition(n_pin, F.col("_w"))
    )
    full = tok.select(F.col("_id").alias("_idf"), F.col("_sz").alias("_szf"), "_w")
    cand = (
        prefix.join(full, "_w")
        .filter(F.col("_id") != F.col("_idf"))
        # prefix side must be the smaller (or equal-size id-smaller)
        # set: exactly one direction generates each candidate pair
        .filter(
            (F.col("_sz") < F.col("_szf"))
            | ((F.col("_sz") == F.col("_szf")) & (F.col("_id") < F.col("_idf")))
        )
        .select(
            F.least("_id", "_idf").alias("id_a"),
            F.greatest("_id", "_idf").alias("id_b"),
        )
        .distinct()
    )
    a = items.select(F.col("_id").alias("id_a"), F.col("_arr").alias("_ta"))
    b = items.select(F.col("_id").alias("id_b"), F.col("_arr").alias("_tb"))
    pairs = _pin_pair_parallelism(cand).join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("_ta", "_tb"))
    mn = F.least(F.size("_ta"), F.size("_tb"))
    return (
        pairs.withColumn("containment", F.round(inter / mn.cast("double"), 4))
        .filter(F.col("containment") >= tau)
        .select("id_a", "id_b", "containment")
    )
