"""Round-9 surface growth, batch 8: price-volume-mix revenue
decomposition, robust MAD normalization audit, k-anonymity privacy
audit, Johnson–Lindenstrauss ±1 projection with a distortion audit,
centroid-recentering + L2 norm audit, Kneser–Ney smoothed bigram LM,
train/test out-of-vocabulary rate, user-level event co-occurrence
lift, daily peak detection, and Gumbel-top-k deterministic weighted
sampling without replacement.

Design rules (unchanged from batches 1–7):
- integer-exact cores; embedding statistics are QUANTIZED to integer
  micro-units the moment they leave a float aggregate, so every
  downstream comparison/projection/distance is exact integer algebra;
- pairwise constructions only over constant-bounded aggregates
  (10 label centroids, 5×5 event grids) — never fact rows;
- sampling/splits are recomputable from the key alone (Knuth hash,
  zero RNG); top-k selections are TakeOrdered with rounded keys and
  unique-key tie-breaks so cross-engine float dust cannot reorder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.functions.hashing import KNUTH, knuth_bucket, knuth_top_bit
from builder_spark.registry import register

_OC = "CAST(round(o_totalprice * 100) AS BIGINT)"
_LI_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_LI_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# price-volume-mix decomposition


@register(
    "q_pvm_decomposition",
    oracle=f"""
        WITH py AS (
            SELECT l_partkey AS pk, year(l_shipdate) AS y,
                   sum({_LI_QTY}) AS q, sum({_LI_CENTS}) AS cents
            FROM lineitem
            WHERE year(l_shipdate) IN (1995, 1996)
            GROUP BY l_partkey, year(l_shipdate)
        ),
        w AS (
            SELECT coalesce(a.pk, b.pk) AS pk,
                   a.q AS q0, a.cents AS c0, b.q AS q1, b.cents AS c1
            FROM (SELECT * FROM py WHERE y = 1995) a
            FULL OUTER JOIN (SELECT * FROM py WHERE y = 1996) b
            ON a.pk = b.pk
        ),
        s AS (
            SELECT
                CAST(sum(coalesce(c0, 0)) AS BIGINT) AS r0,
                CAST(sum(coalesce(c1, 0)) AS BIGINT) AS r1,
                CAST(sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
                sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                    THEN (c1 * 1.0 / q1 - c0 * 1.0 / q0) * q1 ELSE 0 END)
                    AS price_eff,
                sum(CASE WHEN q0 IS NOT NULL AND q1 IS NOT NULL
                    THEN (c0 * 1.0 / q0) * (q1 - q0) ELSE 0 END) AS vol_eff,
                CAST(sum(CASE WHEN q0 IS NULL THEN c1 ELSE 0 END)
                     AS BIGINT) AS new_rev,
                CAST(sum(CASE WHEN q1 IS NULL THEN c0 ELSE 0 END)
                     AS BIGINT) AS dropped_rev
            FROM w
        )
        SELECT n_common,
               round(r0 / 100.0, 2) AS rev_base,
               round(r1 / 100.0, 2) AS rev_curr,
               round((r1 - r0) / 100.0, 2) AS delta,
               round(price_eff / 100.0, 2) AS price_effect,
               round(vol_eff / 100.0, 2) AS volume_effect,
               round(new_rev / 100.0, 2) AS new_part_effect,
               round(-dropped_rev / 100.0, 2) AS dropped_part_effect
        FROM s
    """,
    category="analytics",
)
def q_pvm_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix decomposition of the 1995→1996 revenue change:
    ΔR = Σ(p₁−p₀)q₁ (price effect) + Σp₀(q₁−q₀) (volume effect)
    + revenue of new parts − revenue of dropped parts — an exact
    additive split (the four effects sum to ΔR by construction, a
    pinned invariant). THE standard finance/BI bridge chart, and the
    attribution complement of q_price_index's pure price ratio.

    Unit prices are per-(part,year) Σcents/Σqty — float divisions of
    exact integer sums; the effects sum those identically on both
    engines and round once at the end. Shape: one combinable
    (part,year) aggregate, a part-grain FULL OUTER self-join (~1000×
    reduced from line grain), one 1-row aggregate."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("y", F.year("l_shipdate"))
        .filter(F.col("y").isin(1995, 1996))
        .groupBy(F.col("l_partkey").alias("pk"), "y")
        .agg(F.sum(F.expr(_LI_QTY)).alias("q"), F.sum(F.expr(_LI_CENTS)).alias("cents"))
    )
    a = li.filter(F.col("y") == 1995).select(
        "pk", F.col("q").alias("q0"), F.col("cents").alias("c0")
    )
    b = li.filter(F.col("y") == 1996).select(
        F.col("pk").alias("pk_b"), F.col("q").alias("q1"), F.col("cents").alias("c1")
    )
    w = a.join(b, F.col("pk") == F.col("pk_b"), "full_outer")
    common = F.col("q0").isNotNull() & F.col("q1").isNotNull()
    p0 = F.col("c0") * 1.0 / F.col("q0")
    p1 = F.col("c1") * 1.0 / F.col("q1")
    s = w.agg(
        F.sum(F.coalesce(F.col("c0"), F.lit(0))).cast("bigint").alias("r0"),
        F.sum(F.coalesce(F.col("c1"), F.lit(0))).cast("bigint").alias("r1"),
        F.sum(F.when(common, 1).otherwise(0)).cast("bigint").alias("n_common"),
        F.sum(F.when(common, (p1 - p0) * F.col("q1")).otherwise(0)).alias("price_eff"),
        F.sum(F.when(common, p0 * (F.col("q1") - F.col("q0"))).otherwise(0)).alias(
            "vol_eff"
        ),
        F.sum(F.when(F.col("q0").isNull(), F.col("c1")).otherwise(0))
        .cast("bigint")
        .alias("new_rev"),
        F.sum(F.when(F.col("q1").isNull(), F.col("c0")).otherwise(0))
        .cast("bigint")
        .alias("dropped_rev"),
    )
    return s.select(
        "n_common",
        F.round(F.col("r0") / 100.0, 2).alias("rev_base"),
        F.round(F.col("r1") / 100.0, 2).alias("rev_curr"),
        F.round((F.col("r1") - F.col("r0")) / 100.0, 2).alias("delta"),
        F.round(F.col("price_eff") / 100.0, 2).alias("price_effect"),
        F.round(F.col("vol_eff") / 100.0, 2).alias("volume_effect"),
        F.round(F.col("new_rev") / 100.0, 2).alias("new_part_effect"),
        F.round(-F.col("dropped_rev") / 100.0, 2).alias("dropped_part_effect"),
    )


# ---------------------------------------------------------------------------
# robust MAD normalization audit


@register(
    "q_mad_normalize",
    oracle=f"""
        WITH x AS (
            SELECT o_orderpriority AS grp, {_OC} AS cents FROM orders
        ),
        med AS (
            SELECT grp, quantile_cont(cents, 0.5) AS m FROM x GROUP BY grp
        ),
        dev AS (
            SELECT x.grp, x.cents, abs(x.cents - med.m) AS ad, med.m
            FROM x JOIN med ON x.grp = med.grp
        ),
        mad AS (
            SELECT grp, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY grp
        )
        SELECT dev.grp,
               CAST(count(*) AS BIGINT) AS n,
               round(any_value(dev.m) / 100.0, 2) AS median_dollars,
               round(any_value(mad.mad) / 100.0, 2) AS mad_dollars,
               CAST(sum(CASE WHEN abs(dev.cents - dev.m)
                                  > 3.5 * 1.4826 * mad.mad
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev JOIN mad ON dev.grp = mad.grp
        GROUP BY dev.grp
    """,
    category="llm-pipeline",
)
def q_mad_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) normalization audit per order priority:
    median, MAD, and the |x−med| > 3.5·1.4826·MAD outlier count — the
    scaling q_zscore_normalize should NOT be trusted for when
    q_levene_test rejects (mean/sd are themselves dragged by the
    outliers they're supposed to find; median/MAD have breakdown
    point 50%).

    Two stitched rank-selection passes (operators/quantiles.py —
    never a buffering percentile over fact grain): group medians
    broadcast back, then the MAD as the median of |x−med|, broadcast
    again for one counting pass. Deviations are exact integers (cents
    vs an interpolated median that is exact at .5 grain), so the
    outlier comparison is the same float expression everywhere."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    x = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), F.expr(_OC).alias("cents")
    )
    med = quantile_cont_stitched(x, "cents", {"m": 0.5}, ["grp"]).drop("n")
    dev = x.join(F.broadcast(med), "grp").select(
        "grp", "cents", "m", F.abs(F.col("cents") - F.col("m")).alias("ad")
    )
    mad = quantile_cont_stitched(dev, "ad", {"mad": 0.5}, ["grp"]).drop("n")
    j = dev.join(F.broadcast(mad), "grp")
    return j.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.any_value("m") / 100.0, 2).alias("median_dollars"),
        F.round(F.any_value("mad") / 100.0, 2).alias("mad_dollars"),
        F.sum(
            F.when(
                F.abs(F.col("cents") - F.col("m"))
                > 3.5 * 1.4826 * F.col("mad"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit


_KANON_K = 10


@register(
    "q_k_anonymity",
    oracle=f"""
        WITH g AS (
            SELECT c_mktsegment AS seg, c_nationkey AS nk,
                   CAST(count(*) AS BIGINT) AS gsize
            FROM customer GROUP BY c_mktsegment, c_nationkey
        )
        SELECT seg,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(min(gsize) AS BIGINT) AS min_group,
               CAST(sum(gsize) AS BIGINT) AS n_customers,
               CAST(sum(CASE WHEN gsize < {_KANON_K} THEN gsize ELSE 0 END)
                    AS BIGINT) AS n_below_k,
               round(sum(CASE WHEN gsize < {_KANON_K} THEN gsize ELSE 0 END)
                     * 1.0 / sum(gsize), 4) AS share_below_k
        FROM g GROUP BY seg
    """,
    category="analytics",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (market segment × nation)
    quasi-identifier: per segment, the equivalence-class count, the
    smallest class, and how many customers sit in classes below k=10 —
    the re-identification exposure a privacy review quantifies before
    any release (q_dp_noisy_counts is the mitigation; this is the
    measurement). Classes below k are exactly the rows a k-anonymizer
    would have to suppress or generalize.

    Two combinable aggregates: (seg, nation) class sizes, then the
    per-segment rollup — integer-exact throughout, one shuffle each,
    no windows."""
    g = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("gsize"))
    )
    below = F.when(F.col("gsize") < _KANON_K, F.col("gsize")).otherwise(0)
    return g.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("gsize").cast("bigint").alias("min_group"),
        F.sum("gsize").cast("bigint").alias("n_customers"),
        F.sum(below).cast("bigint").alias("n_below_k"),
        F.round(F.sum(below) * 1.0 / F.sum("gsize"), 4).alias("share_below_k"),
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss ±1 projection + distortion audit


_JL_OUT = 8  # target dimensionality


@register(
    "q_jl_projection",
    oracle=f"""
        WITH u AS (
            SELECT label, i AS dim,
                   CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS x
            FROM embeddings, unnest(range(0, 64)) t(i)
        ),
        cent AS (
            SELECT label, dim,
                   CAST(round(avg(x) * 1000000) AS BIGINT) AS cq
            FROM u GROUP BY label, dim
        ),
        proj AS (
            SELECT label, j,
                   CAST(sum(CASE WHEN ((CAST(dim * {_JL_OUT} + j AS HUGEINT)
                                        * {KNUTH}) % 4294967296)
                                       // 2147483648 = 0
                            THEN cq ELSE -cq END) AS BIGINT) AS y
            FROM cent, unnest(range(0, {_JL_OUT})) t(j)
            GROUP BY label, j
        ),
        od AS (
            SELECT a.label AS la, b.label AS lb,
                   sum((a.cq - b.cq) * (a.cq - b.cq)) AS d2
            FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
            GROUP BY a.label, b.label
        ),
        pd AS (
            SELECT a.label AS la, b.label AS lb,
                   sum((a.y - b.y) * (a.y - b.y)) AS p2
            FROM proj a JOIN proj b ON a.j = b.j AND a.label < b.label
            GROUP BY a.label, b.label
        )
        SELECT od.la AS label_a, od.lb AS label_b,
               round(sqrt(od.d2) / 1000000.0, 4) AS dist_orig,
               round(sqrt(pd.p2 / {_JL_OUT}.0) / 1000000.0, 4) AS dist_proj,
               round(sqrt(pd.p2 / {_JL_OUT}.0) / sqrt(od.d2), 4) AS distortion
        FROM od JOIN pd ON od.la = pd.la AND od.lb = pd.lb
    """,
    category="llm-similarity",
)
def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sketch audit: project the 10 label
    centroids from 64 to 8 dims with a deterministic ±1 sign matrix
    (sign = the TOP bit of the Knuth hash of the (dim, out-dim) cell
    — the well-mixed bit; the bottom bit is just the cell's parity
    and collapses the matrix to rank 1 — recomputable on any engine,
    no RNG), and report per-pair distance distortion
    √(‖y_a−y_b‖²/k)/‖c_a−c_b‖ — the empirical check on the JL promise
    (distortion ≈ 1 ± ε) that decides whether a cheap sketched index
    is safe for this embedding space.

    Centroids are QUANTIZED to integer micro-units straight out of
    the avg aggregate, so the projection (a signed integer sum) and
    both squared distances are EXACT integer algebra — floats appear
    only in the three final √/ratio expressions. All pair grids are
    over the 10-row label aggregate (≤45 pairs, dim/j equi-joins),
    never fact rows."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select("label", F.posexplode("embedding").alias("dim", "x")).select(
        "label", "dim", F.col("x").cast("double").alias("x")
    )
    cent = u.groupBy("label", "dim").agg(
        F.round(F.avg("x") * 1000000).cast("bigint").alias("cq")
    )
    j_ix = F.explode(F.sequence(F.lit(0), F.lit(_JL_OUT - 1))).alias("j")
    signed = cent.select("label", "dim", "cq", j_ix).select(
        "label",
        "j",
        F.when(
            knuth_top_bit(F.col("dim") * _JL_OUT + F.col("j")) == 0, F.col("cq")
        )
        .otherwise(-F.col("cq"))
        .alias("term"),
    )
    proj = signed.groupBy("label", "j").agg(F.sum("term").cast("bigint").alias("y"))
    ca = cent.select(F.col("label").alias("la"), "dim", F.col("cq").alias("cqa"))
    cb = cent.select(F.col("label").alias("lb"), F.col("dim").alias("dim_b"), F.col("cq").alias("cqb"))
    od = (
        ca.join(
            F.broadcast(cb),
            (F.col("dim") == F.col("dim_b")) & (F.col("la") < F.col("lb")),
        )
        .groupBy("la", "lb")
        .agg(F.sum((F.col("cqa") - F.col("cqb")) * (F.col("cqa") - F.col("cqb"))).alias("d2"))
    )
    pa = proj.select(F.col("label").alias("la"), "j", F.col("y").alias("ya"))
    pb = proj.select(F.col("label").alias("lb"), F.col("j").alias("j_b"), F.col("y").alias("yb"))
    pd = (
        pa.join(
            F.broadcast(pb),
            (F.col("j") == F.col("j_b")) & (F.col("la") < F.col("lb")),
        )
        .groupBy("la", "lb")
        .agg(F.sum((F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))).alias("p2"))
    )
    return od.join(pd, ["la", "lb"]).select(
        F.col("la").alias("label_a"),
        F.col("lb").alias("label_b"),
        F.round(F.sqrt(F.col("d2")) / 1000000.0, 4).alias("dist_orig"),
        F.round(F.sqrt(F.col("p2") / float(_JL_OUT)) / 1000000.0, 4).alias("dist_proj"),
        F.round(F.sqrt(F.col("p2") / float(_JL_OUT)) / F.sqrt(F.col("d2")), 4).alias(
            "distortion"
        ),
    )


# ---------------------------------------------------------------------------
# centroid recentering + L2 norm audit


@register(
    "q_recenter_l2",
    oracle="""
        WITH u AS (
            SELECT vec_id, label, i AS dim,
                   CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS x
            FROM embeddings, unnest(range(0, 64)) t(i)
        ),
        mu AS (
            SELECT dim, CAST(round(avg(x) * 1000000) AS BIGINT) AS mq
            FROM u GROUP BY dim
        ),
        per_vec AS (
            SELECT u.vec_id, u.label,
                   CAST(round(sqrt(sum(x * x)) * 10000) AS BIGINT) AS raw_q,
                   CAST(round(sqrt(sum((x - mq / 1000000.0)
                                       * (x - mq / 1000000.0))) * 10000)
                        AS BIGINT) AS cen_q
            FROM u JOIN mu ON u.dim = mu.dim
            GROUP BY u.vec_id, u.label
        )
        SELECT label, CAST(count(*) AS BIGINT) AS n,
               round(sum(raw_q) / (10000.0 * count(*)), 4) AS avg_raw_norm,
               round(sum(cen_q) / (10000.0 * count(*)), 4) AS avg_centered_norm,
               CAST(sum(CASE WHEN cen_q < raw_q THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_shrunk
        FROM per_vec GROUP BY label
    """,
    category="llm-similarity",
)
def q_recenter_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid recentering audit — the standard pre-ANN transform
    (subtracting the global mean removes the common-direction bias
    that inflates all cosines; see q_embedding_anisotropy for the
    measurement): per label, the average L2 norm before and after
    recentering and how many vectors SHRINK (an anisotropic space
    shrinks most of them). The go/no-go for shipping recentered
    vectors to the index.

    The global centroid is a (dim)-grain aggregate quantized to
    integer micro-units (64-row broadcast); per-vector norms are one
    identical float expression per row, quantized to 1e-4 units
    before the label rollup so the sums are exact integers — no
    cross-engine accumulation-order hazard survives past a single
    row."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "label", "dim", F.col("x").cast("double").alias("x"))
    mu = u.groupBy("dim").agg(
        F.round(F.avg("x") * 1000000).cast("bigint").alias("mq")
    )
    cx = F.col("x") - F.col("mq") / 1000000.0
    per_vec = (
        u.join(F.broadcast(mu), "dim")
        .groupBy("vec_id", "label")
        .agg(
            F.round(F.sqrt(F.sum(F.col("x") * F.col("x"))) * 10000)
            .cast("bigint")
            .alias("raw_q"),
            F.round(F.sqrt(F.sum(cx * cx)) * 10000).cast("bigint").alias("cen_q"),
        )
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("raw_q") / (10000.0 * F.count(F.lit(1))), 4).alias(
            "avg_raw_norm"
        ),
        F.round(F.sum("cen_q") / (10000.0 * F.count(F.lit(1))), 4).alias(
            "avg_centered_norm"
        ),
        F.sum(F.when(F.col("cen_q") < F.col("raw_q"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_shrunk"),
    )


# ---------------------------------------------------------------------------
# Kneser–Ney smoothed bigram LM


_KN_D = 0.75  # absolute discount


@register(
    "q_kneser_ney_bigram",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        big AS (
            SELECT ws[i] AS w1, ws[i+1] AS w2
            FROM tok, unnest(range(1, greatest(len(ws) - 1, 0) + 1)) t(i)
        ),
        c12 AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY w1, w2
        ),
        c1 AS (
            SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
                   CAST(count(*) AS BIGINT) AS n1plus_fwd
            FROM c12 GROUP BY w1
        ),
        cont AS (
            SELECT w2, CAST(count(*) AS BIGINT) AS n1plus_rev
            FROM c12 GROUP BY w2
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_bigram_types FROM c12)
        SELECT w1, w2, c AS c_bigram,
               round((c - {_KN_D}) / c1
                     + ({_KN_D} * n1plus_fwd / c1)
                       * (n1plus_rev * 1.0 / n_bigram_types), 4) AS p_kn
        FROM c12
        JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN tot
        ORDER BY c DESC, w1 ASC, w2 ASC
        LIMIT 20
    """,
    category="llm-text",
)
def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities for the corpus's
    20 most frequent bigrams: P_KN(w₂|w₁) = max(c₁₂−d,0)/c₁ +
    (d·N₁₊(w₁·)/c₁)·(N₁₊(·w₂)/N₁₊(··)) with d=0.75 — the smoothing
    that made n-gram LMs competitive (continuation counts, not raw
    unigrams, in the backoff) and still the baseline perplexity
    reference next to q_lm_perplexity's add-k model.

    Every count — bigram, left-marginal, forward/reverse continuation
    type counts — is an exact integer from combinable vocab-grain
    aggregates; P_KN is one identical float expression. Joins are
    vocab-grain equi-joins; the top-20 is a TakeOrdered on the exact
    integer count with full lexical tie-breaks (no float enters the
    ordering). c₁₂ ≥ 1 > d, so the max(·,0) clamp never binds and is
    dropped on both engines identically."""
    d = load_table(spark, sf_dir, "documents")
    # materialized _toks column: inlined in the lambda the split
    # re-evaluates per element (no CSE inside HOF lambdas)
    tk = F.col("_toks")
    big = (
        d.select(F.split(F.col("text"), " ").alias("_toks"))
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(tk) - 1, F.lit(0))),
                    lambda i: F.struct(
                        F.element_at(tk, i).alias("w1"),
                        F.element_at(tk, i + 1).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1plus_fwd"),
    )
    cont = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1plus_rev")
    )
    tot = c12.agg(F.count(F.lit(1)).cast("bigint").alias("n_bigram_types"))
    p_kn = (F.col("c") - F.lit(_KN_D)) / F.col("c1") + (
        F.lit(_KN_D) * F.col("n1plus_fwd") / F.col("c1")
    ) * (F.col("n1plus_rev") * 1.0 / F.col("n_bigram_types"))
    j = (
        c12.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", F.col("c").alias("c_bigram"), F.round(p_kn, 4).alias("p_kn")
        )
    )
    return j.orderBy(
        F.col("c_bigram").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(20)


# ---------------------------------------------------------------------------
# out-of-vocabulary rate across a deterministic split


@register(
    "q_oov_rate",
    oracle=f"""
        WITH d AS (
            SELECT lang, text,
                   CAST((CAST(doc_id AS HUGEINT) * {KNUTH})
                        % 4294967296 % 10 AS INT) AS bkt
            FROM documents
        ),
        train_vocab AS (
            SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS term
            FROM d WHERE bkt < 8
        ),
        test_tok AS (
            SELECT lang, unnest(string_split(text, ' ')) AS term
            FROM d WHERE bkt >= 8
        ),
        m AS (
            SELECT t.lang, t.term,
                   CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
            FROM test_tok t
            LEFT JOIN train_vocab v ON t.lang = v.lang AND t.term = v.term
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_test_tokens,
               CAST(sum(oov) AS BIGINT) AS n_oov,
               round(sum(oov) * 1.0 / count(*), 4) AS oov_rate
        FROM m GROUP BY lang
    """,
    category="llm-text",
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate across the deterministic 80/20
    train/test split (Knuth hash of doc_id — the same split family as
    q_hash_split, so this audits THE split the pipeline ships): per
    language, the share of test tokens absent from the train
    vocabulary. The generalization-gap early warning for tokenizer
    and vocab-size decisions (pairs with q_vocab_coverage, which
    audits a fixed top-k vocab instead of a split).

    The split is recomputable from the key alone; the train side
    dedups to (lang, term) vocab grain BEFORE the join (vocabulary ≪
    token stream crosses the wire); membership is a left join at
    vocab grain aggregated per language — integer-exact to the final
    ratio."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "text", knuth_bucket("doc_id", 10).cast("int").alias("bkt")
    )
    train_vocab = (
        d.filter(F.col("bkt") < 8)
        .select("lang", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
        .withColumn("in_vocab", F.lit(1))
    )
    test_tok = d.filter(F.col("bkt") >= 8).select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    )
    m = test_tok.join(train_vocab, ["lang", "term"], "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_tokens"),
        F.sum(oov).cast("bigint").alias("n_oov"),
        F.round(F.sum(oov) * 1.0 / F.count(F.lit(1)), 4).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# user-level event-type co-occurrence lift


@register(
    "q_event_cooccurrence",
    oracle="""
        WITH ut AS (
            SELECT DISTINCT user_id, event_type FROM events
        ),
        nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
        marg AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM ut
            GROUP BY event_type
        ),
        pairs AS (
            SELECT a.event_type AS ta, b.event_type AS tb,
                   CAST(count(*) AS BIGINT) AS c_both
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        )
        SELECT ta, tb, c_both,
               round(c_both * 1.0 * nu.n / (ma.c * mb.c), 4) AS lift,
               round(ln(c_both * 1.0 * nu.n / (ma.c * mb.c)), 4) AS pmi
        FROM pairs
        JOIN marg ma ON pairs.ta = ma.event_type
        JOIN marg mb ON pairs.tb = mb.event_type
        CROSS JOIN nu
    """,
    category="analytics",
)
def q_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level event-type co-occurrence lift and PMI: for every
    unordered type pair, lift = P(a,b)/(P(a)·P(b)) over users — which
    behaviors travel together (click+purchase ≫ 1) and which repel
    (error vs signup) — q_pmi_bigrams' construction lifted from token
    windows to user baskets, and the association screen behind
    next-action models (q_markov_entropy_rate is the sequential
    version; this is the set version).

    Events dedup to (user, type) grain FIRST (≤5 rows per user);
    the pair join is a user-grain equi-join with fan-out ≤ C(5,2)=10
    per user; marginals and the user count are tiny broadcasts; all
    counts exact integers to the final lift/PMI expressions."""
    ut = load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    nu = ut.agg(F.countDistinct("user_id").cast("bigint").alias("n"))
    marg = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = ut.select("user_id", F.col("event_type").alias("ta"))
    b = ut.select(F.col("user_id").alias("uid_b"), F.col("event_type").alias("tb"))
    pairs = (
        a.join(b, (F.col("user_id") == F.col("uid_b")) & (F.col("ta") < F.col("tb")))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_both"))
    )
    ma = marg.select(F.col("event_type").alias("ta"), F.col("c").alias("ca"))
    mb = marg.select(F.col("event_type").alias("tb"), F.col("c").alias("cb"))
    lift = F.col("c_both") * 1.0 * F.col("n") / (F.col("ca") * F.col("cb"))
    return (
        pairs.join(F.broadcast(ma), "ta")
        .join(F.broadcast(mb), "tb")
        .crossJoin(F.broadcast(nu))
        .select(
            "ta",
            "tb",
            "c_both",
            F.round(lift, 4).alias("lift"),
            F.round(F.log(lift), 4).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# daily revenue peak detection


@register(
    "q_peak_detection",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderpriority AS grp, date_trunc('day', o_orderdate) AS d,
                   CAST(sum({_OC}) AS BIGINT) AS rev
            FROM orders GROUP BY grp, date_trunc('day', o_orderdate)
        ),
        flagged AS (
            SELECT grp, d, rev,
                   CASE WHEN rev > coalesce(lag(rev) OVER w, -1)
                         AND rev > coalesce(lead(rev) OVER w, -1)
                        THEN 1 ELSE 0 END AS is_peak
            FROM daily
            WINDOW w AS (PARTITION BY grp ORDER BY d)
        )
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(is_peak) AS BIGINT) AS n_peaks,
               round(sum(is_peak) * 1.0 / count(*), 4) AS peak_rate,
               round(max(CASE WHEN is_peak = 1 THEN rev ELSE NULL END)
                     / 100.0, 2) AS max_peak_dollars
        FROM flagged GROUP BY grp
    """,
    category="analytics",
)
def q_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum peak detection on each priority's daily revenue
    series: a day is a peak when it strictly exceeds BOTH neighbors
    (boundary days count when they exceed their one neighbor — the
    sentinel −1 coalesce makes the rule total). Peak density and the
    tallest peak per series — the load-spike profile capacity
    planning reads, and the discrete complement of
    q_cusum_changepoint's sustained-shift detector.

    Integer-exact: revenue is summed cents, so strict comparisons
    cannot float-flip. The lag/lead windows partition on the series
    key over the day-grain rollup (calendar-bounded rows per
    partition; the rollup absorbs fact growth before any window)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.date_trunc("day", F.col("o_orderdate")).alias("d"),
        )
        .agg(F.sum(F.expr(_OC)).cast("bigint").alias("rev"))
    )
    w = Window.partitionBy("grp").orderBy("d")
    is_peak = (
        F.when(
            (F.col("rev") > F.coalesce(F.lag("rev").over(w), F.lit(-1)))
            & (F.col("rev") > F.coalesce(F.lead("rev").over(w), F.lit(-1))),
            1,
        ).otherwise(0)
    )
    flagged = daily.select("grp", "d", "rev", is_peak.alias("is_peak"))
    return flagged.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("is_peak").cast("bigint").alias("n_peaks"),
        F.round(F.sum("is_peak") * 1.0 / F.count(F.lit(1)), 4).alias("peak_rate"),
        F.round(
            F.max(F.when(F.col("is_peak") == 1, F.col("rev")).otherwise(F.lit(None)))
            / 100.0,
            2,
        ).alias("max_peak_dollars"),
    )


# ---------------------------------------------------------------------------
# Gumbel-top-k deterministic weighted sample (without replacement)


_GTK_K = 50
_GTK_M = 1048576  # 2^20 hash-uniform resolution


@register(
    "q_gumbel_topk_sample",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, lang, n_chars,
                   ln(n_chars)
                   - ln(-ln(((CAST(doc_id AS HUGEINT) * {KNUTH})
                             % 4294967296 % {_GTK_M} + 0.5) / {_GTK_M}))
                       AS gkey
            FROM documents
        ),
        top AS (
            SELECT lang, n_chars
            FROM keyed
            ORDER BY round(gkey, 6) DESC, doc_id ASC
            LIMIT {_GTK_K}
        ),
        corpus AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_corpus,
                   CAST(sum(n_chars) AS BIGINT) AS chars_corpus
            FROM documents GROUP BY lang
        )
        SELECT corpus.lang, n_corpus,
               CAST(count(top.lang) AS BIGINT) AS n_sampled,
               CAST(coalesce(sum(top.n_chars), 0) AS BIGINT) AS chars_sampled,
               round(coalesce(avg(top.n_chars), 0), 2) AS avg_len_sampled,
               round(chars_corpus * 1.0 / n_corpus, 2) AS avg_len_corpus
        FROM corpus LEFT JOIN top ON corpus.lang = top.lang
        GROUP BY corpus.lang, n_corpus, chars_corpus
    """,
    category="llm-pipeline",
)
def q_gumbel_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k weighted sampling WITHOUT replacement: key each
    document with ln(w) − ln(−ln(u)) (w = n_chars, u = a Knuth-hash
    uniform) and keep the k=50 largest keys — provably equivalent to
    sequential weighted draws without replacement (the Gumbel-max
    trick), with ZERO RNG state: the sample is recomputable from keys
    alone on any engine, any partitioning, any run. The
    exact-size-k counterpart of q_weighted_sample's Bernoulli policy
    (which only controls the EXPECTED size), and the standard
    distributed implementation (one TakeOrdered, no sequential
    draws). Per language: sampled count/chars and the mean-length
    shift vs corpus (long docs should be over-represented).

    The hash-uniform has 2²⁰ resolution so u ∈ (0,1) strictly (the
    +0.5 bumps off zero); keys are ranked AFTER round(·,6) with a
    doc_id tie-break, so the selected set is deterministic
    cross-engine; the audit aggregates are exact integers."""
    d = load_table(spark, sf_dir, "documents")
    u = (knuth_bucket("doc_id", _GTK_M) + 0.5) / F.lit(float(_GTK_M))
    gkey = F.log(F.col("n_chars").cast("double")) - F.log(-F.log(u))
    keyed = d.select("doc_id", "lang", "n_chars", F.round(gkey, 6).alias("gkey"))
    top = keyed.orderBy(F.col("gkey").desc(), F.col("doc_id").asc()).limit(_GTK_K)
    corpus = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_corpus"),
        F.sum("n_chars").cast("bigint").alias("chars_corpus"),
    )
    t = top.select(F.col("lang").alias("lang_t"), F.col("n_chars").alias("nc_t"))
    j = corpus.join(t, F.col("lang") == F.col("lang_t"), "left")
    return j.groupBy("lang", "n_corpus", "chars_corpus").agg(
        F.count(F.col("lang_t")).cast("bigint").alias("n_sampled"),
        F.coalesce(F.sum("nc_t"), F.lit(0)).cast("bigint").alias("chars_sampled"),
        F.round(F.coalesce(F.avg("nc_t"), F.lit(0)), 2).alias("avg_len_sampled"),
    ).select(
        "lang",
        "n_corpus",
        "n_sampled",
        "chars_sampled",
        "avg_len_sampled",
        F.round(F.col("chars_corpus") * 1.0 / F.col("n_corpus"), 2).alias(
            "avg_len_corpus"
        ),
    )
