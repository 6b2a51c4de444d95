"""Relational breadth, batch 2: pivot/unpivot, exact percentiles,
min_by/max_by, string_agg, decimal aggregation, MapType, and
regexp_extract_all (SURVEY.md §2.B rows 85-92).

Parity notes (probed against DuckDB 1.0 before declaring):
- F.percentile == quantile_cont bit-for-bit (same linear interpolation).
- Decimal sums are exact in both engines; both sides cast to
  DECIMAL(38,2) so the result TYPE also agrees.
- min_by/max_by tie-break: the ordering value embeds the key
  (price*1e6 + key, exact below 2^53) so ties are impossible.
- Map ops ride on events.props (JSON string) via from_json → MapType;
  the oracle unnests json_keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register


@register(
    "q_pivot",
    oracle="""
        SELECT year(o_orderdate) AS o_year,
               -- exact cents sums (2e9-magnitude cells at sf0.1)
               round(CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0, 4) AS F,
               round(CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0, 4) AS O,
               round(CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0, 4) AS P
        FROM orders
        GROUP BY year(o_orderdate)
    """,
    category="grouping",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order-status columns per year. Pivot values are DECLARED
    (not discovered) — at scale an undeclared pivot is two jobs, the
    first being a distinct scan just to learn the columns."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(  # exact cents sum (2e9-magnitude cells at sf0.1)
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("double") / 100.0, 4
            )
        )
    )


@register(
    "q_unpivot",
    oracle="""
        WITH base AS (
            SELECT year(o_orderdate) AS o_year,
                   round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4) AS total_price,  -- exact cents
                   round(avg(o_totalprice), 4) AS avg_price,
                   CAST(count(*) AS DOUBLE) AS n_orders
            FROM orders GROUP BY year(o_orderdate)
        )
        SELECT o_year, 'total_price' AS metric, total_price AS value FROM base
        UNION ALL SELECT o_year, 'avg_price', avg_price FROM base
        UNION ALL SELECT o_year, 'n_orders', n_orders FROM base
    """,
    category="grouping",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-year metrics → long (metric, value)."""
    o = load_table(spark, sf_dir, "orders")
    base = (
        o.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(  # exact cents sum (2e9-magnitude cells at sf0.1)
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("double") / 100.0, 4
            ).alias("total_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).cast("double").alias("n_orders"),
        )
    )
    return base.unpivot(
        "o_year", ["total_price", "avg_price", "n_orders"], "metric", "value"
    )


@register(
    "q_percentiles",
    oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(median(o_totalprice), 4) AS med
        FROM orders GROUP BY o_orderstatus
    """,
    category="aggregation",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics) —
    the graded twin of approx_percentile, which is sketch-based and
    engine-specific. Computed as a stitched RANK SELECTION
    (operators/quantiles.py) rather than Spark's buffering
    ``percentile`` aggregate, whose per-group value map grows with the
    distinct-value count — unbounded for continuous doubles at fact
    grain."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    o = load_table(spark, sf_dir, "orders")
    q = quantile_cont_stitched(
        o,
        "o_totalprice",
        # med == p50: computed once, aliased below (a duplicate entry
        # would double the lo/hi agg columns for an identical value)
        {"p25": 0.25, "p50": 0.5, "p90": 0.9},
        ["o_orderstatus"],
    )
    return q.select(
        "o_orderstatus",
        F.round("p25", 4).alias("p25"),
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
        F.round("p50", 4).alias("med"),
    )


@register(
    "q_argminmax",
    oracle="""
        SELECT o_orderstatus,
               arg_max(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS priciest_order,
               arg_min(o_orderkey, o_totalprice * 1000000 + o_orderkey) AS cheapest_order,
               round(max(o_totalprice), 4) AS max_price
        FROM orders GROUP BY o_orderstatus
    """,
    category="aggregation",
)
def q_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax): the ordering value embeds the key
    (price·1e6 + key stays exact under 2^53) so ties can't make the
    answer engine-dependent."""
    o = load_table(spark, sf_dir, "orders")
    ordv = F.col("o_totalprice") * 1000000 + F.col("o_orderkey")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", ordv).alias("priciest_order"),
        F.min_by("o_orderkey", ordv).alias("cheapest_order"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


@register(
    "q_string_agg",
    oracle="""
        SELECT year(o_orderdate) AS o_year,
               string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
               string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities
        FROM orders GROUP BY year(o_orderdate)
    """,
    category="aggregation",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_agg / listagg with deterministic ordering: sorted distinct
    set joined with a separator (collect_set order is arbitrary —
    array_sort makes it an honest value)."""
    o = load_table(spark, sf_dir, "orders")
    return o.withColumn("o_year", F.year("o_orderdate")).groupBy("o_year").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses"),
        F.concat_ws("|", F.array_sort(F.collect_set("o_orderpriority"))).alias("priorities"),
    )


@register(
    "q_decimal_agg",
    oracle="""
        SELECT o_orderstatus,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS total_cents,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus
    """,
    category="aggregation",
)
def q_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal aggregation — both engines sum DECIMAL(18,2) exactly.
    The OUTPUT is integer cents: DuckDB round-trips DECIMAL(38,2) (>18
    precision) to pandas as float64, so a decimal output column hash-
    mismatches even when values are digit-identical (CORRECTNESS_r01).
    BIGINT cents is exact and engine-portable; the decimal math stays
    internal."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("total_cents"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_map_funcs",
    oracle="""
        SELECT k AS key,
               count(*) AS n,
               CAST(sum(CAST(json_extract(props::JSON, '$.' || k) AS INT)) AS BIGINT) AS vsum,
               CAST(min(CAST(json_extract(props::JSON, '$.' || k) AS INT)) AS INT) AS vmin,
               CAST(max(CAST(json_extract(props::JSON, '$.' || k) AS INT)) AS INT) AS vmax
        FROM (SELECT props, unnest(json_keys(props::JSON)) AS k FROM events)
        GROUP BY k
    """,
    category="scalar",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: JSON string → map<string,int> via from_json,
    explode to (key, value), aggregate per key."""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(F.explode(F.from_json("props", "map<string,int>")).alias("key", "value"))
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("vsum"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


@register(
    "q_regexp_extract_all",
    oracle="""
        SELECT p_partkey,
               len(regexp_extract_all(p_name, '[a-z]+')) AS n_words,
               array_to_string(regexp_extract_all(p_name, '[a-z]+'), '-') AS joined,
               regexp_extract_all(p_type, '[A-Z]+')[1] AS first_type_word
        FROM part
    """,
    category="scalar",
)
def q_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: all matches as an array (count, join, head)."""
    p = load_table(spark, sf_dir, "part")
    words = F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0)
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_join(words, "-").alias("joined"),
        F.element_at(F.regexp_extract_all("p_type", F.lit("[A-Z]+"), 0), 1).alias(
            "first_type_word"
        ),
    )


@register(
    "q_salted_agg",
    oracle="""
        SELECT event_type,
               round(sum(value), 4) AS sum_value,
               count(*) AS n
        FROM events
        GROUP BY event_type
    """,
    category="aggregation",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation through
    ``operators.partitioning.salted_sum_count`` — the skew escape
    hatch when one key dominates and map-side partials can't compress
    it (each of the 16 salt buckets of a hot key lands on a different
    reducer, then a vocabulary-sized second phase merges). The oracle
    is the PLAIN group-by: salting must be invisible in the result —
    sum/count are reassociable, and round(·,4) absorbs the summation-
    order change the re-bucketing introduces."""
    from builder_spark.operators.partitioning import salted_sum_count

    ev = load_table(spark, sf_dir, "events")
    agg = salted_sum_count(ev, ["event_type"], "value", n=16)
    return agg.select(
        "event_type",
        F.round(F.col("sum_value"), 4).alias("sum_value"),
        F.col("count_value").alias("n"),
    )


@register(
    "q_robust_stats",
    oracle="""
        WITH med AS (
            SELECT event_type, median(value) AS med_value
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               round(any_value(m.med_value), 4) AS med_value,
               round(median(abs(e.value - m.med_value)), 4) AS mad_value
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type
    """,
    category="aggregation",
)
def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/spread per group: median and MAD (median
    absolute deviation) — outlier-proof twins of avg/stddev. MAD is
    inherently two-pass (deviations need the median first): a
    per-group median broadcast-joined back, then a second median over
    deviations. Both engines interpolate medians identically (probed
    in row 87). Scale: both medians are stitched rank selections
    (operators/quantiles.py) — 5 fact-grain groups never pass through
    a buffering percentile aggregate — with 5-row broadcasts between
    the passes."""
    from builder_spark.operators.quantiles import quantile_cont_stitched

    ev = load_table(spark, sf_dir, "events")
    med = quantile_cont_stitched(
        ev, "value", {"med_value": 0.5}, ["event_type"]
    ).drop("n")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_value",
        F.abs(F.col("value") - F.col("med_value")).alias("_adev"),
    )
    mad = quantile_cont_stitched(dev, "_adev", {"mad_value": 0.5}, ["event_type"]).drop(
        "n"
    )
    return (
        med.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            F.round("med_value", 4).alias("med_value"),
            F.round("mad_value", 4).alias("mad_value"),
        )
    )


@register(
    "q_regression",
    oracle="""
        SELECT event_type,
               round(regr_slope(value, hour(ts)), 4) AS slope,
               round(regr_intercept(value, hour(ts)), 4) AS intercept,
               round(regr_r2(value, hour(ts)), 4) AS r2,
               regr_count(value, hour(ts)) AS n
        FROM events
        GROUP BY event_type
    """,
    category="aggregation",
)
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (value ~ hour-of-day per event
    type) — trend detection as a single combinable aggregate, no ML
    library. regr_* are closed-form moment sums, so they map-side
    combine like any sum; both engines use the same textbook
    formulas and round(4) absorbs moment-accumulation order."""
    ev = load_table(spark, sf_dir, "events")
    hr = F.hour("ts").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope("value", hr), 4).alias("slope"),
        F.round(F.regr_intercept("value", hr), 4).alias("intercept"),
        F.round(F.regr_r2("value", hr), 4).alias("r2"),
        F.regr_count("value", hr).alias("n"),
    )


@register(
    "q_bit_bool_agg",
    oracle="""
        SELECT l_returnflag,
               bit_and(l_linenumber) AS all_bits,
               bit_or(l_linenumber) AS any_bits,
               bit_xor(l_linenumber) AS parity_bits,
               bool_and(l_quantity > 1) AS all_gt1,
               bool_or(l_quantity > 49) AS any_gt49
        FROM lineitem
        GROUP BY l_returnflag
    """,
    category="aggregation",
)
def q_bit_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and boolean aggregates — the flag-combination family
    (permission masks, feature-presence rollups). All five are
    associative+commutative, so they map-side combine; exact integer/
    boolean semantics leave nothing to round."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("all_bits"),
        F.bit_or("l_linenumber").alias("any_bits"),
        F.bit_xor("l_linenumber").alias("parity_bits"),
        F.bool_and(F.col("l_quantity") > 1).alias("all_gt1"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_gt49"),
    )


@register(
    "q_moments",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   count(*) AS n,
                   avg(value) AS mu,
                   avg(value * value) AS m2r,
                   avg(value * value * value) AS m3r,
                   avg(value * value * value * value) AS m4r
            FROM events GROUP BY event_type
        )
        SELECT event_type, n,
               round(m3c / pow(m2c, 1.5), 4) AS skewness,
               round(m4c / (m2c * m2c) - 3.0, 4) AS excess_kurtosis
        FROM (
            SELECT event_type, n,
                   m2r - mu * mu AS m2c,
                   m3r - 3 * mu * m2r + 2 * mu * mu * mu AS m3c,
                   m4r - 4 * mu * m3r + 6 * mu * mu * m2r - 3 * mu * mu * mu * mu AS m4c
            FROM m
        )
    """,
    category="aggregation",
)
def q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis from EXPLICIT raw
    moments (E[x^k] → central via binomial expansion) — built-in
    skewness/kurtosis differ between engines in bias correction
    (sample vs population), so the portable form IS the raw-moment
    algebra, identical on both sides. One combinable agg; the
    fixture's value range (~0-100) keeps x⁴ ≈ 1e8 — far inside double
    precision, so the raw-moment route is numerically safe here (at
    wide ranges switch to Welford/co-moment accumulation)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(v).alias("mu"),
        F.avg(v * v).alias("m2r"),
        F.avg(v * v * v).alias("m3r"),
        F.avg(v * v * v * v).alias("m4r"),
    )
    mu, m2r, m3r, m4r = F.col("mu"), F.col("m2r"), F.col("m3r"), F.col("m4r")
    m2c = m2r - mu * mu
    m3c = m3r - 3 * mu * m2r + 2 * mu * mu * mu
    m4c = m4r - 4 * mu * m3r + 6 * mu * mu * m2r - 3 * mu * mu * mu * mu
    return m.select(
        "event_type",
        "n",
        # ANSI /0 guards: a single-row group has zero central variance
        F.round(m3c / F.when(F.pow(m2c, 1.5) != 0, F.pow(m2c, 1.5)), 4).alias(
            "skewness"
        ),
        F.round(m4c / F.when(m2c * m2c != 0, m2c * m2c) - 3.0, 4).alias(
            "excess_kurtosis"
        ),
    )


@register(
    "q_percentile_approx",
    oracle=None,  # GK sketch (Spark) vs t-digest (DuckDB) — different
    # algorithms, not hash-matchable; the rank-error-bound pytest in
    # tests/test_queries_oracle.py is the correctness guard, and
    # q_percentiles is the exact graded twin of this family
    category="agg",
)
def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna) p50/p90/p99 per event type
    — the 100 TB path for quantiles: a mergeable bounded-size sketch
    per group (map-side combined) instead of exact percentile's full
    sort/collect of every value. accuracy=10000 bounds rank error at
    n/10000 per group."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.9, 10000).alias("p90_approx"),
        F.percentile_approx("value", 0.99, 10000).alias("p99_approx"),
    )
