"""Join operators — SURVEY.md §2.B rows 17-26.

Scale posture: dimension tables (region/nation/customer/part/supplier)
are broadcast — either by Catalyst's size estimate or an explicit
``F.broadcast`` hint — so the fact-table side never shuffles for them.
The one genuinely non-equi join (theta) carries an equi prefix
(p_brand) so it plans as a hash/sort-merge join with a residual range
filter, not a nested-loop cross product. The as-of join is the
window-rewrite documented in SURVEY.md §2 row 25.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register


@register(
    "q_join_inner",
    oracle="""
        SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    category="join",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with the small dimension broadcast (no fact shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "q_join_multi",
    oracle="""
        -- exact 1e-4-unit sum (q_salted_join class: 1.5e9 cells at sf0.1)
        SELECT n_name, round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    category="join",
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join (TPC-H Q5 shape). The region filter reaches the
    region scan (predicate pushdown) and the dim chain broadcasts, so
    the only shuffle is the final small group-by."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(  # exact 1e-4-unit sum (q_salted_join class)
            F.round(
                F.sum(F.round(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))
                              * 10000).cast("bigint")).cast("double")
                / 10000.0, 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q_join_left",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
    category="join",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a null-producing side (customers without orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_full",
    oracle="""
        WITH buyers AS (
            SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
        ),
        rich AS (
            SELECT c_custkey, round(c_acctbal, 4) AS acctbal
            FROM customer WHERE c_acctbal > 8000
        )
        SELECT o_custkey, n_orders, c_custkey, acctbal
        FROM buyers FULL JOIN rich ON o_custkey = c_custkey
    """,
    category="join",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join producing nulls on both sides."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    buyers = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    rich = c.filter(F.col("c_acctbal") > 8000).select(
        "c_custkey", F.round(F.col("c_acctbal"), 4).alias("acctbal")
    )
    return buyers.join(rich, buyers.o_custkey == rich.c_custkey, "full").select(
        "o_custkey", "n_orders", "c_custkey", "acctbal"
    )


@register(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    category="join",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers with ≥1 big order. Semi joins never duplicate
    the left side, so no post-join distinct (and no extra shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    category="join",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — rows with no match on the other side (the NOT EXISTS plan without a subquery)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "q_join_theta",
    oracle="""
        SELECT a.p_brand AS brand, count(*) AS n_pairs,
               round(avg(b.p_size - a.p_size), 4) AS avg_gap
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand
         AND a.p_size < b.p_size
         AND b.p_size <= a.p_size + 2
        GROUP BY a.p_brand
    """,
    category="join",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) self-join. The equi prefix on p_brand keeps this a
    hash join with a residual range predicate — NOT a nested-loop cross
    product — so it scales with per-brand group size, not n²."""
    p = load_table(spark, sf_dir, "part")
    a = p.select(F.col("p_brand").alias("brand"), F.col("p_size").alias("size_a"))
    b = p.select(F.col("p_brand").alias("brand_b"), F.col("p_size").alias("size_b"))
    return (
        a.join(
            b,
            (a.brand == b.brand_b)
            & (a.size_a < b.size_b)
            & (b.size_b <= a.size_a + 2),
        )
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg(F.col("size_b") - F.col("size_a")), 4).alias("avg_gap"),
        )
    )


@register(
    "q_join_broadcast",
    oracle="""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    category="join",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint — physical-only, results identical."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "q_join_asof",
    oracle="""
        WITH cand AS (
            SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                   ) AS rn
            FROM events e
            JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        )
        SELECT event_id, user_id, ts, o_orderkey, o_orderdate
        FROM cand WHERE rn = 1
    """,
    category="join",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (row 25): per event, the latest order at-or-before the
    event timestamp for that user. Spark has no native ASOF; this is
    the UNION + running-last rewrite — the scalable algorithm: tag both
    sides, union them, sort each user's timeline once, and carry the
    most recent order forward with last(ignorenulls) over a running
    frame. ONE shuffle on the key and NO candidate fan-out (the naive
    candidate-join + row_number rewrite materializes |events_u| ×
    |orders_u| rows per user — quadratic in key density; this is
    linear). Tie discipline: orders sort before events at equal
    timestamps (≤ semantics), same-timestamp orders by o_orderkey asc
    so the running last picks the max key — matching the oracle's
    (o_orderdate, o_orderkey) DESC rn=1."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("_t"),
        F.lit(1).alias("_kind"),
        "event_id",
        "ts",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("_t"),
        F.lit(0).alias("_kind"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        "o_orderkey",
        "o_orderdate",
    )
    timeline = ev.unionByName(o)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_t").asc(), F.col("_kind").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        timeline.withColumn("_last_key", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("_last_date", F.last("o_orderdate", ignorenulls=True).over(w))
        .filter((F.col("_kind") == 1) & F.col("_last_key").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("_last_key").alias("o_orderkey"),
            F.col("_last_date").alias("o_orderdate"),
        )
    )


@register(
    "q_join_cross",
    oracle="""
        SELECT n_name, r_name FROM nation CROSS JOIN region
    """,
    category="join",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny dimensions — the one legitimate cross join (both sides enum-sized)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.crossJoin(r).select("n_name", "r_name")


@register(
    "q_temporal_join",
    oracle="""
        WITH dim AS (
            SELECT user_id, value AS segment_value, ts AS valid_from,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ) AS valid_to
            FROM events WHERE event_type = 'signup'
        )
        SELECT round(d.segment_value, 0) AS segment_bucket,
               count(*) AS n_purchases,
               round(sum(e.value), 4) AS purchase_value
        FROM events e
        JOIN dim d
          ON e.user_id = d.user_id
         AND e.ts >= d.valid_from
         AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        WHERE e.event_type = 'purchase'
        GROUP BY 1
    """,
    category="join",
)
def q_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each purchase matched to the
    SCD2 dimension period covering its timestamp — how you join facts
    to history-tracked dimensions without leaking future attributes.
    Equi key user_id carries the join; the interval test is a residual
    filter, so this stays a hash/sort-merge join, never a nested-loop.
    Each fact matches EXACTLY one period (periods partition the
    timeline per user), so no row blowup. Scale: same as any keyed
    join + an O(1) residual."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("value").alias("segment_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("_pts"), F.col("value").alias("_pv")
    )
    return (
        purchases.join(dim, "user_id")
        .filter(
            (F.col("_pts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("_pts") < F.col("valid_to")))
        )
        .groupBy(F.round("segment_value", 0).alias("segment_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("_pv"), 4).alias("purchase_value"),
        )
    )


@register(
    "q_not_in_null_trap",
    oracle="""
        SELECT
            (SELECT count(*) FROM orders
             WHERE o_custkey NOT IN
                   (SELECT nullif(c_custkey, 1) FROM customer)) AS n_not_in,
            (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (
                 SELECT 1 FROM customer c
                 WHERE nullif(c.c_custkey, 1) = o.o_custkey)) AS n_not_exists
    """,
    category="subquery",
)
def q_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, graded: when the subquery list contains a
    NULL, ANSI three-valued logic makes ``x NOT IN (...)`` UNKNOWN for
    every x — zero rows — while NOT EXISTS (null-rejecting equality)
    still eliminates only real matches. Both engines implement ANSI
    semantics; this query pins that the engine's null-aware anti-join
    (Spark plans NOT IN as one) agrees. Returns both counts side by
    side: (0, customers-minus-one's orders)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_custkey"), F.lit(1)).alias("k")
    )
    o.createOrReplaceTempView("_nt_orders")
    c.createOrReplaceTempView("_nt_keys")
    return spark.sql(
        """
        SELECT
            (SELECT count(*) FROM _nt_orders
             WHERE o_custkey NOT IN (SELECT k FROM _nt_keys)) AS n_not_in,
            (SELECT count(*) FROM _nt_orders o
             WHERE NOT EXISTS (
                 SELECT 1 FROM _nt_keys c WHERE c.k = o.o_custkey)) AS n_not_exists
        """
    )


@register(
    "q_range_join_bucketed",
    oracle="""
        WITH intervals AS (
            SELECT CAST(i AS BIGINT) AS interval_id,
                   TIMESTAMP '2024-01-01 00:00:00' + CAST(i AS INT) * INTERVAL 14 HOUR AS s,
                   TIMESTAMP '2024-01-01 00:00:00' + CAST(i AS INT) * INTERVAL 14 HOUR
                       + INTERVAL 6 HOUR AS e
            FROM range(0, 50) t(i)
        )
        SELECT interval_id,
               count(*) AS n_events,
               round(sum(value), 4) AS value_sum
        FROM intervals JOIN events ev ON ev.ts >= s AND ev.ts < e
        GROUP BY interval_id
    """,
    category="join",
)
def q_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range (interval) join — events falling inside 50 fixed
    6-hour windows spaced 14 hours apart — via the BUCKETED rewrite:
    each interval explodes into its covered hour buckets, each event
    maps to its one hour bucket, and the match becomes an EQUI-join on
    the bucket plus an O(1) residual ``s <= ts < e``. A naive interval
    join has no equi key, so Spark would plan a BroadcastNestedLoopJoin
    scanning every (interval, event) pair — the rewrite is THE pattern
    that keeps interval matching shuffle-joinable at 100 TB (bucket
    granularity chosen so each row lands in O(width/granularity)
    buckets; here 6 buckets per interval, 1 per event). The oracle
    states the naive BETWEEN join — same result, quadratic plan —
    which is exactly the parity this query pins."""
    ev = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    base_us = 1_704_067_200_000_000  # epoch µs of 2024-01-01 00:00:00 UTC
    intervals = (
        spark.range(50)
        .select(
            F.col("id").alias("interval_id"),
            (F.lit(base_us) + F.col("id") * (14 * hour_us)).alias("s_us"),
            (F.lit(base_us) + F.col("id") * (14 * hour_us) + 6 * hour_us).alias("e_us"),
        )
    )
    # one row per (interval, covered hour bucket): 6 buckets each
    ibuckets = intervals.select(
        "interval_id",
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                (F.col("s_us") / hour_us).cast("long"),
                ((F.col("e_us") - 1) / hour_us).cast("long"),
            )
        ).alias("bucket"),
    )
    evb = ev.select(
        F.col("value"),
        F.unix_micros("ts").alias("ts_us"),
        (F.unix_micros("ts") / hour_us).cast("long").alias("bucket"),
    )
    joined = evb.join(F.broadcast(ibuckets), "bucket").filter(
        (F.col("ts_us") >= F.col("s_us")) & (F.col("ts_us") < F.col("e_us"))
    )
    return joined.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("value_sum"),
    )


@register(
    "q_salted_join",
    oracle="""
        -- EXACT 1e-4-unit integer sum: the revenue tops 6e9 at sf0.1,
        -- where double summation order reaches the 4th decimal (the
        -- q_cdc_upsert class — this one flipped BETWEEN sf0.1 runs);
        -- price*(1-disc) is exact at 4 decimals so the int sum is exact
        SELECT o_orderpriority,
               count(*) AS n_lineitems,
               round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                         * 10000) AS BIGINT)) AS DOUBLE)
                     / 10000.0, 4) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    category="join",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALTED equi-join — the skew escape hatch when one join key
    dominates the big side (AQE's skew-join split handles moderate
    skew; salting is the explicit fix when a single key exceeds what
    one reducer can hold). Big side gets a row-position salt in
    [0, 16); the dimension side replicates 16× (acceptable exactly when
    it was near-broadcastable); the join runs on (key, salt), so a hot
    key's rows spread over 16 reducers instead of one. The oracle is
    the PLAIN join — salting must be invisible in the result, and
    round(·,4) absorbs the summation-order change from re-bucketing.
    The sort-merge path is forced (broadcast disabled per-join via
    hint) so the salted exchange is actually exercised."""
    from builder_spark.operators.partitioning import (
        replicate_for_salted_join,
        with_salt,
    )

    li = with_salt(load_table(spark, sf_dir, "lineitem"), 16)
    o = replicate_for_salted_join(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        16,
    )
    joined = li.hint("merge").join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (li["_salt"] == o["_salt"]),
    )
    # exact 1e-4-unit integer sum (decimal-widened for sf100 headroom):
    # salting must be invisible, and at sf0.1 magnitudes a double sum's
    # re-bucketed order is NOT absorbed by round(,4) — it flipped a
    # digit between two sf0.1 runs of the full differential sweep
    rev_units = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 10000
    ).cast("bigint")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(F.sum(rev_units).cast("double") / 10000.0, 4).alias("revenue"),
    )


@register(
    "q_bloom_pruned_join",
    oracle="""
        SELECT c_mktsegment,
               count(*) AS n_orders,
               round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4) AS revenue  -- exact cents (8.5e8)
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 9000
        GROUP BY c_mktsegment
    """,
    category="join",
)
def q_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (semi-join reduction) pattern: before the exact
    join, the fact scan is pre-filtered by a Bloom filter built over
    the selective dimension's keys. The 8064-bit filter (128 int64
    words, ~1 KB) is collected to the driver and inlined as a LITERAL
    array, so the probe is a pure per-row predicate riding the fact
    scan — zero extra shuffle, exactly how Spark's own runtime bloom
    pushdown (spark.sql.optimizer.runtime.bloomFilter) ships a
    subquery's filter to a scan. Most non-matching rows die at the
    scan; the exact join that follows eliminates the false positives,
    so the result EQUALS the plain join (the oracle) — the filter only
    prunes, never decides. Same filter construction as
    q_bloom_membership; Bloom guarantees no false negatives.

    Scale: the driver collect moves 128 longs regardless of data size
    (same contract as Spark's InSubqueryExec broadcast); the dimension
    side is an aggregate of the selective dim, so building the filter
    costs one combinable bit_or pass."""
    from builder_spark.queries.textops import _CMS_P, _CMS_PLANES, _BLOOM_M, _bloom_hashes, _mask

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    dim = c.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_mktsegment")
    filter_rows = (
        dim.select(F.explode(F.array(*_bloom_hashes(F.col("c_custkey")))).alias("wm"))
        .select("wm.word", "wm.bit")
        .withColumn("mask", _mask())
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    words = {int(r["word"]): int(r["bits"]) for r in filter_rows}
    lits = ",".join(str(words.get(i, 0)) + "L" for i in range(_BLOOM_M // 63))
    probe_terms = []
    for a, b in _CMS_PLANES:
        h = f"(({a}L * o_custkey + {b}L) % {_CMS_P}L) % {_BLOOM_M}L"
        probe_terms.append(
            f"(element_at(array({lits}), cast(({h}) div 63 as int) + 1)"
            f" & shiftleft(1L, cast(({h}) % 63 as int))) != 0"
        )
    pruned = o.filter(F.expr(" AND ".join(probe_terms)))
    return (
        pruned.join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(  # exact cents sum (8.5e8 magnitude at sf0.1)
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("double") / 100.0, 4
            ).alias("revenue"),
        )
    )
