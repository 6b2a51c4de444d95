"""TPC-H completion set — the six queries that need the part↔supplier
bridge the fixtures lack a partsupp table for (Q2, Q9, Q11, Q16, Q20)
plus Q22. Each is adapted faithfully to the fixture schema: the bridge
``(l_partkey, l_suppkey)`` pairs observed in lineitem stand in for
partsupp, with per-pair unit price / shipped quantity standing in for
ps_supplycost / ps_availqty. With these, all 22 TPC-H query shapes are
covered (Q1=q_agg_group, Q6/Q3/Q4/Q5/Q7/Q8/Q10/Q12-Q15/Q17-Q19/Q21 in
``tpch.py``).

Float-determinism discipline (SURVEY.md §2 traps): any value that feeds
an equality/argmin comparison is ``round(·, 4)``-ed BEFORE the compare
on both engines; pure threshold compares (>) on exact-integer-valued
doubles (quantities) or on values with ~1e-15 relative noise vs a
continuous threshold are safe raw (probability of a boundary flip is
negligible and probed at both sf0.001 and sf0.01).

Scale posture (100 TB): the bridge aggregate shuffles on
(l_partkey, l_suppkey) — the same key the downstream per-part argmin
re-uses, so AQE plans one exchange; dimension sides (part, supplier,
nation, region) broadcast; scalar thresholds are 1-row broadcasts, never
driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register


def _bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp stand-in: distinct (part, supplier) pairs with the min
    observed unit price (supply-cost proxy) in integer MILLI-CENTS:
    cents·1000 floor-divided by quantity. Prices carry 2 decimals and
    quantities are integral, so every step is exact integer arithmetic
    — the argmin cannot flip on float rounding (a round(·,4) of the
    raw quotient DID flip at a half boundary between engines)."""
    l = load_table(spark, sf_dir, "lineitem")
    unit = F.expr(
        "cast(round(l_extendedprice * 100) as bigint) * 1000"
        " div cast(l_quantity as bigint)"
    )
    return l.groupBy("l_partkey", "l_suppkey").agg(F.min(unit).alias("unit_cost"))


@register(
    "q_tpch_q2",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000
                       // CAST(l_quantity AS BIGINT)) AS unit_cost
            FROM lineitem GROUP BY 1, 2
        ),
        euro AS (
            SELECT ps.l_partkey, ps.l_suppkey, ps.unit_cost,
                   s.s_name, round(s.s_acctbal, 4) AS s_acctbal, n.n_name
            FROM ps
            JOIN supplier s ON ps.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT e.s_acctbal, e.s_name, e.n_name,
               p.p_partkey, p.p_name, e.unit_cost
        FROM euro e
        JOIN part p ON p.p_partkey = e.l_partkey
        WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
          AND e.unit_cost = (
              SELECT min(e2.unit_cost) FROM euro e2
              WHERE e2.l_partkey = e.l_partkey
          )
        ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
        LIMIT 100
    """,
    category="tpch",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (minimum-cost supplier): for STANDARD size-15 parts, the
    EUROPE supplier(s) quoting the per-part minimum unit price. The
    correlated min subquery decorrelates into a per-part window min
    over the Europe-filtered bridge — one exchange on l_partkey, no
    rescan. unit_cost is exact integer milli-cents (see ``_bridge``)
    so both engines agree on the argmin set exactly; the top-100 is
    totally ordered (acctbal DESC, nation, supplier, part)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    euro = (
        _bridge(spark, sf_dir)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        euro.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            F.round("s_acctbal", 4).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "unit_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


@register(
    "q_tpch_q9",
    oracle="""
        SELECT n.n_name AS nation,
               year(l.l_shipdate) AS o_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)
                         - 0.1 * p.p_retailprice * l.l_quantity), 4) AS profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
    category="tpch",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (product-type profit): per supplier-nation per ship year,
    profit on 'widget' parts. ps_supplycost*l_quantity becomes
    0.1*p_retailprice*l_quantity (the fixture's only cost-like column).
    part and supplier broadcast; the p_name LIKE filter prunes the
    part build side so the broadcast-hash-join runtime filter shrinks
    the lineitem probe. Single aggregation pass, one shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("profit"))
    )


@register(
    "q_tpch_q11",
    oracle="""
        WITH val AS (
            SELECT l.l_partkey, sum(l.l_extendedprice) AS value
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_1'
            GROUP BY 1
        )
        SELECT l_partkey, round(value, 4) AS part_value
        FROM val
        WHERE round(value, 4) > (SELECT round(0.001 * sum(value), 4) FROM val)
    """,
    category="tpch",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 (important stock): parts whose NATION_1-supplied value
    exceeds 0.1% of that nation's total. The scalar total becomes an
    empty-frame window sum over the per-part aggregate (|parts| rows —
    one extra tiny exchange, no second lineitem scan). Both compare
    operands round to 4 first so differing summation orders cannot
    flip the threshold."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    val = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    # scalar threshold via broadcast 1-row aggregate — not an
    # empty-frame window over the |parts| aggregate
    tot = val.agg(F.round(0.001 * F.sum("value"), 4).alias("thresh"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.round(F.col("value"), 4) > F.col("thresh"))
        .select("l_partkey", F.round("value", 4).alias("part_value"))
    )


@register(
    "q_tpch_q16",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT ps.l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'MEDIUM'
          AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND ps.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
    """,
    category="tpch",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 (part/supplier relationship): how many qualified suppliers
    ship each (brand, type, size) combo, excluding suppliers with
    negative balance (the fixture's stand-in for the complaints NOT IN
    subquery — key list is non-null so NOT IN ≡ anti-join). The
    distinct bridge and the countDistinct share the same
    (partkey, suppkey) shuffle key; part broadcasts with its three
    filters pushed to the scan."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    ps = l.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q20",
    oracle="""
        WITH shipped AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT l_partkey, sum(qty) AS total_qty FROM shipped GROUP BY 1
        )
        SELECT DISTINCT s.s_name, n.n_name
        FROM shipped sh
        JOIN tot      ON sh.l_partkey = tot.l_partkey
        JOIN part p   ON p.p_partkey = sh.l_partkey AND p.p_name LIKE 'red%'
        JOIN supplier s ON s.s_suppkey = sh.l_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE sh.qty > 0.5 * tot.total_qty
    """,
    category="tpch",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (potential part promotion): suppliers who dominated (>50%
    of) a red part's 1997 shipments — ps_availqty > 0.5*shipped
    becomes supplier-share > 0.5 of the part total. Quantities are
    exact small integers in doubles, so the raw > compare is exact on
    both engines. The part total is a window sum over the
    (part, supplier) aggregate — same shuffle key, no rescan; the
    'red%' prefix filter broadcasts with part."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = l.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    w = Window.partitionBy("l_partkey")
    return (
        shipped.withColumn("total_qty", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .distinct()
    )


@register(
    "q_tpch_q22",
    oracle="""
        WITH eligible AS (
            SELECT c_custkey, c_nationkey, c_acctbal FROM customer
            WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)
        )
        SELECT e.c_nationkey AS cntrycode,
               count(*) AS numcust,
               round(sum(e.c_acctbal), 4) AS totacctbal
        FROM eligible e
        WHERE e.c_acctbal > (
                  SELECT avg(c_acctbal) FROM eligible WHERE c_acctbal > 0
              )
          AND NOT EXISTS (
                  SELECT 1 FROM orders o
                  WHERE o.o_custkey = e.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
              )
        GROUP BY 1
    """,
    category="tpch",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (global sales opportunity): customers from six 'country
    codes' (nationkeys — the fixture has no c_phone) whose balance
    beats the positive-balance average of that group and who have
    never placed an URGENT order (every fixture customer has SOME
    order, so the spec's no-order-at-all form would be vacuously
    empty — the priority-scoped NOT EXISTS keeps the anti-join shape
    AND produces rows). The scalar avg is a 1-row broadcast cross
    join; NOT EXISTS is a left_anti on o_custkey with the priority
    filter pushed to the orders scan. Raw > against the avg is safe:
    acctbal has 2 decimals, the threshold carries ~1e-12 noise — no
    boundary collision. At scale the anti-join shuffles on custkey;
    everything else is broadcast-sized."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11)
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )
