"""Round-9 batch 2 surface growth: classical inference (one-way ANOVA,
CUPED variance reduction, Benjamini-Hochberg FDR), inequality
decomposition (Theil), FIFO lot matching, geo grid-bucketed nearest
neighbour, retrieval MRR, exact quantile normalization, Bollinger-band
breaches, and rendezvous (HRW) sharding.

Design rules (same as the rest of the graded surface):
- integer-exact wherever the semantics allow (FIFO quantities, decile
  boundaries, HRW hashes); floats only through one identical
  expression tree on both engines, then ``round(·, 4)``;
- deterministic total orders under every window/rank (tie-break on a
  unique key);
- scale-shaped plans: per-entity windows partition on the entity key,
  global scalars travel as 1-row broadcasts, candidate generation is
  grid/cell-bucketed (geo) or broadcast-bounded (MRR's 20 queries) —
  nothing all-pairs over fact grain, nothing single-reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from builder_spark.catalog import load_table
from builder_spark.registry import register

_K = 2654435761  # 2^32/φ — the repo's engine-portable multiplicative hash
_M32 = 4294967296

#: DuckDB-side dot/norm over float lists (same macros as llmdata.py:30)
_DD_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_DD_NORM = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * x)))"


# ---------------------------------------------------------------------------
# classical statistical inference


@register(
    "q_anova_f",
    oracle="""
        WITH seg AS (
            SELECT c.c_mktsegment AS seg,
                   count(*) AS n,
                   sum(o.o_totalprice) AS s,
                   sum(o.o_totalprice * o.o_totalprice) AS ss
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        )
        SELECT CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(n) AS BIGINT) AS n_total,
               round(
                 ((sum(s * s / n) - sum(s) * sum(s) / sum(n)) / (count(*) - 1))
                 / ((sum(ss) - sum(s * s / n)) / (sum(n) - count(*))), 4
               ) AS f_stat,
               round(
                 (sum(s * s / n) - sum(s) * sum(s) / sum(n))
                 / (sum(ss) - sum(s) * sum(s) / sum(n)), 4
               ) AS eta_sq
        FROM seg
    """,
    category="analytics",
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean order value differ across the five
    market segments? F = (SSB/(k-1)) / (SSW/(N-k)) plus the eta-squared
    effect size — the k-group generalization of q_welch_ttest.

    Exactness: every sum of squares comes from the same raw-moment
    algebra on both engines (SSB = Σ s_g²/n_g − S²/N, SSW = Σ ss_g −
    Σ s_g²/n_g — the q_moments/q_multi_regression discipline), so the
    only cross-engine noise is double-summation order, ~1e-13 relative,
    invisible after the single round(·,4) on the O(1)-scale ratios.
    Scale: one combinable conditional-agg pass to 5 segment rows; the
    closed form runs on those 5 rows."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s"),
            F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("ss"),
        )
    )
    k = F.count(F.lit(1))
    ssb = F.sum(F.col("s") * F.col("s") / F.col("n")) - F.sum("s") * F.sum("s") / F.sum("n")
    ssw = F.sum("ss") - F.sum(F.col("s") * F.col("s") / F.col("n"))
    sst = F.sum("ss") - F.sum("s") * F.sum("s") / F.sum("n")
    return seg.agg(
        k.cast("bigint").alias("n_groups"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.round((ssb / (k - 1)) / (ssw / (F.sum("n") - k)), 4).alias("f_stat"),
        F.round(ssb / sst, 4).alias("eta_sq"),
    )


@register(
    "q_cuped",
    oracle="""
        WITH bounds AS (
            SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid_us
            FROM events
        ),
        per_user AS (
            SELECT user_id,
                   sum(CASE WHEN epoch_us(ts) < b.mid_us THEN value ELSE 0 END) AS pre,
                   sum(CASE WHEN epoch_us(ts) >= b.mid_us THEN value ELSE 0 END) AS post
            FROM events, bounds b
            GROUP BY user_id, b.mid_us
        ),
        m AS (
            SELECT count(*) AS n, sum(pre) AS sp, sum(post) AS so,
                   sum(pre * pre) AS spp, sum(pre * post) AS spo,
                   sum(post * post) AS soo
            FROM per_user
        )
        SELECT CAST(n AS BIGINT) AS n_users,
               round((spo - sp * so / n) / (spp - sp * sp / n), 4) AS theta,
               round(sqrt((soo - so * so / n) / n), 4) AS sd_post,
               round(sqrt(((soo - so * so / n)
                           - (spo - sp * so / n) * (spo - sp * so / n)
                             / (spp - sp * sp / n)) / n), 4) AS sd_adj,
               round(100.0 * (spo - sp * so / n) * (spo - sp * so / n)
                     / ((spp - sp * sp / n) * (soo - so * so / n)), 4)
                   AS var_reduction_pct
        FROM m
    """,
    category="analytics",
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction — the industry-standard experiment
    pre-adjustment: split each user's activity at the dataset's time
    midpoint into a pre-period covariate and a post-period metric,
    fit theta = cov(pre, post)/var(pre), and report how much variance
    the adjusted metric post − θ·(pre − mean_pre) sheds (= 100·corr²).

    The midpoint is a 1-row broadcast; per-user pre/post is one
    conditional-agg pass; all second moments come from a single
    5-sufficient-statistics aggregate (the q_multi_regression
    pattern) with the closed form on a 1-row result."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("us"), "value"
    )
    bounds = ev.agg(
        F.expr("(min(us) + max(us)) div 2").alias("mid_us")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") < F.col("mid_us"), F.col("value")).otherwise(0.0)).alias("pre"),
            F.sum(F.when(F.col("us") >= F.col("mid_us"), F.col("value")).otherwise(0.0)).alias("post"),
        )
    )
    n = F.count(F.lit(1))
    sp, so = F.sum("pre"), F.sum("post")
    spp = F.sum(F.col("pre") * F.col("pre"))
    spo = F.sum(F.col("pre") * F.col("post"))
    soo = F.sum(F.col("post") * F.col("post"))
    cov = spo - sp * so / n
    _varp = spp - sp * sp / n
    varp = F.when(_varp != 0, _varp)  # ANSI /0 guard: constant pre-metric
    varo = soo - so * so / n
    return per_user.agg(
        n.cast("bigint").alias("n_users"),
        F.round(cov / varp, 4).alias("theta"),
        F.round(F.sqrt(varo / n), 4).alias("sd_post"),
        F.round(F.sqrt((varo - cov * cov / varp) / n), 4).alias("sd_adj"),
        F.round(
            F.lit(100.0) * cov * cov
            / F.when(_varp * varo != 0, _varp * varo),
            4,
        ).alias("var_reduction_pct"),
    )


@register(
    "q_bh_fdr",
    oracle="""
        WITH cells AS (
            SELECT event_type, isodow(ts) - 1 AS dow, count(*) AS o
            FROM events GROUP BY event_type, isodow(ts) - 1
        ),
        rows_m AS (SELECT event_type, sum(o) AS nr FROM cells GROUP BY event_type),
        cols_m AS (SELECT dow, sum(o) AS nc FROM cells GROUP BY dow),
        tot AS (SELECT sum(o) AS n FROM cells),
        scored AS (
            SELECT c.event_type, c.dow,
                   (c.o - r.nr * cm.nc / t.n) * (c.o - r.nr * cm.nc / t.n)
                   / (r.nr * cm.nc / t.n) AS stat,
                   exp(-((c.o - r.nr * cm.nc / t.n) * (c.o - r.nr * cm.nc / t.n)
                   / (r.nr * cm.nc / t.n)) / 2) AS p
            FROM cells c
            JOIN rows_m r ON c.event_type = r.event_type
            JOIN cols_m cm ON c.dow = cm.dow
            CROSS JOIN tot t
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (ORDER BY p, event_type, dow) AS i,
                   count(*) OVER () AS m
            FROM scored
        ),
        cut AS (
            SELECT *,
                   max(CASE WHEN p <= i * 0.05 / m THEN i END) OVER () AS kstar
            FROM ranked
        )
        SELECT event_type, CAST(dow AS INT) AS dow, round(stat, 4) AS stat,
               CAST(i AS BIGINT) AS rank_i,
               CAST(CASE WHEN i <= coalesce(kstar, 0) THEN 1 ELSE 0 END AS INT)
                   AS rejected
        FROM cut
    """,
    category="analytics",
)
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the 35 (event type ×
    weekday) contingency cells: per-cell chi-square contribution
    (o−e)²/e against the independence expectation, a monotone
    exp(−stat/2) pseudo-p (the BH *mechanics* — rank, step-up
    threshold i·α/m, reject everything up to the largest passing rank
    — are what's graded; the p-calibration is explicitly synthetic
    since cross-engine erf/CDFs aren't portable), α = 0.05.

    Exactness: o, nr, nc, N are exact integers, so every stat and p is
    ONE identical per-row expression tree — bit-identical across
    engines, making the rank and the step-up cut deterministic. Scale:
    the window runs over 35 rows; everything upstream is combinable
    aggregates + broadcast-size margin joins."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.weekday("ts").alias("dow")
    )
    cells = ev.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("o"))
    rows_m = cells.groupBy("event_type").agg(F.sum("o").alias("nr"))
    cols_m = cells.groupBy("dow").agg(F.sum("o").alias("nc"))
    tot = cells.agg(F.sum("o").alias("n"))
    e = F.col("nr") * F.col("nc") / F.col("n")
    scored = (
        cells.join(F.broadcast(rows_m), "event_type")
        .join(F.broadcast(cols_m), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            ((F.col("o") - e) * (F.col("o") - e) / e).alias("stat"),
            F.exp(-((F.col("o") - e) * (F.col("o") - e) / e) / 2).alias("p"),
        )
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = scored.withColumn(
        "i", F.row_number().over(Window.orderBy("p", "event_type", "dow"))
    ).withColumn("m", F.count(F.lit(1)).over(w_all))
    cut = ranked.withColumn(
        "kstar",
        F.max(
            F.when(F.col("p") <= F.col("i") * F.lit(0.05) / F.col("m"), F.col("i"))
        ).over(w_all),
    )
    return cut.select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        F.round("stat", 4).alias("stat"),
        F.col("i").cast("bigint").alias("rank_i"),
        F.when(F.col("i") <= F.coalesce(F.col("kstar"), F.lit(0)), 1)
        .otherwise(0)
        .cast("int")
        .alias("rejected"),
    )


# ---------------------------------------------------------------------------
# inequality decomposition


@register(
    "q_theil_index",
    oracle="""
        WITH cust AS (
            SELECT o_custkey, sum(o_totalprice) AS x
            FROM orders GROUP BY o_custkey
        ),
        tagged AS (
            SELECT n.n_name, cu.x
            FROM cust cu
            JOIN customer c ON cu.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        grp AS (
            SELECT n_name, count(*) AS ng, sum(x) AS xg,
                   sum(x * ln(x)) AS slx
            FROM tagged GROUP BY n_name
        ),
        overall AS (SELECT sum(ng) AS n, sum(xg) AS x FROM grp)
        SELECT g.n_name,
               CAST(g.ng AS BIGINT) AS n_cust,
               round(g.xg / gl.x, 4) AS income_share,
               -- + 0.0: both terms are noise around 0 for a nation at
               -- the global mean, and DuckDB round() preserves -0.0
               -- where Spark's BigDecimal round cannot (SURVEY trap 10;
               -- two -0.0 carriers surfaced at sf0.1)
               round(g.slx / g.xg - ln(g.xg / g.ng), 4) + 0.0 AS theil_within,
               round((g.xg / gl.x) * ln((g.xg / g.ng) / (gl.x / gl.n)), 4) + 0.0
                   AS between_term
        FROM grp g CROSS JOIN overall gl
    """,
    category="analytics",
)
def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer revenue, decomposed by
    nation — the additively decomposable alternative to Gini: per
    nation the within-group index T_g and the between-group term
    s_g·ln(μ_g/μ); summing contribution s_g·T_g + between over nations
    gives the total index.

    The one-pass trick: T_g = (Σ x·ln x)/X_g − ln μ_g, so the entire
    decomposition needs only (n, Σx, Σ x·ln x) per nation — one
    customer-grain aggregate, one 25-row nation rollup, one 1-row
    global broadcast. ln is portable; all ratios are O(1)-scale before
    the single round."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("x"))
    tagged = (
        cust.join(c, cust.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "x")
    )
    grp = tagged.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("x").alias("xg"),
        F.sum(F.col("x") * F.log("x")).alias("slx"),
    )
    glob = grp.agg(F.sum("ng").alias("n"), F.sum("xg").alias("x"))
    j = grp.crossJoin(F.broadcast(glob))
    return j.select(
        "n_name",
        F.col("ng").cast("bigint").alias("n_cust"),
        F.round(F.col("xg") / F.col("x"), 4).alias("income_share"),
        F.round(
            F.col("slx") / F.col("xg") - F.log(F.col("xg") / F.col("ng")), 4
        ).alias("theil_within"),
        F.round(
            (F.col("xg") / F.col("x"))
            * F.log((F.col("xg") / F.col("ng")) / (F.col("x") / F.col("n"))),
            4,
        ).alias("between_term"),
    )


# ---------------------------------------------------------------------------
# FIFO lot matching


@register(
    "q_fifo_fill",
    oracle="""
        WITH lots AS (
            SELECT l_partkey,
                   CAST(l_quantity AS BIGINT) AS qty,
                   sum(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_partkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   sum(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_partkey
                   ) AS total
            FROM lineitem
        )
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n_lots,
               CAST(max(total) AS BIGINT) AS total_qty,
               CAST(max(total) // 2 AS BIGINT) AS demand,
               CAST(sum(CASE WHEN cum <= total // 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_full,
               CAST(max(total) // 2
                    - max(CASE WHEN cum <= total // 2 THEN cum ELSE 0 END)
                    AS BIGINT) AS partial_qty
        FROM lots GROUP BY l_partkey
    """,
    category="analytics",
)
def q_fifo_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching — the cumulative-interval form of first-in
    first-out cost allocation: per part, supply lots (lineitems in
    ship order) fill a demand of half the total supplied quantity;
    report how many lots the demand fully consumes and the quantity
    taken from the first partially-consumed lot. The classic
    inventory/cost-basis primitive, done with a running cumsum instead
    of an iterative queue.

    Exactness: quantities are integer-valued, so every column is an
    exact BIGINT. Scale: both windows share ONE per-part exchange
    (same PARTITION BY); the rollup is a combinable groupBy — no
    queue state, no self-join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w_cum = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("l_partkey")
    lots = li.select(
        "l_partkey",
        F.sum("qty").over(w_cum).alias("cum"),
        F.sum("qty").over(w_tot).alias("total"),
    )
    full = F.col("cum") <= F.expr("total div 2")
    return lots.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lots"),
        F.max("total").cast("bigint").alias("total_qty"),
        F.expr("max(total) div 2").cast("bigint").alias("demand"),
        F.sum(F.when(full, 1).otherwise(0)).cast("bigint").alias("n_full"),
        (
            F.expr("max(total) div 2")
            - F.max(F.when(full, F.col("cum")).otherwise(0))
        )
        .cast("bigint")
        .alias("partial_qty"),
    )


# ---------------------------------------------------------------------------
# geo grid-bucketed nearest neighbour


# divisor as e0 DOUBLE literal: Spark parses a plain `4294967296.0` as
# DECIMAL, making the whole coordinate decimal arithmetic truncated at
# scale 6 while DuckDB computes doubles — inputs must be bit-identical
# for the polynomial haversine below to match
_LAT = "(((({key}) * 2654435761) % 4294967296) / 4294967296e0 * 120.0 - 60.0)"
_LON = "((((({key}) + 7) * 2654435761) % 4294967296) / 4294967296e0 * 360.0 - 180.0)"


def _horner(x: str, c0: float, coeffs: list[float]) -> str:
    """``(c0 + u*(c1 + u*(...)))`` with u = x² — one fixed IEEE
    operation order both engines must follow."""
    u = f"(({x}) * ({x}))"
    acc = repr(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        acc = f"({c!r} + {u} * {acc})"
    return f"({c0!r} + {u} * {acc})"


def _psin(x: str) -> str:
    """Deterministic sin: degree-17 Taylor, |x| ≤ π (max abs error
    ~2e-8 at π, full precision in the ≤0.06 rad range that survives
    the 100 km filter). Pure +,*: bit-identical on Spark and DuckDB,
    unlike libm sin (JVM vs C library last-ulp drift measured at
    2e-9 RELATIVE on d — guaranteed round(,4) boundary collisions
    as row counts grow)."""
    body = _horner(
        x,
        1.0,
        [
            -0.16666666666666666,
            0.008333333333333333,
            -0.0001984126984126984,
            2.7557319223985893e-06,
            -2.505210838544172e-08,
            1.6059043836821613e-10,
            -7.647163731819816e-13,
            2.8114572543455206e-15,
        ],
    )
    return f"(({x}) * {body})"


def _pcos(x: str) -> str:
    """Deterministic cos: degree-12 Taylor, |x| ≤ 1.05 rad (lat ≤ 60°;
    max abs error ~2e-11)."""
    return _horner(
        x,
        1.0,
        [
            -0.5,
            0.041666666666666664,
            -0.001388888888888889,
            2.48015873015873e-05,
            -2.755731922398589e-07,
            2.08767569878681e-09,
        ],
    )


def _pasin(y: str) -> str:
    """Deterministic asin for |y| ≤ 0.008 (the ≤100 km regime; error
    ~1e-16 there). For far pairs it underestimates but stays ≥ y, so
    12742·pasin(y) ≥ 12742·sin(0.5°) > 111 km — no far pair can sneak
    under the radius filter."""
    v = f"(({y}) * ({y}))"
    return (
        f"(({y}) * (1.0 + {v} * (0.16666666666666666"
        f" + {v} * (0.075 + {v} * 0.044642857142857144))))"
    )


def _hav(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Haversine with every transcendental replaced by the shared
    polynomial — the whole expression is +,*,/,sqrt, so Spark and
    DuckDB produce BIT-IDENTICAL doubles and round(d, 4) can never
    disagree (libm trig differs between the JVM and DuckDB's C math
    library; at sf0.1 a pair landed within that drift of a 4dp
    boundary). 0.0087266… = π/360 (half-radians per degree),
    0.0174532… = π/180, 12742 = 2R."""
    sdlat = _psin(f"(({lat2}) - ({lat1})) * 0.008726646259971648")
    sdlon = _psin(f"(({lon2}) - ({lon1})) * 0.008726646259971648")
    clat1 = _pcos(f"({lat1}) * 0.017453292519943295")
    clat2 = _pcos(f"({lat2}) * 0.017453292519943295")
    a = f"({sdlat} * {sdlat} + {clat1} * {clat2} * {sdlon} * {sdlon})"
    return f"(12742.0 * {_pasin(f'sqrt({a})')})"


class _HavFmt:
    """Adapter keeping the existing ``_HAV.format(lat1=…, …)`` call
    sites while the template is now generated."""

    @staticmethod
    def format(*, lat1: str, lon1: str, lat2: str, lon2: str) -> str:
        return _hav(lat1, lon1, lat2, lon2)


_HAV = _HavFmt()


@register(
    "q_geo_nearest",
    oracle=f"""
        WITH cust AS (
            SELECT c_custkey,
                   {_LAT.format(key="CAST(c_custkey AS HUGEINT)")} AS lat,
                   {_LON.format(key="CAST(c_custkey AS HUGEINT)")} AS lon
            FROM customer
        ),
        supp AS (
            SELECT s_suppkey,
                   {_LAT.format(key="CAST(s_suppkey AS HUGEINT)")} AS lat,
                   {_LON.format(key="CAST(s_suppkey AS HUGEINT)")} AS lon
            FROM supplier
        ),
        pairs AS (
            SELECT c.c_custkey, s.s_suppkey,
                   {_HAV.format(lat1="c.lat", lon1="c.lon", lat2="s.lat", lon2="s.lon")} AS d
            FROM cust c, supp s
        ),
        ranked AS (
            SELECT c_custkey, s_suppkey, round(d, 4) AS dist_km,
                   row_number() OVER (
                       PARTITION BY c_custkey
                       ORDER BY round(d, 4), s_suppkey
                   ) AS rk
            FROM pairs WHERE d <= 100.0
        )
        SELECT c_custkey, s_suppkey, dist_km FROM ranked WHERE rk = 1
    """,
    category="join",
)
def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo nearest-neighbour within a 100 km radius via GRID-CELL
    bucketING — the spatial-join pattern: deterministic synthetic
    coordinates (lat ∈ [−60, 60], lon ∈ [−180, 180) from the portable
    key hash — the fixture schema has no geography), 2°×2° cells, each
    supplier replicated into its 3×3 cell neighbourhood (2° ≥ 111 km of
    latitude and ≥ 100 km of longitude at |lat| ≤ 60, so the
    neighbourhood provably covers any 100 km disc), equi-join on cell,
    haversine verify, per-customer rank-1.

    The oracle brute-forces all pairs (fine at test scale); the Spark
    plan joins only the ~9 candidate cells per customer — candidate
    count scales with density, not table size, and the supplier side
    (small dim ×9) broadcasts. The haversine is evaluated with shared
    POLYNOMIAL sin/cos/asin (pure IEEE +,*,sqrt — see _hav) so both
    engines produce bit-identical distances: libm trig drifts ~2e-9
    relative between the JVM and DuckDB, which at sf0.1 row counts
    lands pairs inside round(,4) boundaries. Rank still orders on
    round(d, 4) then s_suppkey."""
    from builder_spark.operators.partitioning import spread

    # spread: the customer scan is a single row group at bench SFs, and
    # the whole candidate pipeline (cell join + polynomial haversine +
    # radius filter) pipelines on the scan's tasks — measured one
    # 11 CPU-s task at sf0.1 (the Horner-expanded haversine is the
    # per-row cost). On a real cluster the scan is already wide and
    # spread no-ops.
    cust = spread(
        load_table(spark, sf_dir, "customer"), "c_custkey"
    ).selectExpr(
        "c_custkey",
        f"{_LAT.format(key='c_custkey')} AS lat",
        f"{_LON.format(key='c_custkey')} AS lon",
    )
    supp = load_table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey",
        f"{_LAT.format(key='s_suppkey')} AS s_lat",
        f"{_LON.format(key='s_suppkey')} AS s_lon",
    )
    cust = cust.withColumn(
        "cell_lat", F.floor((F.col("lat") + 60.0) / 2.0)
    ).withColumn("cell_lon", F.floor((F.col("lon") + 180.0) / 2.0))
    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    supp9 = (
        supp.withColumn("dlat", off)
        .withColumn("dlon", off)
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (F.floor((F.col("s_lat") + 60.0) / 2.0) + F.col("dlat")).alias("cell_lat"),
            (
                (F.floor((F.col("s_lon") + 180.0) / 2.0) + F.col("dlon") + 180)
                % 180
            ).alias("cell_lon"),
        )
    )
    d = F.expr(
        _HAV.format(lat1="lat", lon1="lon", lat2="s_lat", lon2="s_lon")
    )
    pairs = (
        cust.join(F.broadcast(supp9), ["cell_lat", "cell_lon"])
        .select("c_custkey", "s_suppkey", d.alias("d"))
        .filter(F.col("d") <= 100.0)
    )
    w = Window.partitionBy("c_custkey").orderBy(F.round("d", 4), "s_suppkey")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("c_custkey", "s_suppkey", F.round("d", 4).alias("dist_km"))
    )


# ---------------------------------------------------------------------------
# retrieval quality: mean reciprocal rank


@register(
    "q_mrr_retrieval",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS q_emb,
                   {_DD_NORM.format(v="embedding")} AS q_nrm
            FROM embeddings WHERE vec_id < 20
        ),
        rel AS (
            SELECT q.q_id, q.q_emb, q.q_nrm, e.vec_id AS rel_id,
                   round({_DD_DOT.format(a="q.q_emb", b="e.embedding")}
                         / (q.q_nrm * {_DD_NORM.format(v="e.embedding")}), 4)
                       AS cos_rel
            FROM q JOIN embeddings e ON e.vec_id = q.q_id + 100
        ),
        scored AS (
            SELECT r.q_id, r.rel_id, r.cos_rel, e.vec_id AS c_id,
                   round({_DD_DOT.format(a="r.q_emb", b="e.embedding")}
                         / (r.q_nrm * {_DD_NORM.format(v="e.embedding")}), 4)
                       AS cos
            FROM rel r JOIN embeddings e ON e.vec_id <> r.q_id
        )
        SELECT q_id, rel_id,
               CAST(1 + sum(CASE WHEN cos > cos_rel
                                 OR (cos = cos_rel AND c_id < rel_id)
                            THEN 1 ELSE 0 END) AS BIGINT) AS rel_rank,
               round(CASE WHEN 1 + sum(CASE WHEN cos > cos_rel
                                            OR (cos = cos_rel AND c_id < rel_id)
                                       THEN 1 ELSE 0 END) <= 10
                          THEN 1.0 / (1 + sum(CASE WHEN cos > cos_rel
                                                   OR (cos = cos_rel AND c_id < rel_id)
                                              THEN 1 ELSE 0 END))
                          ELSE 0.0 END, 4) AS rr
        FROM scored GROUP BY q_id, rel_id
    """,
    category="llm-similarity",
)
def q_mrr_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of retrieval — MRR@10's per-query rows: for
    each of the 20 query vectors the designated relevant item is
    vec_id + 100 (deterministic relevance, since the fixture has no
    qrels); report the relevant item's exact cosine rank among all
    candidates and its reciprocal rank (0 beyond cutoff 10).

    The rank is computed WITHOUT materializing a sorted list: rank =
    1 + count(candidates that beat the relevant one) on the rounded
    cosine with id tie-break — one linear pass over embeddings against
    a 20-row broadcast (queries + their relevant-item cosines), one
    combinable count. No K·N shuffle, no window over fact grain."""
    e = load_table(spark, sf_dir, "embeddings")

    def _cos(a: str, b: str):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nrm = lambda v: F.sqrt(  # noqa: E731
            F.aggregate(
                F.transform(v, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        return F.round(dot / (nrm(F.col(a)) * nrm(F.col(b))), 4)

    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    rel = q.join(
        e.select(F.col("vec_id").alias("rel_id"), F.col("embedding").alias("rel_emb")),
        F.col("rel_id") == F.col("q_id") + 100,
    ).select("q_id", "q_emb", "rel_id", _cos("q_emb", "rel_emb").alias("cos_rel"))
    cand = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"))
    scored = cand.join(
        F.broadcast(rel), F.col("c_id") != F.col("q_id")
    ).select(
        "q_id",
        "rel_id",
        "cos_rel",
        "c_id",
        _cos("q_emb", "c_emb").alias("cos"),
    )
    beats = (F.col("cos") > F.col("cos_rel")) | (
        (F.col("cos") == F.col("cos_rel")) & (F.col("c_id") < F.col("rel_id"))
    )
    out = scored.groupBy("q_id", "rel_id").agg(
        (F.lit(1) + F.sum(F.when(beats, 1).otherwise(0))).cast("bigint").alias("rel_rank")
    )
    return out.select(
        "q_id",
        "rel_id",
        "rel_rank",
        F.round(
            F.when(F.col("rel_rank") <= 10, F.lit(1.0) / F.col("rel_rank")).otherwise(
                0.0
            ),
            4,
        ).alias("rr"),
    )


# ---------------------------------------------------------------------------
# exact quantile normalization


@register(
    "q_quantile_normalize",
    oracle="""
        WITH sl AS (
            SELECT source, n_chars, count(*) AS cnt
            FROM documents GROUP BY source, n_chars
        ),
        scum AS (
            SELECT source, n_chars, cnt,
                   sum(cnt) OVER (
                       PARTITION BY source ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   sum(cnt) OVER (PARTITION BY source) AS tot
            FROM sl
        ),
        src_q AS (
            SELECT source, d.decile, min(n_chars) AS src_val
            FROM scum, (SELECT unnest(range(1, 10)) AS decile) d
            WHERE cum >= (d.decile * tot + 9) // 10
            GROUP BY source, d.decile
        ),
        gl AS (
            SELECT n_chars, count(*) AS cnt FROM documents GROUP BY n_chars
        ),
        gcum AS (
            SELECT n_chars,
                   sum(cnt) OVER (
                       ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   sum(cnt) OVER () AS tot
            FROM gl
        ),
        glob_q AS (
            SELECT d.decile, min(n_chars) AS glob_val
            FROM gcum, (SELECT unnest(range(1, 10)) AS decile) d
            WHERE cum >= (d.decile * tot + 9) // 10
            GROUP BY d.decile
        )
        SELECT s.source, CAST(s.decile AS INT) AS decile,
               CAST(s.src_val AS BIGINT) AS src_val,
               CAST(g.glob_val AS BIGINT) AS glob_val,
               CAST(s.src_val - g.glob_val AS BIGINT) AS shift
        FROM src_q s JOIN glob_q g ON s.decile = g.decile
    """,
    category="llm-pipeline",
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization diagnostic — per-source decile boundaries
    of document length against the global distribution's (the mapping
    a quantile-normalizing data mixer applies, and the drift readout
    when sources' length profiles diverge). Type-1 exact quantiles:
    smallest value whose cumulative count reaches ⌈d·n/10⌉.

    Everything is integer-exact. Scale: quantiles come from cumsums
    over the (source × distinct-length) AGGREGATE — the window input
    is bounded by the length domain, never document grain (the
    q_length_percentile_gate discipline); the decile probe is a 9-way
    explode of that bounded table; the global side joins as a 9-row
    broadcast."""
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    deciles = F.explode(F.array(*[F.lit(i) for i in range(1, 10)])).alias("decile")

    sl = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scum = sl.select(
        "source",
        "n_chars",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("source")).alias("tot"),
    )
    src_q = (
        scum.select("source", "n_chars", "cum", "tot", deciles)
        .filter(F.col("cum") >= F.expr("(decile * tot + 9) div 10"))
        .groupBy("source", "decile")
        .agg(F.min("n_chars").alias("src_val"))
    )

    gl = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    w_g = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    w_gt = Window.partitionBy()
    gcum = gl.select(
        "n_chars",
        F.sum("cnt").over(w_g).alias("cum"),
        F.sum("cnt").over(w_gt).alias("tot"),
    )
    glob_q = (
        gcum.select("n_chars", "cum", "tot", deciles)
        .filter(F.col("cum") >= F.expr("(decile * tot + 9) div 10"))
        .groupBy("decile")
        .agg(F.min("n_chars").alias("glob_val"))
    )

    return (
        src_q.join(F.broadcast(glob_q), "decile")
        .select(
            "source",
            F.col("decile").cast("int").alias("decile"),
            F.col("src_val").cast("bigint").alias("src_val"),
            F.col("glob_val").cast("bigint").alias("glob_val"),
            (F.col("src_val") - F.col("glob_val")).cast("bigint").alias("shift"),
        )
    )


# ---------------------------------------------------------------------------
# Bollinger-band breaches


@register(
    "q_bollinger_breach",
    oracle="""
        WITH day AS (
            SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
                   round(sum(o_totalprice), 2) AS rev
            FROM orders GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
        ),
        banded AS (
            SELECT prio, d, rev,
                   count(*) OVER w AS n,
                   sum(rev) OVER w AS s,
                   sum(rev * rev) OVER w AS ss
            FROM day
            WINDOW w AS (PARTITION BY prio ORDER BY d
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT prio,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CASE WHEN n = 7 AND rev > s / n
                        + 2 * sqrt(greatest(ss / n - (s / n) * (s / n), 0))
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_hi,
               CAST(sum(CASE WHEN n = 7 AND rev < s / n
                        - 2 * sqrt(greatest(ss / n - (s / n) * (s / n), 0))
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_lo
        FROM banded GROUP BY prio
    """,
    category="analytics",
)
def q_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breach counts: daily revenue per order priority
    against a trailing 7-day mean ± 2σ band (full windows only) — the
    rolling volatility-envelope alarm behind metric monitoring.

    The band's mean/σ come from explicit Σ/Σ² window sums (not a
    stddev aggregate — bias conventions differ across engines) over
    day-grain revenue ROUNDED to cents first, so both engines band the
    same series. Scale: the window runs over the (priority × day)
    aggregate — calendar-bounded — with a bounded 7-row frame."""
    day = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = Window.partitionBy("prio").orderBy("d").rowsBetween(-6, 0)
    banded = day.select(
        "prio",
        "rev",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("rev").over(w).alias("s"),
        F.sum(F.col("rev") * F.col("rev")).over(w).alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    sd = F.sqrt(F.greatest(F.col("ss") / F.col("n") - mean * mean, F.lit(0.0)))
    full = F.col("n") == 7
    return banded.groupBy("prio").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.when(full & (F.col("rev") > mean + 2 * sd), 1).otherwise(0))
        .cast("bigint")
        .alias("n_breach_hi"),
        F.sum(F.when(full & (F.col("rev") < mean - 2 * sd), 1).otherwise(0))
        .cast("bigint")
        .alias("n_breach_lo"),
    )


# ---------------------------------------------------------------------------
# rendezvous (highest-random-weight) sharding


@register(
    "q_rendezvous_shards",
    oracle="""
        WITH h AS (
            SELECT doc_id,
                   list_transform(range(0, 9),
                       s -> ((CAST(doc_id AS HUGEINT) + s * 1000003)
                             * 2654435761) % 4294967296) AS hs
            FROM documents
        ),
        assigned AS (
            SELECT doc_id,
                   list_position(hs[1:8], list_max(hs[1:8])) - 1 AS shard8,
                   list_position(hs, list_max(hs)) - 1 AS shard9
            FROM h
        )
        SELECT CAST(shard8 AS INT) AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_moved,
               round(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 4) AS moved_frac
        FROM assigned GROUP BY shard8
    """,
    category="llm-pipeline",
)
def q_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding — the consistent
    assignment every distributed store wants: each doc goes to the
    shard maximizing a portable per-(doc, shard) hash. Growing the
    ring 8 → 9 shards moves EXACTLY the docs whose new max is the new
    shard (HRW's minimal-disruption property, ~1/9 of each shard);
    report per-shard sizes and the observed churn.

    Row-local integer codegen (array of 9 hashes, argmax via
    array_position of array_max — first match breaks ties identically
    in both engines), one combinable groupBy. Nothing shuffles but the
    8-row rollup."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    hs = F.array(
        *[
            ((F.col("doc_id") + F.lit(s * 1000003)) * F.lit(_K)) % F.lit(_M32)
            for s in range(9)
        ]
    ).alias("hs")
    assigned = d.select("doc_id", hs).selectExpr(
        "doc_id",
        "array_position(slice(hs, 1, 8), array_max(slice(hs, 1, 8))) - 1 AS shard8",
        "array_position(hs, array_max(hs)) - 1 AS shard9",
    )
    moved = F.when(F.col("shard9") != F.col("shard8"), 1).otherwise(0)
    return assigned.groupBy(F.col("shard8").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(moved).cast("bigint").alias("n_moved"),
        F.round(F.sum(moved) * F.lit(1.0) / F.count(F.lit(1)), 4).alias("moved_frac"),
    )
