"""Property-based tests for the STATEFUL operator families (r13
verdict task 3): the as-of join variants (forward / tolerance /
nearest), lag+cumsum sessionization, and the SCD2 / temporal-join
interval contract. Each test mirrors the registered query's core
algorithm on fuzzed timelines — integer timestamps stand in for the
timestamp columns; the union-timeline + window shape, frame bounds,
and (ts, kind, key) tie discipline are EXACTLY the registered
query's — and compares against the obvious quadratic Python oracle.
The fixture queries cover one deterministic dataset; these pin the
semantics on ANY timeline: timestamp ties between left and right
rows, ties within a side, users present on only one side, zero-length
SCD2 periods from duplicate change timestamps."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# two event streams on a shared (user, t) plane; row key = list index
two_streams = st.tuples(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=0, max_size=25),
)


def _timeline(spark, left, right):
    """Union timeline mirroring q_join_asof*: left rows (kind 1) carry
    event_id, right rows (kind 0) carry o_key; kind 0 sorts first at
    equal t so right-side rows are <=-visible backward and >-only
    forward — the exact tie discipline of joins.py:213 /
    round5.py:1112 / round6.py:185 / round7.py:1141."""
    ev = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(left)], "event_id long, user_id long, t long"
    )
    od = (
        spark.createDataFrame(
            [(k, u, t) for k, (u, t) in enumerate(right)],
            "o_key long, user_id long, t long",
        )
        if right
        else spark.createDataFrame([], "o_key long, user_id long, t long")
    )
    l = ev.select(
        "user_id", F.col("t").alias("_t"), F.lit(1).alias("_kind"), "event_id",
        F.lit(None).cast("long").alias("o_key"),
    )
    r = od.select(
        "user_id", F.col("t").alias("_t"), F.lit(0).alias("_kind"),
        F.lit(None).cast("long").alias("event_id"), "o_key",
    )
    return l.unionByName(r).repartition(4)


@_settings
@given(data=two_streams)
def test_asof_forward_matches_naive(spark, data):
    """FORWARD as-of (q_join_asof_forward's union + first-FOLLOWING
    algorithm): per left event, the right row with min (t, key) among
    t STRICTLY greater — an equal-timestamp right row sorts before the
    event (kind 0 < 1) and must NOT match."""
    events, orders = data
    tl = _timeline(spark, events, orders)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_t").asc(), F.col("_kind").asc(), F.col("o_key").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    got = {
        (r.event_id, r.o_key)
        for r in tl.withColumn("_nxt", F.first("o_key", ignorenulls=True).over(w))
        .filter((F.col("_kind") == 1) & F.col("_nxt").isNotNull())
        .select("event_id", F.col("_nxt").alias("o_key"))
        .collect()
    }
    want = set()
    for i, (u, t) in enumerate(events):
        cands = [(ot, k) for k, (ou, ot) in enumerate(orders) if ou == u and ot > t]
        if cands:
            want.add((i, min(cands)[1]))
    assert got == want


@_settings
@given(data=two_streams, tol=st.sampled_from([0, 3, 7]))
def test_asof_tolerance_matches_naive(spark, data, tol):
    """As-of WITH TOLERANCE (q_join_asof_tolerance's running-last +
    post-match gap predicate): the latest at-or-before match is kept
    only when its gap <= tol, else NULL — and filtering the single
    best match must equal bounding the whole search (if the latest
    prior row is stale, every earlier one is too). LEFT semantics:
    every left event emits exactly one row."""
    events, orders = data
    tl = _timeline(spark, events, orders)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_t").asc(), F.col("_kind").asc(), F.col("o_key").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        tl.withColumn("_vid", F.last("o_key", ignorenulls=True).over(w))
        .withColumn(
            "_vts",
            F.last(F.when(F.col("_kind") == 0, F.col("_t")), ignorenulls=True).over(w),
        )
        .filter(F.col("_kind") == 1)
    )
    gap = F.col("_t") - F.col("_vts")
    in_tol = F.col("_vid").isNotNull() & (gap <= tol)
    rows = matched.select(
        "event_id",
        F.when(in_tol, F.col("_vid")).alias("o_key"),
        F.when(in_tol, gap).alias("gap"),
    ).collect()
    assert {r.event_id for r in rows} == set(range(len(events)))
    got = {(r.event_id, r.o_key, r.gap) for r in rows}
    want = set()
    for i, (u, t) in enumerate(events):
        cands = [(ot, k) for k, (ou, ot) in enumerate(orders) if ou == u and ot <= t]
        if cands and t - max(cands)[0] <= tol:
            ot, k = max(cands)
            want.add((i, k, t - ot))
        else:
            want.add((i, None, None))
    assert got == want


@_settings
@given(data=two_streams)
def test_asof_nearest_matches_naive(spark, data):
    """NEAREST as-of (q_join_asof_nearest's twin frames over ONE
    sort): latest at-or-before vs earliest strictly-after, prior
    winning distance ties; events with no match on either side drop
    out. Both directions must come off the same (t, kind, key) order:
    backward keeps last (max key at tie t), forward keeps first
    (min key at earliest later t)."""
    events, orders = data
    tl = _timeline(spark, events, orders)
    base = Window.partitionBy("user_id").orderBy(
        F.col("_t").asc(), F.col("_kind").asc(), F.col("o_key").asc()
    )
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out = (
        tl.withColumn("_pk", F.last("o_key", ignorenulls=True).over(w_back))
        .withColumn(
            "_pd",
            F.last(F.when(F.col("_kind") == 0, F.col("_t")), ignorenulls=True).over(w_back),
        )
        .withColumn("_nk", F.first("o_key", ignorenulls=True).over(w_fwd))
        .withColumn(
            "_nd",
            F.first(F.when(F.col("_kind") == 0, F.col("_t")), ignorenulls=True).over(w_fwd),
        )
        .filter(F.col("_kind") == 1)
        .filter(F.col("_pk").isNotNull() | F.col("_nk").isNotNull())
    )
    prior_wins = F.col("_pk").isNotNull() & (
        F.col("_nk").isNull()
        | ((F.col("_t") - F.col("_pd")) <= (F.col("_nd") - F.col("_t")))
    )
    got = {
        (r.event_id, r.o_key, r.direction)
        for r in out.select(
            "event_id",
            F.when(prior_wins, F.col("_pk")).otherwise(F.col("_nk")).alias("o_key"),
            F.when(prior_wins, F.lit("prior")).otherwise(F.lit("next")).alias("direction"),
        ).collect()
    }
    want = set()
    for i, (u, t) in enumerate(events):
        prior = [(ot, k) for k, (ou, ot) in enumerate(orders) if ou == u and ot <= t]
        nxt = [(ot, k) for k, (ou, ot) in enumerate(orders) if ou == u and ot > t]
        if not prior and not nxt:
            continue
        if prior and (not nxt or t - max(prior)[0] <= min(nxt)[0] - t):
            want.add((i, max(prior)[1], "prior"))
        else:
            want.add((i, min(nxt)[1], "next"))
    assert got == want


session_events = st.lists(
    st.tuples(
        st.integers(0, 3),  # user
        st.integers(0, 30),  # t
        st.integers(-5, 5),  # value
    ),
    min_size=1,
    max_size=30,
)


@_settings
@given(events=session_events, gap=st.sampled_from([1, 5]))
def test_sessionization_lag_cumsum_matches_naive(spark, events, gap):
    """The lag+cumsum sessionization contract (q_win_session's exact
    rewrite, integer clock): a row opens a new session iff it has no
    predecessor or its gap to the (ts, id)-previous row exceeds the
    threshold; session_id is the running count of openers; rollups
    follow. Must agree with the single-pass Python oracle on ANY
    timeline — duplicate timestamps (gap 0 stays in-session, tie order
    by event_id), gap == threshold staying IN-session (strict >),
    single-event users."""
    df = spark.createDataFrame(
        [(i, u, t, v) for i, (u, t, v) in enumerate(events)],
        "event_id long, user_id long, t long, v long",
    ).repartition(4)
    w = Window.partitionBy("user_id").orderBy(F.col("t").asc(), F.col("event_id").asc())
    g = F.col("t") - F.lag("t").over(w)
    new_session = F.when(g.isNull() | (g > gap), F.lit(1)).otherwise(F.lit(0))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = {
        (r.user_id, r.session_id, r.n_events, r.session_start, r.session_end, r.total_v)
        for r in df.withColumn("ns", new_session)
        .withColumn("session_id", F.sum("ns").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("t").alias("session_start"),
            F.max("t").alias("session_end"),
            F.sum("v").alias("total_v"),
        )
        .collect()
    }
    by_user: dict[int, list[tuple[int, int, int]]] = {}
    for i, (u, t, v) in enumerate(events):
        by_user.setdefault(u, []).append((t, i, v))
    want = set()
    for u, rows in by_user.items():
        rows.sort()
        sid, prev_t = 0, None
        sessions: dict[int, list[tuple[int, int]]] = {}
        for t, _i, v in rows:
            if prev_t is None or t - prev_t > gap:
                sid += 1
            sessions.setdefault(sid, []).append((t, v))
            prev_t = t
        for s, evs in sessions.items():
            ts = [t for t, _ in evs]
            want.add((u, s, len(evs), min(ts), max(ts), sum(v for _, v in evs)))
    assert got == want


changes = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 15)),  # (user, t)
    min_size=1,
    max_size=20,
)


@_settings
@given(rows=changes)
def test_scd2_periods_partition_timeline(spark, rows):
    """SCD2 period construction (q_scd2_periods' lead rewrite) on ANY
    change stream: per user the periods must (a) reproduce the naive
    consecutive-pairs build exactly — including ZERO-LENGTH periods
    from duplicate change timestamps, ordered by (ts, id) — and
    (b) satisfy the interval invariants: one period per change row,
    each valid_to equal to the next valid_from, exactly one open
    (is_current) period per user, valid_from nondecreasing."""
    df = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, t long",
    ).repartition(4)
    w = Window.partitionBy("user_id").orderBy(F.col("t").asc(), F.col("event_id").asc())
    nxt = F.lead("t").over(w)
    got_rows = df.select(
        "user_id",
        "event_id",
        F.col("t").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ).collect()
    got = {(r.user_id, r.event_id, r.valid_from, r.valid_to, r.is_current) for r in got_rows}

    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, t) in enumerate(rows):
        by_user.setdefault(u, []).append((t, i))
    want = set()
    for u, evs in by_user.items():
        evs.sort()
        for j, (t, i) in enumerate(evs):
            nxt_t = evs[j + 1][0] if j + 1 < len(evs) else None
            want.add((u, i, t, nxt_t, nxt_t is None))
    assert got == want

    # interval invariants, stated independently of the oracle
    per_user: dict[int, list] = {}
    for r in got_rows:
        per_user.setdefault(r.user_id, []).append(r)
    assert sum(len(v) for v in per_user.values()) == len(rows)
    for u, periods in per_user.items():
        periods.sort(key=lambda r: (r.valid_from, r.event_id))
        assert sum(1 for p in periods if p.is_current) == 1
        assert periods[-1].is_current and periods[-1].valid_to is None
        for a, b in zip(periods, periods[1:]):
            assert a.valid_to == b.valid_from  # contiguous, no gaps/overlaps


temporal_data = st.tuples(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 15)), min_size=1, max_size=15),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 15)), min_size=1, max_size=15),
)


@_settings
@given(data=temporal_data)
def test_temporal_join_exactly_one_period_per_fact(spark, data):
    """Point-in-time join (q_temporal_join's equi-join + residual
    interval filter) on ANY change/fact streams: a fact at ts >= the
    user's first valid_from matches EXACTLY one period (periods
    partition the timeline — the no-row-blowup contract the query's
    docstring claims); a fact before the first period, or for a user
    with no periods, matches ZERO. Match identity equals the naive
    scan, with zero-length periods matching nothing."""
    dims, facts = data
    ddf = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(dims)],
        "dim_id long, user_id long, t long",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("t").asc(), F.col("dim_id").asc())
    dim = ddf.select(
        "user_id",
        "dim_id",
        F.col("t").alias("valid_from"),
        F.lead("t").over(w).alias("valid_to"),
    )
    fdf = spark.createDataFrame(
        [(j, u, t) for j, (u, t) in enumerate(facts)],
        "fact_id long, user_id long, ft long",
    ).repartition(4)
    got_rows = (
        fdf.join(dim, "user_id")
        .filter(
            (F.col("ft") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ft") < F.col("valid_to")))
        )
        .select("fact_id", "dim_id")
        .collect()
    )
    got = {(r.fact_id, r.dim_id) for r in got_rows}
    # exactly-one: no fact_id may match two periods
    assert len(got) == len(got_rows)
    fact_ids = [r.fact_id for r in got_rows]
    assert len(set(fact_ids)) == len(fact_ids), "a fact matched multiple periods"

    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, t) in enumerate(dims):
        by_user.setdefault(u, []).append((t, i))
    want = set()
    for j, (u, t) in enumerate(facts):
        evs = sorted(by_user.get(u, []))
        for k, (dt, di) in enumerate(evs):
            upper = evs[k + 1][0] if k + 1 < len(evs) else None
            if t >= dt and (upper is None or t < upper):
                want.add((j, di))
    assert got == want
    # coverage: every fact at/after its user's first change matched
    for j, (u, t) in enumerate(facts):
        evs = by_user.get(u)
        if evs and t >= min(evs)[0]:
            assert j in {f for f, _ in got}
        else:
            assert j not in {f for f, _ in got}


intervals = st.lists(
    st.tuples(st.integers(0, 400), st.integers(0, 100)),  # (start, length)
    min_size=1,
    max_size=20,
)


@_settings
@given(ivs=intervals, wins=st.lists(st.integers(0, 4), min_size=1, max_size=3))
def test_interval_bucket_rewrite_matches_theta_join(spark, ivs, wins):
    """q_interval_overlap_join's claim: exploding each interval into
    the day buckets it covers and equi-joining on the bucket is
    LOSSLESS vs the naive theta join (a.start < w_end AND a.end >=
    w_start), with identical exact overlaps — including zero-length
    intervals, boundary touches (end == window start), and intervals
    spanning multiple windows. Here 'days' are 100-unit buckets."""
    B = 100  # bucket width
    iv = [(i, s, s + ln) for i, (s, ln) in enumerate(ivs)]
    wset = sorted(set(wins))
    df = spark.createDataFrame(iv, "id long, ss long, se long")
    w = spark.createDataFrame([(d,) for d in wset], "day long")
    cov = df.withColumn(
        "day",
        F.explode(
            F.sequence(F.floor(F.col("ss") / B), F.floor(F.col("se") / B))
        ),
    )
    ov = F.least(F.col("se"), (F.col("day") + 1) * B) - F.greatest(
        F.col("ss"), F.col("day") * B
    )
    got = {
        (r.id, r.day, r.ov)
        for r in cov.join(F.broadcast(w), "day").select("id", "day", ov.alias("ov")).collect()
    }
    want = set()
    for i, s, e in iv:
        for d in wset:
            lo, hi = d * B, (d + 1) * B
            if s < hi and e >= lo:
                want.add((i, d, min(e, hi) - max(s, lo)))
    assert got == want


cap_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (user, t)
    min_size=1,
    max_size=40,
)


@given(events=cap_events, gap=st.sampled_from([3, 10]))
@settings(max_examples=40, deadline=None)
def test_gap_cap_walk_matches_naive(events, gap):
    """q_session_cap's REGISTERED pandas state machine == the obvious
    Python loop on ANY timeline (no Spark needed — the walk is a pure
    per-group function). Timestamps are scaled so the fn's fixed
    30-min gap / 2-h cap constants bind at integer thresholds (gap=g,
    cap=4g in test units — exact: K·(t−p) > K·g ⟺ t−p > g). Covers
    duplicate timestamps, gap exactly at threshold (stays in-session),
    cap boundary (t − anchor == cap stays; beyond splits), and cap
    splits inside dense runs where the gap rule never fires."""
    import pandas as pd

    from builder_spark.queries.round14 import _capped_sessions_fn

    cap = 4 * gap  # the fn's fixed 1_800/7_200 ratio
    k = 1_800_000_000 // gap
    by_user: dict[int, list[int]] = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        pdf = pd.DataFrame(
            {
                "user_id": [u] * len(ts),
                "ts_us": [t * k for t in ts],
                "event_id": list(range(len(ts))),
            }
        )
        out = _capped_sessions_fn(pdf)
        rows = [
            (int(r.user_id), int(r.session_id), int(r.n_events),
             int(r.start_us) // k, int(r.end_us) // k)
            for r in out.itertuples()
        ]
        # naive oracle: session boundaries by definition — anchor =
        # first event of the session, scanning sorted order
        naive = []
        cur: list[int] = []
        nsid = 0
        for t in sorted(ts):
            if cur and (t - cur[-1] > gap or t - cur[0] > cap):
                nsid += 1
                naive.append((u, nsid, len(cur), cur[0], cur[-1]))
                cur = [t]
            elif not cur:
                cur = [t]
            else:
                cur.append(t)
        nsid += 1
        naive.append((u, nsid, len(cur), cur[0], cur[-1]))
        assert sorted(rows) == sorted(naive)
        # and every emitted session obeys the contract
        for _u, _sid, n, fst, lst in rows:
            assert lst - fst <= cap
            assert n >= 1


merge_rows = st.lists(
    st.tuples(
        st.integers(0, 3),   # user
        st.integers(0, 60),  # start
        st.integers(0, 15),  # length
    ),
    min_size=1,
    max_size=25,
)


@_settings
@given(rows=merge_rows)
def test_merge_intervals_sweep_matches_naive(spark, rows):
    """q_merge_intervals' sweep-line core (new group iff start exceeds
    the running max of ALL previous ends — not just the previous
    row's) must reproduce the naive merged-interval union on ANY
    interval set: nested intervals (a long one swallowing later short
    ones — the case a lag-based gap check gets wrong), exact-touch
    boundaries (end == next start merges), duplicates, per-user
    isolation."""
    iv = [(i, u, s, s + ln) for i, (u, s, ln) in enumerate(rows)]
    df = spark.createDataFrame(iv, "id long, user_id long, s long, e long").repartition(4)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        df.withColumn(
            "new_iv",
            F.when(F.max("e").over(w_prev) >= F.col("s"), 0).otherwise(1),
        )
        .withColumn("grp", F.sum("new_iv").over(w_run))
        .groupBy("user_id", "grp")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
    )
    got = sorted((r.user_id, r.ms, r.me) for r in merged.collect())
    # naive: sort per user, merge overlapping-or-touching
    by_user: dict[int, list[tuple[int, int]]] = {}
    for _i, u, s, e in iv:
        by_user.setdefault(u, []).append((s, e))
    want = []
    for u, ivs in by_user.items():
        ivs.sort()
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e = max(cur_e, e)
            else:
                want.append((u, cur_s, cur_e))
                cur_s, cur_e = s, e
        want.append((u, cur_s, cur_e))
    assert got == sorted(want)


@_settings
@given(keys=st.lists(st.integers(0, 60), min_size=1, max_size=30))
def test_islands_key_minus_rank_matches_naive(spark, keys):
    """q_sequence_islands' k − row_number trick over DISTINCT keys
    must produce exactly the maximal consecutive runs on ANY key set
    (the registered query feeds unique order keys; distinctness is
    part of the contract, so the fuzz dedups too)."""
    ks = sorted(set(keys))
    df = spark.createDataFrame([(k,) for k in ks], "k long").repartition(4)
    w = Window.orderBy("k")
    got = sorted(
        (r.island_start, r.island_end, r.island_len)
        for r in df.withColumn("rn", F.row_number().over(w))
        .select("k", (F.col("k") - F.col("rn")).alias("grp"))
        .groupBy("grp")
        .agg(
            F.min("k").alias("island_start"),
            F.max("k").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .collect()
    )
    want = []
    start = prev = ks[0]
    for k in ks[1:]:
        if k == prev + 1:
            prev = k
            continue
        want.append((start, prev, prev - start + 1))
        start = prev = k
    want.append((start, prev, prev - start + 1))
    assert got == sorted(want)


# --- calendar-recurrence family (r14 verdict task 5) ------------------------


def _ewma_linearized(xs, lam=0.25):
    """EXACT mirror of q_ewma_chart's power-weight linearization
    (round14.py): one sequential running sum of x_i/beta^i, then
    z_t = lam*beta^t*wsum_t + beta^t*mu — same float64 op order as the
    Spark ROWS UNBOUNDED PRECEDING window."""
    beta = 1.0 - lam
    mu = sum(xs) / len(xs)
    out, wsum = [], 0.0
    for t, x in enumerate(xs, start=1):
        wsum += x / beta**t
        out.append(lam * beta**t * wsum + beta**t * mu)
    return out


def _ewma_recurrence(xs, lam=0.25):
    """Definitional z_t = lam*x_t + (1-lam)*z_{t-1}, z_0 = mu."""
    mu = sum(xs) / len(xs)
    z, out = mu, []
    for x in xs:
        z = lam * x + (1.0 - lam) * z
        out.append(z)
    return out


@given(
    st.lists(
        st.floats(0.0, 1e8, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=400,
    )
)
@_settings
def test_ewma_linearization_matches_recurrence(xs):
    """q_ewma_chart's one-running-sum rewrite equals the definitional
    EWMA recurrence at the query's 4dp grain on ANY day series inside
    the double-range boundary (values fuzzed at cent scale)."""
    lin, rec = _ewma_linearized(xs), _ewma_recurrence(xs)
    for a, b in zip(lin, rec):
        assert abs(a - b) < 5e-5, (a, b)


def test_ewma_linearization_double_range_boundary():
    """Pin the REAL boundary of the linearization (r14 verdict task 5).

    x_i/beta^i overflows double at i > (ln DBL_MAX - ln max_x)/ln(1/beta)
    — ~2,403 days for cent-scale magnitudes (1e8), NOT the ~3,000 days
    round 14 documented (that figure ignored the x_i factor; corrected
    in SCALE.md/round14.py this round). The shard-per-year fallback is
    therefore required beyond ~2,400 days at this magnitude:
    - at 2,300 days the rewrite is exact at the 4dp grain (margin
      ~1e-8 absolute on 1e8-scale values);
    - by 2,450 days the linearized path goes non-finite while the
      recurrence stays finite — the rewrite CANNOT silently return
      wrong numbers past the boundary, it degrades loudly to inf/nan.
    """
    import math

    rnd = __import__("random").Random(7)
    xs = [rnd.uniform(0.0, 1e8) for _ in range(2450)]

    import sys

    t_overflow = (math.log(sys.float_info.max) - math.log(1e8)) / math.log(1.0 / 0.75)
    assert 2300 < t_overflow < 2450  # ~2403: inside the probed bracket

    lin, rec = _ewma_linearized(xs[:2300]), _ewma_recurrence(xs[:2300])
    assert all(math.isfinite(v) for v in lin)
    assert max(abs(a - b) for a, b in zip(lin, rec)) < 5e-5

    lin_past = _ewma_linearized(xs)
    rec_past = _ewma_recurrence(xs)
    assert all(math.isfinite(v) for v in rec_past)
    assert not all(math.isfinite(v) for v in lin_past)


@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=3,
        max_size=40,
    )
)
@_settings
def test_newey_west_banded_join_matches_naive_day_squared(spark, ys):
    """q_newey_west's HAC lag-product sum comes from a BANDED one-sided
    self-join (0 <= b.t - a.t <= 5, off-diagonal doubled) — this fuzz
    proves that join equals the naive two-sided day^2 Bartlett sum
    sum_{|i-j|<=L} (1-|d|/6) e_i e_j x_i x_j on ANY day table, i.e. the
    band is lossless and the 2x factor exactly replaces the mirrored
    pairs. Same join predicate and weight expressions as round14.py."""
    n = len(ys)
    ts = [float(i + 1) for i in range(n)]
    tbar = sum(ts) / n
    ybar = sum(ys) / n
    sxx = sum((t - tbar) ** 2 for t in ts)
    sxy = sum((t - tbar) * (y - ybar) for t, y in zip(ts, ys))
    slope = sxy / sxx if sxx != 0 else 0.0
    rows = [
        (t, t - tbar, (y - ybar) - slope * (t - tbar)) for t, y in zip(ts, ys)
    ]

    naive = 0.0
    for ti, xi, ei in rows:
        for tj, xj, ej in rows:
            d = abs(tj - ti)
            if d <= 5:
                naive += (1.0 - d / 6.0) * ei * ej * xi * xj

    r = spark.createDataFrame(rows, "t double, xt double, e double").repartition(4)
    a, b = r.alias("a"), r.alias("b")
    t_off = F.col("b.t") - F.col("a.t")
    s_hac = (
        a.join(b, (t_off >= 0) & (t_off <= 5))
        .agg(
            F.sum(
                (1.0 - t_off / 6.0)
                * F.when(t_off == 0, 1.0).otherwise(2.0)
                * F.col("a.e") * F.col("b.e") * F.col("a.xt") * F.col("b.xt")
            ).alias("s")
        )
        .collect()[0]["s"]
    )
    assert s_hac == __import__("pytest").approx(naive, rel=1e-9, abs=1e-6)
