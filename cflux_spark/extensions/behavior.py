"""Behavioral / product analytics over event streams (round 12).

ClickHouse-style parametric aggregates — ``windowFunnel``,
``retention``, ``sequenceCount`` — re-expressed as pure Spark window
functions. The reference (`cflux.js:687-833` SELECT passthrough)
delegates analytics SQL to a ClickHouse backend where these
aggregates are built in; here the same semantics are native
DataFrame plans with one hash-partition per user and zero Python in
the hot path.

Determinism contract (the oracle gate): every per-event computation
is a window expression over the total order (ts, event_id) — both
engines sort identically (timestamps are exact integer microseconds,
event_id breaks ties) — and every emitted number is either an exact
integer or one correctly-rounded division of exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """ClickHouse ``windowFunnel``-style conversion levels: a user
    reaches level k iff events e1 < e2 < ... < ek exist (strict
    (ts, tiebreak) order) matching steps 1..k with
    ts(ek) − ts(e1) ≤ window.

    Algorithm: per-event dynamic programming over ONE sorted window
    per user. Carrying the MAXIMUM chain-start timestamp is the
    exact DP — the only constraint is one-sided
    (ts_k − t1 ≤ window ⟺ t1 ≥ ts_k − window), so the latest valid
    start dominates every earlier one; intermediate pruning is safe
    because the budget only shrinks as ts grows:

        c_1(e)  = ts(e)                      if e matches step 1
        b_i(e)  = max c_i over events STRICTLY before e (same user)
        c_i(e)  = b_{i-1}(e)                 if e matches step i and
                                             ts(e) ≤ b_{i-1}(e) + window
        level(u) = Σ_i [∃e: c_i(e) not null]   (monotone in i)

    Scale shape: one shuffle on user_col; all k DP columns share one
    WindowSpec, so Catalyst plans a single Window exec followed by a
    user-keyed aggregate — O(k) state per row, never a self-join,
    never a per-user collect. Output: (user_id, level) for every
    user present, level ∈ [0, len(steps)].
    """
    w = Window.partitionBy("user_id").orderBy("_ts", "_tb")
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    win = F.expr(f"INTERVAL {window}")

    df = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(type_col).alias("_et"),
    )
    chain = F.when(F.col("_et") == F.lit(steps[0]), F.col("_ts"))
    df = df.withColumn("_c1", chain)
    for i in range(2, len(steps) + 1):
        df = df.withColumn(f"_b{i - 1}", F.max(f"_c{i - 1}").over(prior))
        df = df.withColumn(
            f"_c{i}",
            F.when(
                (F.col("_et") == F.lit(steps[i - 1]))
                & (F.col("_ts") <= F.col(f"_b{i - 1}") + win),
                F.col(f"_b{i - 1}"),
            ),
        )
    level = sum(
        F.max(F.col(f"_c{i}").isNotNull().cast("int")) for i in range(1, len(steps) + 1)
    )
    return df.groupBy("user_id").agg(level.cast("int").alias("level"))


def funnel_conversion(
    events: DataFrame, steps: list[str], window: str = "1 hour", **kw
) -> DataFrame:
    """Aggregate funnel report on top of :func:`window_funnel`:
    for each level 1..k, how many users reached AT LEAST that level
    and the conversion share of the level-eligible population.
    share = exact-integer count ratio, one correctly-rounded
    division (round 6). Output: (level, n_reached, n_users, share)."""
    levels = window_funnel(events, steps, window, **kw)
    per_level = levels.groupBy("level").agg(F.count("*").alias("_n"))
    k = len(steps)
    ladder = per_level.crossJoin(
        F.broadcast(
            levels.sparkSession.range(1, k + 1).select(
                F.col("id").cast("int").alias("level_at")
            )
        )
    ).where(F.col("level") >= F.col("level_at"))
    total = per_level.agg(F.sum("_n").alias("n_users"))  # 1-row broadcast, no collect
    return (
        ladder.groupBy(F.col("level_at").alias("level"))
        .agg(F.sum("_n").alias("n_reached"))
        .crossJoin(F.broadcast(total))
        .select(
            "level",
            "n_reached",
            "n_users",
            F.round(F.col("n_reached") / F.col("n_users").cast("double"), 6).alias(
                "share"
            ),
        )
    )


def cohort_retention(
    events: DataFrame,
    origin: str = "2024-01-01",
    granularity_days: int = 1,
    cohort_type: str | None = None,
    activity_type: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention (the ClickHouse ``retention`` aggregate
    generalized to a full cohort matrix): cohort = the
    `granularity_days`-day block (from `origin`) of a user's first
    `cohort_type` event (any type if None — users without one are
    excluded); for each (cohort, offset ≥ 0) the count of cohort
    users with an `activity_type` event offset blocks later and
    their share of the cohort.

    Block index = floor(datediff(day, origin, ts) / granularity) —
    pure integer arithmetic, identical in both engines (no
    locale-dependent week-truncation). retention = exact-count
    ratio, one correctly-rounded division (round 6).

    Scale shape: user-keyed min-aggregate (map-side combine) joined
    back on user (user-cardinality side — AQE picks broadcast when
    it fits), then a (cohort, offset) count-distinct. Output rows
    are bounded by (#blocks)² regardless of corpus size. Output:
    (cohort_block, offset, n_active, cohort_size, retention)."""
    blk = (
        F.datediff(F.col(ts_col).cast("date"), F.lit(origin).cast("date"))
        / F.lit(granularity_days)
    ).cast("int")
    ev = events.select(
        F.col(user_col).alias("user_id"), blk.alias("blk"), F.col(type_col).alias("_et")
    )
    coh = ev if cohort_type is None else ev.where(F.col("_et") == F.lit(cohort_type))
    first = coh.groupBy("user_id").agg(F.min("blk").alias("cohort_block"))
    sizes = first.groupBy("cohort_block").agg(F.count("*").alias("cohort_size"))
    act = ev if activity_type is None else ev.where(F.col("_et") == F.lit(activity_type))
    return (
        act.join(first, "user_id")
        .where(F.col("blk") >= F.col("cohort_block"))
        .groupBy("cohort_block", (F.col("blk") - F.col("cohort_block")).alias("offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
        .join(sizes, "cohort_block")
        .select(
            "cohort_block",
            "offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size").cast("double"), 6).alias(
                "retention"
            ),
        )
    )


def sequence_count(
    events: DataFrame,
    first: str,
    then: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user count of DISJOINT ordered `first` → `then` pairs
    (ClickHouse ``sequenceCount`` with non-overlap semantics) —
    greedy matching, closed-form via the bracket-matching identity:
    with a_t/b_t = running counts of A/B events in (ts, tiebreak)
    order, the number of unmatched B events is max_t(b_t − a_t)
    clamped at 0, so

        pairs(u) = b_total − greatest(0, max_t(b_t − a_t))

    (an unmatched B is one that arrives when every prior A is
    already consumed — exactly a prefix where closers outnumber
    openers). Pure running-sum + max window expressions, exact
    integers end to end.

    Scale shape: one shuffle on user_col, one Window exec, one
    user-keyed aggregate. Output: (user_id, n_first, n_then, pairs)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("_ts", "_tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_a = (F.col(type_col) == F.lit(first)).cast("long")
    is_b = (F.col(type_col) == F.lit(then)).cast("long")
    df = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        is_a.alias("_a"),
        is_b.alias("_b"),
    ).select(
        "user_id",
        "_a",
        "_b",
        (F.sum("_b").over(w) - F.sum("_a").over(w)).alias("_d"),
    )
    return df.groupBy("user_id").agg(
        F.sum("_a").alias("n_first"),
        F.sum("_b").alias("n_then"),
        (
            F.sum("_b") - F.greatest(F.lit(0).cast("long"), F.max("_d"))
        ).alias("pairs"),
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — P(next event type | current event type), the
    behavioral fingerprint a product-analytics store derives for
    journey modeling and bot detection (a scripted client's rows
    concentrate on one transition).

    Exact integers: successor pairs come from one lead() window per
    user (sequence boundaries contribute no pair), the matrix is a
    (cur, nxt) count aggregate, and prob = pair count / row total of
    cur — one correctly-rounded division. Output rows are bounded by
    (#event types)², independent of corpus size. Output:
    (cur, nxt, n, prob)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(type_col).alias("cur"),
            F.lead(type_col).over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("_t"))
    return pairs.join(tot, "cur").select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n").cast("double") / F.col("_t"), round_to).alias("prob"),
    )


def interarrival_quartiles(
    events: DataFrame,
    by: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-group inter-arrival-time quartiles (seconds) over
    per-user event streams — the latency/cadence profile behind
    deadman thresholds and sessionization gaps.

    Gaps are exact integer MICROSECONDS from one lag() window per
    (group, user); quartiles use continuous interpolation over those
    integers, so every interpolated value is a dyadic rational —
    an exact double in both engines (the X49 robust-scale parity
    tier) — and the µs→s conversion is one correctly-rounded
    division. Output: (by, n_gaps, p25_s, p50_s, p75_s)."""
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(by, user_col).orderBy("_us", tiebreak_col)
    gaps = (
        events.select(F.col(by), F.col(user_col), us.alias("_us"), F.col(tiebreak_col))
        .withColumn("_gap", F.col("_us") - F.lag("_us").over(w))
        .where(F.col("_gap").isNotNull())
    )
    g = gaps.groupBy(by).agg(
        F.count("*").alias("n_gaps"),
        F.percentile(F.col("_gap").cast("double"), F.lit(0.25)).alias("_q1"),
        F.percentile(F.col("_gap").cast("double"), F.lit(0.5)).alias("_q2"),
        F.percentile(F.col("_gap").cast("double"), F.lit(0.75)).alias("_q3"),
    )
    return g.select(
        by,
        "n_gaps",
        F.round(F.col("_q1") / 1000000.0, round_to).alias("p25_s"),
        F.round(F.col("_q2") / 1000000.0, round_to).alias("p50_s"),
        F.round(F.col("_q3") / 1000000.0, round_to).alias("p75_s"),
    )


def last_touch_attribution(
    events: DataFrame,
    conversion: str = "purchase",
    touches: tuple = ("view", "click"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """Last-touch conversion attribution: for every `conversion`
    event, credit the MOST RECENT strictly-earlier touch event
    (one of `touches`) in the same user's stream — 'direct' when no
    touch precedes it. The marketing-analytics primitive every
    event store ships.

    One last_value(ignorenulls) window over the strict-prior frame
    per user — the as-of join collapsed into the sequence sort; all
    integers + one share division. Output: (touch, n_conversions,
    share)."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col).isin(*touches), F.col(type_col))
    attributed = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(type_col).alias("_et"),
            F.last(touch, ignorenulls=True).over(w).alias("_touch"),
        )
        .where(F.col("_et") == F.lit(conversion))
        .select(F.coalesce(F.col("_touch"), F.lit("direct")).alias("touch"))
    )
    g = attributed.groupBy("touch").agg(F.count("*").alias("n_conversions"))
    tot = g.agg(F.sum("n_conversions").alias("_t"))
    return g.crossJoin(F.broadcast(tot)).select(
        "touch",
        "n_conversions",
        F.round(F.col("n_conversions").cast("double") / F.col("_t"), round_to).alias(
            "share"
        ),
    )
