"""Streaming pre-aggregation and stateful operators (SURVEY.md ST3+).

The reference accepts all rows regardless of timestamp and aggregates
only at query time (lambda style). These operators add the streaming-
native upgrades Spark makes available:

- ``windowed_rollup``: watermarked tumbling-window aggregation in
  update mode — late data within the watermark still lands in its
  window; beyond it, state is dropped (bounded memory at 100 TB/day
  stream rates, unlike query-time-only aggregation).
- ``stateful_series_diff``: per-series difference over an unbounded
  stream via ``applyInPandasWithState`` — the Kapacitor
  ``difference('counter')`` TICK task (docker/config/diffs.tick:8-9)
  as an in-engine stateful operator: state = last (ts, value) per
  series, O(#series) not O(#rows).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_rollup(
    facts: DataFrame,
    window_seconds: int = 60,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window mean/count/min/max per series.

    Output schema: keys..., window(start,end), mean, n, min_v, max_v.
    Attach with ``.writeStream.outputMode("update")``.
    """
    keys = keys or ["fingerprint"]
    return (
        facts.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.window(ts_col, f"{window_seconds} seconds"))
        .agg(
            F.avg(value_col).alias("mean"),
            F.count(value_col).alias("n"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )


_DIFF_OUTPUT = StructType(
    [
        StructField("series_key", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value", DoubleType(), True),
        StructField("diff", DoubleType(), True),
    ]
)
_DIFF_STATE = StructType(
    [StructField("last_ts_ns", LongType(), True), StructField("last_value", DoubleType(), True)]
)


def _diff_fn(key: Any, pdfs, state: GroupState):
    """Emit value - previous value per series, carrying the last
    observation across micro-batches in GroupState."""
    (series_key,) = key
    if state.exists:
        last_ts_ns, last_value = state.get
    else:
        last_ts_ns, last_value = None, None
    rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts_ns")
        for r in pdf.itertuples():
            diff = None if last_value is None else float(r.value) - last_value
            rows.append((series_key, r.ts, r.value, diff))
            last_ts_ns, last_value = int(r.ts_ns), float(r.value)
    state.update((last_ts_ns, last_value))
    yield pd.DataFrame(rows, columns=["series_key", "ts", "value", "diff"])


def stateful_series_diff(facts: DataFrame, key_col: str = "series_key") -> DataFrame:
    """Custom stateful streaming operator: per-series difference.

    `facts` must be a streaming DataFrame with columns
    (series_key string, ts timestamp, ts_ns long, value double).
    State per group is a single (last_ts_ns, last_value) pair.
    """
    return facts.groupBy(key_col).applyInPandasWithState(
        _diff_fn,
        outputStructType=_DIFF_OUTPUT,
        stateStructType=_DIFF_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------- TA (r7)

_EMA_OUTPUT = StructType(
    [
        StructField("series_key", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value", DoubleType(), True),
        StructField("ema", DoubleType(), True),
    ]
)
# (points seen, running ema) per series — the streaming twin of
# operators/ta.py's EMA with InfluxDB 'exponential' warmup
# (alpha_t = 2/(min(t, N)+1): the first point seeds, every point emits)
_EMA_STATE = StructType(
    [StructField("t", LongType(), True), StructField("ema", DoubleType(), True)]
)


def _make_ema_fn(n: int):
    def _ema_fn(key: Any, pdfs, state: GroupState):
        (series_key,) = key
        t, ema = state.get if state.exists else (0, None)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ns")
            for r in pdf.itertuples():
                t += 1
                alpha = 2.0 / (min(t, n) + 1.0)
                v = float(r.value)
                ema = v if ema is None else (1.0 - alpha) * ema + alpha * v
                rows.append((series_key, r.ts, r.value, ema))
        state.update((t, ema))
        yield pd.DataFrame(rows, columns=["series_key", "ts", "value", "ema"])

    return _ema_fn


_ALERT_OUTPUT = StructType(
    [
        StructField("series_key", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value", DoubleType(), True),
        StructField("level", StringType(), False),
        StructField("prev_level", StringType(), False),
    ]
)
_ALERT_STATE = StructType([StructField("level", StringType(), True)])

_LEVELS = ("ok", "warn", "crit")


def _make_alert_fn(crit: float, warn: float | None):
    def _level(v: float) -> str:
        if v >= crit:
            return "crit"
        if warn is not None and v >= warn:
            return "warn"
        return "ok"

    def _alert_fn(key: Any, pdfs, state: GroupState):
        (series_key,) = key
        (level,) = state.get if state.exists else ("ok",)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ns")
            for r in pdf.itertuples():
                if r.value is None or pd.isna(r.value):
                    continue  # string points carry no numeric value
                new = _level(float(r.value))
                if new != level:
                    rows.append((series_key, r.ts, r.value, new, level))
                    level = new
        state.update((level,))
        yield pd.DataFrame(
            rows, columns=["series_key", "ts", "value", "level", "prev_level"]
        )

    return _alert_fn


def stateful_alerts(
    facts: DataFrame,
    crit: float,
    warn: float | None = None,
    key_col: str = "series_key",
) -> DataFrame:
    """Kapacitor-style threshold alerting as an in-engine stateful
    operator (the reference ecosystem runs AlertNodes in an external
    Kapacitor fed by the subscription mirror — SURVEY ST5; this is the
    diffs.tick precedent applied to alerts): per series, classify each
    point as ok / warn / crit (``value >= crit`` → crit, else
    ``>= warn`` → warn) and emit a row ONLY on LEVEL TRANSITIONS —
    Kapacitor's default no-``.all()`` behavior, so a series pinned
    above the threshold alerts once, not per point.

    State per series is the last level alone (O(1)); a new series
    starts at ok, so a first point already in violation emits its
    ok→crit transition. In-order arrival per series is assumed within
    the stream (the ``stateful_series_diff`` contract); batch parity
    is pinned by tests/test_streaming_rollup.py against
    :func:`alert_transitions`."""
    if warn is not None and warn >= crit:
        raise ValueError(f"warn threshold must be < crit, got warn={warn} crit={crit}")
    return facts.groupBy(key_col).applyInPandasWithState(
        _make_alert_fn(float(crit), None if warn is None else float(warn)),
        outputStructType=_ALERT_OUTPUT,
        stateStructType=_ALERT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def alert_transitions(
    facts: DataFrame,
    crit: float,
    warn: float | None = None,
    key_col: str = "series_key",
) -> DataFrame:
    """Batch twin of :func:`stateful_alerts`: the same level
    transitions computed over a bounded frame with per-series windows
    (lag over time order, seeded at ok) — the parity oracle for the
    streaming operator, and the backfill path (re-deriving historical
    alert timelines from stored points)."""
    from pyspark.sql import Window as _W

    if warn is not None and warn >= crit:
        raise ValueError(f"warn threshold must be < crit, got warn={warn} crit={crit}")
    v = F.col("value")
    level = F.when(v >= crit, "crit")
    if warn is not None:
        level = level.when(v >= warn, "warn")
    level = level.otherwise("ok")
    w = _W.partitionBy(key_col).orderBy("ts_ns")
    out = (
        facts.filter(v.isNotNull())
        .withColumn("level", level)
        .withColumn("prev_level", F.coalesce(F.lag("level").over(w), F.lit("ok")))
        .filter(F.col("level") != F.col("prev_level"))
    )
    return out.select(key_col, "ts", "value", "level", "prev_level")


_RSI_OUTPUT = StructType(
    [
        StructField("series_key", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value", DoubleType(), True),
        StructField("rsi", DoubleType(), True),
    ]
)
# (points seen, last value, warmup gain/loss sums, Wilder averages):
# O(1) per series. The sums matter only until the seed at the n-th
# difference; afterwards the two averages ARE the whole recurrence
# state (operators/ta.py RSI — Wilder smoothing seeded with the
# first-n simple means).
_RSI_STATE = StructType(
    [
        StructField("t", LongType(), True),
        StructField("last", DoubleType(), True),
        StructField("sg", DoubleType(), True),
        StructField("sl", DoubleType(), True),
        StructField("ag", DoubleType(), True),
        StructField("al", DoubleType(), True),
    ]
)


def _make_rsi_fn(n: int):
    wa = (n - 1) / float(n)

    def _rsi_fn(key: Any, pdfs, state: GroupState):
        (series_key,) = key
        t, last, sg, sl, ag, al = (
            state.get if state.exists else (0, None, 0.0, 0.0, None, None)
        )
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ns")
            for r in pdf.itertuples():
                t += 1
                v = float(r.value)
                if last is not None:
                    d = v - last
                    g, lo = max(d, 0.0), max(-d, 0.0)
                    u = t - 1  # diff index, as in the batch operator
                    if u < n:
                        sg, sl = sg + g, sl + lo
                    elif u == n:
                        # seed: simple means of the first n gains/losses
                        ag, al = (sg + g) / n, (sl + lo) / n
                    else:
                        # Wilder recurrence, same fp shape as the batch
                        # scan (a*prev + b with b = g/n)
                        ag = wa * ag + g / n
                        al = wa * al + lo / n
                    if u >= n:
                        rsi = 100.0 if al == 0 else 100.0 - 100.0 / (1.0 + ag / al)
                        rows.append((series_key, r.ts, r.value, rsi))
                last = v
        state.update((t, last, sg, sl, ag, al))
        yield pd.DataFrame(rows, columns=["series_key", "ts", "value", "rsi"])

    return _rsi_fn


def stateful_rsi(facts: DataFrame, n: int, key_col: str = "series_key") -> DataFrame:
    """Streaming RELATIVE_STRENGTH_INDEX per series (round 8,
    completing the stateful TA trio with ``stateful_ema``): Wilder
    gain/loss averages seeded with the first-n simple means, emitting
    from the (n+1)-th point — identical semantics and fp shapes to
    ``operators.ta.ta_transform(..., "relative_strength_index")``,
    with state carried across micro-batches. State is O(1) per series
    (six scalars); batch parity pinned by
    tests/test_streaming_rollup.py."""
    if n < 1:
        raise ValueError(f"stateful_rsi period must be >= 1, got {n}")
    return facts.groupBy(key_col).applyInPandasWithState(
        _make_rsi_fn(int(n)),
        outputStructType=_RSI_OUTPUT,
        stateStructType=_RSI_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_KAMA_OUTPUT = StructType(
    [
        StructField("series_key", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value", DoubleType(), True),
        StructField("kama", DoubleType(), True),
    ]
)
# (points seen, last n+1 values, running kama): KAMA's efficiency
# ratio looks back n points, so the state is BOUNDED at n+1 doubles
# per series — the one stateful TA whose state is not a scalar pair.
_KAMA_STATE = StructType(
    [
        StructField("t", LongType(), True),
        StructField("vals", ArrayType(DoubleType()), True),
        StructField("kama", DoubleType(), True),
    ]
)


def _make_kama_fn(n: int):
    # Kaufman's standard fast/slow constants, as in operators/ta.py
    fast, slow = 2.0 / (2 + 1), 2.0 / (30 + 1)

    def _kama_fn(key: Any, pdfs, state: GroupState):
        (series_key,) = key
        t, vals, kama = state.get if state.exists else (0, [], None)
        vals = list(vals or [])
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ns")
            for r in pdf.itertuples():
                t += 1
                v = float(r.value)
                vals.append(v)
                if len(vals) > n + 1:
                    vals.pop(0)
                if t >= n + 1:
                    direction = abs(v - vals[0])
                    vol = 0.0
                    for i in range(len(vals) - 1):
                        vol += abs(vals[i + 1] - vals[i])
                    er = 0.0 if vol == 0 else direction / vol
                    sc_base = er * (fast - slow) + slow
                    sc = sc_base * sc_base  # explicit product (ta.py)
                    if t == n + 1:
                        kama = v  # seed row, as in the batch scan
                    else:
                        kama = (1.0 - sc) * kama + sc * v
                    rows.append((series_key, r.ts, r.value, kama))
        state.update((t, vals, kama))
        yield pd.DataFrame(rows, columns=["series_key", "ts", "value", "kama"])

    return _kama_fn


def stateful_kama(facts: DataFrame, n: int, key_col: str = "series_key") -> DataFrame:
    """Streaming KAUFMANS_ADAPTIVE_MOVING_AVERAGE per series: the
    data-dependent-coefficient recurrence (efficiency ratio over the
    last n points sets the smoothing constant), emitting from the
    (n+1)-th point — same semantics and fp shapes as
    ``operators.ta.ta_transform(..., "kaufmans_adaptive_moving_average")``.
    State is BOUNDED: the last n+1 values plus the running average;
    batch parity across micro-batch boundaries pinned by
    tests/test_streaming_rollup.py."""
    if n < 1:
        raise ValueError(f"stateful_kama period must be >= 1, got {n}")
    return facts.groupBy(key_col).applyInPandasWithState(
        _make_kama_fn(int(n)),
        outputStructType=_KAMA_OUTPUT,
        stateStructType=_KAMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_ema(facts: DataFrame, n: int, key_col: str = "series_key") -> DataFrame:
    """Streaming EXPONENTIAL_MOVING_AVERAGE per series (the Kapacitor-
    style stream transform the reference ecosystem runs OUTSIDE the
    engine — diffs.tick precedent; here it is an in-engine stateful
    operator like ``stateful_series_diff``).

    ``facts``: streaming frame with (series_key, ts timestamp,
    ts_ns long, value double). State per series is (points_seen,
    running_ema) — O(1), no timeout (a series' EMA stays warm across
    arbitrary gaps, matching the batch semantics where gaps carry no
    weight). Emits every input row with its EMA. In-order arrival per
    series is assumed within the stream (same contract as
    ``stateful_series_diff``); batch parity is pinned by
    tests/test_streaming_rollup.py against ``operators.ta``.
    """
    if n < 1:
        raise ValueError(f"stateful_ema period must be >= 1, got {n}")
    return facts.groupBy(key_col).applyInPandasWithState(
        _make_ema_fn(int(n)),
        outputStructType=_EMA_OUTPUT,
        stateStructType=_EMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------ deadman (r9)

_DEADMAN_OUTPUT = StructType(
    [
        StructField("series_key", StringType(), False),
        StructField("ts", TimestampType(), False),
        StructField("level", StringType(), False),
        StructField("last_seen", TimestampType(), False),
    ]
)
# (last observed event-time ns, 1 if the series is currently dead):
# O(1) per series — the whole deadman switch is "when did I last hear
# from you, and have I already alerted".
_DEADMAN_STATE = StructType(
    [StructField("last_ts_ns", LongType(), True), StructField("dead", LongType(), True)]
)


def _make_deadman_fn(every_ns: int):
    def _ts(ns: int):
        return pd.Timestamp(ns // 1000, unit="us")

    def _deadman_fn(key: Any, pdfs, state: GroupState):
        (series_key,) = key
        rows = []
        if state.hasTimedOut:
            # Watermark passed last_seen + every with no new points:
            # the series went silent. Alert ONCE (Kapacitor deadman
            # default), at the deadline itself, then hold state with
            # no further timeout until data resumes.
            last_ts_ns, dead = state.get
            if not dead:
                rows.append(
                    (series_key, _ts(last_ts_ns + every_ns), "dead", _ts(last_ts_ns))
                )
            state.update((last_ts_ns, 1))
        else:
            last_ts_ns, dead = state.get if state.exists else (None, 0)
            for pdf in pdfs:
                pdf = pdf.sort_values("ts_ns")
                for r in pdf.itertuples():
                    ns = int(r.ts_ns)
                    if dead:
                        # data resumed: recovery at the first new point
                        rows.append(
                            (series_key, _ts(ns), "alive", _ts(last_ts_ns))
                        )
                        dead = 0
                    if last_ts_ns is None or ns > last_ts_ns:
                        last_ts_ns = ns
            state.update((last_ts_ns, dead))
            # Arm the switch: fire when event-time watermark passes
            # last_seen + every. Spark requires the timeout timestamp
            # to sit beyond the current watermark — a late-but-valid
            # point whose deadline already passed alerts at the next
            # watermark tick instead of throwing.
            deadline_ms = (last_ts_ns + every_ns) // 1_000_000
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(deadline_ms, wm + 1))
        yield pd.DataFrame(rows, columns=["series_key", "ts", "level", "last_seen"])

    return _deadman_fn


def stateful_deadman(
    facts: DataFrame, every_seconds: int, key_col: str = "series_key"
) -> DataFrame:
    """Kapacitor-style DEADMAN switch (the other half of the alerting
    surface next to :func:`stateful_alerts` — Kapacitor's
    ``deadman(0.0, interval)`` fed by the reference's subscription
    mirror, here as an in-engine stateful streaming operator): per
    series, emit ``dead`` at ``last_seen + every`` once the event-time
    watermark passes that deadline with no new points, and ``alive``
    at the first point after a death. A silent series alerts ONCE, not
    per interval.

    ``facts`` must be a streaming frame with (series_key, ts
    timestamp, ts_ns long) and a WATERMARK on ``ts`` — event-time
    timeouts fire off the watermark, so liveness is judged by the
    stream's own clock, not wall time (replays behave identically).
    State is O(1)/series: (last_seen_ns, dead). Batch/backfill twin:
    :func:`deadman_transitions`; cross-micro-batch parity pinned in
    tests/test_streaming_rollup.py."""
    if every_seconds <= 0:
        raise ValueError(f"deadman interval must be > 0 s, got {every_seconds}")
    return facts.groupBy(key_col).applyInPandasWithState(
        _make_deadman_fn(int(every_seconds) * 1_000_000_000),
        outputStructType=_DEADMAN_OUTPUT,
        stateStructType=_DEADMAN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def deadman_transitions(
    facts: DataFrame,
    every_seconds: int | None = None,
    key_col: str = "series_key",
    now_ts_ns: int | None = None,
    every_ns: int | None = None,
) -> DataFrame:
    """Batch twin of :func:`stateful_deadman` — gaps-and-islands over
    stored points: for every per-series gap longer than ``every``,
    emit ``dead`` at ``gap_start + every`` and ``alive`` at the point
    that ended the gap; with ``now_ts_ns`` given, a series whose LAST
    point is more than ``every`` old is dead with no recovery (the
    trailing open gap). The parity oracle for the streaming operator
    and the backfill path for historical alert timelines.

    One window pass (lead over time order) + a per-series max for the
    trailing gap — no self-join, scales as the windows family does.

    The interval is ``every_seconds`` (whole seconds) or ``every_ns``
    (exact nanoseconds — for data-derived intervals such as
    k × the mean inter-event gap, which a scale-invariant backfill
    wants; round-10, VERDICT r9 item 3)."""
    from pyspark.sql import Window as _W

    if (every_seconds is None) == (every_ns is None):
        raise ValueError("pass exactly one of every_seconds / every_ns")
    if every_ns is None:
        every_ns = int(every_seconds) * 1_000_000_000
    if every_ns <= 0:
        raise ValueError(f"deadman interval must be > 0, got {every_ns} ns")
    w = _W.partitionBy(key_col).orderBy("ts_ns")
    nxt = F.lead("ts_ns").over(w)
    base = facts.select(key_col, "ts_ns").withColumn("next_ns", nxt)
    gap = base.filter(F.col("next_ns").isNotNull() & (F.col("next_ns") - F.col("ts_ns") > every_ns))
    # ns -> timestamp via DECIMAL division: 2024-epoch ns (~1.7e18)
    # exceed double's 2^53 integer range, so c/1000 in double drifts
    # by whole microseconds; decimal(38,0)/1000 is exact.
    to_ts = lambda c: F.timestamp_micros(  # noqa: E731
        (c.cast("decimal(38,0)") / 1000).cast("long")
    )
    dead = gap.select(
        key_col,
        to_ts(F.col("ts_ns") + every_ns).alias("ts"),
        F.lit("dead").alias("level"),
        to_ts(F.col("ts_ns")).alias("last_seen"),
    )
    alive = gap.select(
        key_col,
        to_ts(F.col("next_ns")).alias("ts"),
        F.lit("alive").alias("level"),
        to_ts(F.col("ts_ns")).alias("last_seen"),
    )
    out = dead.unionAll(alive)
    if now_ts_ns is not None:
        trailing = (
            facts.groupBy(key_col)
            .agg(F.max("ts_ns").alias("ts_ns"))
            .filter(F.lit(int(now_ts_ns)) - F.col("ts_ns") > every_ns)
            .select(
                key_col,
                to_ts(F.col("ts_ns") + every_ns).alias("ts"),
                F.lit("dead").alias("level"),
                to_ts(F.col("ts_ns")).alias("last_seen"),
            )
        )
        out = out.unionAll(trailing)
    return out
