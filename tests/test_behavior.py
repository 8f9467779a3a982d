"""Behavioral analytics (extensions/behavior.py): windowFunnel DP
semantics, cohort retention arithmetic, disjoint sequence counting."""

from datetime import datetime

import pytest

from cflux_spark.extensions import behavior


def _ev(spark, rows):
    """rows: (user_id, iso_ts, event_type)."""
    return spark.createDataFrame(
        [
            (i, u, datetime.fromisoformat(ts), et)
            for i, (u, ts, et) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )


def _levels(spark, rows, window="1 hour"):
    df = behavior.window_funnel(_ev(spark, rows), ["a", "b", "c"], window)
    return {r["user_id"]: r["level"] for r in df.collect()}


def test_funnel_full_chain_within_window(spark):
    rows = [
        (1, "2024-01-01T00:00:00", "a"),
        (1, "2024-01-01T00:10:00", "b"),
        (1, "2024-01-01T00:50:00", "c"),
    ]
    assert _levels(spark, rows) == {1: 3}


def test_funnel_window_measured_from_chain_start(spark):
    # b at +50min keeps level 2, but c at +70min exceeds the 1h
    # budget measured from the FIRST step, not from b.
    rows = [
        (1, "2024-01-01T00:00:00", "a"),
        (1, "2024-01-01T00:50:00", "b"),
        (1, "2024-01-01T01:10:00", "c"),
    ]
    assert _levels(spark, rows) == {1: 2}


def test_funnel_later_restart_rescues_chain(spark):
    # A second 'a' restarts the window: the DP carries the LATEST
    # valid chain start, so a→b→c completes off the second a.
    rows = [
        (1, "2024-01-01T00:00:00", "a"),
        (1, "2024-01-01T02:00:00", "a"),
        (1, "2024-01-01T02:10:00", "b"),
        (1, "2024-01-01T02:20:00", "c"),
    ]
    assert _levels(spark, rows) == {1: 3}


def test_funnel_order_is_strict(spark):
    # c before b: no level-3 chain; b before any a: level 1 only.
    rows = [
        (1, "2024-01-01T00:00:00", "a"),
        (1, "2024-01-01T00:10:00", "c"),
        (1, "2024-01-01T00:20:00", "b"),
        (2, "2024-01-01T00:00:00", "b"),
        (2, "2024-01-01T00:10:00", "a"),
    ]
    assert _levels(spark, rows) == {1: 2, 2: 1}


def test_funnel_user_with_no_steps_is_level_zero(spark):
    rows = [(1, "2024-01-01T00:00:00", "x")]
    assert _levels(spark, rows) == {1: 0}


def test_funnel_conversion_ladder(spark):
    rows = [
        (1, "2024-01-01T00:00:00", "a"),
        (2, "2024-01-01T00:00:00", "a"),
        (2, "2024-01-01T00:01:00", "b"),
        (3, "2024-01-01T00:00:00", "x"),
    ]
    out = {
        r["level"]: (r["n_reached"], r["n_users"], r["share"])
        for r in behavior.funnel_conversion(_ev(spark, rows), ["a", "b", "c"]).collect()
    }
    assert out[1] == (2, 3, round(2 / 3, 6))
    assert out[2] == (1, 3, round(1 / 3, 6))
    assert 3 not in out  # nobody reached level 3


def test_sequence_count_disjoint_pairs(spark):
    # b a b a b: greedy disjoint a→b pairs = 2 (first b unmatched).
    rows = [
        (1, "2024-01-01T00:00:00", "b"),
        (1, "2024-01-01T00:01:00", "a"),
        (1, "2024-01-01T00:02:00", "b"),
        (1, "2024-01-01T00:03:00", "a"),
        (1, "2024-01-01T00:04:00", "b"),
    ]
    r = behavior.sequence_count(_ev(spark, rows), "a", "b").collect()[0]
    assert (r["n_first"], r["n_then"], r["pairs"]) == (2, 3, 2)


def test_sequence_count_no_pairs_when_all_b_first(spark):
    rows = [
        (1, "2024-01-01T00:00:00", "b"),
        (1, "2024-01-01T00:01:00", "b"),
        (1, "2024-01-01T00:02:00", "a"),
    ]
    r = behavior.sequence_count(_ev(spark, rows), "a", "b").collect()[0]
    assert r["pairs"] == 0


def test_cohort_retention_counts_and_offsets(spark):
    rows = [
        # user 1: signs up day 0, purchases day 0 and day 2
        (1, "2024-01-01T08:00:00", "signup"),
        (1, "2024-01-01T09:00:00", "purchase"),
        (1, "2024-01-03T09:00:00", "purchase"),
        # user 2: signs up day 0, never purchases
        (2, "2024-01-01T10:00:00", "signup"),
        # user 3: signs up day 2, purchases day 2 twice (distinct-counted once)
        (3, "2024-01-03T08:00:00", "signup"),
        (3, "2024-01-03T09:00:00", "purchase"),
        (3, "2024-01-03T10:00:00", "purchase"),
        # user 4: purchase BEFORE signup — excluded by offset >= 0
        (4, "2024-01-03T08:00:00", "purchase"),
        (4, "2024-01-05T08:00:00", "signup"),
    ]
    out = {
        (r["cohort_block"], r["offset"]): (r["n_active"], r["cohort_size"], r["retention"])
        for r in behavior.cohort_retention(
            _ev(spark, rows), cohort_type="signup", activity_type="purchase"
        ).collect()
    }
    assert out == {
        (0, 0): (1, 2, 0.5),
        (0, 2): (1, 2, 0.5),
        (2, 0): (1, 1, 1.0),
    }


@pytest.mark.parametrize("shuffle", ["2", "16"])
def test_funnel_partition_invariant(spark, sf_dir, shuffle):
    """Funnel levels are a pure function of the per-user event
    sequence — partitioning must not change them."""
    from cflux_spark.sources.readers import load_table

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        ev = load_table(spark, sf_dir, "events")
        rows = sorted(
            tuple(r)
            for r in behavior.window_funnel(
                ev, ["view", "click", "purchase"], "6 hours"
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    if not hasattr(test_funnel_partition_invariant, "_snap"):
        test_funnel_partition_invariant._snap = rows
    else:
        assert rows == test_funnel_partition_invariant._snap


def test_markov_transitions_exact_probs(spark):
    """user 1: a->b->a->b (transitions ab, ba, ab); user 2: a->c.
    P(b|a) = 2/3, P(c|a) = 1/3, P(a|b) = 1."""
    from cflux_spark.extensions.behavior import markov_transitions

    rows = [
        (0, 1, "2024-01-01T00:00:00", "a"),
        (1, 1, "2024-01-01T00:01:00", "b"),
        (2, 1, "2024-01-01T00:02:00", "a"),
        (3, 1, "2024-01-01T00:03:00", "b"),
        (4, 2, "2024-01-01T00:00:00", "a"),
        (5, 2, "2024-01-01T00:01:00", "c"),
    ]
    df = _ev(spark, [(u, ts, et) for _, u, ts, et in rows])
    out = {(r["cur"], r["nxt"]): (r["n"], r["prob"]) for r in markov_transitions(df).collect()}
    assert out[("a", "b")] == (2, round(2 / 3, 6))
    assert out[("a", "c")] == (1, round(1 / 3, 6))
    assert out[("b", "a")] == (1, 1.0)
    # no cross-user pair: user 1's last b never links to user 2's a
    assert ("b", "c") not in out and len(out) == 3


def test_interarrival_quartiles_exact(spark):
    """One user, one type, gaps 60s, 120s, 300s -> p25=90 (dyadic
    midpoint), p50=120, p75=210."""
    from cflux_spark.extensions.behavior import interarrival_quartiles

    rows = [
        (1, "2024-01-01T00:00:00", "m"),
        (1, "2024-01-01T00:01:00", "m"),
        (1, "2024-01-01T00:03:00", "m"),
        (1, "2024-01-01T00:08:00", "m"),
    ]
    r = interarrival_quartiles(_ev(spark, rows)).collect()[0]
    assert (r["n_gaps"], r["p25_s"], r["p50_s"], r["p75_s"]) == (3, 90.0, 120.0, 210.0)


def test_last_touch_attribution(spark):
    """click then purchase -> click; view then purchase (later click
    AFTER it doesn't count) -> view; purchase with no touch ->
    direct; a touch from ANOTHER user never leaks."""
    from cflux_spark.extensions.behavior import last_touch_attribution

    rows = [
        (1, "2024-01-01T00:00:00", "click"),
        (1, "2024-01-01T00:01:00", "purchase"),
        (2, "2024-01-01T00:00:00", "view"),
        (2, "2024-01-01T00:01:00", "purchase"),
        (2, "2024-01-01T00:02:00", "click"),
        (3, "2024-01-01T00:00:00", "purchase"),
    ]
    out = {
        r["touch"]: (r["n_conversions"], r["share"])
        for r in last_touch_attribution(_ev(spark, rows)).collect()
    }
    assert out == {
        "click": (1, round(1 / 3, 6)),
        "view": (1, round(1 / 3, 6)),
        "direct": (1, round(1 / 3, 6)),
    }
