"""Aggregation operators (SURVEY.md §2.4).

The reference's only aggregate is the 1-minute tumbling ``avg``
(cflux.js:749,766); InfluxQL's full aggregate set is extended here
(sum/min/max/count/stddev/percentile) — all built-in JVM functions, so
they get partial (map-side) aggregation and whole-stage codegen for
free. On a cluster the shuffle key is the (bucket, series) pair, which
is high-cardinality and evenly spread — no skew concern; AQE coalesces
the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cflux_spark.operators.timeops import bucket_ts, minute_trunc


def minute_avg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """A1 — ``toStartOfMinute`` bucket + avg, grouped per series keys
    (cflux.js:749). Output columns: keys..., minute, mean."""
    keys = keys or []
    mean: Column = F.avg(value_col)
    if round_to is not None:
        mean = F.round(mean, round_to)
    return (
        df.groupBy(*keys, minute_trunc(ts_col).alias("minute"))
        .agg(mean.alias("mean"))
        .orderBy(*keys, "minute")
    )


def time_bucket_agg(
    df: DataFrame,
    seconds: int,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """A2 — parameterized GROUP BY time(N seconds): the operator the
    reference declares but regex-strips (cflux.js:378-379)."""
    keys = keys or []
    mean: Column = F.avg(value_col)
    if round_to is not None:
        mean = F.round(mean, round_to)
    return (
        df.groupBy(*keys, bucket_ts(ts_col, seconds).alias("bucket"))
        .agg(mean.alias("mean"))
        .orderBy(*keys, "bucket")
    )


def agg_suite(
    df: DataFrame,
    value_col: str = "value",
    keys: list[str] | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Extended aggregate set (InfluxQL defines these; the reference
    implements only avg — SURVEY §2.4 'Not present' row)."""
    keys = keys or []
    v = F.col(value_col)
    return (
        df.groupBy(*keys)
        .agg(
            F.count(v).alias("n"),
            F.round(F.sum(v), round_to).alias("sum_v"),
            F.round(F.min(v), round_to).alias("min_v"),
            F.round(F.max(v), round_to).alias("max_v"),
            F.round(F.avg(v), round_to).alias("avg_v"),
            F.round(F.expr(f"percentile({value_col}, 0.5)"), round_to).alias("median_v"),
            F.round(F.stddev_samp(v), round_to).alias("stddev_v"),
        )
        .orderBy(*keys)
    )


def distinct_values(df: DataFrame, col: str, where: Column | None = None) -> DataFrame:
    """A3 — distinct via GROUP BY (cflux.js:459,480,645)."""
    out = df.filter(where) if where is not None else df
    return out.select(col).distinct().orderBy(col)


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Session-window aggregation: events of one key closer than
    ``gap_seconds`` apart merge into one session (Spark-native
    ``session_window`` — the streaming-capable sibling of the tumbling
    windows in A1/A2; the same call works under Structured Streaming
    with a watermark). Streaming output mode: use ``append`` — a
    session row is emitted once the watermark passes its close, and
    rows later than the watermark are dropped with one micro-batch of
    lag (Spark filters late events against the PREVIOUS batch's
    watermark and evicts against the updated one; pinned by
    tests/test_streaming_rollup.py).

    Output: (key, session_start, n_events, sum_v) with sum_v in exact
    integer-cents math (see plans/queries docstring). Boundary
    semantics (verified empirically): an event exactly gap_seconds
    after its predecessor still MERGES — a new session starts only
    when the gap is strictly greater. The gaps-and-islands SQL oracle
    mirrors this with `diff > gap`.

    Scale: one shuffle on the session key; within a key the merge is a
    sort-based scan. Skewed keys (one user with 10^8 events) sort, not
    explode — no quadratic path.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        df.groupBy(key_col, F.session_window(F.col(ts_col), f"{gap_seconds} seconds"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents).cast("double") / 100).alias("sum_v"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_v",
        )
    )


def value_histogram(
    df: DataFrame,
    lo: float,
    hi: float,
    n_buckets: int,
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Equal-width histogram of ``value_col`` per key group:
    ``width_bucket`` semantics (bucket 0 = underflow, n_buckets+1 =
    overflow), one map-side-combinable groupBy. The distribution
    profile every data-quality dashboard wants (token-length, score,
    value distributions) at a cost of one narrow shuffle regardless of
    data volume.
    """
    keys = keys or []
    b = F.width_bucket(F.col(value_col), F.lit(lo), F.lit(hi), F.lit(n_buckets))
    return (
        df.groupBy(*keys, b.cast("int").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy(*keys, "bucket")
    )
