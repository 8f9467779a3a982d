"""Window-function operators (SURVEY.md §2.5).

The reference has none in-engine; the downstream Kapacitor TICK script
does ``difference('counter')`` per series over the subscription stream
(docker/config/diffs.tick:8-9). Adopted as a first-class operator:
per-series lag-difference. Partitioning by the series key means the
sort is per-series and local to each shuffle partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def series_difference(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: list[str] | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """value - lag(value) OVER (PARTITION BY keys ORDER BY ts[, tiebreak])."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    diff = F.col(value_col) - F.lag(value_col).over(w)
    if round_to is not None:
        diff = F.round(diff, round_to)
    return df.withColumn("diff", diff)


def series_difference_segmented(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: list[str] | None = None,
    round_to: int | None = 4,
    segment_span_s: int = 3600,
) -> DataFrame:
    """`series_difference`, skew-proof: identical output, but a hot
    series no longer serializes one task.

    A plain per-series window puts EVERY row of a series in one
    partition — a pathological fingerprint (one series holding 10% of
    the table) pins a core for the whole stage (SCALE.md 'Skew & hot
    keys'). Two-phase segment lag restores parallelism:

      1. lag within (series, time-segment) — partition count for a hot
         series becomes its time span / segment_span_s;
      2. each segment's first row takes its predecessor from the
         previous segment's last value, computed by a per-segment
         aggregate (one row per (series, segment)) and a window over
         THAT tiny frame.

    The boundary join keys match the phase-1 window partitioning, so
    no extra shuffle of the fact rows beyond the one the window needed
    anyway. Null `value`s would be ambiguous with 'first row' — callers
    with nullable values should pre-filter (facts' value is non-null).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    seg = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(segment_span_s)).alias("_seg")
    df2 = df.withColumn("_seg", seg)
    w_in = Window.partitionBy(*key_cols, "_seg").orderBy(*order)
    bounds = df2.groupBy(*key_cols, "_seg").agg(
        F.max_by(F.col(value_col), F.struct(*order)).alias("_lv")
    )
    w_seg = Window.partitionBy(*key_cols).orderBy("_seg")
    prev = bounds.select(
        *key_cols, "_seg", F.lag("_lv").over(w_seg).alias("_prev_last")
    )
    out = df2.withColumn("_lag_in", F.lag(value_col).over(w_in)).join(
        prev, [*key_cols, "_seg"], "left"
    )
    diff = F.col(value_col) - F.coalesce(F.col("_lag_in"), F.col("_prev_last"))
    if round_to is not None:
        diff = F.round(diff, round_to)
    return out.withColumn("diff", diff).drop("_seg", "_lag_in", "_prev_last")


def moving_average(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: list[str] | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """Trailing n-row mean per series (InfluxQL moving_average()).

    Emits every row; the first n-1 rows of a series average the rows
    seen so far (callers wanting InfluxDB's emit-once-full behavior
    filter on ``ma_n >= n``, exposed as a count column).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(-(n - 1), 0)
    ma = F.avg(value_col).over(w)
    if round_to is not None:
        ma = F.round(ma, round_to)
    return df.withColumn("ma", ma).withColumn("ma_n", F.count(value_col).over(w))


def cumulative_sum(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: list[str] | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """Running sum per series (InfluxQL cumulative_sum())."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cs = F.sum(value_col).over(w)
    if round_to is not None:
        cs = F.round(cs, round_to)
    return df.withColumn("cumsum", cs)


def series_rate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: list[str] | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """Per-second rate: difference / seconds-elapsed (InfluxQL
    derivative(); natural companion of series_difference)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    dv = F.col(value_col) - F.lag(value_col).over(w)
    dt = F.unix_timestamp(ts_col).cast("double") - F.unix_timestamp(F.lag(ts_col).over(w)).cast("double")
    rate = F.when(dt > 0, dv / dt)
    if round_to is not None:
        rate = F.round(rate, round_to)
    return df.withColumn("rate", rate)
