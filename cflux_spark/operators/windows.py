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
