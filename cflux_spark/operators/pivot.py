"""Result shaping: the InfluxDB series pivot (SURVEY.md §2.12, R1).

The reference streams (minute, name, mean, labelname, labelvalue,
message) rows into a nested dict keyed metric → tagKey → tagValue →
[[ts_ms, value]...] and emits one InfluxDB `series` object per (metric,
tag pair) with columns ["time", metric] (cflux.js:786-833). The
string-over-float rule (`row[5] || row[2]`, cflux.js:795) picks the
string message when present.

Spark shape: the heavy grouping/sorting is distributed
(groupBy + sort_array(collect_list(struct(...)))); only the final
envelope assembly touches the driver, over the already-aggregated
per-series rows (small: one row per series, not per point).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_pivot(
    df: DataFrame,
    name_col: str = "name",
    tag_key_col: str = "tagname",
    tag_val_col: str = "tagvalue",
    ts_col: str = "minute",
    value_col: str = "mean",
    message_col: str | None = "message",
) -> DataFrame:
    """Distributed pivot: one output row per (name, tagKey, tagValue)
    with a time-sorted array of (ts_ms, value) points.

    `val` applies the reference's string-over-float rule when a
    message column is present."""
    if message_col is not None:
        val = F.coalesce(F.col(message_col).cast("string"), F.col(value_col).cast("string"))
    else:
        val = F.col(value_col).cast("string")
    pts = F.struct(
        (F.unix_timestamp(ts_col) * 1000).cast("long").alias("ts_ms"),
        val.alias("val"),
    )
    return (
        df.groupBy(name_col, tag_key_col, tag_val_col)
        .agg(F.sort_array(F.collect_list(pts)).alias("points"))
        .orderBy(name_col, tag_key_col, tag_val_col)
    )


def to_influx_envelope(pivoted: DataFrame, statement_id: int = 0) -> dict[str, Any]:
    """Driver-side envelope assembly (small input: one row per series).

    Emits the InfluxDB 1.x JSON results shape (cflux.js:815-832)."""
    series = []
    for row in pivoted.collect():
        name, tagk, tagv = row[0], row[1], row[2]
        series.append(
            {
                "name": name,
                "tags": {tagk: tagv} if tagk is not None else {},
                "columns": ["time", name],
                "values": [[p["ts_ms"], _maybe_float(p["val"])] for p in row["points"]],
            }
        )
    return {"results": [{"statement_id": statement_id, "series": series}]}


def _maybe_float(s: str) -> float | str:
    try:
        return float(s)
    except (TypeError, ValueError):
        return s
