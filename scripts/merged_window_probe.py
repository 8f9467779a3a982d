"""Measured probe: ungrouped (merged-series) window at scale —
`partitionBy(lit(1))` vs the segmented two-phase stage
(`operators/windows.merged_window_stage`). This is the plan shape
behind every ungrouped InfluxQL transform since round 5; the probe
gives SCALE.md its number the same way registry_probe.py does for the
broadcast/bucketed join story.

Usage: python scripts/merged_window_probe.py [n_rows] [span_hours]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cflux_spark.operators.windows import merged_window_stage
from cflux_spark.session import get_spark


def main(n_rows: int = 20_000_000, span_hours: int = 240) -> None:
    spark = get_spark("merged-window-probe", cpus=16)
    span_ns = span_hours * 3600 * 10**9
    df = (
        spark.range(n_rows)
        .select(
            (F.col("id") * (span_ns // n_rows)).alias("ts_ns"),
            (F.col("id") % 9973).cast("double").alias("value"),
        )
        .repartition(64)
    )
    df.write.mode("overwrite").parquet("/tmp/mw_probe")
    base = spark.read.parquet("/tmp/mw_probe")

    def run(tag: str, frame) -> None:
        t = time.monotonic()
        frame.write.format("noop").mode("overwrite").save()
        print(f"{tag}: {time.monotonic() - t:6.2f} s")

    wg = Window.partitionBy(F.lit(1)).orderBy("ts_ns")
    run(
        "single-partition lag ",
        base.withColumn("_d", F.col("value") - F.lag("value").over(wg)),
    )
    staged, w, fin = merged_window_stage(base)
    run(
        "segmented lag        ",
        fin(staged.withColumn("_d", F.col("value") - F.lag("value").over(w))),
    )
    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    main(n, h)
