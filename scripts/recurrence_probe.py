"""Segmented linear-recurrence scan at scale (SCALE.md, round 7).

The TA transform family (operators/ta.py) rides on
operators/recurrence.linear_recurrence — a Blelloch-style scan whose
parallelism is (series, hour-segment), not #series. The question this
probe answers: does the MERGED-series shape (keys=[], the worst case:
one logical series, parallelism from segments alone) hold at 10^7-10^8
rows, and does the grouped shape scale with series count?

Run:  python scripts/recurrence_probe.py [n_rows]
"""

from __future__ import annotations

import sys
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from cflux_spark import get_spark  # noqa: E402
from cflux_spark.operators.ta import ta_transform  # noqa: E402


def main(n_rows: int = 10_000_000) -> None:
    spark = get_spark("recurrence-probe", cpus=16)
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    # ---- merged series (keys=[]): 100 ms spacing → 36k rows/segment,
    # n_rows/36k hour-segments of parallelism
    base = spark.range(n_rows).select(
        (F.col("id") * 100_000_000).alias("ts_ns"),  # 100 ms in ns
        (F.sin(F.col("id") / 1000.0) * 10 + 50).alias("value"),
    )
    t0 = time.time()
    out = ta_transform(base, [], "ts_ns", "value", "exponential_moving_average", 20)
    last2 = out.orderBy(F.col("ts_ns").desc()).limit(2).collect()
    dt_merged = time.time() - t0
    n_segs = n_rows * 100_000_000 // (3600 * 1_000_000_000) + 1
    print(
        f"merged EMA(20) over {n_rows:,} rows ({n_segs:,} segments): "
        f"{dt_merged:6.2f} s  last_ema={last2[0]['_ta']:.6f}",
        flush=True,
    )

    # exactness: the recurrence relation must hold across the final
    # two emitted rows (the last row crosses the last segment carry)
    v_last = float(np.sin((n_rows - 1) / 1000.0) * 10 + 50)
    e_prev, e_last = last2[1]["_ta"], last2[0]["_ta"]
    alpha = 2.0 / 21.0
    assert abs((1 - alpha) * e_prev + alpha * v_last - e_last) < 1e-9, "recurrence broken"
    print("  recurrence relation holds at the tail (1e-9)", flush=True)

    # ---- grouped: 10^4 series × n_rows/10^4 points each
    n_series = 10_000
    grouped = spark.range(n_rows).select(
        (F.col("id") % n_series).cast("string").alias("k"),
        (F.col("id") * 100_000_000).alias("ts_ns"),
        (F.sin(F.col("id") / 1000.0) * 10 + 50).alias("value"),
    )
    t0 = time.time()
    out_g = ta_transform(
        grouped, ["k"], "ts_ns", "value", "exponential_moving_average", 20
    )
    cnt = out_g.count()
    dt_grouped = time.time() - t0
    print(
        f"grouped EMA(20), {n_series:,} series x {n_rows // n_series:,} pts: "
        f"{dt_grouped:6.2f} s  rows={cnt:,}"
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
