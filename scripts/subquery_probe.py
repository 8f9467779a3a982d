"""Measured probe: the InfluxQL subquery engine at 10^8 points
(round 8) — the plan-shape tests assert the subquery machinery
composes into ONE Catalyst plan; this probe puts a wall-clock number
on that claim at scale, through the REAL engine entry point
(`InfluxQLEngine.execute`), over a store-layout parquet table
synthesized executor-side (no LP parse in the loop — the probe times
the query engine, not ingest).

Shape: 10^4 series (hosts) × 10^4 points each (1 s spacing, one date
partition) = 10^8 fact rows. Statements:

  q_raw3   three levels: raw innermost passthrough (tag-filtered) →
           per-(minute, host) mean → HAVING-style value filter →
           10-minute max — the full round-7/8 subquery surface in one
           statement.
  q_lone   lone selector over a bucketed subquery: the single max row
           (at its own bucket timestamp) over all 1.67M inner buckets.
  q_pushdown raw-inner single-series mean: the tag filter must reach
           the scan through the passthrough level (broadcast semi-join
           on the registry slice), so this touches 10^4 of 10^8 rows'
           worth of series.

Usage: python scripts/subquery_probe.py [n_series] [n_points]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cflux_spark.session import get_spark


def main(n_series: int = 10_000, n_points: int = 10_000) -> None:
    spark = get_spark("subquery-probe", cpus=16)
    root = tempfile.mkdtemp(prefix="sqprobe_")
    db = "probe"
    base_ns = 1704067200 * 10**9

    n = n_series * n_points
    facts = (
        spark.range(n)
        .select(
            (F.col("id") % n_series).alias("fingerprint"),
            (F.col("id") / n_series).cast("long").alias("_k"),
        )
        .select(
            "fingerprint",
            (F.lit(base_ns) + F.col("_k") * F.lit(10**9)).alias("ts_ns"),
            (((F.col("fingerprint") + F.col("_k")) % 100) / 10.0).alias("value"),
        )
        .select(
            "fingerprint",
            F.timestamp_micros(F.expr("ts_ns div 1000")).alias("ts"),
            "ts_ns",
            "value",
            F.lit(None).cast("string").alias("message"),
            F.lit("user").alias("field"),
            F.lit("cpu").alias("measurement"),
            F.to_date(F.timestamp_micros(F.expr("ts_ns div 1000"))).alias("date"),
        )
    )
    t0 = time.monotonic()
    facts.write.mode("overwrite").partitionBy("date").parquet(
        os.path.join(root, db, "samples")
    )
    reg = spark.range(n_series).select(
        F.lit("2024-01-01").cast("date").alias("date"),
        F.col("id").alias("fingerprint"),
        F.lit("cpu").alias("measurement"),
        F.lit("cpu.user").alias("name"),
        F.map_from_arrays(
            F.array(F.lit("host")),
            F.array(F.concat(F.lit("h"), F.col("id").cast("string"))),
        ).alias("tags"),
        F.concat(F.lit('{"host":"h'), F.col("id").cast("string"), F.lit('"}')).alias(
            "labels"
        ),
    )
    reg.write.mode("overwrite").parquet(os.path.join(root, db, "time_series"))
    print(f"write: {time.monotonic() - t0:.1f} s ({n:,} rows, {n_series} series)")

    from cflux_spark.plans.influxql import InfluxQLEngine

    eng = InfluxQLEngine(spark, root)
    results = {}

    stmts = {
        "q_raw3": (
            "SELECT max(mean_u) FROM ("
            " SELECT mean(u) AS mean_u FROM ("
            "  SELECT user AS u FROM cpu WHERE host != 'h0'"
            " ) GROUP BY time(60s), host"
            ") WHERE mean_u > 4.0 GROUP BY time(600s)"
        ),
        "q_lone": (
            "SELECT max(mean_u) FROM (SELECT mean(user) AS mean_u FROM cpu "
            "GROUP BY time(60s), host)"
        ),
        "q_pushdown": (
            "SELECT mean(u) FROM (SELECT user AS u FROM cpu WHERE host = 'h42') "
            "GROUP BY time(3600s)"
        ),
    }
    for tag, q in stmts.items():
        t0 = time.monotonic()
        res = eng.execute(q, db=db)
        dt = time.monotonic() - t0
        series = res["results"][0].get("series", [])
        rows = sum(len(s["values"]) for s in series)
        results[tag] = dt
        print(f"{tag}: {dt:.1f} s ({rows} result rows)")
        assert rows > 0, (tag, res)
    print(
        f"RESULT n={n} "
        + " ".join(f"{k}={v:.1f}s" for k, v in results.items())
    )
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 10_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 10_000,
    )
