"""Measured probe: concurrent query fan-in (round 8) — a Grafana
dashboard fires many InfluxQL statements at once; the engine must
interleave them on one SparkSession without serializing into the sum
of their latencies. Spark schedules concurrent actions from separate
driver threads across the same executor pool, so total wall should
sit well under the serial sum (whole-stage codegen tasks interleave).

Shape: the subquery probe's store layout at 10^7 points (10^3 series
× 10^4 points), then ``n_clients`` threads each running a mixed
statement (bucketed mean / tag-filtered raw / subquery HAVING / lone
selector) through ``InfluxQLEngine.execute``.

Usage: python scripts/concurrency_probe.py [n_clients] [n_series] [n_points]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cflux_spark.session import get_spark


def main(n_clients: int = 32, n_series: int = 1_000, n_points: int = 10_000) -> None:
    spark = get_spark("concurrency-probe", cpus=16)
    root = tempfile.mkdtemp(prefix="concprobe_")
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
    facts.write.mode("overwrite").partitionBy("date").parquet(
        os.path.join(root, db, "samples")
    )
    spark.range(n_series).select(
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
    ).write.mode("overwrite").parquet(os.path.join(root, db, "time_series"))

    from cflux_spark.plans.influxql import InfluxQLEngine

    eng = InfluxQLEngine(spark, root)
    shapes = [
        "SELECT mean(user) FROM cpu GROUP BY time(600s)",
        "SELECT user FROM cpu WHERE host = 'h{i}' LIMIT 100",
        "SELECT mean_u FROM (SELECT mean(user) AS mean_u FROM cpu "
        "GROUP BY time(600s), host) WHERE mean_u > 4.9 LIMIT 50",
        "SELECT max(user) FROM cpu WHERE host = 'h{i}'",
    ]
    stmts = [shapes[i % len(shapes)].format(i=i % n_series) for i in range(n_clients)]

    def run_one(q: str) -> float:
        t = time.monotonic()
        res = eng.execute(q, db=db)
        assert "series" in res["results"][0] or "error" not in res["results"][0]
        return time.monotonic() - t

    # serial reference: one of each shape, summed and scaled
    t0 = time.monotonic()
    serial_each = [run_one(s.format(i=7)) for s in shapes]
    serial_scaled = sum(serial_each) / len(shapes) * n_clients
    print(f"serial one-of-each: {[round(x, 2) for x in serial_each]} s")

    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=n_clients) as ex:
        lats = sorted(ex.map(run_one, stmts))
    wall = time.monotonic() - t0
    p50 = lats[len(lats) // 2]
    p95 = lats[int(len(lats) * 0.95)]
    print(
        f"RESULT n={n} clients={n_clients} wall={wall:.1f}s "
        f"p50={p50:.2f}s p95={p95:.2f}s serial_scaled={serial_scaled:.1f}s "
        f"speedup={serial_scaled / wall:.1f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 32,
        int(sys.argv[2]) if len(sys.argv) > 2 else 1_000,
        int(sys.argv[3]) if len(sys.argv) > 3 else 10_000,
    )
