"""Time individual bench keys with the bench methodology (noop sink,
cache cleared between runs) without paying for the full sweep.

Usage:
    python scripts/time_keys.py q_bleu q_pagerank          # 3 runs each
    RUNS=1 python scripts/time_keys.py q_quality_classifier
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import bench
    from cflux_spark.plans.queries import QUERIES
    from cflux_spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        print("usage: time_keys.py <query> [...]", file=sys.stderr)
        return 2
    n_runs = max(1, int(os.environ.get("RUNS", "3")))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    spark = get_spark("time_keys", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    ops = bench._bench_ops()
    if any(n == "q_dedup_incremental" for n in names):
        bench._mhindex_prepare(spark, sf_dir)
    out: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_runs):
        for name in names:
            fn = ops.get(name) or QUERIES[name]
            spark.sparkContext.setJobDescription(name)
            t = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            out[name].append(round(time.monotonic() - t, 3))
            spark.catalog.clearCache()
    for name, ts in out.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:28s} median={med:7.3f}  runs={ts}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
