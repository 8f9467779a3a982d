"""Capture `.explain("formatted")` for catalog queries into
plans/r12/<name>_<tag>.txt (the optimization round's before/after
evidence). Does not execute the queries — plan-only.

Usage:
    python scripts/explain_capture.py <tag> [query ...]
    # default queries: every BENCH_QUERIES key; tag is e.g. 'before'
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    import bench
    from cflux_spark.plans.queries import QUERIES
    from cflux_spark.session import get_spark

    names = sys.argv[2:] or bench.BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_capture", cpus=8)
    ops = bench._bench_ops()
    for name in names:
        fn = ops.get(name) or QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {type(ex).__name__}: {ex}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
