"""Registry-scale probe (SCALE.md 'Registry (measured)', NEXT.md #2).

Synthesizes a registry of N series and a fact table of M rows, then
runs the production query shape — filter the registry by measurement
(the filtered slice), join facts to it, hourly aggregate — at several
slice cardinalities to find where the broadcast strategy gives way to
sort-merge, and what each costs.

The fixture registry is ~10^4 series; this probes 10^2-10^3× that.
Run:  python scripts/registry_probe.py [n_series] [n_facts]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from cflux_spark import get_spark  # noqa: E402


def main(n_series: int = 10_000_000, n_facts: int = 10_000_000) -> None:
    spark = get_spark("registry-probe", cpus=16)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # one row per series: fingerprint + measurement (1000 measurements
    # → a measurement filter keeps n_series/1000 rows) + name
    reg = (
        spark.range(n_series)
        .select(
            F.xxhash64(F.col("id").cast("string")).alias("fingerprint"),
            F.concat(F.lit("m"), (F.col("id") % 1000).cast("string")).alias("measurement"),
            F.concat(F.lit("f"), (F.col("id") % 7).cast("string")).alias("name"),
        )
        .cache()
    )
    reg.count()

    facts = (
        spark.range(n_facts)
        .select(
            F.xxhash64((F.col("id") % n_series).cast("string")).alias("fingerprint"),
            (F.col("id") * 1_000_000_000 % (86400 * 1_000_000_000)).alias("ts_ns"),
            (F.col("id") % 997 / 10.0).alias("value"),
        )
        .cache()
    )
    facts.count()

    # slice cardinality sweep: 1 measurement (n/1000 series), 10, 100,
    # all 1000 (the whole registry — the anti-broadcast extreme)
    for n_meas in (1, 10, 100, 1000):
        ms = [f"m{i}" for i in range(n_meas)]
        t0 = time.time()
        slice_ = reg.filter(F.col("measurement").isin(ms)).select("fingerprint")
        out = (
            facts.join(slice_, "fingerprint")
            .groupBy(F.expr("ts_ns div 3600000000000").alias("hour"))
            .agg(F.avg("value").alias("mean"), F.count("*").alias("n"))
        )
        rows = out.collect()
        dt = time.time() - t0
        plan = out._jdf.queryExecution().executedPlan().toString()
        strategy = "broadcast" if "BroadcastHashJoin" in plan else (
            "sort-merge" if "SortMergeJoin" in plan else "shuffled-hash" if "ShuffledHashJoin" in plan else "?"
        )
        n_slice = n_meas * (n_series // 1000)
        print(
            f"slice={n_slice:>10,} series ({n_meas:>4} measurements): "
            f"{dt:6.2f} s  join={strategy}  out_rows={len(rows)}"
        )

    spark.stop()


def main_bucketed(n_series: int = 10_000_000, n_facts: int = 10_000_000) -> None:
    """Bucketed-store variant (VERDICT r2 #4): facts and registry
    co-bucketed on fingerprint; the >10^5-slice sort-merge regime runs
    with no Exchange on either side. Prints the plan excerpt that
    SCALE.md records."""
    from cflux_spark.sources.bucketed import write_bucketed

    spark = get_spark("registry-probe-bucketed", cpus=16)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ regime

    reg = spark.range(n_series).select(
        F.xxhash64(F.col("id").cast("string")).alias("fingerprint"),
        F.concat(F.lit("m"), (F.col("id") % 1000).cast("string")).alias("measurement"),
    )
    facts = spark.range(n_facts).select(
        F.xxhash64((F.col("id") % n_series).cast("string")).alias("fingerprint"),
        (F.col("id") * 1_000_000_000 % (86400 * 1_000_000_000)).alias("ts_ns"),
        (F.col("id") % 997 / 10.0).alias("value"),
    )
    t0 = time.time()
    write_bucketed(reg, "probe_reg", n_buckets=32)
    write_bucketed(facts, "probe_facts", n_buckets=32, sort_cols=("fingerprint", "ts_ns"))
    print(f"bucketed write ({n_series:,} series, {n_facts:,} facts): {time.time()-t0:.1f} s")

    for n_meas in (100, 1000):
        ms = [f"m{i}" for i in range(n_meas)]
        t0 = time.time()
        slice_ = spark.table("probe_reg").filter(F.col("measurement").isin(ms)).select("fingerprint")
        out = (
            spark.table("probe_facts")
            .join(slice_, "fingerprint")
            .groupBy(F.expr("ts_ns div 3600000000000").alias("hour"))
            .agg(F.avg("value").alias("mean"), F.count("*").alias("n"))
        )
        rows = out.collect()
        dt = time.time() - t0
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_exchange = plan.count("Exchange")
        # the single agg shuffle remains (groupBy hour); the JOIN itself
        # must contribute zero Exchange
        join_excerpt = "\n".join(
            l for l in plan.splitlines() if "SortMergeJoin" in l or "Exchange" in l or "FileScan" in l
        )
        n_slice = n_meas * (n_series // 1000)
        print(
            f"bucketed slice={n_slice:>10,} series: {dt:6.2f} s  "
            f"exchanges_in_plan={n_exchange} (agg only)\n{join_excerpt}"
        )

    spark.sql("DROP TABLE IF EXISTS probe_reg")
    spark.sql("DROP TABLE IF EXISTS probe_facts")
    spark.stop()


def main_disk(n_series: int = 100_000_000, n_facts: int = 100_000_000) -> None:
    """Disk-backed variant (VERDICT r3 #6 / NEXT.md #7): the registry
    and facts are MATERIALIZED TO PARQUET first and the sweep reads
    them back, so scan cost (IO, decode, row-group pruning) is real
    instead of a free codegen'd range(). This is the honest shape of
    the production query — LPStore reads both sides from parquet."""
    import shutil
    import tempfile

    spark = get_spark("registry-probe-disk", cpus=16)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    root = tempfile.mkdtemp(prefix="regprobe_")
    reg_path, facts_path = f"{root}/registry", f"{root}/facts"
    t0 = time.time()
    (
        spark.range(n_series)
        .select(
            F.xxhash64(F.col("id").cast("string")).alias("fingerprint"),
            F.concat(F.lit("m"), (F.col("id") % 1000).cast("string")).alias("measurement"),
            F.concat(F.lit("f"), (F.col("id") % 7).cast("string")).alias("name"),
        )
        .write.mode("overwrite")
        .parquet(reg_path)
    )
    (
        spark.range(n_facts)
        .select(
            F.xxhash64((F.col("id") % n_series).cast("string")).alias("fingerprint"),
            (F.col("id") * 1_000_000_000 % (86400 * 1_000_000_000)).alias("ts_ns"),
            (F.col("id") % 997 / 10.0).alias("value"),
        )
        .write.mode("overwrite")
        .parquet(facts_path)
    )
    sz = sum(f.stat().st_size for f in __import__("pathlib").Path(root).rglob("*.parquet"))
    print(
        f"materialized {n_series:,} series + {n_facts:,} facts in "
        f"{time.time()-t0:.1f} s ({sz/2**30:.2f} GiB parquet)"
    )

    try:
        reg = spark.read.parquet(reg_path)
        facts = spark.read.parquet(facts_path)
        for n_meas in (1, 10, 100, 1000):
            ms = [f"m{i}" for i in range(n_meas)]
            t0 = time.time()
            slice_ = reg.filter(F.col("measurement").isin(ms)).select("fingerprint")
            out = (
                facts.join(slice_, "fingerprint")
                .groupBy(F.expr("ts_ns div 3600000000000").alias("hour"))
                .agg(F.avg("value").alias("mean"), F.count("*").alias("n"))
            )
            rows = out.collect()
            dt = time.time() - t0
            plan = out._jdf.queryExecution().executedPlan().toString()
            strategy = "broadcast" if "BroadcastHashJoin" in plan else (
                "sort-merge" if "SortMergeJoin" in plan else
                "shuffled-hash" if "ShuffledHashJoin" in plan else "?"
            )
            n_slice = n_meas * (n_series // 1000)
            print(
                f"disk slice={n_slice:>12,} series ({n_meas:>4} measurements): "
                f"{dt:6.2f} s  join={strategy}  out_rows={len(rows)}"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ns = int(args[0]) if args else 10_000_000
    nf = int(args[1]) if len(args) > 1 else 10_000_000
    if "--bucketed" in sys.argv:
        main_bucketed(ns, nf)
    elif "--disk" in sys.argv:
        main_disk(ns, nf)
    else:
        main(ns, nf)
