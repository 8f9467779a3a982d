"""Z-order pruning-effectiveness probe (round 12, X52 evidence).

Writes the orders table twice — once z-ordered (`zorder_partition` on
(o_custkey, cents)) and once in natural order — then counts how many
parquet ROW GROUPS each layout could skip for a 2-dimensional range
predicate, using the files' own min/max column statistics (the same
stats Spark's parquet reader consults for row-group pruning). This is
the direct measurement of what the layout buys at 100 TB: a z-ordered
file covers a tight rectangle in (custkey, price) space, so a filter
on EITHER or BOTH dimensions overlaps few row groups; natural order
only helps the write-order column.

    SF=/root/testdata/sf0.1 python scripts/zorder_prune_probe.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def overlapping_row_groups(path_glob: str, pred: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(row groups that overlap the predicate box, total row groups)
    by min/max stats — a row group is skippable iff some predicate
    column's [min, max] misses its range."""
    hit = total = 0
    for f in sorted(glob.glob(path_glob)):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            total += 1
            g = meta.row_group(rg)
            stats = {}
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in pred and col.statistics is not None:
                    stats[name] = (col.statistics.min, col.statistics.max)
            ok = True
            for name, (lo, hi) in pred.items():
                mn, mx = stats[name]
                if mx < lo or mn > hi:
                    ok = False
                    break
            if ok:
                hit += 1
    return hit, total


def main() -> None:
    sf = os.environ.get("SF", "/root/testdata/sf0.1")
    n_files = int(os.environ.get("ZORDER_FILES", "16"))
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        # small row groups so one file holds several prunable units,
        # as a production table would
        .config("spark.hadoop.parquet.block.size", str(256 * 1024))
        .appName("zorder-prune-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cflux_spark.extensions.layout import zorder_partition, zorder_rank

    raw = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    stats = raw.agg(
        F.min("ck").alias("ck_min"),
        F.max("ck").alias("ck_max"),
        F.min("cents").alias("c_min"),
        F.max("cents").alias("c_max"),
    )
    # zorder_partition interleaves RANKS (bits-wide ints), not raw
    # values — raw cents would overflow the 16-bit budget and only
    # its noise bits would survive
    orders = raw.crossJoin(F.broadcast(stats))
    ranks = [
        zorder_rank(F.col("ck"), F.col("ck_min"), F.col("ck_max")),
        zorder_rank(F.col("cents"), F.col("c_min"), F.col("c_max")),
    ]
    lo = raw.agg(
        F.min("ck"), F.max("ck"), F.min("cents"), F.max("cents")
    ).first()
    ck_mid = (lo[0] + lo[1]) // 2
    c_mid = (lo[2] + lo[3]) // 2
    ck_w = max((lo[1] - lo[0]) // 10, 1)
    c_w = max((lo[3] - lo[2]) // 10, 1)
    pred = {
        "ck": (ck_mid, ck_mid + ck_w),
        "cents": (c_mid, c_mid + c_w),
    }

    out = tempfile.mkdtemp(prefix="zorder_probe_")
    try:
        zorder_partition(orders, ranks, n_files).drop(
            "ck_min", "ck_max", "c_min", "c_max"
        ).write.mode("overwrite").parquet(f"{out}/zordered")
        raw.repartition(n_files).write.mode("overwrite").parquet(f"{out}/natural")
        res = {}
        for name in ("zordered", "natural"):
            hit, total = overlapping_row_groups(f"{out}/{name}/*.parquet", pred)
            res[name] = {"overlapping_row_groups": hit, "total_row_groups": total}
            print(f"{name}: {hit}/{total} row groups overlap the 10%x10% box")
        ratio = (
            res["natural"]["overlapping_row_groups"]
            / max(res["zordered"]["overlapping_row_groups"], 1)
        )
        print(f"pruning advantage: {ratio:.1f}x fewer row groups scanned when z-ordered")
        print("ZORDER_PRUNE_JSON " + json.dumps({"sf": sf, "pred": {k: list(v) for k, v in pred.items()}, **res, "advantage": ratio}))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
