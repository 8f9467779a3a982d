"""Measured probe: corpus-as-queries IVF-PQ at 100k+ vectors — the
shape the collected (round-4) ANN path could not run at all (10k query
cap). Synthesizes a clustered corpus (so IVF cells are meaningful),
builds the distributed stack, and times ivfpq_topk_bulk end to end.

Usage: python scripts/ann_bulk_probe.py [n_vectors] [dim]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cflux_spark.extensions import similarity
from cflux_spark.session import get_spark


def main(n: int = 100_000, dim: int = 32) -> None:
    spark = get_spark("ann-bulk-probe", cpus=16)
    # deterministic pseudo-clustered vectors: 64 blob centers from the
    # id hash, plus a small per-id jitter — no Date.now/randomness
    blob = (F.xxhash64(F.col("id")) % 64 + 64) % 64
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (
            F.sin(blob.cast("double") * i.cast("double"))
            + (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)).cast("double") / 5000.0)
        ),
    )
    df = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .repartition(64)
    )
    df.write.mode("overwrite").parquet("/tmp/ann_probe")
    emb = spark.read.parquet("/tmp/ann_probe")
    emb.count()

    t = time.monotonic()
    out = similarity.ivfpq_topk_bulk(
        emb, emb, k=3, nlist=64, nprobe=4, m=8, ksub=16, rerank=20
    )
    got = out.groupBy().agg(
        F.countDistinct("query_id").alias("nq"), F.count("*").alias("rows")
    ).collect()[0]
    dt = time.monotonic() - t
    print(f"ivfpq_topk_bulk corpus-as-queries: n={n:,} dim={dim} "
          f"-> {got.nq:,} queries, {got.rows:,} result rows in {dt:.1f} s")
    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    main(n, d)
