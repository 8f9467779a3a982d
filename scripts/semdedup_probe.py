"""SemDeDup scale probe (SCALE.md 'Round-4 pipeline operators').

Measures the claim that clustering bounds semantic dedup's quadratic
term: synthesize N unit vectors (clustered blobs + near-duplicate
copies), run ``similarity.semdedup`` at several k, and record wall
time plus the realized Σ|c|² pair-work (the per-cluster GEMM cost) —
which should fall ~linearly in k while wall time follows it, and the
planted duplicates should be dropped at every k (copies share an
argmin cell with their source by construction).

Run:  python scripts/semdedup_probe.py [n_vectors] [dim]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

sys.path.insert(0, ".")
from cflux_spark import get_spark  # noqa: E402
from cflux_spark.extensions import similarity  # noqa: E402


def main(n: int = 200_000, dim: int = 64) -> None:
    spark = get_spark("semdedup-probe", cpus=16)
    n_blobs, dup_frac = 32, 0.02
    n_dup = int(n * dup_frac)

    # synthesize on executors: blob centers from a hash of the blob id,
    # per-row noise from a hash of the row id — deterministic, no
    # driver-side matrix. Duplicates: rows [n, n+n_dup) copy row id-n
    # exactly (same blob, same noise seed).
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((n_blobs, dim)) * 3.0
    b_centers = spark.sparkContext.broadcast(centers)

    @pandas_udf("array<double>")
    def make_vec(ids: pd.Series) -> pd.Series:
        c = b_centers.value
        out = []
        for i in ids:
            src = int(i) if i < n else int(i) - n  # dup rows copy their source
            r = np.random.default_rng(src)
            v = c[src % n_blobs] + r.standard_normal(dim)
            out.append(v / np.linalg.norm(v))
        return pd.Series(out)

    vecs = (
        spark.range(n + n_dup)
        .withColumnRenamed("id", "vec_id")
        .withColumn("embedding", make_vec(F.col("vec_id")))
        .cache()
    )
    vecs.count()

    for k in (16, 64, 256):
        t = time.monotonic()
        res = similarity.semdedup(vecs, threshold=0.99, k=k, max_train_rows=250_000)
        per = res.groupBy("cluster").agg(
            F.count("*").alias("sz"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("drops"),
        )
        rows = per.collect()
        wall = time.monotonic() - t
        pair_work = sum(r.sz * r.sz for r in rows)
        drops = sum(r.drops for r in rows)
        print(
            f"k={k:4d}  wall={wall:6.1f}s  max_cell={max(r.sz for r in rows):7d}  "
            f"sum_sz2={pair_work:.2e}  drops={drops} (planted {n_dup})"
        )
    spark.stop()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
