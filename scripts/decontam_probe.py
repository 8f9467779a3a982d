"""Measured probe: semantic decontamination at scale — broadcast tier
vs grid cogroup for cosine_pairs_bulk when the candidate side is
benchmark-sized (round-7 VERDICT: the sharded cogroup replicated the
CORPUS ×n_shards into n_shards tasks; the broadcast tier is one
shuffle-free mapInPandas over corpus partitions).

Synthetic shape mirrors the 100 TB decontamination job: a large
corpus of unit-ish random vectors (deterministic per-id generation,
no driver materialization) against a 10^4-row benchmark. Timings go
to SCALE.md the way cluster_probe.py's do.

Usage: python scripts/decontam_probe.py [n_corpus] [n_bench] [dim]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cflux_spark.extensions.similarity import cosine_pairs_bulk
from cflux_spark.session import get_spark


def synth_vectors(spark, n: int, dim: int, seed: int, id_offset: int = 0):
    """Deterministic pseudo-random vectors generated EXECUTOR-side
    from the id (sin-hash mixing — cheap, codegen'd, no Python), so
    the probe scales without the driver ever holding a vector."""
    return (
        spark.range(n)
        .select((F.col("id") + id_offset).alias("vec_id"))
        .withColumn(
            "embedding",
            F.expr(
                f"transform(sequence(1, {dim}), "
                f"i -> sin(CAST(vec_id * {dim} + i + {seed} AS DOUBLE) * 12.9898) * 43758.5453 % 1.0)"
            ),
        )
    )


def main(n_corpus: int = 10_000_000, n_bench: int = 10_000, dim: int = 32) -> None:
    spark = get_spark("decontam_probe", cpus=32)
    corpus = synth_vectors(spark, n_corpus, dim, seed=1)
    bench = synth_vectors(spark, n_bench, dim, seed=2, id_offset=10**9)

    t0 = time.time()
    n_b = cosine_pairs_bulk(
        corpus, bench, threshold=0.9, exclude_same_id=False
    ).count()
    t_bcast = time.time() - t0
    print(f"broadcast tier: {n_b} pairs in {t_bcast:.1f}s "
          f"({n_corpus} corpus x {n_bench} bench, dim={dim})")

    t0 = time.time()
    n_g = cosine_pairs_bulk(
        corpus, bench, threshold=0.9, exclude_same_id=False,
        broadcast_threshold=None, n_shards=16, n_query_splits=4,
    ).count()
    t_grid = time.time() - t0
    print(f"grid tier:      {n_g} pairs in {t_grid:.1f}s")
    assert n_b == n_g, (n_b, n_g)
    print(f"speedup: {t_grid / t_bcast:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
