"""Scale-adaptive parallelism helpers (round-12 optimization).

The repo's expensive map kernels (per-gram md5 builds, Python codec
kernels, token filters) hang directly off parquet scans. A small
single-file scan plans as ONE partition, and — the subtle half — a
keyed ``repartition(F.col(k))`` WITHOUT an explicit partition count
has shuffle origin REPARTITION_BY_COL, which AQE's partition
coalescing is allowed to fold back together; with doc-level rows a
few MB compressed, the advisory size folds them to one partition and
the kernel serializes on one core anyway (measured on the multimodal
codec chain: 7.7 s in one task, 1.9 s after pinning).

``spread_by`` pins the count (REPARTITION_BY_NUM — exempt from AQE
coalescing) to the session's core count: proportional to the cluster,
never a constant tuned for one box. Use it where the rows shuffled
are doc-level (ids or token arrays, cheap to move at any scale) and
the work ABOVE the exchange is the expensive part; do NOT use it on
payload-heavy frames — at 100 TB those arrive partitioned from any
real multi-file source and a forced re-shuffle would move the
payload bytes (guide §8's cardinal sin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def spread_by(df: DataFrame, *keys: Column | str) -> DataFrame:
    """Hash-repartition ``df`` by ``keys`` with a PINNED partition
    count equal to the session's default parallelism (core count —
    scale-adaptive, not AQE-coalescible). On a real cluster this is
    one cores-count exchange of doc-level rows before per-row-heavy
    work — load balancing, not overhead."""
    sc = df.sparkSession.sparkContext
    n = max(sc.defaultParallelism, 8)
    return df.repartition(n, *keys)
