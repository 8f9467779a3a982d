"""Measured probe: min-label propagation (dedup_clusters) at scale —
per-round cost and the effect of the round-6 changes (convergence
flag folded into the propagation join instead of a second
labels⋈new_labels join per round; periodic localCheckpoint to bound
lineage/planning growth). Gives SCALE.md its number the way
merged_window_probe.py does for ungrouped windows.

The synthetic graph is the worst realistic shape for the operator:
``n_nodes`` nodes in chains of length ``chain_len`` (diameter
chain_len-1, so convergence needs ~chain_len rounds — far deeper than
real near-dup components, which are shallow stars).

Usage: python scripts/cluster_probe.py [n_nodes] [chain_len]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cflux_spark.extensions.dedup import dedup_clusters
from cflux_spark.session import get_spark


def main(n_nodes: int = 2_000_000, chain_len: int = 8, mode: str = "both") -> None:
    """``mode='ck'`` runs only the checkpointed variant — at 10^8
    edges the no-checkpoint control is a known DNF (the 10^7 run
    already pinned the 11x+ lineage-nesting cost), so the big probe
    measures just the production path."""
    spark = get_spark("cluster-probe", cpus=16)
    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    # chains: i -> i+1 within each block of chain_len consecutive ids
    pairs = (
        spark.range(n_nodes - 1)
        .filter((F.col("id") % chain_len) != (chain_len - 1))
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    nodes.cache().count()
    pairs.cache().count()

    results = {}
    variants = (("checkpoint_every=5", 5),) if mode == "ck" else (
        ("checkpoint_every=5", 5), ("no_checkpoint", 0)
    )
    for tag, ck in variants:
        t0 = time.monotonic()
        out = dedup_clusters(
            nodes, pairs=pairs, max_iter=chain_len + 4, checkpoint_every=ck
        )
        n_clusters = out.select("cluster_id").distinct().count()
        dt = time.monotonic() - t0
        results[tag] = dt
        expected = (n_nodes + chain_len - 1) // chain_len
        assert n_clusters == expected, (n_clusters, expected)
        print(f"{tag}: {dt:.1f} s  ({n_clusters} clusters, correct)")
    summary = " ".join(
        f"{'ck5' if 'checkpoint' in t else 'nock'}={dt:.1f}s" for t, dt in results.items()
    )
    print(f"RESULT n_nodes={n_nodes} chain_len={chain_len} {summary}")
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 8,
        sys.argv[3] if len(sys.argv) > 3 else "both",
    )
