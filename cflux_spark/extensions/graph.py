"""Link-graph operators for web-corpus curation (SURVEY.md §2.13 X42).

PageRank (Page et al. 1999 — public paper) is the standard
link-structure quality prior for crawl corpora (Common-Crawl-scale
pipelines rank hosts/URLs by harmonic centrality or PageRank before
content filters ever run). This implementation is the batch power
iteration with a FIXED iteration count and per-iteration rounding, so
it is deterministic and a SQL oracle replays it value-exactly — the
same replayable-training philosophy as the NB classifier and the GD
study before it.

    r_{t+1}(v) = (1−d)/N + d·( Σ_{u→v} r_t(u)/outdeg(u) + dangling_t/N )

with dangling_t = Σ r_t over nodes with no out-links (their mass
redistributes uniformly — the standard correction, keeps Σr = 1), and
r_t rounded to 12 dp after each iteration so both engines carry
identical doubles into the next one (per-iteration float-sum order
differences are ~1e-15, far inside the rounding).

Scale shape (100 TB of edges): each iteration is one join of the edge
list against the rank frame (rank side is node-cardinality, shuffled
on the join key; with the edge list pre-partitioned by src the join
co-locates) + one dst-keyed aggregation + one broadcast 1-row
dangling/N frame. Ranks persist between iterations (node-sized — tiny
next to edges) so iteration t+1 never recomputes t. Nothing is
collected to the driver; the iteration count is fixed, not
convergence-tested, exactly like production batch PageRank over
daily crawl snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    iter_round: int = 12,
    round_to: int = 6,
) -> DataFrame:
    """Batch power-iteration PageRank over an (src, dst) edge frame.
    Nodes = distinct endpoints; duplicate edges count once (the crawl
    dedup convention). Output: (node, rank) with rank rounded to
    ``round_to``; Σ rank ≈ 1."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n1 = nodes.agg(F.count("*").alias("_n"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    ).persist()
    d = float(damping)
    for _ in range(iterations):
        contrib = (
            e.join(outdeg, "src")
            .join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_in"))
        )
        dangling = (
            ranks.join(outdeg.select(F.col("src").alias("node")), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        nxt = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    (F.lit(1.0) - d) / F.col("_n")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.col("_dang") / F.col("_n")
                    ),
                    iter_round,
                ).alias("rank"),
            )
            .persist()
        )
        # materialize BEFORE dropping the parent cache — unpersisting
        # first would force the next iteration to recompute the whole
        # lineage chain (node-sized job, one per iteration, same as any
        # production iterative job's step barrier)
        nxt.count()
        ranks.unpersist()
        ranks = nxt
    nodes.unpersist()
    return ranks.select("node", F.round("rank", round_to).alias("rank"))
