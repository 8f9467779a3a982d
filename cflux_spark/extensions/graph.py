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
redistributes uniformly — the standard correction, keeps Σr = 1).

Round 12 (VERDICT r11 item 2): ranks are carried as INTEGER FIXED
POINT (``RANK_SCALE`` = 1e12 quanta of mass). Each per-edge
contribution round(rankf/outdeg) and the dangling share round(dangf/N)
are single correctly-rounded double ops of exact integers, re-rounded
to integers, so every Σ in the update is EXACT, ORDER-INDEPENDENT
long arithmetic — immune to shuffle-order float-sum nondeterminism
(the hazard the old 12-dp per-iteration rounding merely suppressed)
and trivially replayable by the SQL oracle. Per-iteration
quantization error ≤ 0.5e-12 per node, the same magnitude the old
rounding introduced.

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


# one unit of PageRank mass = 1e12 quanta; all inter-iteration state
# is long counts of quanta (see module docstring)
RANK_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    round_to: int = 6,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Batch power-iteration PageRank over an (src, dst) edge frame.
    Nodes = distinct endpoints; duplicate edges count once (the crawl
    dedup convention). Output: (node, rank) with rank rounded to
    ``round_to``; Σ rank ≈ 1 (within N·5e-13 of fixed-point
    quantization).

    The returned frame reads the final iteration's CACHE — the caller
    owns it and should ``.unpersist()`` (or let the session end) when
    done; repeated calls in one long-lived session otherwise
    accumulate node-sized cached frames.

    ``checkpoint_every`` > 0 truncates lineage with an eager
    localCheckpoint every K iterations instead of the persist+count
    step barrier. The contrib + dangling stages reference the cached
    rank frame TWICE, so the LOGICAL plan grows ~2^t even though
    execution reads the cache — measured: 6 iterations over the sf1
    fixture graph OOMed a 16 GB driver at analysis time without
    truncation (scripts/pagerank_convergence_probe.py, round 12).
    Anything beyond the contracted 3 iterations should set it; the
    knob is value-invariant (unit-pinned)."""
    # Loop-invariant frames are computed ONCE and persisted (round-12
    # optimization, guide §2.4): the old shape re-ran the edge
    # distinct, the outdeg aggregation, and the dangling anti-join
    # lineage inside EVERY iteration's step-barrier job. ``edeg``
    # (edges with out-degree attached) is the per-iteration join's
    # left side — cached already partitioned by src, so each iteration
    # shuffles only the node-sized rank frame; ``dang_nodes`` (the
    # no-out-link node set) turns the per-iteration anti-join into a
    # node-sized semi-join against a cached frame.
    # the deduped edge frame is the root of EVERY loop-invariant
    # derivation (nodes, outdeg, edeg, the dangling set) — persist it
    # so the upstream edge construction (for the catalog fixture: a
    # scan + global row_number window + join) runs once, not once per
    # derivation job
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # node count as a DRIVER LITERAL (the accepted 1-row-aggregate
    # collect idiom): the old per-iteration crossJoin(broadcast(n1))
    # paid one broadcast-exchange job EVERY iteration for a number
    # that never changes. The count also materializes the e + nodes
    # caches so the planner sees real sizes instead of parquet guesses.
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    # edeg materializes lazily inside iteration 1's contrib job (one
    # fewer step-barrier job than an eager count; AQE re-plans the
    # iteration joins from REAL runtime sizes at each stage boundary,
    # so the eager-stats barrier bought nothing — measured round 12)
    edeg = e.join(outdeg, "src").persist()
    dang_nodes = nodes.join(
        outdeg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    scale = F.lit(float(RANK_SCALE))
    ranks = nodes.select(
        "node", F.round(scale / F.lit(float(n))).cast("long").alias("rankf")
    ).persist()
    d = float(damping)
    for it in range(iterations):
        # per-edge quantum transfer: one correctly-rounded division of
        # exact longs, re-quantized — the Σ below is exact integer
        # arithmetic, order-independent under any shuffle
        contrib = (
            edeg.join(ranks.select(F.col("node").alias("src"), "rankf"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(F.round(F.col("rankf") / F.col("_deg")).cast("long")).alias(
                    "_inf"
                )
            )
        )
        dangling = (
            ranks.join(dang_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rankf"), F.lit(0)).cast("long").alias("_dangf"))
        )
        nxt = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    (F.lit(1.0) - d) * scale / F.lit(float(n))
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("_inf"), F.lit(0))
                        + F.round(F.col("_dangf") / F.lit(float(n))).cast("long")
                    )
                )
                .cast("long")
                .alias("rankf"),
            )
        )
        if checkpoint_every > 0 and (it + 1) % checkpoint_every == 0:
            # eager localCheckpoint materializes AND truncates lineage
            nxt = nxt.localCheckpoint(eager=True)
        else:
            # materialize BEFORE dropping the parent cache —
            # unpersisting first would force the next iteration to
            # recompute the whole lineage chain (node-sized job, one
            # per iteration, same as any production iterative job's
            # step barrier)
            nxt = nxt.persist()
            nxt.count()
        ranks.unpersist()
        ranks = nxt
    nodes.unpersist()
    e.unpersist()
    edeg.unpersist()
    dang_nodes.unpersist()
    return ranks.select(
        "node", F.round(F.col("rankf") / scale, round_to).alias("rank")
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    round_to: int = 6,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, JACM — public
    paper), the other classic link-quality prior for crawl corpora:
    authority(v) = Σ_{u→v} hub(u), hub(u) = Σ_{u→v} authority(v),
    each L1-normalized per half-step. Fixed iteration count, same
    replayable-batch philosophy as :func:`pagerank`.

    Like pagerank, scores are carried as INTEGER 1e-12 mass quanta
    (``RANK_SCALE``): each half-step is one equi-join + one keyed Σ of
    longs (exact, order-independent), then a renormalization
    ``round(score/Σ·1e12)`` — two correctly-rounded double ops of
    exact integers, bit-identical across engines, SQL-replayable.

    Scale shape (100 TB of edges): two edge⋈score joins + two keyed
    aggregations per iteration, node-sized score frames eagerly
    localCheckpoint-ed between half-steps, 1-row normalization
    aggregates broadcast — nothing collected. Each half-step
    references its parent TWICE (the join and the Σ normalizer), so
    unlike pagerank the logical plan would grow ~4^t without
    checkpointing — 3 iterations were enough to OOM the optimizer
    (measured on a 5-edge graph); lineage truncation per half-step is
    mandatory here, not a knob.

    Output: (node, authority, hub), each rounded to ``round_to``;
    Σ authority ≈ Σ hub ≈ 1. Nodes = distinct endpoints; duplicate
    edges count once."""
    # the deduped edge frame feeds BOTH half-steps of every iteration
    # (2·iterations joins) plus the node derivation — persist it once
    # instead of re-running the distinct inside every eager
    # checkpoint's job (round-12, guide §2.4)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n1 = nodes.agg(F.count("*").alias("_n"))
    scale = F.lit(float(RANK_SCALE))
    hubs = nodes.crossJoin(F.broadcast(n1)).select(
        "node", F.round(scale / F.col("_n")).cast("long").alias("hf")
    ).localCheckpoint(eager=True)
    auths = None
    for _ in range(iterations):
        # authority half-step: pull hub mass along in-edges. NOTE the
        # per-node Σ feeds BOTH the 1-row normalizer broadcast and the
        # node join, so the edge⋈scores join runs twice per half-step
        # (both passes read the cached edge frame + the checkpointed
        # score frame). Persisting the Σ instead was measured SLOWER
        # at bench scale (+0.4 s/run — CacheManager bookkeeping on a
        # node-sized frame outweighs the recompute); at production
        # iteration counts over 100 TB edge lists, persist the raw Σ
        # per half-step — the second pass there is the dominant cost.
        araw = (
            e.join(hubs.select(F.col("node").alias("src"), "hf"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hf").alias("_araw"))
        )
        asum = araw.agg(F.sum("_araw").alias("_s"))
        auths = (
            nodes.join(araw, "node", "left")
            .crossJoin(F.broadcast(asum))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("_araw"), F.lit(0)) / F.col("_s") * scale
                )
                .cast("long")
                .alias("af"),
            )
            .localCheckpoint(eager=True)
        )
        # hub half-step: pull the NEW authority mass along out-edges
        hraw = (
            e.join(auths.select(F.col("node").alias("dst"), "af"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("af").alias("_hraw"))
        )
        hsum = hraw.agg(F.sum("_hraw").alias("_s"))
        hubs = (
            nodes.join(hraw, "node", "left")
            .crossJoin(F.broadcast(hsum))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("_hraw"), F.lit(0)) / F.col("_s") * scale
                )
                .cast("long")
                .alias("hf"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return (
        nodes.join(auths, "node", "left")
        .join(hubs, "node", "left")
        .select(
            "node",
            F.round(F.coalesce(F.col("af"), F.lit(0)) / scale, round_to).alias(
                "authority"
            ),
            F.round(F.coalesce(F.col("hf"), F.lit(0)) / scale, round_to).alias("hub"),
        )
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation
    (Raghavan et al. 2007) over the UNDIRECTED view of an (src, dst)
    edge frame — the cheap community pass crawl pipelines run to
    group mirror/template site families before per-community
    sampling caps.

    Deterministic variant (so a SQL oracle replays it exactly):
    label_0(v) = v; each iteration every node adopts the most
    frequent label among its neighbors, ties broken by SMALLEST
    label, isolated nodes keep their label — synchronous updates, a
    FIXED iteration count, no randomized visit order (the published
    algorithm's asynchronous random order trades determinism for
    faster mixing; fixed-sweep synchronous LPA is the standard batch
    adaptation). All state is integer node ids — zero float
    exposure.

    Scale shape: per iteration one labels⋈edges equi-join (labels
    are node-sized, shuffled on the join key), one (node, label)
    count aggregate, one per-node argmax (a struct-max hash
    aggregate over candidate labels, ≤ degree per node), and one
    left join back onto the node set. Labels persist between
    iterations with the same persist→count→unpersist step barrier as
    :func:`pagerank`; the returned frame reads the final cache — the
    caller owns `.unpersist()`. Output: (node, community)."""
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    )
    # the undirected view joins against labels EVERY sweep — persist
    # it once instead of re-running the union+distinct inside every
    # iteration's step-barrier job (round-12, guide §2.4)
    und = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    nodes = und.select(F.col("a").alias("node")).distinct().persist()
    labels = nodes.select("node", F.col("node").alias("lab")).persist()
    # materialize the caches BEFORE the first sweep plans its join: an
    # unmaterialized InMemoryRelation reports default (huge) stats, so
    # the sweep joins would plan sort-merge where broadcast is right
    labels.count()
    for _ in range(iterations):
        neigh = (
            und.join(labels.select(F.col("node").alias("b"), "lab"), "b")
            .groupBy(F.col("a").alias("node"), "lab")
            .agg(F.count("*").alias("_c"))
        )
        # per-node argmax as a HASH AGGREGATE instead of a row_number
        # window (round-12, guide §2.4): struct max compares fields in
        # order, so max(struct(_c, -lab)) is exactly "most frequent
        # label, ties to the SMALLEST label" — (node, lab) rows are
        # unique post-aggregation, so the selection is deterministic —
        # while replacing the window's per-key sort with map-side
        # partial aggregation. (-lab is exact for any label id above
        # Long.MIN_VALUE; labels here are node ids.)
        best = (
            neigh.groupBy("node")
            .agg(
                F.max(F.struct(F.col("_c"), (-F.col("lab")).alias("_nl"))).alias("_m")
            )
            .select("node", (-F.col("_m._nl")).alias("_new"))
        )
        nxt = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce(F.col("_new"), F.col("lab")).alias("lab"))
            .persist()
        )
        nxt.count()  # step barrier: materialize before dropping the parent
        labels.unpersist()
        labels = nxt
    nodes.unpersist()
    und.unpersist()
    return labels.select("node", F.col("lab").alias("community"))
