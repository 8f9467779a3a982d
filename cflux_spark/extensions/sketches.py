"""Distributed frequency sketches (SURVEY.md §2.13 X46).

COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005, J. Algorithms —
public paper): the fixed-size frequency summary a 100 TB token pass
ships instead of its full vocabulary. depth×width counters; each item
increments one counter per row at position h_i(x); a point query
reads min_i counter[i][h_i(x)] — an overestimate, never an under-
estimate (the CMS guarantee), with error ≤ εN at probability 1−δ for
width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

Engine shape: the sketch IS a DataFrame of (row, col, cnt) — built by
one groupBy over the k-exploded occurrences (map-side combine makes
each partition's contribution a partial sketch; Spark's shuffle ADDS
partial sketches, which is exactly the CMS merge operation — the
reason sketches scale). depth·width ≤ a few thousand rows broadcast
back for point queries; the corpus never shuffles on anything wider
than the (row, col) counter key. All arithmetic is integer (md5-
derived Kirsch–Mitzenmacher positions, exact counts, min over k
longs), so the SQL oracle replays it bit-for-bit — the HLL tier
(q_hll_rollup) stays the approximate-cardinality sibling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(item, depth: int, width: int):
    """Kirsch–Mitzenmacher double hashing off one md5: position of
    ``item`` in sketch row i is (h1 + i·h2) mod width — the same
    two-hash recipe as the Bloom tier, so both engines derive
    identical counter coordinates."""
    h1 = F.conv(F.substring(F.md5(item), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(item), 9, 8), 16, 10).cast("long").bitwiseOR(
        F.lit(1)
    )
    return [((h1 + F.lit(i) * h2) % width).alias(f"_p{i}") for i in range(depth)]


def cms_build(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over an item frame — one row per
    occurrence, or (with ``weight_col``) one row per DISTINCT item
    carrying its count. The weighted form yields bit-identical
    counters while hashing each item once instead of once per
    occurrence — at sf1 that cut the q_cms_topk build from
    per-occurrence md5 over ~15M tokens to vocabulary-sized work
    (measured 11.3× → see SCALE.md). Returns the (row, col, cnt)
    counter frame — depth·width counters at most, usually far fewer
    (zero counters carry no row; point queries COALESCE absent
    counters to 0)."""
    pos = _positions(F.col(item_col), depth, width)
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    exploded = items.select(
        w.alias("_w"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), p.alias("col"))
                    for i, p in enumerate(pos)
                ]
            )
        ).alias("_rc"),
    ).select(F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"), "_w")
    return exploded.groupBy("row", "col").agg(F.sum("_w").alias("cnt"))


def cms_point_query(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Point-estimate each queried item's frequency: min over the
    sketch's depth rows of the counter at that item's position
    (0 when the counter row is absent). Output: (item, estimate).
    The estimate NEVER underestimates the true count — the CMS
    guarantee a contamination/top-k budget relies on, pinned by the
    oracle against exact counts."""
    pos = _positions(F.col(item_col), depth, width)
    probes = queries.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), p.alias("col"))
                    for i, p in enumerate(pos)
                ]
            )
        ).alias("_rc"),
    ).select(F.col(item_col), F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
    )
