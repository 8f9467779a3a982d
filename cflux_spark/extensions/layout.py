"""Multi-dimensional data-layout operators (SURVEY.md §2.13 X52).

Z-ORDER (Morton-curve) clustering — the data-layout optimization a
100 TB lakehouse runs before multi-dimensional scans (the public
technique behind Delta Lake's OPTIMIZE ZORDER BY and the Morton 1966
ordering itself): interleave the bits of each dimension's rank so
rows close in EVERY dimension land close in the one-dimensional file
order, letting parquet min/max row-group stats prune scans that
filter on ANY subset of the z-ordered columns (a plain sort only
prunes its leading column).

Float parity (the oracle replays keys bit-for-bit): ranks come from
EXACT integer arithmetic only — ``(v − min)·(2^bits − 1)`` then an
exact integer division implemented as ``(a − pmod(a, b)) / b`` (the
subtraction makes the quotient an exactly-representable integer, so
the one double division is correctly rounded to it in every engine;
SQL mirrors it with ``//``). The Morton key is a pure bit-ops sum.
No transcendental, no float normalization.

Scale shape (100 TB): min/max is one columnar aggregate (1-row
broadcast back); the key is a map-side expression; the LAYOUT step is
``repartitionByRange(zkey)`` + ``sortWithinPartitions`` — one range
shuffle (sampled boundaries, AQE-coalesced), the same shuffle ANY
layout rewrite pays, then each output file covers a tight z-range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _div_exact(a: Column, b: Column) -> Column:
    """Exact long division for non-negative a and positive b: strip
    the remainder first so the double divide is of an exactly-
    representable integer quotient (correctly rounded in every
    engine). SQL mirror: ``a // b``."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def zorder_rank(v: Column, vmin: Column, vmax: Column, bits: int = 16) -> Column:
    """Scale an integral column to a ``bits``-bit rank in [0, 2^bits)
    using its (broadcast) min/max: rank = (v − min)·(2^bits − 1) //
    max(max − min, 1). All-equal columns rank 0."""
    span = F.greatest(vmax - vmin, F.lit(1)).cast("long")
    return _div_exact((v - vmin).cast("long") * F.lit((1 << bits) - 1), span)


def zorder_key(ranks: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``bits``-bit ranks into one long: bit b of
    dimension d lands at position b·D + d. Two 16-bit dims → a 32-bit
    key; pure shifts/ands/ors, identical in any engine."""
    d_n = len(ranks)
    key = F.lit(0).cast("long")
    for d, r in enumerate(ranks):
        for b in range(bits):
            key = key + (
                F.shiftleft(
                    F.shiftrightunsigned(r, b).bitwiseAND(F.lit(1)).cast("long"),
                    b * d_n + d,
                )
            )
    return key


def zorder_partition_auto(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = 16
) -> DataFrame:
    """`zorder_partition` over RAW integral columns: computes each
    column's min/max (one aggregate, broadcast back) and ranks
    internally. Exists because passing raw values where ranks belong
    silently interleaves overflow noise and prunes nothing — measured
    in scripts/zorder_prune_probe.py before this guard-rail existed."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"_zmin_{c}"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"_zmax_{c}"))
    stats = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats))
    ranks = [
        zorder_rank(
            F.col(c).cast("long"), F.col(f"_zmin_{c}"), F.col(f"_zmax_{c}"), bits
        )
        for c in cols
    ]
    out = zorder_partition(joined, ranks, n_partitions, bits)
    return out.drop(*[f"_zmin_{c}" for c in cols], *[f"_zmax_{c}" for c in cols])


def zorder_partition(
    df: DataFrame, rank_cols: list[Column], n_partitions: int, bits: int = 16
) -> DataFrame:
    """The production layout rewrite: range-partition on the Morton
    key and sort within each partition, so every output file covers a
    tight z-range and parquet min/max stats prune multi-dimensional
    filters. One range shuffle (sampled boundaries); the key column
    is dropped from the result."""
    keyed = df.withColumn("_zkey", zorder_key(rank_cols, bits))
    return (
        keyed.repartitionByRange(n_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
