"""Distributed first-order linear recurrences (e_i = a_i*e_{i-1} + b_i).

The primitive behind the InfluxQL technical-analysis transform family
(EXPONENTIAL_MOVING_AVERAGE and friends — InfluxDB 1.8 `SELECT`
function surface; the reference engine, cflux.js, has none of these).
Every one of those functions is a first-order linear recurrence once
its per-row coefficients are written down:

    EMA:  e_i = (1-alpha)*e_{i-1} + alpha*v_i
    RSI:  Wilder averages  g_i = (1-1/N)*g_{i-1} + gain_i/N
    KAMA: k_i = (1-sc_i)*k_{i-1} + sc_i*v_i   (sc_i data-dependent)

so the engine implements ONE scan operator and derives the family from
JVM-computed coefficient columns.

Why not a Window expression: Catalyst has no O(n) scan primitive — a
running product/fold with per-row coefficients is not expressible as a
window aggregate (cumulative sums cover only a == 1). Why not one big
``collect_list`` + ``F.aggregate`` fold per series: that materializes
a whole series as a single array in one task, the exact skew
``merged_window_stage`` exists to avoid.

Shape here (Blelloch-style scan over affine maps):

  1. rows bucket into ``segment_span`` slices of ``order_col`` per
     series — the unit of parallelism, same discipline as
     ``operators.windows.merged_running_sum``;
  2. ONE Arrow-batched kernel per (series, segment) computes, by an
     exact sequential fold from zero state, the within-segment pair
     (P_i = prod a, l_i = local recurrence) for every row — the only
     Python in the operator, sanctioned by SURVEY §2.10's policy note
     for sequential-recurrence kernels;
  3. per-segment summaries (one row each: P_end, l_end) compose
     across segments in the JVM — affine-map composition is plain
     algebra, folded per series over the TINY summary frame;
  4. each row finalizes as  e_i = l_i + P_i * c_in(segment)  with the
     carry broadcast back — pure codegen.

Exactness: the within-segment fold is the literal sequential
recurrence; cross-segment composition  e = l + P*c  is algebraically
identical to continuing the fold (floating-point rounding differs from
a single serial pass only in the usual last-ulp sense). ``a_i == 0``
forgets all history — callers encode warmup seeds that way. A segment
whose accumulated product underflows to 0.0 simply (and correctly)
stops propagating its carry.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# one hour of nanosecond timestamps — matches the merged_* operators
DEFAULT_SEGMENT_SPAN_NS = 3600 * 1_000_000_000


def linear_recurrence(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    a_col: str,
    b_col: str,
    out_col: str = "rec",
    segment_span: int = DEFAULT_SEGMENT_SPAN_NS,
) -> DataFrame:
    """Per-series  e_i = a_i * e_{i-1} + b_i  over rows ordered by
    ``order_col`` (ties broken by ``order_col`` only — callers with
    duplicate order values should dedup first, as the InfluxQL store
    does for same-timestamp points).

    ``keys`` may be empty: the whole frame is then ONE merged series
    and segments alone carry the parallelism (no single-partition
    stage — the per-row work still runs one task per segment; only the
    one-row-per-segment summary fold is driver-of-one-group sized).

    Contract: ``a_col``/``b_col`` non-null on every row (pre-filter
    null values); ``a_i == 0`` starts the recurrence over at ``b_i``.
    Returns ``df`` + ``out_col``; row count and all input columns are
    preserved.
    """
    seg = F.floor(F.col(order_col) / F.lit(int(segment_span))).cast("long")
    staged = df.withColumn("_seg", seg)

    out_schema = T.StructType(
        staged.schema.fields
        + [T.StructField("_p", T.DoubleType()), T.StructField("_l", T.DoubleType())]
    )
    a_name, b_name, o_name = a_col, b_col, order_col
    grp_cols = [*keys, "_seg"]

    # ONE streaming kernel over hash-partitioned, within-partition
    # sorted rows — NOT groupBy(keys, _seg).applyInPandas: sparse
    # series shatter into millions of tiny (series, segment) groups
    # and per-group Arrow slicing dominates (measured: 10^4 series x
    # 10^3 pts at 1000 s spacing -> 2.78M four-row groups, stalled;
    # this shape streams the same rows in one pass per partition,
    # resetting (P, l) at group boundaries). Parallelism and shuffle
    # are IDENTICAL to the groupBy form: hash on (keys, segment), so
    # a huge single series still spreads across its segments.
    def _scan_stream(batches):
        import numpy as np

        carry_key = None
        p, l = 1.0, 0.0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            a = pdf[a_name].to_numpy(dtype=float)
            b = pdf[b_name].to_numpy(dtype=float)
            # vectorized group-boundary mask (no per-row tuple builds)
            cols = [pdf[c].to_numpy() for c in grp_cols]
            change = np.zeros(n, dtype=bool)
            for arr in cols:
                change[1:] |= arr[1:] != arr[:-1]
            change[0] = carry_key != tuple(arr[0] for arr in cols)
            carry_key = tuple(arr[-1] for arr in cols)
            p_out = [0.0] * n
            l_out = [0.0] * n
            for i in range(n):
                if change[i]:
                    p, l = 1.0, 0.0
                p = a[i] * p
                l = a[i] * l + b[i]
                p_out[i] = p
                l_out[i] = l
            pdf["_p"] = p_out
            pdf["_l"] = l_out
            yield pdf

    scanned = (
        staged.repartition(*grp_cols)
        .sortWithinPartitions(*grp_cols, o_name)
        .mapInPandas(_scan_stream, out_schema)
    )

    # one row per (series, segment): the affine summary (A, B) = the
    # last row's (P, l). Carry-in for segment m is the recurrence value
    # at the end of segment m-1: c_m = B_{m-1} + A_{m-1} * c_{m-1},
    # folded in segment order over the tiny summary frame (JVM HOF —
    # arrays are #segments-per-series long, thousands at most).
    summaries = scanned.groupBy(*keys, "_seg").agg(
        F.max_by(F.struct(F.col("_p").alias("p"), F.col("_l").alias("l")), F.col(o_name)).alias(
            "_s"
        )
    )
    folded = summaries.groupBy(*keys).agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("_seg").alias("seg"), F.col("_s").alias("s")))
            ),
            F.struct(
                F.lit(0.0).alias("c"),
                F.expr("cast(array() as array<struct<seg: long, c: double>>)").alias("outs"),
            ),
            lambda acc, x: F.struct(
                (x["s"]["l"] + x["s"]["p"] * acc["c"]).alias("c"),
                F.concat(
                    acc["outs"],
                    F.array(F.struct(x["seg"].alias("seg"), acc["c"].alias("c"))),
                ).alias("outs"),
            ),
            lambda acc: acc["outs"],
        ).alias("_carries")
    )
    carries = folded.select(*keys, F.explode("_carries").alias("_e")).select(
        *keys, F.col("_e.seg").alias("_seg"), F.col("_e.c").alias("_cin")
    )
    joined = scanned.join(F.broadcast(carries), [*keys, "_seg"], "left")
    return (
        joined.withColumn(out_col, F.col("_l") + F.col("_p") * F.coalesce("_cin", F.lit(0.0)))
        .drop("_seg", "_p", "_l", "_cin")
    )


def merged_row_number(
    df: DataFrame,
    order_col: str,
    out_col: str = "_rn",
    segment_span: int = DEFAULT_SEGMENT_SPAN_NS,
) -> DataFrame:
    """1-based row number over the whole frame ordered by
    ``order_col`` without a single-partition WindowExec: rank within a
    fixed segment plus the prefix count of earlier segments (the
    row_number companion of ``operators.windows.merged_running_sum``).
    """
    seg = F.floor(F.col(order_col) / F.lit(int(segment_span))).cast("long")
    df2 = df.withColumn("_seg", seg)
    w_in = Window.partitionBy("_seg").orderBy(order_col)
    counts = df2.groupBy("_seg").agg(F.count(F.lit(1)).alias("_n"))
    w_pre = (
        Window.partitionBy(F.pmod(F.col("_seg"), F.lit(1)))
        .orderBy("_seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = counts.select(
        "_seg", F.coalesce(F.sum("_n").over(w_pre), F.lit(0)).alias("_before")
    )
    return (
        df2.join(F.broadcast(prefix), "_seg")
        .withColumn(out_col, (F.row_number().over(w_in) + F.col("_before")).cast("long"))
        .drop("_seg", "_before")
    )
