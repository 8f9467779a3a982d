"""Join operators (SURVEY.md §2.3).

The reference's single join shape: facts ``ANY INNER JOIN`` the deduped
series dimension ``USING (fingerprint)`` (cflux.js:750-764). ClickHouse
ANY-join semantics = at most one right row per key; we reproduce that
with an explicit dropDuplicates on the join key before a broadcast hash
join.

Scale notes: the series dimension (even at 10^8 series) is orders of
magnitude smaller than 100 TB of facts. When a name/tag filter is
applied first (the reference always does — PREWHERE name=..., line
755), the filtered slice is small enough to broadcast, making the join
shuffle-free on the fact side. When the dimension slice is too big to
broadcast, Catalyst falls back to sort-merge and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def any_inner_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str | list[str] = "fingerprint",
    dim_filter: Column | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1 — facts ⋈ dedup(dim) on `key`, ANY semantics.

    `dim_filter` is applied BEFORE dedup+broadcast, mirroring the
    reference's inner filtered subquery (cflux.js:751-763) and keeping
    the broadcast side minimal.
    """
    keys = [key] if isinstance(key, str) else list(key)
    d = dim.filter(dim_filter) if dim_filter is not None else dim
    d = d.dropDuplicates(keys)
    if broadcast_dim:
        d = F.broadcast(d)
    return facts.join(d, keys, "inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """As-of join: each left row gets the columns of the nearest right
    row per key — the time-series join the reference lacks (SURVEY §2.3
    'no as-of join anywhere in the reference').

    direction: 'backward' (latest right.ts <= left.ts, inclusive),
    'forward' (earliest right.ts >= left.ts), or 'nearest' (smaller
    absolute gap; backward wins exact ties — pandas merge_asof parity).
    tolerance_s bounds the match distance in seconds (out-of-tolerance
    matches become null, like merge_asof's tolerance).

    Executed as union + running ``last``/``first(_, ignorenulls)``
    window — ONE shuffle on (key, ts), no range-join row explosion: a
    naive range-join produces |matches| intermediate rows per left row
    and re-aggregates; this form is linear in |left| + |right| and the
    per-key sort is the same work a merge-based as-of does. At equal
    timestamps the right row sorts first (side marker 0 < 1), so the
    backward match is inclusive like DuckDB ``ASOF``.

    Right rows should be unique per (key, right_ts) — with duplicates,
    which row wins is tie-broken by the window order deterministically
    only up to the value columns.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    keys = [key] if isinstance(key, str) else list(key)
    vals = value_cols or [c for c in right.columns if c not in (*keys, right_ts)]
    # left_ts is carried as _asof_ts and renamed back at the end — keeping
    # it in lcols too would emit a duplicate timestamp column and make any
    # downstream reference to it AMBIGUOUS_REFERENCE
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    l = left.select(
        *keys,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in vals],
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in vals],
    )
    both = l.unionByName(r)
    # carry the matched right timestamp alongside each value via a
    # struct, so tolerance/nearest can reason about the gap
    wb = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward scan: right rows must still sort BEFORE left at equal ts
    # to be visible inclusively, so scan the same order from the end
    wf = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", "_side")
        .rowsBetween(0, Window.unboundedFollowing)
    )

    def tagged(c: str) -> Column:
        return F.when(
            F.col("_side") == 0, F.struct(F.col("_asof_ts").alias("t"), F.col(f"_r_{c}").alias("v"))
        )

    picks = []
    for c in vals:
        back = F.last(tagged(c), ignorenulls=True).over(wb)
        fwd = F.first(tagged(c), ignorenulls=True).over(wf)
        if direction == "backward":
            pick = back
        elif direction == "forward":
            # back-scan may see a right row at EXACTLY left.ts (sorted
            # before it); forward-inclusive prefers that exact match
            pick = F.when(back["t"] == F.col("_asof_ts"), back).otherwise(fwd)
        else:  # nearest — backward wins exact-distance ties
            bgap = F.col("_asof_ts").cast("double") - back["t"].cast("double")
            fgap = fwd["t"].cast("double") - F.col("_asof_ts").cast("double")
            pick = (
                F.when(back.isNull(), fwd)
                .when(fwd.isNull(), back)
                .when(fgap < bgap, fwd)
                .otherwise(back)
            )
        if tolerance_s is not None:
            gap = F.abs(F.col("_asof_ts").cast("double") - pick["t"].cast("double"))
            pick = F.when(gap <= F.lit(float(tolerance_s)), pick)
        picks.append(pick["v"].alias(f"_r_{c}"))

    filled = both.select(*keys, "_asof_ts", "_side", *lcols, *picks)
    out = filled.filter(F.col("_side") == 1).drop("_side")
    for c in vals:
        out = out.withColumnRenamed(f"_r_{c}", c)
    return out.withColumnRenamed("_asof_ts", left_ts)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join (see ``asof_join``)."""
    return asof_join(left, right, key, left_ts, right_ts, value_cols, direction="backward")


def semi_join_filter(
    facts: DataFrame,
    dim: DataFrame,
    key: str | list[str] = "fingerprint",
    dim_filter: Column | None = None,
) -> DataFrame:
    """J2 — restrict facts to series matching the dimension predicate
    (the reference's subquery-as-semi-join, cflux.js:751-763) without
    attaching dimension columns. left_semi never duplicates fact rows."""
    keys = [key] if isinstance(key, str) else list(key)
    d = dim.filter(dim_filter) if dim_filter is not None else dim
    return facts.join(F.broadcast(d.select(*keys).distinct()), keys, "left_semi")
