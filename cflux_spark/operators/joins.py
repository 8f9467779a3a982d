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
