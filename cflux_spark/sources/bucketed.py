"""Bucketed storage option for co-located fact⋈registry joins at
10^7+ series (SCALE.md 'Registry at 10^7'; round-2 probe follow-up).

The default store broadcasts the filtered registry slice (J1) — right
up to ~10^5-10^6 slice rows, where Catalyst falls back to sort-merge
and BOTH sides shuffle on fingerprint. At 100 TB the fact-side
Exchange is the whole cost: every join re-shuffles and re-sorts the
fact table.

Bucketing eliminates it. Write facts AND registry as bucketed tables —
``bucketBy(N, "fingerprint").sortBy("fingerprint")`` — and a
fingerprint equi-join plans as SortMergeJoin with **zero Exchange on
either side**: Spark trusts the on-disk bucketing as the required
hash partitioning (``spark.sql.sources.bucketing.enabled``, on by
default), and within-bucket sort files satisfy most of the sort
requirement. This mirrors the reference's physical design — ClickHouse
``ORDER BY (fingerprint, timestamp_ms)`` clusters facts by series
(cflux.js:152) — expressed the Spark-native way.

Trade-offs, stated: bucketed tables live in the session catalog (a
warehouse dir / metastore), bucket count is fixed at write time (pick
~cluster cores × small factor; re-bucket on major growth), and
streaming appends must write through the same table. The path-based
LPStore stays the default; this is the opt-in layout for
registry-heavy deployments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    key: str = "fingerprint",
    sort_cols: tuple[str, ...] = ("fingerprint",),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted catalog table on ``key``.

    Facts and registry written with the SAME (key, n_buckets) join
    co-located: no Exchange, no fact-side re-sort beyond the
    within-bucket merge."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    facts_table: str,
    registry_table: str,
    key: str = "fingerprint",
    how: str = "inner",
) -> DataFrame:
    """Fingerprint equi-join over two co-bucketed tables. With both
    sides bucketed on ``key`` with equal bucket counts this is a
    shuffle-free SortMergeJoin (verify: ``.explain`` has no Exchange);
    tests/test_bucketed.py asserts that plan shape."""
    return spark.table(facts_table).join(spark.table(registry_table), key, how)
