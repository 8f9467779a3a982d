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


def append_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    key: str = "fingerprint",
    sort_cols: tuple[str, ...] = ("fingerprint",),
) -> None:
    """Append a batch into an existing bucketed table (creates it on
    first write). Each append adds one sorted file per touched bucket;
    reads stay Exchange-free — Spark merges the per-file sorted runs
    with a Sort (cheap, within-partition) but never re-shuffles.
    Compaction cadence: periodically rewrite with ``write_bucketed``
    when file counts per bucket grow (same discipline as LPStore's
    compact()). Bucket spec must match the existing table — Spark
    rejects mismatches loudly."""
    (
        df.write.mode("append")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def stream_to_bucketed(
    stream_df: DataFrame,
    table: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
    key: str = "fingerprint",
    sort_cols: tuple[str, ...] = ("fingerprint",),
    trigger_seconds: float = 2.0,
):
    """Structured-Streaming sink into a bucketed table: each micro-batch
    appends through ``append_bucketed`` inside ``foreachBatch`` (the
    2 s trigger mirrors the reference's buffer maxAge, cflux.js:109-118).
    Checkpointing makes it at-least-once; the bucket spec is pinned by
    the arguments, so restarts keep the table consistent. Returns the
    started StreamingQuery.

    Reader caveat: Spark caches a data-source table's file listing per
    session, and micro-batches append through the stream's cloned
    session — a long-lived READER session must
    ``spark.catalog.refreshTable(table)`` to see new batches (the sink
    refreshes its own session after each append)."""

    def sink(batch: DataFrame, _epoch: int) -> None:
        append_bucketed(batch, table, n_buckets, key, sort_cols)
        batch.sparkSession.catalog.refreshTable(table)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
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
