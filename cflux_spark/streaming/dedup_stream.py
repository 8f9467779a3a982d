"""Streaming dedup-at-ingest: screen each micro-batch of documents
against a persisted MinHash index, keep the survivors, and register
their signatures so LATER micro-batches dedup against earlier ones.

This is the streaming composition of ``extensions.dedup.MinHashIndex``
(the reference has no document pipeline at all; the pattern here is
the standard crawl-ingest shape: an unbounded stream of scraped docs
must not re-admit near-duplicates of anything already accepted).

Why foreachBatch and not a stateful operator: the dedup state is the
INDEX — tens of TB of signatures at corpus scale — which belongs in
parquet on shared storage, not in per-executor streaming state (state
store checkpoints would rewrite it every batch and cap it at executor
memory). foreachBatch gives each micro-batch a batch-scoped DataFrame
to run the exact batch-mode operators on, so streaming and batch
screening share one implementation and agree bit for bit.

Delivery semantics: the kept-docs output is written to a
``batch_id=N`` subdirectory with dynamic partition OVERWRITE, so a
crash-replayed batch rewrites its own output idempotently. The
signature append is at-least-once — a replay can append the same
signatures twice — which is SAFE for screening (duplicate identical
signatures yield the same candidates) because the probe runs with
``exclude_same_id=True``: a replayed doc never matches its own
first-attempt signatures and vanishes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cflux_spark.extensions.dedup import MinHashIndex, minhash_lsh_pairs


class StreamingDedup:
    """Wires a streaming DataFrame of (id, text) documents through
    per-batch near-dup screening into a partitioned parquet of
    accepted docs + the growing signature index."""

    def __init__(
        self,
        index: MinHashIndex,
        out_dir: str,
        checkpoint_dir: str,
        threshold: float = 0.5,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.index = index
        self.out_dir = out_dir.rstrip("/")
        self.checkpoint_dir = checkpoint_dir
        self.threshold = threshold
        self.text_col = text_col
        self.id_col = id_col
        self.batches_seen = 0

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        self.batches_seen += 1
        idc, txc = self.id_col, self.text_col
        # corpus screen (self-matches excluded: replays must survive
        # their own first-attempt signatures)
        corpus_dups = (
            self.index.probe(batch, self.threshold, txc, idc, exclude_same_id=True)
            .select(F.col("batch_id").alias(idc))
            .distinct()
        )
        kept = batch.join(corpus_dups, idc, "left_anti")
        # in-batch screen: keep-lowest-id per candidate pair (same
        # greedy as MinHashIndex.dedup_batch)
        internal = minhash_lsh_pairs(
            kept, self.index.n, self.index.num_hashes, self.index.bands, txc, idc
        ).filter(F.col("est_jaccard") >= self.threshold)
        kept = kept.join(
            internal.select(F.col("id_b").alias(idc)).distinct(), idc, "left_anti"
        )
        # pin survivors before the index append (same lineage hazard
        # as dedup_batch: the plan reads the signature parquet lazily)
        kept = kept.localCheckpoint(eager=True)
        # idempotent output: a replayed batch overwrites ITS OWN
        # partition only (dynamic partition overwrite)
        (
            kept.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.out_dir)
        )
        self.index.append(kept, txc, idc)

    def start(
        self,
        docs: DataFrame,
        trigger_seconds: float | None = 2.0,
        available_now: bool = False,
    ) -> StreamingQuery:
        """``docs`` is a streaming DataFrame carrying at least
        (id_col, text_col). available_now=True drains what exists and
        stops (deterministic for tests)."""
        writer = docs.writeStream.foreachBatch(self._process_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()
