"""Structured Streaming ingest (SURVEY.md §2.9, §3.1).

Reference behavior → Spark mapping:

- ST1 micro-batch buffering (5000 rows / 2000 ms record-cache,
  cflux.js:109-124)            → ``trigger(processingTime="2 seconds")``
- ST2 at-most-once, no WAL (204-before-flush, cflux.js:351)
                               → upgraded: checkpointed foreachBatch =
                                 at-least-once; facts append is
                                 idempotent-enough for metrics (exact
                                 dedup on (fingerprint, ts_ns) possible
                                 at read); registry writes are
                                 anti-joined so replays add nothing
- ST4 new-series detection (LRU, cflux.js:326-330)
                               → left-anti join against the stored
                                 registry keys per batch
- ST5 subscription fan-out (cflux.js:313-315)
                               → pluggable per-batch callback (HTTP in
                                 prod, collecting sink in tests)

Scale notes: each micro-batch is a narrow parse → explode pipeline;
the only wide op is the registry anti-join, whose right side (existing
fingerprints) is broadcast when small. At 1000-executor scale the
source would be Kafka partitions; everything downstream is unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from cflux_spark.sources.ingest import LPStore


class StreamingIngest:
    """Wires a streaming DataFrame of raw LP lines into an LPStore."""

    def __init__(
        self,
        store: LPStore,
        checkpoint_dir: str,
        subscription_sink: Callable[[DataFrame], None] | None = None,
        default_ts_ns: int = 0,
        dedupe_window_s: int | None = None,
    ):
        self.store = store
        self.checkpoint_dir = checkpoint_dir
        self.subscription_sink = subscription_sink
        self.default_ts_ns = default_ts_ns
        self.dedupe_window_s = dedupe_window_s
        self.batches_seen = 0

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        self.batches_seen += 1
        if self.subscription_sink is not None:
            # ST5: mirror the raw write body before parsing, like the
            # reference forwards the unparsed POST body
            self.subscription_sink(batch)
        # collect_stats=False: the default would add two count() jobs
        # (facts, new_series) to EVERY micro-batch on top of the writes
        # — measurable headroom at a 2 s trigger. Row counts come free
        # from StreamingQuery.lastProgress (numInputRows) instead.
        self.store.write_batch(batch, default_ts_ns=self.default_ts_ns, collect_stats=False)

    def start(
        self,
        lines: DataFrame,
        trigger_seconds: float | None = 2.0,
        available_now: bool = False,
    ) -> StreamingQuery:
        """`lines` is a streaming DataFrame with one string column
        `line`. available_now=True drains what exists and stops
        (deterministic for tests); otherwise a 2 s processing trigger
        mirrors the reference's 2000 ms buffer age.

        With ``dedupe_window_s`` set, duplicate LINES (upstream
        at-least-once retransmits — the reference double-inserts them,
        cflux.js has no write dedup) are dropped across micro-batches
        via ``dropDuplicatesWithinWatermark``: state is bounded by the
        watermark window instead of growing forever, which is what
        makes streaming dedup viable on an unbounded 100 TB stream.
        Event time comes from the line's trailing ns timestamp
        (JVM regexp, no Python); lines without one fall back to
        processing time. The timestamp must be whitespace-separated
        and a plausible epoch width (10-19 digits): a bare field token
        like ``v=1`` must NOT match, or its trailing digits would be
        read as a ~1970 event time and the row silently dropped once
        other lines advance the watermark."""
        if self.dedupe_window_s:
            from pyspark.sql import functions as F

            ev = F.timestamp_micros(
                F.expr(r"TRY_CAST(regexp_extract(line, '\\s(\\d{10,19})\\s*$', 1) AS LONG) div 1000")
            )
            lines = (
                lines.withColumn("_evt", F.coalesce(ev, F.current_timestamp()))
                .withWatermark("_evt", f"{self.dedupe_window_s} seconds")
                .dropDuplicatesWithinWatermark(["line"])
                .drop("_evt")
            )
        writer = lines.writeStream.foreachBatch(self._process_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()


def file_line_source(spark: SparkSession, dir_path: str) -> DataFrame:
    """Streaming source over a directory of text files of LP lines
    (the test/file analogue of the reference's HTTP /write endpoint;
    in production this would be Kafka)."""
    return spark.readStream.format("text").load(dir_path).withColumnRenamed("value", "line")


def kafka_line_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Streaming source over a Kafka topic of LP lines — the production
    analogue of the reference's HTTP /write fan-in (cflux.js:298): at
    1000-executor scale, topic partitions are the parallelism unit and
    everything downstream of the `line` column is unchanged.

    Requires the spark-sql-kafka package on the classpath; this
    container has no broker or kafka jar, so the constructor raises a
    clear error instead of a cryptic provider failure (NEXT.md #5 —
    kept import-gated until verifiable)."""
    try:
        df = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # AnalysisException: failed to find data source
        raise RuntimeError(
            "Kafka source unavailable: spark-sql-kafka package not on the "
            "classpath (add org.apache.spark:spark-sql-kafka-0-10 via "
            "spark.jars.packages)"
        ) from exc
    return kafka_records_to_lines(df)


def kafka_records_to_lines(df: DataFrame) -> DataFrame:
    """The post-source transform of :func:`kafka_line_source`, split
    out so it is testable WITHOUT a broker (the sandbox has none):
    the Kafka record schema carries `value` as bytes; one LP line per
    record (Telegraf's kafka output mode) — batch-of-lines producers
    should split first. Parse parity with the file source is pinned
    by tests/test_streaming.py feeding the same corpus through this
    chain from a binary-value frame."""
    from pyspark.sql import functions as F

    return df.select(F.col("value").cast("string").alias("line"))


def rate_lp_source(spark: SparkSession, rows_per_second: int = 2500) -> DataFrame:
    """Synthetic LP line stream at a fixed rate (benchmark parity with
    the reference's implied 2,500 rows/s floor, BASELINE.md)."""
    from pyspark.sql import functions as F

    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.concat(
            F.lit("bench,host=h"),
            (F.col("value") % 8).cast("string"),
            F.lit(" v="),
            (F.col("value") % 1000).cast("string"),
            F.lit(".5 "),
            (F.unix_timestamp("timestamp") * F.lit(1_000_000_000) + F.col("value")).cast("string"),
        ).alias("line")
    )
