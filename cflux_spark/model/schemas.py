"""Physical schemas for the engine's two core tables.

Mirrors the reference data model (SURVEY.md §1; reference DDL at
cflux.js:152 for samples and cflux.js:164 for the series registry),
re-expressed for Spark:

- samples (facts): one row per (series, timestamp) observation. The
  reference stores ``timestamp_ms Int64``; Spark timestamps are µs
  precision, so we keep both a ``ts`` TimestampType (for window/bucket
  ops and partition pruning) and ``ts_ns`` LongType (exact line-protocol
  nanosecond round-trip).
- time_series (dimension): one row per unique series fingerprint.
  The reference stores parallel ``Array(String)`` labelname/labelvalue
  columns because old ClickHouse lacked Map; we use MapType plus the
  canonical JSON string (``labels``) the fingerprint is derived from.

At rest the fact table is Parquet partitioned by a derived ``date``
column (the reference partitions by hour-number; daily partitions are
the right grain for 100 TB — hourly would produce millions of tiny
partitions) and sorted within files by (fingerprint, ts) to mirror the
MergeTree ORDER BY and get Parquet min/max row-group skipping.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Fact rows. The reference routes each field write to a float row
# (value) or a string row (message) — cflux.js:362-369. We keep one
# unified schema with nullable value/message instead of two tables;
# `field` (reference: the redundant `string` col / time_series.name)
# names which field of the measurement this row carries.
SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("ts_ns", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("field", T.StringType(), False),
        T.StructField("measurement", T.StringType(), False),
    ]
)

# Series registry. `name` is the metric name = "<measurement>.<field>"
# in the reference's usage (time_series.name, cflux.js:322). `labels`
# is the canonical sorted-key JSON of the tag set (the fingerprint
# input). Latest-wins semantics (ReplacingMergeTree + FINAL,
# cflux.js:164,754) are enforced on read via dedup_registry().
TIME_SERIES_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("measurement", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("labels", T.StringType(), False),
    ]
)

# Subscription control table (reference: in-memory dict, cflux.js:102).
SUBSCRIPTIONS_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("target", T.StringType(), False),
    ]
)

# Parsed line-protocol rows (pre fan-out): one row per LP line.
PARSED_LINE_SCHEMA = T.StructType(
    [
        T.StructField("measurement", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("float_fields", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("string_fields", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("ts_ns", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)
