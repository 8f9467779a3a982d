"""Readers for the driver's parquet tables and engine storage."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. The generated events table has shipped
    with two timestamp layouts across driver rounds, and we accept both:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so read
      as nanosecond longs (legacy conf, runtime-settable) and convert
      to TimestampType via integer µs division — `ts div 1000` stays in
      64-bit integer math (a double round-trip would lose precision
      above 2^53 ns).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): read as plain
      TimestampType (inferTimestampNTZ off, so with the UTC session
      zone the semantics are identical to NTZ) — `ts` stays the RAW
      parquet attribute, so time predicates written against it reach
      the scan as PushedFilters. `ts_ns` is derived (µs × 1000).

    Either way callers see the same shape: `ts` TimestampType plus
    `ts_ns` LongType with ts_ns == unix_micros(ts) * 1000."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(table_path(sf_dir, name))
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            if dt == "timestamp_ntz":  # session created before our conf
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            df = df.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
