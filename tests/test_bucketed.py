"""Bucketed-store plan shape: co-bucketed fact⋈registry sort-merge
joins must run with ZERO Exchange (the 10^7-series scale path —
SCALE.md 'Registry at 10^7', VERDICT r2 #4).
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cflux_spark.sources.bucketed import bucketed_join, write_bucketed  # noqa: E402


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    reg = spark.range(2000).select(
        F.xxhash64(F.col("id").cast("string")).alias("fingerprint"),
        F.concat(F.lit("m"), (F.col("id") % 10).cast("string")).alias("measurement"),
    )
    facts = spark.range(20000).select(
        F.xxhash64((F.col("id") % 2000).cast("string")).alias("fingerprint"),
        (F.col("id") % 997 / 10.0).alias("value"),
    )
    write_bucketed(reg, "t_reg_bucketed", n_buckets=8)
    write_bucketed(facts, "t_facts_bucketed", n_buckets=8)
    yield "t_facts_bucketed", "t_reg_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_facts_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_reg_bucketed")


def _executed_plan(df):
    df.collect()  # materialize so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    facts_t, reg_t = bucketed_tables
    # force the sort-merge path (the regime where bucketing matters —
    # small dims broadcast anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, facts_t, reg_t)
        plan = _executed_plan(out)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert out.count() == 20000


def test_bucketed_join_correct_vs_unbucketed(spark, bucketed_tables):
    facts_t, reg_t = bucketed_tables
    bucketed = (
        bucketed_join(spark, facts_t, reg_t)
        .groupBy("measurement")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
    )
    plain = (
        spark.table(facts_t)
        .join(spark.table(reg_t).hint("broadcast"), "fingerprint")
        .groupBy("measurement")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_filtered_slice_join_still_no_fact_exchange(spark, bucketed_tables):
    """The production shape: measurement-filtered registry slice joined
    to facts. The filter doesn't break bucket alignment — the fact side
    still reads in place."""
    facts_t, reg_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        slice_ = spark.table(reg_t).filter(F.col("measurement") == "m3").select("fingerprint")
        out = spark.table(facts_t).join(slice_, "fingerprint")
        plan = _executed_plan(out)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Exchange" not in plan, f"slice join shuffles:\n{plan}"
    assert out.count() == 2000


def test_append_bucketed_stays_exchange_free(spark):
    """Incremental appends add sorted runs per bucket; the join remains
    Exchange-free (a within-partition merge Sort is fine, a shuffle is
    not)."""
    from cflux_spark.sources.bucketed import append_bucketed

    reg = spark.range(500).select(
        F.xxhash64(F.col("id").cast("string")).alias("fingerprint"),
        F.lit("m").alias("measurement"),
    )
    write_bucketed(reg, "t_reg_app", n_buckets=4)
    for lo in (0, 500, 1000):
        batch = spark.range(lo, lo + 500).select(
            F.xxhash64((F.col("id") % 500).cast("string")).alias("fingerprint"),
            (F.col("id") / 10.0).alias("value"),
        )
        append_bucketed(batch, "t_facts_app", n_buckets=4)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = bucketed_join(spark, "t_facts_app", "t_reg_app")
        plan = _executed_plan(out)
        assert "SortMergeJoin" in plan and "Exchange" not in plan, plan
        assert out.count() == 1500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_facts_app")
        spark.sql("DROP TABLE IF EXISTS t_reg_app")


def test_stream_to_bucketed(spark, tmp_path):
    """Streaming micro-batches land in the bucketed table with the
    pinned bucket spec; at-least-once via checkpoint."""
    from cflux_spark.sources.bucketed import stream_to_bucketed

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        .select(
            F.xxhash64((F.col("value") % 100).cast("string")).alias("fingerprint"),
            F.col("value").cast("double").alias("v"),
        )
    )
    q = stream_to_bucketed(
        src, "t_stream_bucketed", str(tmp_path / "ckpt"), n_buckets=4, trigger_seconds=1.0
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                # reader sessions cache the table's file listing; appends
                # land via the stream's cloned session → refresh to see them
                spark.catalog.refreshTable("t_stream_bucketed")
                if spark.table("t_stream_bucketed").count() > 0:
                    break
            except Exception:
                pass
            time.sleep(1)
        spark.catalog.refreshTable("t_stream_bucketed")
        assert spark.table("t_stream_bucketed").count() > 0
        # table carries the bucket spec
        desc = spark.sql("DESCRIBE EXTENDED t_stream_bucketed").collect()
        txt = "\n".join(str(r) for r in desc)
        assert "fingerprint" in txt and ("Num Buckets" in txt or "bucket" in txt.lower())
    finally:
        q.stop()
        spark.sql("DROP TABLE IF EXISTS t_stream_bucketed")
