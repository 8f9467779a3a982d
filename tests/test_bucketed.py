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
