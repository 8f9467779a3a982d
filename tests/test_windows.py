"""Window operator tests: the segmented (skew-proof) lag must be
bit-identical to the plain per-series window on real data, including
segment-boundary rows and single-row segments."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cflux_spark.operators import windows
from cflux_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_segmented_equals_global(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = windows.series_difference(
        ev, key_cols=["user_id", "event_type"], order_tiebreak=["event_id"]
    ).select("event_id", "diff")
    seg = windows.series_difference_segmented(
        ev, key_cols=["user_id", "event_type"], order_tiebreak=["event_id"], segment_span_s=3600
    ).select("event_id", "diff")
    a = {r.event_id: r.diff for r in plain.collect()}
    b = {r.event_id: r.diff for r in seg.collect()}
    assert a == b and len(a) > 0


def test_segmented_tiny_span_many_boundaries(spark):
    """A 60s span forces nearly every row onto a segment boundary —
    the boundary-stitch path is exercised everywhere."""
    ev = load_table(spark, SF_DIR, "events").filter(F.col("user_id") < 20)
    plain = windows.series_difference(
        ev, key_cols=["user_id", "event_type"], order_tiebreak=["event_id"]
    ).select("event_id", "diff")
    seg = windows.series_difference_segmented(
        ev, key_cols=["user_id", "event_type"], order_tiebreak=["event_id"], segment_span_s=60
    ).select("event_id", "diff")
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in seg.collect()}
