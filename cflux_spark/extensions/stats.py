"""Robust per-group feature statistics (SURVEY.md §2.13 X49).

Quality-score distributions differ wildly across corpus sources (a
news crawl's length histogram is nothing like a forum dump's), so
production filters threshold on PER-SOURCE ROBUST POSITION rather
than raw values: the median/IQR z-score (outlier-insensitive, the
scikit RobustScaler recipe) and the empirical CDF rank.

Float parity: medians/quartiles use CONTINUOUS interpolation
(pos = p·(n−1), linear between neighbors — the ANSI/NumPy default
shared by Spark ``percentile`` and DuckDB ``quantile_cont``); with
integer-valued inputs every interpolated value is a DYADIC rational
(f ∈ {0, .25, .5, .75}), hence an exact double in both engines, and
the z-score is one correctly-rounded division of exact doubles — no
transcendentals anywhere (functions/parity.py tier "pure rational").
``cume_dist`` is rows≤current / n, an integer ratio.

Scale shape (100 TB): quartiles are one groupBy aggregate over the
value column (map-side combine; group cardinality = sources,
broadcast back); the per-row z is a map-side expression after the
broadcast join. cume_dist is a per-group window — parallel across
groups, the one per-group sort this operator genuinely needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-group robust scaling of a numeric column. Output:
    (id, group, value, median, iqr, robust_z, pct_rank) where
    robust_z = (value − median)/iqr (0.0 when the group's IQR is 0 —
    a constant group has no spread to scale by) and pct_rank is the
    within-group cume_dist (fraction of rows ≤ this value)."""
    v = F.col(value_col).cast("double")
    stats = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(0.25)).alias("_q1"),
        F.percentile(v, F.lit(0.5)).alias("median"),
        F.percentile(v, F.lit(0.75)).alias("_q3"),
    )
    w = Window.partitionBy(group_col).orderBy(v)
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn("_iqr", F.col("_q3") - F.col("_q1"))
        .select(
            F.col(id_col),
            F.col(group_col),
            v.alias("value"),
            "median",
            F.col("_iqr").alias("iqr"),
            F.when(F.col("_iqr") == 0, F.lit(0.0))
            .otherwise(F.round((v - F.col("median")) / F.col("_iqr"), round_to))
            .alias("robust_z"),
            F.round(F.cume_dist().over(w), round_to).alias("pct_rank"),
        )
    )
