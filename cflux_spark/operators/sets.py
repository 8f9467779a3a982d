"""Set operators (SURVEY.md §2.7): per-field UNION ALL.

The reference compiles ``SELECT f1, f2 FROM m`` into one sub-query per
field joined with UNION ALL (cflux.js:745-772). Spark: unionByName over
per-field DataFrames. Each branch carries a `field` discriminator
column (the reference keeps the field name in time_series.name).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """U1 — UNION ALL by column name; requires identical schemas."""
    if not dfs:
        raise ValueError("union_all of zero DataFrames")
    return reduce(lambda a, b: a.unionByName(b), dfs)
