"""Deterministic sampling for training-data pipelines.

RNG-based ``df.sample`` is irreproducible across engines, runs, and
repartitioning; content-hash sampling keys the decision to the row
itself: keep a row iff the top ``hex_chars`` of ``md5(key)`` fall under
a threshold. Properties that matter at 100 TB:

- engine-portable (md5 is identical everywhere — oracle-checkable),
- stable under repartition/shuffle/retry (no seed-per-partition drift),
- composable: the keep-1/16 sample is a strict subset of keep-2/16,
  so sample ladders (0.1% → 1% → 10%) nest without re-sampling,
- streams: a row's fate is decided on arrival, no coordination.

Lexicographic compare of fixed-width lowercase hex equals numeric
compare, so the filter is a single cheap string predicate evaluated
inside whole-stage codegen right after the scan (being a derived
expression it does not reach PushedFilters — column pruning still
applies, and the scan reads only the key + selected columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_sample(
    df: DataFrame,
    keep_buckets: int,
    hex_chars: int = 2,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep rows whose md5(key) top ``hex_chars`` hex digits are
    < ``keep_buckets`` — sampling rate = keep_buckets / 16**hex_chars.
    Deterministic, repartition-stable, and nested across rates."""
    space = 16**hex_chars
    if not 0 < keep_buckets <= space:
        raise ValueError(f"keep_buckets must be in (0, {space}]")
    thr = format(keep_buckets, f"0{hex_chars}x")
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, hex_chars)
    return df.filter(bucket < F.lit(thr))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    hex_chars: int = 4,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample web crawl
    to 1% but keep 100% of books): rate per ``strata_col`` value,
    unlisted strata dropped. Same hash-threshold mechanics, one pass,
    no shuffle."""
    space = 16**hex_chars
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, hex_chars)
    cond = None
    for value, rate in rates.items():
        thr = format(min(space, max(0, round(rate * space))), f"0{hex_chars}x")
        c = (F.col(strata_col) == value) & (bucket < F.lit(thr))
        cond = c if cond is None else (cond | c)
    if cond is None:
        raise ValueError("rates must be non-empty")
    return df.filter(cond)
