"""Benchmark decontamination for training-data pipelines.

The standard pre-training hygiene step: drop (or flag) any training
document that contains an n-gram from an evaluation benchmark, so test
questions don't leak into the training set (the method popularized by
the GPT-3 / PaLM appendices: 8-13 token n-gram overlap).

Scale shape — the part that matters at 100 TB:

- Documents explode to token n-grams hashed to 64-bit longs
  (``xxhash64``), so the join key is a fixed-width long, not a string:
  the shuffle carries 8 bytes per gram instead of the gram text.
- The benchmark side is tiny by construction (eval suites are a few
  MB), so the join is a broadcast hash join: the exploded document
  side NEVER shuffles — contamination flagging is a map-only pass over
  the corpus followed by one doc-keyed aggregation.
- No all-pairs anything: cost is O(total tokens) + O(hits).

Tokenization is whitespace-normalized lowercase (single-space split),
chosen so a DuckDB oracle can reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_tokens(text_col: str):
    """Lowercase, collapse whitespace, split on single space."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " "),
        lambda x: x != "",
    )


def text_ngrams(
    df: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Explode each document into its space-joined token ``n``-grams:
    (id, gram). Documents shorter than ``n`` tokens yield no rows.
    Per-row n-gram generation is a higher-order transform (JVM-side,
    no Python), then one explode.

    The token array is materialized as a column in a FIRST projection:
    referencing the tokenize expression directly inside the transform
    lambda re-evaluates regexp+split once per gram (no common-
    subexpression elimination inside HOF lambdas) — measured 5.6×
    slower at sf0.1."""
    base = df.select(F.col(id_col), _norm_tokens(text_col).alias("_toks"))
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return base.select(
        F.col(id_col), F.explode(F.when(F.size(toks) >= n, grams).otherwise(F.array())).alias("gram")
    )


def benchmark_ngrams(
    bench: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct hashed n-grams of a benchmark corpus — the (small)
    build side of the contamination join."""
    return (
        text_ngrams(bench, n, text_col, id_col)
        .select(F.xxhash64("gram").alias("gram_hash"))
        .distinct()
    )


def flag_contamination(
    docs: DataFrame,
    bench_grams: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contamination flag + hit count against a benchmark
    n-gram set (as produced by :func:`benchmark_ngrams`).

    Output: (id, n_hits, contaminated). ``n_hits`` counts contaminated
    gram OCCURRENCES (a doc repeating a leaked answer 3× scores 3).
    The benchmark side is broadcast; the document side never shuffles
    for the join — the only shuffle is the final doc-keyed count."""
    grams = text_ngrams(docs, n, text_col, id_col).select(
        F.col(id_col), F.xxhash64("gram").alias("gram_hash")
    )
    hits = (
        grams.join(F.broadcast(bench_grams), "gram_hash")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
