"""DSIR — Data Selection via Importance Resampling (SURVEY.md §2.13).

Implements the hashed-n-gram importance-resampling data selector of
Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", NeurIPS — public paper): score every raw document by how
much more likely its hashed n-gram bag is under a TARGET corpus's
distribution than under the RAW corpus's own, then sample
without replacement proportionally to the importance weights via
Gumbel top-k.

Everything is engine-portable-deterministic so a SQL oracle can replay
it bit-for-bit:

- tokenization is the BM25 idiom (lower, split on non-alphanumeric),
- grams hash to buckets through ``int(md5(gram)[:8], 16) % B`` (the
  sampling-module content-hash idiom — no RNG, no seed drift),
- bucket distributions are Laplace-smoothed categorical estimates,
- the Gumbel noise is DERIVED from the document id
  (``u = (int(md5(id || ':dsir')[:13], 16) + 0.5) / 2^52``,
  ``g = -ln(-ln(u))``) — faithful to the paper's Gumbel-top-k sampling
  yet reproducible across engines, runs, and repartitioning.

Scale shape (100 TB): gram explosion is map-only off the scan; the two
bucket histograms aggregate to ≤ ``n_buckets`` rows each (map-side
combine, then a broadcast-sized frame); the per-doc weight is one
broadcast join + doc-keyed aggregation; selection is TakeOrdered
(no global sort). Nothing quadratic, nothing driver-collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TWO_52 = float(1 << 52)


def hashed_gram_occurrences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """One row per unigram/bigram OCCURRENCE: (doc_id, bucket).
    Buckets are md5-hashed gram ids — the paper's hashed n-gram
    feature map, made engine-portable. Map-only (split + explode off
    the scan), no shuffle. The token array is MATERIALIZED in its own
    projection before any lambda references it — an expression
    referenced inside a HOF lambda is re-evaluated per element (no CSE
    across lambda boundaries), which turns tokenize into O(n²) per doc
    (the text_stats lesson; measured 10.7 s → sub-second on the sf0.1
    gram explosion)."""
    toks_expr = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+"),
        lambda x: x != F.lit(""),
    )
    # repartition doc-level rows BEFORE the gram explosion: the per-doc
    # weight aggregation shuffles on doc_id anyway, so this moves that
    # exchange above the expensive md5-per-gram build (parallel even
    # off a single-file scan) instead of adding one. PINNED count
    # (round-12): the unpinned form was AQE-coalesced back to one
    # partition at small shuffle sizes, re-serializing the md5 build
    # (functions/partitioning.py).
    from cflux_spark.functions.partitioning import spread_by

    base = spread_by(
        df.select(F.col(id_col).alias("doc_id"), toks_expr.alias("_toks")), "doc_id"
    )
    t = F.col("_toks")
    bi = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat(F.element_at(t, i + 1), F.lit(" "), F.element_at(t, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select("doc_id", F.explode(F.concat(t, bi)).alias("gram"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return grams.select("doc_id", bucket.alias("bucket"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    round_to: int = 4,
) -> DataFrame:
    """Per-raw-document log importance weight
    ``sum over gram occurrences of ln p_target(bucket) − ln p_raw(bucket)``
    with Laplace(1) smoothing: p(b) = (count_b + 1) / (total + B).
    Output: (doc_id, n_grams, log_weight), log_weight rounded for
    cross-engine hashing. Documents with zero grams carry no weight
    row (nothing to score).

    Both histograms collapse to ≤ n_buckets rows (map-side combine);
    the per-bucket log-ratio table broadcasts back onto the raw gram
    occurrences — the corpus is never shuffled on anything wider than
    the doc key."""
    occ = hashed_gram_occurrences(raw, text_col, id_col, n_buckets)
    raw_b = occ.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt_b = (
        hashed_gram_occurrences(target, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("ct"))
    )
    totals = raw_b.agg(F.sum("cr").alias("tr")).crossJoin(
        tgt_b.agg(F.sum("ct").alias("tt"))
    )
    # every occurring bucket exists in raw_b by construction; absent
    # target buckets smooth to count 0
    # per-bucket log-ratio quantized to integer fixed point at the
    # ln() call sites (functions/parity.py): the per-doc Σ is exact
    # long arithmetic — the accumulated cross-libm hazard the round-11
    # classifier failure exposed cannot reach log_weight
    from cflux_spark.functions.parity import FIXED_SCALE_LOG, fixed_log

    ratio = (
        raw_b.join(tgt_b, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            fixed_log(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                    / (F.col("tt") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("cr") + F.lit(1.0)) / (F.col("tr") + F.lit(float(n_buckets)))
                )
            ).alias("lrf"),
        )
    )
    return (
        occ.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(
                F.sum("lrf") / F.lit(float(FIXED_SCALE_LOG)), round_to
            ).alias("log_weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    round_to: int = 4,
) -> DataFrame:
    """Gumbel-top-k importance resampling: keep the k raw documents
    maximizing ``log_weight + Gumbel(doc_id)`` — equivalent to
    sampling k docs without replacement with probability ∝ exp(weight)
    (Gumbel-max trick), the paper's selection rule. The Gumbel draw is
    derived from md5(doc_id) so the selection is a pure function of
    the data. Output: (doc_id, log_weight, score), score descending
    via TakeOrdered — no global sort, ties broken on doc_id."""
    w = dsir_log_weights(raw, target, text_col, id_col, n_buckets, round_to)
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":dsir"))), 1, 13),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(TWO_52)
    # the Gumbel draw is quantized at its (nested-ln) call site so the
    # compared score is a sum of two bit-identical doubles — the
    # functions/parity.py discipline for transcendentals of computed
    # values (u itself is exact md5-derived rational arithmetic)
    from cflux_spark.functions.parity import fixed_log, unfix

    gumbel = unfix(fixed_log(-F.log(-F.log(u))))
    return (
        w.select(
            "doc_id",
            "log_weight",
            F.round(F.col("log_weight") + gumbel, round_to).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )
