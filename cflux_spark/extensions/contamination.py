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
    slower at sf0.1. The doc-level rows spread across cores with a
    pinned-count repartition before the gram build (round-12,
    functions/partitioning.py — a single-file scan otherwise runs the
    whole slice+join explosion in one task)."""
    from cflux_spark.functions.partitioning import spread_by

    base = spread_by(
        df.select(F.col(id_col), _norm_tokens(text_col).alias("_toks")), id_col
    )
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return base.select(
        F.col(id_col), F.explode(F.when(F.size(toks) >= n, grams).otherwise(F.array())).alias("gram")
    )


def text_ngrams_pos(
    df: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional variant of :func:`text_ngrams`: (id, pos, gram) with
    ``pos`` the 0-based token offset of the window start — the input
    to span-level dedup, where WHERE the duplicate sits matters.
    Same pinned-count spread as :func:`text_ngrams`."""
    from cflux_spark.functions.partitioning import spread_by

    base = spread_by(
        df.select(F.col(id_col), _norm_tokens(text_col).alias("_toks")), id_col
    )
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.struct(
            i.cast("int").alias("pos"), F.array_join(F.slice(toks, i + 1, n), " ").alias("gram")
        ),
    )
    return base.select(
        F.col(id_col),
        F.explode(F.when(F.size(toks) >= n, grams).otherwise(F.array())).alias("_w"),
    ).select(F.col(id_col), F.col("_w.pos"), F.col("_w.gram"))


def duplicate_spans(
    df: DataFrame,
    n: int = 20,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr-style duplicate span detection (the suffix-array
    method of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better", re-expressed relationally): every length-
    ``n`` token window occurring ≥ ``min_count`` times ACROSS THE
    CORPUS marks its positions, and per document the overlapping/
    adjacent marked windows merge into maximal spans — the byte ranges
    a pretraining pipeline cuts out (as opposed to doc-level dedup,
    which drops whole documents).

    Output: (id, span_start, span_end, n_windows) — token offsets,
    end exclusive; a doc with no duplicated window emits nothing.

    Scale shape: windows hash to 64-bit longs so the corpus-wide
    count shuffles 8-byte keys (O(total tokens)); the duplicated-hash
    set is output-sized and joins back hash-keyed; span merging is one
    per-doc sort window (gaps-and-islands: a new island starts when
    the next window start is more than ``n`` past the previous — i.e.
    the windows no longer overlap or touch). No suffix array needed:
    the fixed-width window grid finds every duplicated substring of
    length ≥ n, at the cost of span ends rounding to window
    granularity. 64-bit hash collisions can mark a false duplicate
    window (~p²/2^64 for p windows); acceptable for data curation,
    and the gram text can be carried instead when exactness matters."""
    from pyspark.sql import Window as _W

    w = text_ngrams_pos(df, n, text_col, id_col).select(
        F.col(id_col), F.col("pos"), F.xxhash64("gram").alias("_gh")
    )
    dup = w.groupBy("_gh").agg(F.count("*").alias("_c")).filter(F.col("_c") >= min_count)
    hits = w.join(dup.select("_gh"), "_gh").select(id_col, "pos")
    ww = _W.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.lag("pos").over(ww).isNull() | (F.col("pos") - F.lag("pos").over(ww) > n), 1
    ).otherwise(0)
    spans = hits.withColumn("_brk", brk).withColumn(
        "_span", F.sum("_brk").over(ww.rowsBetween(_W.unboundedPreceding, 0))
    )
    return spans.groupBy(id_col, "_span").agg(
        F.min("pos").cast("int").alias("span_start"),
        (F.max("pos") + n).cast("int").alias("span_end"),
        F.count("*").cast("int").alias("n_windows"),
    ).drop("_span")


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


def apply_span_cuts(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "cleaned",
) -> DataFrame:
    """Apply ExactSubstr cut ranges (:func:`duplicate_spans` output):
    drop every token whose 0-based offset falls inside a
    [span_start, span_end) range and reassemble the remainder with
    single spaces — the text a span-level dedup pass actually feeds to
    training. Documents with no spans pass through (left join) under
    the same normalization the span grid tokenized with (lowercase,
    collapsed whitespace), so offsets always line up.

    Plan shape: ranges aggregate to one row per AFFECTED doc
    (output-sized), join back doc-keyed, then a single HOF filter with
    an index lambda — the kept-token array is materialized ONCE before
    its two consumers (no-CSE rule). No shuffle beyond the doc-keyed
    join; linear in corpus tokens.

    Output: (id, cleaned, n_tokens_removed)."""
    ranges = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("_cuts")
    )
    from cflux_spark.functions.partitioning import spread_by

    base = (
        spread_by(df.select(F.col(id_col), _norm_tokens(text_col).alias("_toks")), id_col)
        .join(ranges, id_col, "left")
        .withColumn(
            "_cl",
            F.coalesce(F.col("_cuts"), F.expr("CAST(array() AS array<struct<s:int,e:int>>)")),
        )
    )
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.exists(F.col("_cl"), lambda c: (i >= c["s"]) & (i < c["e"])),
    )
    staged = base.select(F.col(id_col), F.col("_toks"), kept.alias("_kept"))
    return staged.select(
        F.col(id_col),
        F.array_join("_kept", " ").alias(out_col),
        (F.size("_toks") - F.size("_kept")).cast("int").alias("n_tokens_removed"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_shards: int = 16,
) -> DataFrame:
    """Embedding-level decontamination — the semantic tier of X6:
    flag every corpus item whose cosine similarity to ANY benchmark
    vector is ≥ ``threshold``. This catches the paraphrased-eval
    leakage that :func:`flag_contamination`'s exact n-gram overlap
    cannot see (a reworded benchmark answer shares no 8-gram but sits
    next to it in embedding space); run both — they are complementary
    gates over the same corpus.

    Output: one row per corpus item — (id, contaminated bool,
    max_sim double) with max_sim null for clean items (below-threshold
    similarities are never materialized).

    Scale shape: exact tier via :func:`~cflux_spark.extensions.
    similarity.cosine_pairs_bulk` with ``exclude_same_id=False`` (the
    two id spaces are unrelated). A benchmark-sized candidate side
    auto-selects the BROADCAST tier (round-7 VERDICT fix: the sharded
    cogroup replicated the 100 TB corpus ×n_shards into n_shards
    tasks) — the benchmark matrix ships to executors and one
    shuffle-free ``mapInPandas`` streams corpus partitions through
    the blocked GEMM: literally one map over the corpus, parallelism
    = corpus partitions. A benchmark too big to broadcast falls back
    to the (split, shard) grid cogroup; if it is genuinely huge, swap
    the pair generator for ivfpq_topk_bulk and keep the same
    flag/aggregate tail. The final LEFT join is id-keyed and
    AQE-broadcast (hits ≤ contaminated fraction of the corpus)."""
    from cflux_spark.extensions.similarity import cosine_pairs_bulk

    pairs = cosine_pairs_bulk(
        corpus.select(F.col(id_col), F.col(vec_col)),
        benchmark.select(F.col(id_col), F.col(vec_col)),
        threshold,
        id_col=id_col,
        vec_col=vec_col,
        n_shards=n_shards,
        exclude_same_id=False,
    )
    hits = pairs.groupBy("query_id").agg(F.max("sim").alias("max_sim"))
    return (
        corpus.select(F.col(id_col))
        .join(hits, F.col(id_col) == F.col("query_id"), "left")
        .select(
            F.col(id_col),
            F.col("max_sim").isNotNull().alias("contaminated"),
            "max_sim",
        )
    )


# ----------------------------------------------- Bloom-filter tier (X41)


def bloom_build(
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Compact Bloom-filter build over a benchmark's n-grams: the bit
    array as a (word_idx, word) frame of 64-bit words — ≤ m_bits/64
    rows (16,384 at the 2^20 default, ~128 KB), the thing a 100 TB
    decontamination pass actually broadcasts when the benchmark's raw
    gram set is too wide for a hash-set join (Bloom 1970).

    Engine-portable hashing (no RNG, DuckDB-replayable): the i-th of
    ``k`` positions is (h1 + i·h2) mod m_bits with
    h1 = int(md5(gram)[:8], 16), h2 = int(md5(gram)[8:16], 16) | 1
    (forced odd) — Kirsch–Mitzenmacher double hashing off one md5.
    Values stay < 2^35, no overflow in either engine's BIGINT.

    Map-only gram explosion + one ≤16k-row bitwise-OR aggregation."""
    grams = text_ngrams(bench, n, text_col, id_col).select("gram").distinct()
    h1 = F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("gram"), 9, 8), 16, 10).cast("long").bitwiseOR(
        F.lit(1)
    )
    hashed = grams.select(h1.alias("_h1"), h2.alias("_h2"))
    pos = hashed.select(
        F.explode(
            F.array(*[((F.col("_h1") + F.lit(i) * F.col("_h2")) % m_bits).alias(str(i)) for i in range(k)])
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            (F.col("pos") % 64).cast("int").alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), _bit)")).alias("word"))
    )


def bloom_probe(
    docs: DataFrame,
    bloom: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Per-document contamination verdict against a Bloom filter built
    by :func:`bloom_build` (same ``n``, ``m_bits``, ``k`` — the
    positions must replay identically). A gram occurrence "hits" iff
    ALL k probed bits are set; output (id, n_hits, contaminated)
    matches :func:`flag_contamination`'s shape, with the documented
    Bloom caveat: false positives at the configured rate, never false
    negatives.

    Scale: k-way position explosion is map-only; the ≤16k-row filter
    broadcasts; the per-gram all-bits-set check is one
    (id, gram-occurrence)-keyed aggregation followed by the doc-keyed
    count — the corpus never shuffles on anything wider."""
    # deterministic positional occurrence key (ADVICE r11: a
    # monotonically_increasing_id here was correct only while
    # assignment and the (id, _gidx) aggregation shared one lineage —
    # task retries / plan reuse could regenerate ids; pos is a pure
    # function of the data, matching the SQL oracle's gidx)
    occ = text_ngrams_pos(docs, n, text_col, id_col).select(
        F.col(id_col),
        F.col("pos").alias("_gidx"),
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long").alias("_h1"),
        F.conv(F.substring(F.md5("gram"), 9, 8), 16, 10)
        .cast("long")
        .bitwiseOR(F.lit(1))
        .alias("_h2"),
    )
    probes = occ.select(
        F.col(id_col),
        "_gidx",
        F.explode(
            F.array(*[((F.col("_h1") + F.lit(i) * F.col("_h2")) % m_bits).alias(str(i)) for i in range(k)])
        ).alias("pos"),
    ).select(
        F.col(id_col),
        "_gidx",
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        (F.col("pos") % 64).cast("int").alias("_bit"),
    )
    checked = probes.join(F.broadcast(bloom), "word_idx", "left").select(
        F.col(id_col),
        "_gidx",
        F.when(
            F.col("word").isNotNull()
            & (F.expr("(shiftright(word, _bit) & CAST(1 AS BIGINT))") == 1),
            1,
        )
        .otherwise(0)
        .alias("_set"),
    )
    per_gram = checked.groupBy(id_col, "_gidx").agg(
        (F.sum("_set") == k).cast("int").alias("_hit")
    )
    hits = per_gram.groupBy(id_col).agg(F.sum("_hit").alias("n_hits"))
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
