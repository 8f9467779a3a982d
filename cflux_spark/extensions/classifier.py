"""Model-based quality filtering (SURVEY.md §2.13 X39).

The standard CCNet/Gopher-pipeline stage between heuristic quality
scores and LM perplexity tiers: a LINEAR CLASSIFIER over hashed
n-gram bucket features trained in-engine on labeled good/bad
exemplars, then applied to the whole corpus as one broadcast-weights
pass. Here the exemplars come from the CCNet perplexity tiers (head =
positive, tail = negative — Wenzek et al. 2020's bootstrapping trick),
but any (doc_id, label) frame works.

The model is MULTINOMIAL NAIVE BAYES with Laplace(1) smoothing —
closed-form log-odds weights, the classic strong baseline of the
fastText lineage (Wang & Manning 2012's NB component; McCallum &
Nigam 1998) and the deterministic member of the linear-model family:

    w_b  = ln((c⁺_b + 1)/(T⁺ + B)) − ln((c⁻_b + 1)/(T⁻ + B))
    bias = ln(m⁺ / m⁻)
    log_odds(d) = bias + Σ_b cnt_{d,b} · w_b,   score = σ(log_odds)

Closed-form wins over iterated logistic GD here for a reason worth
recording: a SQL-replayable GD budget (a few unrolled full-batch
steps) cannot escape the optimizer's linear regime — the stable step
size is bounded by the feature second moment, and that bound is
invariant to feature rescaling, so three stable steps always produce
near-0.5 scores (measured: tier means 0.5032/0.5031/0.5030). The NB
weights are the infinite-data fixed point of the same feature map,
need ONE pass, and separate sharply.

Scale shape (100 TB): features reuse the DSIR hashed-gram map
(md5 buckets — map-only off the scan); training aggregates the
labeled exemplars into two ≤ n_buckets-row class histograms (map-side
combine) that stay DataFrames end to end — no driver-side model, no
collect anywhere in this module; scoring is one broadcast weight join
+ one doc-keyed aggregation. The corpus is never shuffled on anything
wider than the doc key.

Float-parity discipline (round 12, VERDICT r11 item 1): the trained
weights are QUANTIZED TO INTEGER FIXED POINT (×``FIXED_SCALE``,
round-half-away, cast long) the moment they leave the ln() calls, so
the per-document dot product ``bias_fixed + Σ cnt·w_fixed`` is exact,
order-independent integer arithmetic in every engine. ln/exp are not
IEEE-correctly-rounded; JVM Math.log and another engine's libm can
differ in the last ulp PER CALL, and a ~256-term accumulated dot
product of such values can land within an ulp of a decimal rounding
boundary — which is exactly the cross-environment hash flip the
round-11 driver caught. Quantizing each weight once (a single
rounding of a 2-ln expression, boundary-flip probability ~1e-9 per
weight instead of per doc·term) and keeping everything downstream
integer makes the compared ``log_odds = log_odds_fixed/FIXED_SCALE``
bit-identical across engines. The sigmoid ``score`` is an engine-side
convenience derived from the already-exact log_odds and is excluded
from hash-compared oracle projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# weight quantum: 1e-6 in log-odds units. Large enough that one ulp of
# cross-libm ln() disagreement (~1e-16 relative) cannot straddle a
# rounding boundary in practice; small enough that quantization error
# over a 10^4-gram document stays ≪ any decision margin.
FIXED_SCALE = 1_000_000


def _fixed(expr):
    """Quantize a double log-weight expression to fixed point:
    cast(round(expr · FIXED_SCALE) as long) — round is half-away-from-
    zero in both Spark and DuckDB, so both engines land on the same
    integer given inputs within an ulp of each other."""
    return F.round(expr * F.lit(float(FIXED_SCALE))).cast("long")


def hashed_doc_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Hashed unigram+bigram bucket counts per document:
    (doc_id, bucket, cnt, n_grams) — the multinomial bag-of-grams
    input, reusing the DSIR gram/bucket map
    (:func:`~cflux_spark.extensions.dsir.hashed_gram_occurrences`) so
    the SQL oracle replays the identical md5 bucketing. Docs with zero
    grams yield no rows (nothing to featurize). Map-only explosion +
    one doc-keyed aggregation."""
    from cflux_spark.extensions.dsir import hashed_gram_occurrences

    occ = hashed_gram_occurrences(df, text_col, id_col, n_buckets)
    feat = occ.groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt"))
    ng = feat.groupBy("doc_id").agg(F.sum("cnt").alias("n_grams"))
    return feat.join(ng, "doc_id").select("doc_id", "bucket", "cnt", "n_grams")


def train_nb_weights(
    labeled: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    n_buckets: int = 256,
    features: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Closed-form NB training: returns ``(weights, prior)`` —
    weights a (bucket, w_fixed) frame over every bucket either class
    observed, prior a 1-row (bias_fixed, w_missing_fixed) frame where
    ``w_missing_fixed`` is the log-ratio of a bucket neither class
    saw (both counts smoothed to 1 — NOT zero, because the class
    totals differ); scoring LEFT-joins weights and COALESCEs to it.
    All weights are integer fixed point (×``FIXED_SCALE``, see module
    docstring) so downstream dot products are exact in every engine.
    Both frames are ≤ n_buckets + 1 rows and broadcast at the score
    site — the model never touches the driver.

    ``label`` is 1/0 (truthy cast to double). Gradient-free: one gram
    explosion over the exemplars, two class histograms, arithmetic.

    ``features`` optionally supplies a precomputed
    :func:`hashed_doc_features` frame COVERING the labeled docs (e.g.
    the whole-corpus features the score pass needs anyway); the label
    join restricts it to the exemplars, so the exemplar text is not
    re-tokenized — the histogram is identical either way because
    featurization is per-document."""
    y = labeled.select(
        F.col(id_col).alias("doc_id"),
        (F.col(label_col).cast("double") > 0).alias("_pos"),
    )
    if features is None:
        features = hashed_doc_features(labeled, text_col, id_col, n_buckets)
    occ = features.join(y, "doc_id")
    hist = occ.groupBy("bucket").agg(
        F.sum(F.when(F.col("_pos"), F.col("cnt")).otherwise(F.lit(0))).alias("cp"),
        F.sum(F.when(~F.col("_pos"), F.col("cnt")).otherwise(F.lit(0))).alias("cn"),
    )
    tot = hist.agg(
        F.sum("cp").alias("tp"), F.sum("cn").alias("tn")
    )
    # Round 13 (VERDICT r12 item 1, the three-rounds-red driver row):
    # the weight/prior ln values are computed by the PORTABLE
    # basic-ops ln (functions/parity.py portable_ln_ratio_steps) —
    # bit-identical in Spark and DuckDB BY CONSTRUCTION, so the
    # engine libm leaves the lineage of the one query that carries
    # call-site quanta unrounded into its hashed output. The switch is
    # value-preserving here: portable-vs-libm disagreement is ≤ ~4e-15
    # while the smallest realized rounding margin is 7e-11 (measured,
    # OPTIMIZATION_r13.md) — verified bit-exact at sf0.001/0.01/0.1.
    from cflux_spark.functions.parity import portable_ln_ratio_steps

    b = int(n_buckets)
    base = hist.crossJoin(F.broadcast(tot))
    steps_p, out_p = portable_ln_ratio_steps("cp + 1", f"tp + {b}", "_pp")
    steps_n, out_n = portable_ln_ratio_steps("cn + 1", f"tn + {b}", "_pn")
    for name, body in steps_p + steps_n:
        base = base.selectExpr("*", f"{body} AS {name}")
    weights = base.selectExpr(
        "bucket",
        f"CAST(round(({out_p} - {out_n}) * 1000000.0E0) AS BIGINT) AS w_fixed",
    )
    # class prior from DOC counts; w_missing is the weight of a bucket
    # neither class observed (both smoothed to count 1) — needed when
    # a scored doc hits a bucket absent from the exemplars
    docs_per_class = y.agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("mp"),
        F.sum(F.when(~F.col("_pos"), 1).otherwise(0)).alias("mn"),
    )
    pbase = docs_per_class.crossJoin(tot)
    steps_b, out_b = portable_ln_ratio_steps("mp", "mn", "_pb")
    steps_mp, out_mp = portable_ln_ratio_steps("1", f"tp + {b}", "_pmp")
    steps_mn, out_mn = portable_ln_ratio_steps("1", f"tn + {b}", "_pmn")
    for name, body in steps_b + steps_mp + steps_mn:
        pbase = pbase.selectExpr("*", f"{body} AS {name}")
    prior = pbase.selectExpr(
        f"CAST(round(({out_b}) * 1000000.0E0) AS BIGINT) AS bias_fixed",
        f"CAST(round(({out_mp} - {out_mn}) * 1000000.0E0) AS BIGINT)"
        " AS w_missing_fixed",
    )
    return weights, prior


def score_quality(
    df: DataFrame,
    weights: DataFrame,
    prior: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    round_to: int = 4,
    features: DataFrame | None = None,
) -> DataFrame:
    """Score every document under trained NB weights: one broadcast
    weight join onto the hashed features (``features`` optionally
    supplies a precomputed :func:`hashed_doc_features` frame so a
    pipeline that already built it — e.g. for training — does not
    re-tokenize the corpus), one doc-keyed aggregation.
    Output: (doc_id, n_grams, log_odds, score, keep) with
    log_odds = (bias_fixed + Σ cnt·w_fixed) / FIXED_SCALE — an EXACT
    integer dot product divided once, so the value is bit-identical
    across engines (module docstring); score = σ(log_odds) of that
    exact double, rounded to ``round_to`` (engine-side convenience —
    a transcendental of a computed value, so oracle projections hash
    log_odds/keep, never score); keep = log_odds_fixed ≥ 0. Docs with
    zero grams carry no row (unfeaturizable — same contract as the
    DSIR weight tier)."""
    feats = (
        features
        if features is not None
        else hashed_doc_features(df, text_col, id_col, n_buckets)
    )
    joined = feats.join(F.broadcast(weights), "bucket", "left").crossJoin(
        F.broadcast(prior)
    )
    log_odds_fixed = F.any_value("bias_fixed") + F.sum(
        F.col("cnt") * F.coalesce(F.col("w_fixed"), F.col("w_missing_fixed"))
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.any_value("n_grams").alias("n_grams"),
            log_odds_fixed.alias("_lof"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("_lof") / F.lit(float(FIXED_SCALE))).alias("log_odds"),
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-F.col("_lof") / F.lit(float(FIXED_SCALE)))),
                round_to,
            ).alias("score"),
            (F.col("_lof") >= 0).alias("keep"),
        )
    )


def ccnet_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    lam: float = 0.75,
) -> DataFrame:
    """The bootstrapped CCNet/fastText pipeline end to end: label the
    corpus's perplexity HEAD tier positive and TAIL tier negative
    (:func:`~cflux_spark.extensions.text.bigram_logprob` +
    :func:`~cflux_spark.extensions.text.perplexity_buckets`), train
    the NB model on those exemplars, then score EVERY document —
    middle tier included; generalizing beyond the bootstrap labels is
    the point of the classifier.
    Output: (doc_id, n_grams, log_odds, score, keep).

    Round-12 optimization (guide §2.4 — remove recomputed passes):
    the corpus text is tokenized/hashed ONCE. ``lm`` is persisted
    because :func:`perplexity_buckets` both collects its domain at
    build time AND replays it inside the final plan (the old shape
    ran the whole bigram LM twice); the md5 feature frame is persisted
    and shared between training (restricted to the exemplars by a
    label join — exactly the oracle's ``feat JOIN train`` structure,
    identical histograms because featurization is per-document) and
    corpus-wide scoring (the old shape re-tokenized the exemplar text
    AND the corpus — three gram explosions; now one). The two
    independent corpus passes (LM and features) additionally OVERLAP
    (guide §2.6): the feature cache fills from a driver thread while
    the LM domain collect runs, so this stretch of the pipeline costs
    max(LM, features) wall time instead of their sum. Caches are
    doc-keyed aggregates (≪ corpus text); the caller/session owns
    `.unpersist()` — the graph.pagerank contract."""
    from pyspark import InheritableThread

    from cflux_spark.extensions.text import bigram_logprob, perplexity_buckets

    lm = bigram_logprob(docs, text_col=text_col, id_col=id_col, lam=lam).persist()
    feats = hashed_doc_features(docs, text_col, id_col, n_buckets).persist()
    # Overlap the two INDEPENDENT corpus passes (guide §2.6, round-12
    # optimization round): the md5 feature build does not depend on
    # the LM tiers, so its cache fills from a driver thread while
    # perplexity_buckets collects the LM score domain below — the
    # same two jobs, the same values, executed concurrently instead
    # of back to back (Spark's scheduler back-fills idle cores; cache
    # block locking serializes any overlapping partition compute).
    filler = InheritableThread(target=feats.count)
    filler.start()
    try:
        tiers = perplexity_buckets(lm)
    finally:
        filler.join()
    labels = tiers.filter(F.col("bucket").isin("head", "tail")).select(
        F.col("doc_id").alias(id_col),
        F.when(F.col("bucket") == "head", F.lit(1.0)).otherwise(F.lit(0.0)).alias(
            "label"
        ),
    )
    labeled = docs.join(labels, id_col)
    weights, prior = train_nb_weights(
        labeled,
        text_col=text_col,
        id_col=id_col,
        label_col="label",
        n_buckets=n_buckets,
        features=feats,
    )
    return score_quality(
        docs,
        weights,
        prior,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        features=feats,
    )
