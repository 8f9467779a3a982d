"""Text-generation evaluation metrics (SURVEY.md §2.13 X40/X47/X48/X50).

BLEU (Papineni et al. 2002, ACL — public paper) with Lin & Och 2004
add-one smoothing for the higher orders: the standard automatic score
a data pipeline runs when it produces or filters paraphrases,
translations, summaries, or synthetic training text against
references. Everything is engine-portable-deterministic so the SQL
oracle replays it value-exactly:

- tokenization is the single-space + lower idiom shared with the
  bigram-LM tier,
- modified n-gram precision p_n = clipped_matches / candidate_grams
  with clipping = per-gram min(candidate_count, reference_count),
- smoothing δ = 1 on numerator and denominator for n ≥ 2 only (the
  Lin-Och sentence-BLEU recipe; p_1 unsmoothed, so a candidate with
  zero unigram overlap scores exactly 0),
- brevity penalty BP = exp(min(0, 1 − ref_len / cand_len)),
- BLEU = round(exp(min(0, 1 − r/c) + Σ_{n≤N} ln p_n / N), 6) — ONE
  exp call whose argument is built from integer-fixed-point log
  precisions (each ln quantized at its call site, the
  functions/parity.py discipline), so both engines feed the identical
  double into the single remaining transcendental; the residual
  cross-libm flip probability is ~2·ulp/10^-round_to per pair,
  measured by scripts/float_margin_probe.py.

Scale shape (100 TB): n-gram expansion is map-only off the scan
(grams built INSIDE the token array by indexed transforms — the
no-self-join house rule); counting shuffles on (id, n, gram) — the
pair key, never corpus-wide; the per-pair reduction is one doc-keyed
aggregation. Nothing quadratic, nothing driver-collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _toks(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), " "), lambda x: x != F.lit(""))


def _gram_rows_sided(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_n: int,
    min_n: int = 1,
) -> DataFrame:
    """(id, n, gram, c_cnt, r_cnt) counts over BOTH sides of a pair in
    ONE pass (round-12 optimization, guide §2.3/§2.4): the candidate
    and reference gram streams melt into a single explosion tagged by
    side, and one (_id, n, gram) aggregation pivots the side tag into
    the two count columns — replacing the old two-aggregate +
    shuffle-join shape (two Exchanges + an SMJ) with a single
    Exchange. Counts are 0 (never null) for a side that lacks the
    gram; every output row has c_cnt + r_cnt ≥ 1. Value-identical to
    joining two per-side (id, n, gram, cnt) aggregates — filtering
    c_cnt > 0 / r_cnt > 0 / both recovers the left / right / inner
    join variants."""
    from cflux_spark.functions.partitioning import spread_by

    base = spread_by(
        df.select(
            F.col(id_col).alias("_id"),
            _toks(F.col(cand_col)).alias("_ctoks"),
            _toks(F.col(ref_col)).alias("_rtoks"),
        ),
        "_id",
    )

    def gram_array(t: Column, n: int) -> Column:
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    orders = range(min_n, max_n + 1)
    wide = base.select(
        "_id",
        *[gram_array(F.col("_ctoks"), n).alias(f"_c{n}") for n in orders],
        *[gram_array(F.col("_rtoks"), n).alias(f"_r{n}") for n in orders],
    )
    stacked = wide.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"),
                        F.lit(side).alias("side"),
                        F.col(f"_{side}{n}").alias("grams"),
                    )
                    for n in orders
                    for side in ("c", "r")
                ]
            )
        ).alias("s"),
    ).select(
        "_id",
        F.col("s.n").alias("n"),
        F.col("s.side").alias("side"),
        F.explode("s.grams").alias("gram"),
    )
    return stacked.groupBy("_id", "n", "gram").agg(
        F.sum(F.when(F.col("side") == "c", 1).otherwise(0)).alias("c_cnt"),
        F.sum(F.when(F.col("side") == "r", 1).otherwise(0)).alias("r_cnt"),
    )


def bleu_scores(
    pairs: DataFrame,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    id_col: str = "pair_id",
    max_n: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Per-pair smoothed sentence BLEU over a (id, candidate,
    reference) frame. Output: (id, cand_len, ref_len, bleu).

    A pair whose candidate has no tokens, or zero unigram overlap with
    its reference, scores bleu = 0.0 (kept as a row — an evaluation
    that silently drops failures overstates the corpus mean).

    Both sides' grams are counted in ONE pass (:func:`_gram_rows_sided`
    — round-12: one Exchange where the per-side count + join shape had
    three); restricting to c_cnt > 0 reproduces the old left join's
    candidate-gram rows exactly."""
    joined = _gram_rows_sided(pairs, id_col, cand_col, ref_col, max_n).filter(
        F.col("c_cnt") > 0
    )
    per_n = joined.groupBy("_id", "n").agg(
        F.sum(F.least(F.col("c_cnt"), F.col("r_cnt"))).alias("clipped"),
        F.sum("c_cnt").alias("total"),
    )
    # smoothed log-precision: n=1 unsmoothed (null when clipped=0 —
    # the pair is forced to bleu 0 by the m1 guard below, so the null
    # never reaches a result), n>=2 add-one keeps the log finite. A
    # candidate shorter than n has no per_n row at all, which equals
    # the smoothed p=(0+1)/(0+1)=1 → ln 0 contribution exactly.
    from cflux_spark.functions.parity import FIXED_SCALE_LOG, fixed_log

    logp = F.when(
        F.col("n") == 1,
        F.when(F.col("clipped") > 0, F.log(F.col("clipped") / F.col("total"))),
    ).otherwise(
        F.log((F.col("clipped") + F.lit(1.0)) / (F.col("total") + F.lit(1.0)))
    )
    agg = per_n.groupBy("_id").agg(
        F.sum(F.when(F.col("n") == 1, F.col("clipped"))).alias("m1"),
        F.sum(fixed_log(logp)).alias("_slogpf"),
    )
    lens = pairs.select(
        F.col(id_col).alias("_id"),
        F.size(_toks(F.col(cand_col))).alias("cand_len"),
        F.size(_toks(F.col(ref_col))).alias("ref_len"),
    )
    # single exp on a bit-identical argument: BP·exp(Σlnp/N) folded
    # into exp(min(0, 1−r/c) + slogpf/1e9/N) — min/divisions are
    # correctly-rounded IEEE ops of exact integers
    arg = F.least(
        F.lit(0.0), F.lit(1.0) - F.col("ref_len") / F.col("cand_len")
    ) + (F.col("_slogpf") / F.lit(float(FIXED_SCALE_LOG))) / F.lit(float(max_n))
    bleu = F.when(
        (F.col("cand_len") == 0) | F.coalesce(F.col("m1") == 0, F.lit(True)),
        F.lit(0.0),
    ).otherwise(F.round(F.exp(arg), round_to))
    return (
        lens.join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cand_len",
            "ref_len",
            bleu.alias("bleu"),
        )
    )


def rouge_n_scores(
    pairs: DataFrame,
    n: int = 2,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    id_col: str = "pair_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-pair ROUGE-N RECALL (Lin 2004, ACL — public paper): the
    fraction of the REFERENCE's n-grams recovered by the candidate,
    with clipped counts — the summarization-side complement of BLEU's
    candidate-side precision:

        ROUGE-N = Σ_g min(c_cand(g), c_ref(g)) / Σ_g c_ref(g)

    A pair whose reference has no n-grams scores 0.0 (kept as a row —
    same keep-the-failures contract as BLEU). Pure RATIONAL arithmetic
    of integer counts — no transcendentals anywhere, so cross-engine
    parity is exact by construction (functions/parity.py tier "pure
    rational").

    Scale shape: identical to BLEU's — gram expansion map-only inside
    the token array, counting shuffles on the (pair, gram) key, one
    pair-keyed reduction. Output: (id, ref_grams, matched, rouge_n)."""
    joined = _gram_rows_sided(pairs, id_col, cand_col, ref_col, n, min_n=n).filter(
        F.col("r_cnt") > 0
    )
    agg = joined.groupBy("_id").agg(
        F.sum("r_cnt").alias("ref_grams"),
        F.sum(F.least(F.col("r_cnt"), F.col("c_cnt"))).alias("matched"),
    )
    base = pairs.select(F.col(id_col).alias("_id"))
    return (
        base.join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("ref_grams"), F.lit(0)).alias("ref_grams"),
            F.coalesce(F.col("matched"), F.lit(0)).alias("matched"),
            F.when(F.coalesce(F.col("ref_grams"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(F.col("matched") / F.col("ref_grams"), round_to)
            )
            .alias("rouge_n"),
        )
    )


def _char_gram_rows_sided(
    df: DataFrame, id_col: str, cand_col: str, ref_col: str, max_n: int
) -> DataFrame:
    """Two-sided CHARACTER n-gram counts in one pass: (id, n, gram,
    c_cnt, r_cnt), zeros for the absent side — the char twin of
    :func:`_gram_rows_sided` (round-12: single Exchange instead of two
    aggregates + a full outer join)."""
    from cflux_spark.functions.partitioning import spread_by

    base = spread_by(
        df.select(
            F.col(id_col).alias("_id"),
            F.regexp_replace(F.col(cand_col), r"\s+", "").alias("_cs"),
            F.regexp_replace(F.col(ref_col), r"\s+", "").alias("_rs"),
        ),
        "_id",
    )

    def gram_array(col: str, n: int):
        return (
            F.when(
                F.length(col) >= n,
                F.expr(
                    f"transform(sequence(1, char_length({col}) - {n} + 1),"
                    f" i -> substr({col}, i, {n}))"
                ),
            )
            .otherwise(F.array().cast("array<string>"))
        )

    orders = range(1, max_n + 1)
    wide = base.select(
        "_id",
        *[gram_array("_cs", n).alias(f"_c{n}") for n in orders],
        *[gram_array("_rs", n).alias(f"_r{n}") for n in orders],
    )
    stacked = wide.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"),
                        F.lit(side).alias("side"),
                        F.col(f"_{side}{n}").alias("grams"),
                    )
                    for n in orders
                    for side in ("c", "r")
                ]
            )
        ).alias("s"),
    ).select(
        "_id",
        F.col("s.n").alias("n"),
        F.col("s.side").alias("side"),
        F.explode("s.grams").alias("gram"),
    )
    return stacked.groupBy("_id", "n", "gram").agg(
        F.sum(F.when(F.col("side") == "c", 1).otherwise(0)).alias("c_cnt"),
        F.sum(F.when(F.col("side") == "r", 1).otherwise(0)).alias("r_cnt"),
    )


def chrf_scores(
    pairs: DataFrame,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    id_col: str = "pair_id",
    max_n: int = 6,
    beta: float = 2.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-pair chrF (Popović 2015, WMT — public paper): the
    character-n-gram F-score that correlates with human MT judgment
    better than BLEU on morphology-rich languages — the standard
    second opinion a pipeline scores translations/paraphrases with.

        P_n = matched_n / cand_grams_n,  R_n = matched_n / ref_grams_n
        F_n = (1+β²)·P_n·R_n / (β²·P_n + R_n)      (β = 2: recall-weighted)
        chrF = (Σ_{n≤N} F_n) / N

    Float parity: each P/R is ONE correctly-rounded division of exact
    integer counts and F_n a fixed-shape expression of those — both
    engines compute bit-identical F_n. The cross-order mean would be
    an order-sensitive double sum, so each F_n is quantized to 1e9
    fixed point and the Σ accumulates in longs (functions/parity.py
    discipline), one division at the end. An order with zero matched
    (or zero grams on either side) contributes F_n = 0; the mean
    always divides by max_n — the sacrebleu convention for short
    segments.

    Scale shape (100 TB): identical to BLEU's — char-gram expansion
    map-only inside the string, counting shuffles on the (pair, n,
    gram) key, one pair-keyed reduction. Output: (id, cand_chars,
    ref_chars, chrf)."""
    from cflux_spark.functions.parity import FIXED_SCALE_LOG, fixed_log

    joined = _char_gram_rows_sided(pairs, id_col, cand_col, ref_col, max_n)
    per_n = joined.groupBy("_id", "n").agg(
        F.sum(F.least(F.col("c_cnt"), F.col("r_cnt"))).alias("m"),
        F.sum("c_cnt").alias("c_tot"),
        F.sum("r_cnt").alias("r_tot"),
    )
    b2 = float(beta) * float(beta)
    p = F.col("m") / F.col("c_tot")
    r = F.col("m") / F.col("r_tot")
    f_n = F.when(
        (F.col("m") > 0) & (F.col("c_tot") > 0) & (F.col("r_tot") > 0),
        (F.lit(1.0 + b2) * p * r) / (F.lit(b2) * p + r),
    ).otherwise(F.lit(0.0))
    agg = per_n.groupBy("_id").agg(F.sum(fixed_log(f_n)).alias("_sf"))
    lens = pairs.select(
        F.col(id_col).alias("_id"),
        F.length(F.regexp_replace(F.col(cand_col), r"\s+", "")).alias("cand_chars"),
        F.length(F.regexp_replace(F.col(ref_col), r"\s+", "")).alias("ref_chars"),
    )
    return lens.join(agg, "_id", "left").select(
        F.col("_id").alias(id_col),
        "cand_chars",
        "ref_chars",
        F.round(
            F.coalesce(F.col("_sf"), F.lit(0))
            / F.lit(float(FIXED_SCALE_LOG))
            / F.lit(float(max_n)),
            round_to,
        ).alias("chrf"),
    )


def _lcs_length(cand: list, ref: list) -> int:
    """Exact LCS length via the running-max row recurrence, vectorized
    over the reference axis with numpy. The classic cell update
    dp[i][j] = max(dp[i-1][j], dp[i][j-1], dp[i-1][j-1] + match) folds
    into new[j] = runmax_{k<=j} max(old[k], old[k-1] + match(k)) —
    the within-row j-1 dependency becomes one np.maximum.accumulate
    pass, so each candidate token costs O(n) vectorized integer ops.
    Pure integer arithmetic: bit-identical in any environment."""
    import numpy as np

    m, n = len(cand), len(ref)
    if m == 0 or n == 0:
        return 0
    barr = np.asarray(ref, dtype=object)
    old = np.zeros(n + 1, dtype=np.int32)
    shifted = np.empty(n + 1, dtype=np.int32)
    for tok in cand:
        match = (barr == tok).astype(np.int32)
        shifted[0] = 0
        np.add(old[:-1], match, out=shifted[1:])
        np.maximum(old, shifted, out=shifted)
        np.maximum.accumulate(shifted, out=old)
    return int(old[n])


def rouge_l_scores(
    pairs: DataFrame,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    id_col: str = "pair_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-pair ROUGE-L (Lin 2004, ACL — public paper): the
    LCS-based member of the ROUGE family. With β = 1 the F-measure
    closes to 2·LCS/(cand_len + ref_len) — a pure rational of integer
    counts, so cross-engine parity is exact by construction
    (functions/parity.py tier "pure rational"). A pair with zero LCS
    or two empty sides scores 0.0 (kept as a row — the
    keep-the-failures contract shared with BLEU/ROUGE-N).

    The LCS kernel is the one operator in the evaluation family the
    DataFrame algebra genuinely can't express (a per-pair O(m·n)
    dynamic program), so it runs as an Arrow-batched ``mapInPandas``
    over JVM-built token arrays — tokenization stays engine-side (the
    shared single-space+lower idiom), Python sees only integer DP.
    ``id_col`` must be integral (cast to long through the Arrow
    boundary).

    Scale shape (100 TB): map-only off the scan — no shuffle, no
    join, no driver collect; per-pair work is O(m·n) vectorized ints,
    row-independent across the corpus. Output: (id, cand_len,
    ref_len, lcs, rouge_l)."""
    import pandas as pd

    base = pairs.select(
        F.col(id_col).cast("long").alias("_id"),
        _toks(F.col(cand_col)).alias("_c"),
        _toks(F.col(ref_col)).alias("_r"),
    )

    def run(batches):
        for pdf in batches:
            cl, rl, lcs = [], [], []
            for a, b in zip(pdf["_c"], pdf["_r"]):
                a, b = list(a), list(b)
                cl.append(len(a))
                rl.append(len(b))
                lcs.append(_lcs_length(a, b))
            yield pd.DataFrame(
                {"_id": pdf["_id"], "cand_len": cl, "ref_len": rl, "lcs": lcs}
            )

    raw = base.mapInPandas(run, schema="_id long, cand_len long, ref_len long, lcs long")
    return raw.select(
        F.col("_id").alias(id_col),
        "cand_len",
        "ref_len",
        "lcs",
        F.when(F.col("cand_len") + F.col("ref_len") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(2.0) * F.col("lcs") / (F.col("cand_len") + F.col("ref_len")),
                round_to,
            )
        )
        .alias("rouge_l"),
    )


def classification_report(
    df: DataFrame,
    pred_col: str,
    label_col: str,
    group_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Binary confusion counts + precision/recall/F1, optionally per
    group — the filter-threshold audit a pipeline runs when a
    keep/drop model replaces a heuristic. Pure rationals of exact
    integer counts (one aggregation pass, map-side combine); metrics
    with a zero denominator emit NULL rather than a fabricated 0.

    Output: (group?, tp, fp, fn, tn, precision, recall, f1)."""
    gcols = [group_col] if group_col else []
    p = F.col(pred_col).cast("boolean")
    y = F.col(label_col).cast("boolean")
    agg = df.groupBy(*gcols).agg(
        F.sum((p & y).cast("long")).alias("tp"),
        F.sum((p & ~y).cast("long")).alias("fp"),
        F.sum((~p & y).cast("long")).alias("fn"),
        F.sum((~p & ~y).cast("long")).alias("tn"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), round_to),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")), round_to),
    )
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        F.round(
            F.lit(2.0) * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            round_to,
        ),
    )
    return agg.select(
        *gcols, "tp", "fp", "fn", "tn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def distinct_n_scores(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    max_n: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Per-group distinct-n diversity (Li et al. 2016, NAACL — public
    paper): the fraction of n-gram OCCURRENCES that are distinct
    types — the standard mode-collapse / templated-text detector a
    pipeline runs over generated or scraped corpora (a source whose
    distinct-2 craters is boilerplate). Pure rational of integer
    counts — exact cross-engine parity by construction.

    Scale shape (100 TB): gram expansion map-only inside the token
    array (the no-self-join house rule); ONE (group, n, gram)
    counting shuffle; the per-(group, n) reduction both counts rows
    (types) and sums counts (occurrences) in the same pass. Output:
    (group, n, total_grams, distinct_grams, distinct_ratio)."""
    base = df.select(
        F.col(group_col).alias("_g"), _toks(F.col(text_col)).alias("_toks")
    )
    t = F.col("_toks")

    def gram_array(n: int):
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    wide = base.select("_g", *[gram_array(n).alias(f"_n{n}") for n in range(1, max_n + 1)])
    stacked = wide.select(
        "_g",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(n).alias("n"), F.col(f"_n{n}").alias("grams"))
                    for n in range(1, max_n + 1)
                ]
            )
        ).alias("s"),
    ).select("_g", F.col("s.n").alias("n"), F.explode("s.grams").alias("gram"))
    counted = stacked.groupBy("_g", "n", "gram").agg(F.count("*").alias("cnt"))
    return counted.groupBy("_g", "n").agg(
        F.sum("cnt").alias("total_grams"),
        F.count("*").alias("distinct_grams"),
        F.round((F.count("*") / F.sum("cnt")), round_to).alias("distinct_ratio"),
    ).withColumnRenamed("_g", group_col)


def auc_scores(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """ROC-AUC of a score against binary labels, optionally per group
    — the quality-classifier audit a pipeline runs before trusting a
    model's keep/drop threshold. Computed from the SCORE HISTOGRAM,
    not per-row ranks: AUC = P(score⁺ > score⁻) + ½·P(score⁺ =
    score⁻) (the Mann–Whitney U with midrank ties), which over
    distinct-score counts closes to

        2·P·N·AUC = Σ_s pos_s · (2·neg_below(s) + neg_s)

    — exact integer arithmetic end to end, one final division
    (functions/parity.py tier "pure rational"). Degenerate groups
    (no positives or no negatives) emit NULL.

    Scale shape (100 TB): one (group, score) aggregation with
    map-side combine; the window (cumulative negatives) runs over the
    DISTINCT-SCORE frame — histogram-sized, not corpus-sized — and is
    parallel across groups. Output: (group?, n_pos, n_neg, auc)."""
    from pyspark.sql import Window

    gcols = [group_col] if group_col else []
    lab = F.col(label_col).cast("int")
    hist = df.groupBy(*gcols, F.col(score_col).alias("_s")).agg(
        F.sum(lab).alias("_pos"),
        F.sum(F.lit(1) - lab).alias("_neg"),
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = hist.select(
        *gcols,
        "_pos",
        "_neg",
        (
            F.col("_pos")
            * (2 * F.coalesce(F.sum("_neg").over(w), F.lit(0)) + F.col("_neg"))
        ).alias("_num2"),
    )
    return contrib.groupBy(*gcols).agg(
        F.sum("_pos").alias("n_pos"),
        F.sum("_neg").alias("n_neg"),
        F.when(
            (F.sum("_pos") > 0) & (F.sum("_neg") > 0),
            F.round(
                F.sum("_num2") / (F.lit(2.0) * F.sum("_pos") * F.sum("_neg")),
                round_to,
            ),
        ).alias("auc"),
    )


def token_f1_scores(
    pairs: DataFrame,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    id_col: str = "pair_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-pair token-level F1 (the SQuAD evaluation metric —
    Rajpurkar et al. 2016): overlap = Σ_t min(c_cand(t), c_ref(t))
    over unigram bags, F1 = 2·overlap / (cand_len + ref_len). The
    harmonic mean of bag precision and recall in one closed form —
    the standard extractive-QA / span-answer evaluation a data
    pipeline runs over generated answers. Pure rational arithmetic of
    integer counts — exact cross-engine parity by construction.

    Both sides empty scores 1.0 (two empty answers agree — the SQuAD
    convention); one side empty scores 0.0.

    Scale: ONE two-sided (pair, token) counting shuffle
    (:func:`_gram_rows_sided`) + one pair-keyed reduction. Output:
    (id, cand_len, ref_len, overlap, f1)."""
    joined = _gram_rows_sided(pairs, id_col, cand_col, ref_col, 1).filter(
        (F.col("c_cnt") > 0) & (F.col("r_cnt") > 0)
    )
    ov = joined.groupBy("_id").agg(
        F.sum(F.least(F.col("c_cnt"), F.col("r_cnt"))).alias("overlap")
    )
    lens = pairs.select(
        F.col(id_col).alias("_id"),
        F.size(_toks(F.col(cand_col))).alias("cand_len"),
        F.size(_toks(F.col(ref_col))).alias("ref_len"),
    )
    return lens.join(ov, "_id", "left").select(
        F.col("_id").alias(id_col),
        "cand_len",
        "ref_len",
        F.coalesce(F.col("overlap"), F.lit(0)).alias("overlap"),
        F.when(
            (F.col("cand_len") == 0) & (F.col("ref_len") == 0), F.lit(1.0)
        )
        .when((F.col("cand_len") == 0) | (F.col("ref_len") == 0), F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("overlap"), F.lit(0))
                / (F.col("cand_len") + F.col("ref_len")),
                round_to,
            )
        )
        .alias("f1"),
    )


def cohen_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
    by: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Cohen's kappa inter-annotator agreement (Cohen 1960) between
    two label columns, optionally per group — the standard QA check
    on human or model-judge label streams before training on them.

    All-integer derivation: with contingency counts, observed
    agreement po = diag/N and chance agreement pe = Σ_k row_k·col_k
    / N², so kappa = (N·diag − Σ row·col)/(N² − Σ row·col) — both
    operands exact longs (bound: N ≤ 3e9 keeps N² < 2^63), one
    correctly-rounded division. Degenerate pe = 1 (both raters
    constant and equal) → NULL kappa, mirrored in the oracle.

    Scale shape: one (by, a, b) contingency aggregate (map-side
    combine; cells, not rows), marginal aggregates over cells, one
    label-keyed join of marginals — nothing row-scale after the
    first pass. Output: (by?, n, po, pe, kappa)."""
    keys = [by] if by else []
    cells = df.groupBy(*keys, F.col(a_col).alias("_a"), F.col(b_col).alias("_b")).agg(
        F.count("*").alias("_c")
    )
    n = cells.groupBy(*keys).agg(
        F.sum("_c").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_c")).otherwise(0)).alias(
            "_diag"
        ),
    )
    ra = cells.groupBy(*keys, F.col("_a").alias("_k")).agg(F.sum("_c").alias("_ra"))
    cb = cells.groupBy(*keys, F.col("_b").alias("_k")).agg(F.sum("_c").alias("_cb"))
    s = (
        ra.join(cb, keys + ["_k"])
        .groupBy(*keys)
        .agg(F.sum(F.col("_ra") * F.col("_cb")).alias("_s"))
    )
    j = n.join(s, keys) if keys else n.crossJoin(F.broadcast(s))
    den = F.col("n") * F.col("n") - F.col("_s")
    return j.select(
        *keys,
        "n",
        F.round(F.col("_diag").cast("double") / F.col("n"), round_to).alias("po"),
        F.round(
            F.col("_s").cast("double") / (F.col("n").cast("double") * F.col("n")),
            round_to,
        ).alias("pe"),
        F.when(
            den != 0,
            F.round(
                (F.col("n") * F.col("_diag") - F.col("_s")).cast("double")
                / den.cast("double"),
                round_to,
            ),
        ).alias("kappa"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    scale: int = 1000,
    round_to: int = 6,
) -> DataFrame:
    """Per-bin calibration report (reliability diagram data +
    expected-calibration-error contributions; Naeini 2015, Guo 2017)
    for a classifier score against a boolean label.

    Determinism contract: `score_col` must be an exact multiple of
    1/`scale` (the caller quantizes — model scores should be emitted
    that way for reproducible evaluation anyway); then bin ids,
    counts, Σ score·scale and Σ label are exact integers and every
    emitted double is one fixed ÷/× tree of exact longs. ECE = Σ
    contrib over the output rows.

    Scale shape: one bin-keyed aggregate with map-side combine + a
    broadcast 1-row total. Output: (bin, n, conf, acc, contrib),
    bin ∈ [0, n_bins)."""
    m = F.round(F.col(score_col) * scale).cast("long")
    b = F.least(
        F.floor(m * n_bins / F.lit(scale)).cast("int"), F.lit(n_bins - 1)
    )
    g = df.groupBy(b.alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("_pos"),
        F.sum(m).alias("_sm"),
    )
    tot = g.agg(F.sum("n").alias("_nt"))
    conf = F.col("_sm").cast("double") / F.col("n") / scale
    acc = F.col("_pos").cast("double") / F.col("n")
    return g.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        F.round(conf, round_to).alias("conf"),
        F.round(acc, round_to).alias("acc"),
        F.round(
            F.abs(acc - conf) * F.col("n") / F.col("_nt"), round_to
        ).alias("contrib"),
    )
