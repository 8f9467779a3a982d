"""Float-parity margin probe (round 12, VERDICT r11 item 2).

Measures, for every hash-compared value in the catalog that passes
through a transcendental (ln/exp/pow/log2), how far the PRE-ROUND
value sits from its decimal rounding boundary — the quantity that
decides whether a cross-libm last-ulp difference can flip the hash.

Two tiers are measured (see cflux_spark/functions/parity.py for the
discipline):

1. OUTPUT margins — each operator re-run with its rounding pushed to
   9 dp; the probe measures min/percentile distance of those
   near-exact values to the PRODUCTION grid's flip boundaries (the
   half-grid lines). Under the fixed-point discipline the pre-round
   value is bit-identical across engines, so this margin only
   matters jointly with a call-site flip (tier 2): the per-row
   mismatch probability is ~ n_callsites · (cross-libm error /
   output grid) ≈ 1e-10 per row, not the raw margin.
2. CALL-SITE quantization margins — for the representative quantized
   sites (NB classifier weights, DSIR log-ratios, bigram token
   log-probs, PageRank per-edge divisions) the probe computes the
   raw double x and measures min |frac(x·SCALE) − 0.5| in quanta:
   the distance the round(x·1e9) quantization has before a few-ulp
   libm difference lands it on the other side. A flipped call site
   shifts the output by ONE quantum (1e-9), which then only matters
   if tier 1's margin is also < 1 quantum.

Usage:
    python scripts/float_margin_probe.py [--sf /root/testdata/sf0.01]

Prints one row per measurement: min margin, p1 margin, n values —
and a JSON line for SCALE.md. Exit code 0 always (a small margin is
a documented fact, not a failure; the two-tier product is the risk).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def grid_margin(values: list[float], dp: int) -> dict:
    """Distance of each value·10^dp to its nearest HALF-INTEGER (the
    round-flip boundary), in grid units (1.0 = one output quantum)."""
    scale = 10.0**dp
    margins = []
    for v in values:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        d = v * scale
        frac = d - math.floor(d)
        margins.append(abs(frac - 0.5))
    margins.sort()
    n = len(margins)
    return {
        "n": n,
        "min": margins[0] if n else None,
        "p1": margins[max(0, n // 100 - 1)] if n else None,
        "median": margins[n // 2] if n else None,
    }


def quantum_margin(df: DataFrame, col: str) -> dict:
    """Call-site tier: distance of raw double col·1e9 to the nearest
    half-integer, in quanta."""
    rows = df.select(F.col(col).alias("x")).collect()
    return grid_margin([r["x"] for r in rows], 9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SF", "/root/testdata/sf0.01"))
    args = ap.parse_args()
    sf = args.sf

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .appName("float-margin-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    out: dict[str, dict] = {}

    # ---- tier 1: output margins (operators re-run at 9 dp) ----
    from cflux_spark.extensions import dsir, text
    from cflux_spark.extensions.evaluation import bleu_scores

    lm = text.bigram_logprob(docs, round_to=9)
    out["bigram_logprob@4dp"] = grid_margin(
        [r[0] for r in lm.select("avg_neg_logprob").collect()], 4
    )
    out["unigram_logprob@4dp"] = grid_margin(
        [r[0] for r in text.unigram_logprob(docs, round_to=9).select("avg_neg_logprob").collect()],
        4,
    )
    out["char_entropy@4dp"] = grid_margin(
        [r[0] for r in text.char_entropy(docs, round_to=9).select("entropy").collect()], 4
    )
    out["dsir_log_weight@4dp"] = grid_margin(
        [
            r[0]
            for r in dsir.dsir_log_weights(
                docs, docs.filter(F.col("source") == "src0"), round_to=9
            )
            .select("log_weight")
            .collect()
        ],
        4,
    )
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    pairs = docs.select(F.col("doc_id").alias("pair_id"), toks.alias("_t")).select(
        "pair_id",
        F.array_join(F.filter(F.col("_t"), lambda x, i: (i + 1) % 7 != 0), " ").alias(
            "candidate"
        ),
        F.array_join(F.col("_t"), " ").alias("reference"),
    )
    out["bleu@4dp"] = grid_margin(
        [r[0] for r in bleu_scores(pairs, id_col="pair_id", round_to=9).select("bleu").collect()],
        4,
    )

    # round-12 third wave: the four new transcendental-bearing ops
    out["js_divergence@6dp"] = grid_margin(
        [r[0] for r in text.js_divergence(docs, round_to=12).select("js").collect()], 6
    )
    zf = text.zipf_slope(docs, round_to=12).select("slope", "intercept").collect()
    out["zipf_slope@6dp"] = grid_margin([r[0] for r in zf], 6)
    out["zipf_intercept@6dp"] = grid_margin([r[1] for r in zf], 6)
    out["kneser_ney@4dp"] = grid_margin(
        [
            r[0]
            for r in text.kneser_ney_logprob(docs, round_to=9)
            .select("kn_neg_logprob")
            .collect()
        ],
        4,
    )
    out["pmi@6dp"] = grid_margin(
        [
            r[0]
            for r in text.pmi_collocations(docs, round_to=12).select("pmi").collect()
        ],
        6,
    )

    # ---- tier 2: call-site quantization margins ----
    from cflux_spark.extensions.classifier import hashed_doc_features
    from cflux_spark.extensions.text import bigram_logprob  # noqa: F401 (documented pairing)

    # NB classifier weights: the raw 2-ln weight per bucket
    tiers = text.perplexity_buckets(text.bigram_logprob(docs))
    labels = tiers.filter(F.col("bucket").isin("head", "tail")).select(
        "doc_id",
        F.when(F.col("bucket") == "head", F.lit(1.0)).otherwise(F.lit(0.0)).alias("label"),
    )
    labeled = docs.join(labels, "doc_id")
    y = labeled.select("doc_id", (F.col("label") > 0).alias("_pos"))
    occ = hashed_doc_features(labeled).join(y, "doc_id")
    hist = occ.groupBy("bucket").agg(
        F.sum(F.when(F.col("_pos"), F.col("cnt")).otherwise(F.lit(0))).alias("cp"),
        F.sum(F.when(~F.col("_pos"), F.col("cnt")).otherwise(F.lit(0))).alias("cn"),
    )
    tot = hist.agg(F.sum("cp").alias("tp"), F.sum("cn").alias("tn"))
    w_raw = hist.crossJoin(F.broadcast(tot)).select(
        (
            F.log((F.col("cp") + F.lit(1.0)) / (F.col("tp") + F.lit(256.0)))
            - F.log((F.col("cn") + F.lit(1.0)) / (F.col("tn") + F.lit(256.0)))
        ).alias("x")
    )
    out["nb_weight_callsite@1e-9"] = quantum_margin(w_raw, "x")

    # bigram per-token ln(p) call site (distinct p values)
    toks_expr = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    base = docs.select(F.col("doc_id"), toks_expr.alias("_toks"))
    t = F.col("_toks")
    prs = F.transform(
        t,
        lambda x, i: F.struct(
            x.alias("tok"),
            F.when(i > 0, F.element_at(t, F.greatest(i, F.lit(1)))).alias("prev"),
        ),
    )
    rows = base.select("doc_id", F.explode(prs).alias("p")).select(
        F.col("p.tok").alias("tok"), F.col("p.prev").alias("prev")
    )
    uni = rows.groupBy("tok").agg(F.count("*").alias("n"))
    total = uni.agg(F.sum("n").alias("_t"))
    big = (
        rows.filter(F.col("prev").isNotNull()).groupBy("prev", "tok").agg(F.count("*").alias("n2"))
    )
    up = uni.select(F.col("tok").alias("prev"), F.col("n").alias("n_prev"))
    pvals = (
        rows.join(F.broadcast(uni), "tok")
        .join(F.broadcast(up), "prev", "left")
        .join(big, ["prev", "tok"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.when(F.col("prev").isNull(), F.col("n") / F.col("_t"))
            .otherwise(
                F.lit(0.75) * (F.col("n2") / F.col("n_prev"))
                + F.lit(0.25) * (F.col("n") / F.col("_t"))
            )
            .alias("p")
        )
        .distinct()
        .select(F.log("p").alias("x"))
    )
    out["bigram_lnp_callsite@1e-9"] = quantum_margin(pvals, "x")

    # PageRank per-edge division call site at the 1e-12 mass scale:
    # round(rankf/deg) with rankf ≈ 1e12/N uniform start — measure the
    # first iteration's division margins over the synthetic graph
    from cflux_spark.extensions.graph import RANK_SCALE

    # mirror q_pagerank's fixture: 3 md5-derived out-links per doc,
    # self-loops dropped, duplicates deduped — realistic deg 1..3, and
    # measure the SECOND iteration too (non-uniform rankf inputs)
    from cflux_spark.extensions.graph import pagerank

    n_docs = docs.count()
    from pyspark.sql import Window

    w = Window.orderBy("doc_id")
    ids = docs.select("doc_id", (F.row_number().over(w) - 1).alias("idx"))
    links = ids.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.col("doc_id").cast("string"),
                                        F.lit(":"),
                                        F.lit(str(j)),
                                    )
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % F.lit(n_docs)
                    ).alias(str(j))
                    for j in range(3)
                ]
            )
        ).alias("tidx"),
    )
    e = (
        links.join(ids.select(F.col("idx").alias("tidx"), F.col("doc_id").alias("dst")), "tidx")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # iteration-2 rank inputs: run one real iteration, then measure
    # the rankf/deg division margins it feeds iteration 2
    r1 = pagerank(e, iterations=1, round_to=12).select(
        F.col("node").alias("src"),
        F.round(F.col("rank") * F.lit(float(RANK_SCALE))).cast("long").alias("rankf"),
    )
    div = e.join(deg, "src").join(r1, "src").select(
        (F.col("rankf") / F.col("deg")).alias("x")
    )
    rows2 = div.collect()
    out["pagerank_division_callsite@quanta"] = grid_margin([r["x"] for r in rows2], 0)

    print(json.dumps(out, indent=2))
    print("FLOAT_MARGIN_JSON " + json.dumps({"sf": sf, "margins": out}))
    spark.stop()


if __name__ == "__main__":
    main()
