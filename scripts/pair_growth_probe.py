"""Candidate-pair growth probe for the banded dedup tiers (round 10,
VERDICT r9 item 5).

The sf1 promotion multiplied near-dup candidate pairs ~10× because the
dataset plants one near-identical twin per replica. Before sf10 ever
happens, this probe pins the growth LAW explicitly: for replica
multiplicity m over a fixed base corpus, every original document
becomes a cluster of m near-dup twins, so

  - candidate pairs grow ~ n_docs × C(m, 2) / m = n_docs × (m-1)/2
    per stored doc INSIDE clusters (quadratic in multiplicity, linear
    in corpus size — the documented banding contract), and
  - pairs OUTSIDE clusters stay ~flat (banding holds: no all-pairs).

It measures, for m in --multiplicities over the sf0.1 documents table:
  minhash_lsh_pairs   (64 hashes × 16 bands, threshold ≈ 0.5):
      candidate pairs (the function's output IS the candidate tier),
      pairs/doc, and the per-m growth vs the (m-1)/2 law.
  simhash_near_pairs  (pigeonhole, max_hamming=3 → 4 bands):
      pigeonhole candidates (keep_all_candidates=True — what enters
      the popcount verifier) AND verified pairs (hamming ≤ 3), plus
      the Manku C(6,3) combination-banded candidate tier (n_blocks=6).

A candidate column tracking the law ≈ 1.0 means the verifier tier is
bounded by genuine cluster structure; growth above the law is band-KEY
collision (the 4-block tier's 16-bit keys collide once the corpus
outgrows 2^16 — measured 8.96× the law at 50k docs, which is why
n_blocks=6 with ~33-bit keys is the at-scale configuration; see
SCALE.md round-10 correction).

Replicas use the sf1_probe recipe (key offset i·10⁹, text || ' rep' ||
i) so the twins are near-dups, not byte-dups — the hostile shape.

``--jaccard`` adds the EXACT shingle-Jaccard verifier tier (what
q_dedup_jaccard / q_dedup_edit pay): co-shingle candidate pairs
(threshold 0 — the self-join fan-out), verified pairs (threshold 0.2),
and the max_shingle_df-capped candidate tier. This is the VERDICT r10
item-4 probe: the sf1 gate's 12–16× super-linear growth for those two
keys is the planted 10-replica cluster density — at multiplicity 1 the
same code is ~linear in corpus size.

Usage:
    python scripts/pair_growth_probe.py [--multiplicities 1,2,5,10]
        [--src /root/testdata/sf0.1/documents.parquet] [--jaccard]

Append the output table to SCALE.md when re-pinning.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OFF = 10**9


def replicate(spark, src: str, m: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(src).select("doc_id", "text")
    reps = spark.range(m).withColumnRenamed("id", "i")
    return base.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("i") * OFF).alias("doc_id"),
        F.when(F.col("i") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("i")))
        .alias("text"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1/documents.parquet")
    ap.add_argument("--multiplicities", default="1,2,5,10")
    ap.add_argument("--jaccard", action="store_true",
                    help="measure the exact shingle-Jaccard verifier tier instead")
    ap.add_argument("--max-shingle-df", type=int, default=50,
                    help="cap for the capped-candidate column (--jaccard mode)")
    args = ap.parse_args()
    ms = [int(x) for x in args.multiplicities.split(",")]

    from cflux_spark.extensions.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )
    from cflux_spark.session import get_spark

    spark = get_spark("pair_growth_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    n_base = spark.read.parquet(args.src).count()
    print(f"base corpus: {n_base} docs ({args.src})")

    if args.jaccard:
        # the exact verifier tier (q_dedup_jaccard / q_dedup_edit
        # shape): candidates = every co-shingle pair (threshold 0),
        # verified = jaccard >= 0.2, capped = candidates surviving the
        # max_shingle_df budget knob
        print(
            f"{'m':>3} {'docs':>7} | {'jac_cand':>10} {'cand/doc':>8} {'law':>7} | "
            f"{'verified':>9} | {'capped_df' + str(args.max_shingle_df):>11} | {'wall_s':>7}"
        )
        base_cand = None
        for m in ms:
            t0 = time.time()
            docs = replicate(spark, args.src, m).cache()
            n = docs.count()
            cand = ngram_jaccard_pairs(docs, n=3, threshold=0.0).count()
            ver = ngram_jaccard_pairs(docs, n=3, threshold=0.2).count()
            capped = ngram_jaccard_pairs(
                docs, n=3, threshold=0.0, max_shingle_df=args.max_shingle_df
            ).count()
            docs.unpersist()
            if m == ms[0] and ms[0] == 1:
                base_cand = max(cand, 1)
            law_v = (
                cand / (m * base_cand + n_base * m * (m - 1) / 2)
                if base_cand
                else float("nan")
            )
            print(
                f"{m:>3} {n:>7} | {cand:>10} {cand / n:>8.2f} {law_v:>7.2f} | "
                f"{ver:>9} | {capped:>11} | {time.time() - t0:>7.1f}"
            )
        print(
            "\nlaw ≈ 1.0 ⇒ verifier growth is exactly the planted cluster "
            "structure (linear at multiplicity 1); capped column bounds "
            "the hot-shingle fan-out regardless of multiplicity."
        )
        spark.stop()
        return 0

    hdr = (
        f"{'m':>3} {'docs':>7} | {'mh_cand':>9} {'mh/doc':>7} {'mh_law':>7} | "
        f"{'sh_cand':>9} {'sh_verif':>9} {'sh/doc':>7} {'sh_law':>7} | "
        f"{'sh6_cand':>9} {'sh6/doc':>8} | {'wall_s':>7}"
    )
    print(hdr)
    rows = []
    base_mh = base_sh = None
    for m in ms:
        t0 = time.time()
        docs = replicate(spark, args.src, m).cache()
        n = docs.count()
        mh = minhash_lsh_pairs(docs).count()
        sh_all = simhash_near_pairs(docs, keep_all_candidates=True).cache()
        sh_cand = sh_all.count()
        sh_ver = sh_all.filter("hamming <= 3").count()
        sh_all.unpersist()
        # the Manku combination-banded tier (6 blocks, C(6,3)=20 tables
        # keyed on ~33 bits): same exact recall, collision-driven
        # candidates suppressed ~2^17× — the 100 TB configuration
        sh6 = simhash_near_pairs(docs, keep_all_candidates=True, n_blocks=6)
        sh6_cand = sh6.count()
        docs.unpersist()
        wall = time.time() - t0
        if m == ms[0] and ms[0] == 1:
            base_mh, base_sh = max(mh, 1), max(sh_cand, 1)
        # growth law: within-cluster pairs/doc scale as (m-1)/2; the
        # m=1 baseline is organic (non-planted) near-dups, which also
        # replicate m× — law(m) = m·base + n_base·m·(m-1)/2 pairs
        law = lambda b: (m * b + n_base * m * (m - 1) / 2) if base_mh else float("nan")  # noqa: E731
        mh_law = mh / law(base_mh) if base_mh else float("nan")
        sh_law = sh_cand / law(base_sh) if base_sh else float("nan")
        print(
            f"{m:>3} {n:>7} | {mh:>9} {mh / n:>7.2f} {mh_law:>7.2f} | "
            f"{sh_cand:>9} {sh_ver:>9} {sh_cand / n:>7.2f} {sh_law:>7.2f} | "
            f"{sh6_cand:>9} {sh6_cand / n:>8.2f} | {wall:>7.1f}"
        )
        rows.append((m, n, mh, sh_cand, sh_ver, sh6_cand, wall))
    print(
        "\nlaw column ≈ 1.0 ⇒ candidate growth is exactly the planted "
        "cluster structure (banding holds, no leakage); "
        ">> 1.0 ⇒ banding is leaking cross-cluster candidates."
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
