"""MinHashIndex probe-at-scale (SCALE.md 'Incremental dedup').

Synthesizes a signature index of N corpus docs directly (64 random
longs per doc — the probe exercises the JOIN shape, not shingling)
plus a batch of M docs where every 100th batch doc shares its
signature with a corpus doc (a planted near-dup), then times
``MinHashIndex.probe``'s candidate+verify plan: batch bands broadcast
into the index scan, candidate signatures fetched by broadcast
semi-join, index never shuffled.

The fixture corpus is ~500 docs; this probes 10^4-10^5× that with
the index disk-backed, the shape the 100 TB story rests on.
Run:  python scripts/mhindex_probe.py [n_corpus] [n_batch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from cflux_spark import get_spark  # noqa: E402
from cflux_spark.extensions.dedup import MinHashIndex  # noqa: E402

NUM_HASHES = 64


def synth_signatures(spark, n: int, id_offset: int = 0):
    """n synthetic signatures: doc_id + 64 pseudo-random longs derived
    from the doc id (deterministic, codegen-only)."""
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"),
        *[
            F.xxhash64((F.col("id") + id_offset).cast("string"), F.lit(i)).alias(f"h{i}")
            for i in range(NUM_HASHES)
        ],
    )


def main(n_corpus: int = 10_000_000, n_batch: int = 100_000) -> None:
    spark = get_spark("mhindex-probe", cpus=16)
    root = tempfile.mkdtemp(prefix="mhprobe_")

    t0 = time.time()
    synth_signatures(spark, n_corpus).write.mode("overwrite").parquet(root + "/signatures")
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump({"n": 3, "num_hashes": NUM_HASHES, "bands": 16}, fh)
    t_write = time.time() - t0
    idx = MinHashIndex(spark, root)

    # batch: every 100th doc clones a corpus doc's signature (its ids
    # map back into [0, n_corpus)); the rest are novel
    batch_sig = spark.range(n_batch).select(
        (F.col("id") + n_corpus).alias("doc_id"),
        *[
            F.when(
                F.col("id") % 100 == 0,
                F.xxhash64((F.col("id") % n_corpus).cast("string"), F.lit(i)),
            )
            .otherwise(F.xxhash64((F.col("id") + n_corpus).cast("string"), F.lit(i), F.lit(1)))
            .alias(f"h{i}")
            for i in range(NUM_HASHES)
        ],
    )

    # probe() signs the batch itself from text; here we time the join
    # core on the pre-signed frame by monkey-wiring the signature
    # stage — the join shape below is a verbatim copy of probe()'s
    from cflux_spark.extensions.dedup import _band_stack

    t0 = time.time()
    isig = idx.signatures()
    ibands = _band_stack(isig, NUM_HASHES, 16, "doc_id").withColumnRenamed("doc_id", "corpus_id")
    bbands = _band_stack(batch_sig, NUM_HASHES, 16, "doc_id").withColumnRenamed(
        "doc_id", "batch_id"
    )
    cand = (
        ibands.join(F.broadcast(bbands), ["band_id", "bh"])
        .select("batch_id", "corpus_id")
        .distinct()
    )
    hits = cand.select("corpus_id").distinct().withColumnRenamed("corpus_id", "doc_id")
    a = isig.join(F.broadcast(hits), "doc_id", "left_semi").select(
        F.col("doc_id").alias("corpus_id"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    b = batch_sig.select(
        F.col("doc_id").alias("batch_id"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    matches = sum((F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(NUM_HASHES))
    out = (
        cand.join(a, "corpus_id")
        .join(b, "batch_id")
        .withColumn("est_jaccard", matches / F.lit(NUM_HASHES))
        .filter(F.col("est_jaccard") >= 0.5)
    )
    n_hits = out.count()
    t_probe = time.time() - t0

    expected = n_batch // 100
    print(
        json.dumps(
            {
                "n_corpus": n_corpus,
                "n_batch": n_batch,
                "index_write_sec": round(t_write, 2),
                "probe_sec": round(t_probe, 2),
                "planted": expected,
                "found": n_hits,
            }
        )
    )
    assert n_hits == expected, f"planted {expected}, found {n_hits}"
    spark.stop()


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
