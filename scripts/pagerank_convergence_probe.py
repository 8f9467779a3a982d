"""PageRank convergence probe (round 12, VERDICT r11 item 6).

Pins the rank-delta curve ‖r_t − r_{t−1}‖₁ on the q_pagerank fixture
graph (3 md5-derived out-links per document, self-loops dropped,
duplicates deduped) so the fixed-3-iteration oracle contract is
evidenced rather than assumed. Run at sf1 for the SCALE.md row:

    SF=/root/testdata/sf1 python scripts/pagerank_convergence_probe.py

With the round-12 integer fixed-point ranks the delta is exact:
Σ |rankf_t − rankf_{t−1}| quanta / 1e12.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def main() -> None:
    sf = os.environ.get("SF", "/root/testdata/sf0.01")
    max_iters = int(os.environ.get("PR_ITERS", "6"))
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("pagerank-convergence-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cflux_spark.extensions.graph import RANK_SCALE, pagerank

    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id")
    n_docs = docs.count()
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
    edges = (
        links.join(
            ids.select(F.col("idx").alias("tidx"), F.col("doc_id").alias("dst")), "tidx"
        )
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    edges.count()

    prev = None
    curve = []
    for t in range(1, max_iters + 1):
        # checkpoint_every=2: pagerank's contrib+dangling double
        # reference grows the logical plan ~2^t — t=6 OOMed a 16 GB
        # driver without lineage truncation (measured here, r12);
        # the knob is value-invariant (unit-pinned)
        cur = (
            pagerank(edges, iterations=t, round_to=12, checkpoint_every=2)
            .select(
                "node",
                F.round(F.col("rank") * F.lit(float(RANK_SCALE))).cast("long").alias("rf"),
            )
            .persist()
        )
        cur.count()
        if prev is not None:
            delta_q = (
                prev.alias("a")
                .join(cur.alias("b"), "node")
                .agg(F.sum(F.abs(F.col("a.rf") - F.col("b.rf"))).alias("d"))
                .first()["d"]
            )
            l1 = delta_q / RANK_SCALE
            curve.append({"t": t, "l1_delta": l1})
            print(f"iter {t - 1} -> {t}: ||r_t - r_(t-1)||_1 = {l1:.9f}")
            prev.unpersist()
        prev = cur
    print(
        "PR_CONVERGENCE_JSON "
        + json.dumps({"sf": sf, "n_nodes": n_docs, "curve": curve})
    )
    spark.stop()


if __name__ == "__main__":
    main()
