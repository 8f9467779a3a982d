"""HITS convergence probe (round 12, NEXT r13 item 5).

Pins the score-delta curves ‖a_t − a_{t−1}‖₁ and ‖h_t − h_{t−1}‖₁ on
the q_hits fixture graph (the same md5-derived 3-out-link synthetic
as q_pagerank) so the fixed-3-iteration oracle contract is evidenced
the same way pagerank's is (scripts/pagerank_convergence_probe.py).
Run at sf1 for the SCALE.md row:

    SF=/root/testdata/sf1 python scripts/hits_convergence_probe.py

With integer fixed-point scores the delta is exact:
Σ |score_t − score_{t−1}| quanta / 1e12. hits() localCheckpoints per
half-step by construction, so no lineage knob is needed here.
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
    max_iters = int(os.environ.get("HITS_ITERS", "6"))
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("hits-convergence-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cflux_spark.extensions.graph import RANK_SCALE, hits

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
        cur = (
            hits(edges, iterations=t, round_to=12)
            .select(
                "node",
                F.round(F.col("authority") * F.lit(float(RANK_SCALE)))
                .cast("long")
                .alias("af"),
                F.round(F.col("hub") * F.lit(float(RANK_SCALE))).cast("long").alias("hf"),
            )
            .persist()
        )
        cur.count()
        if prev is not None:
            d = (
                prev.alias("a")
                .join(cur.alias("b"), "node")
                .agg(
                    F.sum(F.abs(F.col("a.af") - F.col("b.af"))).alias("da"),
                    F.sum(F.abs(F.col("a.hf") - F.col("b.hf"))).alias("dh"),
                )
                .first()
            )
            rec = {
                "t": t,
                "l1_delta_authority": d["da"] / RANK_SCALE,
                "l1_delta_hub": d["dh"] / RANK_SCALE,
            }
            curve.append(rec)
            print(
                f"iter {t - 1} -> {t}: ||a_t - a_(t-1)||_1 = "
                f"{rec['l1_delta_authority']:.9f}  "
                f"||h_t - h_(t-1)||_1 = {rec['l1_delta_hub']:.9f}"
            )
            prev.unpersist()
        prev = cur
    print(
        "HITS_CONVERGENCE_JSON "
        + json.dumps({"sf": sf, "n_nodes": n_docs, "curve": curve})
    )
    spark.stop()


if __name__ == "__main__":
    main()
