"""End-to-end pretraining-corpus preparation (SURVEY.md §2.13): the
composition a real training-data export runs — curation gate (quality
+ repetition + exact-dup membership), benchmark decontamination, then
content-keyed shard assignment for the writer.

Each stage is an already-oracle-checked operator; this module wires
them so one call answers "give me the cleaned, decontaminated, sharded
corpus". Plan shape: the gates produce doc-keyed id sets that
LEFT SEMI-join the corpus (each semi-join prunes before the next
stage), and the only corpus-wide shuffles are the ones the component
operators already pay (doc-keyed aggregates; the export's final
repartition-by-shard). Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cflux_spark.extensions import contamination, sampling, text


def curate_corpus(
    docs: DataFrame,
    bench_docs: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    contamination_n: int = 8,
    embeddings: DataFrame | None = None,
    semdedup_gate: bool = True,
    sem_threshold: float = 0.35,
    sem_k: int = 8,
    sem_train_fraction: float | None = None,
    sem_probe: int = 1,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    decontam_bench_embeddings: DataFrame | None = None,
    decontam_threshold: float = 0.9,
    split_clusters: DataFrame | None = None,
    split_boundaries: tuple[float, float] = (0.9, 0.95),
    **gate_kwargs,
) -> DataFrame:
    """The full export pipeline: keep documents that pass the curation
    gate (:func:`text.curation_verdict` — too-short / repetitive /
    low-LM-quality / exact-dup docs drop) AND share no
    ``contamination_n``-gram with the benchmark corpus
    (:func:`contamination.flag_contamination`), then attach the
    deterministic training shard (:func:`sampling.assign_shards`).

    Returns the kept corpus rows (all original columns) plus
    ``shard`` (and ``split`` when ``split_clusters`` is given — a
    (doc, cluster) frame routes every kept doc through the
    cluster-keyed leakage-safe train/val/test assignment).
    ``gate_kwargs`` pass through to ``curation_verdict``
    (min_tokens, min_uniq_frac, max_bigram_share, max_neg_logprob).

    ``decontam_bench_embeddings`` (optional, round 7) adds the
    SEMANTIC decontamination gate on top of the n-gram one: every
    kept doc whose corpus embedding (from ``embeddings``) has cosine
    ≥ ``decontam_threshold`` to ANY benchmark embedding is dropped —
    the paraphrased-leakage defense the exact n-gram overlap cannot
    see. Exact and deterministic (cosine_pairs_bulk broadcast tier),
    so the SQL twin covers it; requires ``embeddings``. Set
    ``semdedup_gate=False`` to use ``embeddings`` for this gate only.

    ``embeddings`` (optional, with ``semdedup_gate=True``) adds the
    SemDeDup semantic-dedup gate:
    rows whose embedding (joined ``emb_id_col`` = ``id_col``) is a
    within-cluster near-duplicate of a smaller-id kept representative
    are dropped via :func:`similarity.semdedup` — the clustered path
    whose quadratic term is bounded by cluster size. This gate is
    rule-but-not-engine-deterministic (k-means assignments aren't
    bit-stable across engines), so q_pipeline_export's exact SQL twin
    runs WITHOUT it; its own spec contract lives in q_semdedup.

    At 100 TB: the verdict and contamination stages are doc-keyed
    aggregates over token/gram explosions (their scale shapes are each
    documented on the component); the composition adds only two
    doc_id-keyed LEFT SEMI joins — uniform keys, each pruning the
    corpus before the next stage runs, and AQE broadcasts the id sets
    when selectivity is high. Re-running the pipeline reproduces
    byte-identical shard membership (every decision is content-keyed
    or rule-based — no RNG, no partition-order dependence)."""
    verdict = text.curation_verdict(docs, text_col=text_col, id_col=id_col, **gate_kwargs)
    bench = contamination.benchmark_ngrams(
        bench_docs, n=contamination_n, text_col=text_col, id_col=id_col
    )
    flags = contamination.flag_contamination(
        docs, bench, n=contamination_n, text_col=text_col, id_col=id_col
    )
    kept = (
        docs.join(verdict.filter(F.col("keep")).select(id_col), id_col, "left_semi")
        .join(flags.filter(~F.col("contaminated")).select(id_col), id_col, "left_semi")
    )
    if decontam_bench_embeddings is not None:
        # semantic decontamination (round 7): the n-gram gate above
        # misses PARAPHRASED eval leakage; this drops every doc whose
        # embedding sits within cosine `decontam_threshold` of ANY
        # benchmark embedding. Deterministic (exact cosine — unlike
        # the SemDeDup gate below), so the SQL twin includes it.
        # Scale shape: cosine_pairs_bulk's broadcast tier — one
        # shuffle-free map over the corpus embeddings.
        if embeddings is None:
            raise ValueError(
                "curate_corpus: decontam_bench_embeddings requires the "
                "corpus `embeddings` frame (the query side of the gate)"
            )
        sem_hits = contamination.semantic_decontaminate(
            embeddings, decontam_bench_embeddings,
            threshold=decontam_threshold,
            id_col=emb_id_col, vec_col=emb_vec_col,
        )
        kept = kept.join(
            sem_hits.filter(F.col("contaminated")).select(
                F.col(emb_id_col).alias(id_col)
            ),
            id_col,
            "left_anti",
        )
    if embeddings is not None and semdedup_gate:
        from cflux_spark.extensions import similarity

        sem = similarity.semdedup(
            embeddings, threshold=sem_threshold, k=sem_k,
            id_col=emb_id_col, vec_col=emb_vec_col,
            train_fraction=sem_train_fraction, probe=sem_probe,
        )
        sem_dropped = sem.filter(~F.col("keep")).select(
            F.col(emb_id_col).alias(id_col)
        )
        kept = kept.join(sem_dropped, id_col, "left_anti")
    out = sampling.assign_shards(kept, n_shards, key_col=id_col)
    if split_clusters is not None:
        # leakage-safe train/val/test (round 6): split keyed on the
        # near-dup cluster so paraphrased duplicates never straddle
        # train/eval. A doc absent from the cluster frame is its own
        # singleton — hashing its doc id IS hashing its cluster id
        # (dedup_clusters labels singletons with themselves), so
        # coverage gaps degrade to doc-keyed splitting, never to a
        # silent default split.
        cl = split_clusters.select(F.col(id_col), F.col("cluster_id"))
        out = out.join(cl, id_col, "left").withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
        )
        out = sampling.leakage_safe_split(out, boundaries=split_boundaries).drop(
            "cluster_id"
        )
    return out
