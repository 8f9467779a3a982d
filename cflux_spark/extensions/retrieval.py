"""Lexical retrieval + hybrid rank fusion (training-data pipeline ops).

BM25 scoring, top-k retrieval, and reciprocal-rank fusion — the
standard hybrid-search stack a data-curation pipeline uses to mine
positives/hard-negatives for retrieval training sets and to audit
corpus coverage against a query workload. The reference engine
(metrico/cFlux — cflux.js delegates every SELECT to ClickHouse) has no
text-retrieval surface at all; this module is part of the
beyond-reference LLM-pipeline tier (SURVEY.md §2.13).

Scale design (100 TB):
- The corpus side never leaves the cluster: tokenize → explode →
  per-(doc,term) counts are map-side-combined partial aggregations.
- Per-term document frequencies shuffle once on the term key (the
  posting-list build every search engine does); corpus-level scalars
  (N, total token count) are one 1-row aggregate broadcast back.
- The query workload is assumed driver-small (a query SET, not a
  table) and is broadcast to the postings — the expensive join is
  postings ⋈ broadcast(query terms), a map-side hash join with no
  corpus shuffle beyond the posting build.
- Top-k per query uses a window over (query_id) — cardinality =
  |queries| × |matching docs|, already reduced by the term join; no
  global sort.
- All scoring is JVM-side column arithmetic (whole-stage codegen);
  zero Python UDFs.

Float-parity policy (repo-wide, see plans/queries.py header): scores
are rounded before ranking, and ranks tie-break on doc id, so the
DuckDB oracle orders identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cflux_spark.extensions.text import word_tokens

__all__ = [
    "bm25_scores",
    "bm25_topk",
    "mine_hard_negatives",
    "mmr_topk",
    "ndcg_at_k",
    "rrf_fuse",
]


def _tokenized(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, dl, _toks) — the token array is materialized once per
    row (no CSE around HOF lambdas — the text_stats lesson). Docs with
    zero tokens keep a row (dl = 0) so corpus stats count them."""
    from cflux_spark.functions.partitioning import spread_by

    return spread_by(
        docs.select(
            F.col(id_col).alias("doc_id"), word_tokens(F.col(text_col)).alias("_toks")
        ),
        "doc_id",
    ).select("doc_id", F.size("_toks").alias("dl"), "_toks")


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    round_to: int = 4,
) -> DataFrame:
    """BM25 score per (query, doc) for docs sharing ≥1 query term.

    Okapi BM25 with the Lucene idf: ``ln(1 + (N - df + .5)/(df + .5))``
    — always positive, so stopword-heavy queries can't subtract. A
    repeated term in one query counts once (set-of-terms semantics,
    as Lucene's boolean-OR of TermQueries scores a bag dedup'd per
    field). Output: (query_id, doc_id, score) with score rounded to
    ``round_to`` decimals for cross-engine rank stability.
    """
    base = _tokenized(docs, text_col, id_col)
    post = base.select("doc_id", "dl", F.explode("_toks").alias("term")).groupBy(
        "doc_id", "dl", "term"
    ).agg(F.count("*").alias("tf"))

    # corpus scalars over ALL docs (empty ones included): one 1-row
    # aggregate, broadcast back. dl sums are exact integers so
    # avgdl = sum_dl / N is ONE double division — bit-identical across
    # engines (the integer-cents discipline).
    stats = base.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl"))

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(word_tokens(F.col(query_text_col))).alias("term"),
    ).distinct()

    # document frequency is needed ONLY for query terms, and postings
    # carry exactly one row per (doc, term) — so after the broadcast
    # term filter, df is a windowed count(*) per term in the SAME pass.
    # (The naive alternative — groupBy(term) over the full vocabulary
    # plus a join back — aggregates every term in the corpus and scans
    # the posting build twice; measured 10 Exchanges vs 5 here.)
    matched = post.join(F.broadcast(qterms.select("term").distinct()), "term")
    w_term = Window.partitionBy("term")
    scored = (
        matched.withColumn("df", F.count("*").over(w_term))
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    contrib = idf * tf * (k1 + 1.0) / (tf + F.lit(k1) * (1.0 - b + F.lit(b) * F.col("dl") / avgdl))
    # per-term contribution quantized at its (ln-bearing) call site so
    # the per-(query, doc) Σ is exact long arithmetic — immune to both
    # cross-libm idf ulps and shuffle-order float-sum drift
    # (functions/parity.py discipline)
    from cflux_spark.functions.parity import fixed_log, unfix

    return (
        scored.withColumn("_cf", fixed_log(contrib))
        .groupBy("query_id", "doc_id")
        .agg(F.round(unfix(F.sum("_cf")), round_to).alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k docs per query by BM25. Output: (query_id, doc_id, score,
    rank); ties break on doc_id so the oracle ranks identically."""
    scored = bm25_scores(docs, queries, **kwargs)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    topn: int | None = None,
    id_cols: tuple[str, str] = ("query_id", "doc_id"),
    rank_col: str = "rank",
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09):
    ``rrf(d) = Σ_sources 1/(k + rank_source(d))`` — the standard way to
    fuse a lexical and a semantic ranking without score calibration.

    Each input carries (query_id, doc_id, rank); a doc absent from a
    source contributes nothing. Output: (query_id, doc_id, rrf_score,
    rank), optionally truncated to ``topn`` per query. Per-source
    contributions are the same literal doubles in every engine and a
    2-source sum is order-independent, so parity is exact up to the
    rounding; ranks tie-break on doc_id.

    Scale: inputs are already top-k-per-query (|queries| × k rows) —
    the union + re-group is tiny relative to the retrieval that
    produced them; no corpus-sized state.
    """
    qc, dc = id_cols
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(qc).alias("query_id"),
            F.col(dc).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias("_rr"),
        )
        for r in rankings
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    fused = allp.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("_rr"), round_to).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    out = fused.withColumn("rank", F.row_number().over(w).cast("int"))
    if topn is not None:
        out = out.filter(F.col("rank") <= topn)
    return out


def mmr_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.75,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): per query, greedily pick k results maximizing

        λ·rel(q, d) − (1−λ)·max over selected s of sim(d, s)

    — the diversity-aware top-k a curation pipeline uses to pull
    varied exemplars (dedup-aware retrieval, eval-set mining) instead
    of k near-copies of the best hit. Step 1 takes the highest
    relevance outright; ties break on doc id everywhere.

    Output: (query_id, doc_id, mmr_score, rank 1..k).

    Scale shape: relevance is the exact-cosine top-``pool`` shortlist
    (:func:`~cflux_spark.extensions.similarity.brute_force_topk` here;
    the IVFPQ bulk path slots in at corpus scale), pairwise sims are
    computed only WITHIN each query's shortlist (pool² per query,
    never corpus²), and the inherently-sequential greedy loop runs as
    an Arrow ``applyInPandas`` kernel per query group — thousands of
    queries select in parallel, each over a pool-sized frame.

    Float parity: rel and sim are rounded to ``round_to`` before the
    greedy math; λ should be exactly representable in binary (0.75 →
    1−λ = 0.25 exact) so a SQL oracle replays identical doubles.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from cflux_spark.extensions.similarity import _norm, _paired_sim, brute_force_topk

    mu = 1.0 - lam
    cand = brute_force_topk(
        queries, candidates, k=pool, id_col=id_col, vec_col=vec_col, round_to=round_to
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), F.col("sim").alias("rel"))
    embn = candidates.select(
        F.col(id_col).alias("_eid"),
        F.col(vec_col).alias("_ev"),
        _norm(F.col(vec_col)).alias("_en"),
    )
    left = cand.join(embn, F.col("doc_id") == F.col("_eid")).select(
        "query_id", "doc_id", "rel", F.col("_ev").alias("qv"), F.col("_en").alias("_qn")
    )
    right = (
        cand.select("query_id", F.col("doc_id").alias("other_id"))
        .join(embn, F.col("other_id") == F.col("_eid"))
        .select("query_id", "other_id", F.col("_ev").alias("cv"), F.col("_en").alias("_cn"))
    )
    pairs = (
        left.join(right, "query_id")
        .filter(F.col("doc_id") != F.col("other_id"))
        .withColumn("sim", _paired_sim(round_to))
        .select("query_id", "doc_id", "rel", "other_id", "sim")
    )
    # rel-only rows keep single-candidate queries alive in the feed
    feed = pairs.unionByName(
        cand.select(
            "query_id",
            "doc_id",
            "rel",
            F.lit(None).cast("long").alias("other_id"),
            F.lit(None).cast("double").alias("sim"),
        )
    )

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rel: dict[int, float] = {}
        sim: dict[tuple[int, int], float] = {}
        for r in pdf.itertuples(index=False):
            d = int(r.doc_id)
            rel[d] = float(r.rel)
            if not pd.isna(r.other_id):
                sim[(d, int(r.other_id))] = float(r.sim)
        remaining = sorted(rel)
        selected: list[int] = []
        out = []
        while remaining and len(selected) < k:
            best_d = None
            best_score = 0.0
            for d in remaining:
                if not selected:
                    score = rel[d]
                else:
                    score = lam * rel[d] - mu * max(sim[(d, s)] for s in selected)
                if best_d is None or score > best_score or (score == best_score and d < best_d):
                    best_d, best_score = d, score
            selected.append(best_d)
            remaining.remove(best_d)
            out.append((qid, best_d, best_score, len(selected)))
        return pd.DataFrame(out, columns=["query_id", "doc_id", "mmr_score", "rank"])

    return feed.groupBy("query_id").applyInPandas(
        kern, schema="query_id long, doc_id long, mmr_score double, rank int"
    )


def ndcg_at_k(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    round_to: int = 6,
    id_cols: tuple[str, str] = ("query_id", "doc_id"),
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Ranking quality evaluation: nDCG@k per query (Järvelin &
    Kekäläinen 2002) — the standard score a retrieval-training
    pipeline computes when mining hard negatives or auditing an index
    against judged queries.

        DCG@k  = Σ_{rank ≤ k} (2^rel − 1) / log2(rank + 1)
        IDCG@k = the same over the query's relevances sorted
                 descending (top k)
        nDCG   = DCG / IDCG   (0 when the query has no relevant docs)

    Output: (query_id, ndcg). Unjudged retrieved docs score rel = 0;
    judged-but-unretrieved docs only affect the ideal term, as usual.

    Scale shape: one join of the ranking with the qrels on
    (query, doc) — both output-sized frames, never the corpus; the
    ideal term is a per-query window over the qrels (parallel across
    queries). All double math is literal-identical to the SQL oracle
    and rounded before hashing."""
    from cflux_spark.functions.parity import fixed_log

    qc, dc = id_cols
    # per-position gain quantized at its (pow/log2) call site: the DCG
    # and IDCG sums become exact long arithmetic, and the final ratio
    # is ONE correctly-rounded division of two exact integers — the
    # 1e9 scale cancels (functions/parity.py discipline)
    gain = fixed_log(
        (F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - F.lit(1.0))
        / (F.log2(F.col(rank_col).cast("double") + F.lit(1.0)))
    )
    dcg = (
        ranking.filter(F.col(rank_col) <= k)
        .join(qrels, [qc, dc], "left")
        .withColumn("_g", F.when(F.col(rel_col).isNull(), F.lit(0)).otherwise(gain))
        .groupBy(qc)
        .agg(F.sum("_g").alias("_dcgf"))
    )
    iw = Window.partitionBy(qc).orderBy(F.col(rel_col).desc(), F.col(dc))
    ideal = (
        qrels.filter(F.col(rel_col) > 0)
        .withColumn("_ir", F.row_number().over(iw))
        .filter(F.col("_ir") <= k)
        .withColumn(
            "_g",
            fixed_log(
                (F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - F.lit(1.0))
                / F.log2(F.col("_ir").cast("double") + F.lit(1.0))
            ),
        )
        .groupBy(qc)
        .agg(F.sum("_g").alias("_idcgf"))
    )
    return dcg.join(ideal, qc, "left").select(
        qc,
        F.round(
            F.when(F.col("_idcgf").isNull(), F.lit(0.0)).otherwise(
                F.col("_dcgf") / F.col("_idcgf")
            ),
            round_to,
        ).alias("ndcg"),
    )


def mine_hard_negatives(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 20,
    jaccard_threshold: float = 0.2,
    shingle_n: int = 3,
    round_to: int = 4,
    **bm25_kwargs,
) -> DataFrame:
    """Contrastive training-set construction (the DPR / sentence-
    transformers mining recipe): per query, the BM25 rank-1 hit is the
    POSITIVE and ranks 2..k are HARD-NEGATIVE candidates — minus any
    candidate that is a near-duplicate of the positive (n-gram Jaccard
    ≥ threshold), because a paraphrase of the positive labeled
    "negative" poisons the loss (a false negative).

    Output: (query_id, positive_id, doc_id, score, rank, jaccard) —
    the surviving negatives with their lexical score, original rank,
    and measured similarity to the positive.

    Scale shape: retrieval is the BM25 stack (posting-build shuffle);
    the Jaccard check runs only on (positive, candidate) PAIRS —
    |queries|·(k−1) pairs, never corpus² — over shingles restricted to
    the involved documents via a broadcast semi-join. Same shingle
    recipe as the dedup tier, so the SQL oracle reuses the shared
    closure-CTE arithmetic. Zero-token docs yield no shingles, so the
    inner size-joins drop their pairs — consistent with the oracle's
    len>0 filter, and unreachable anyway: a termless doc can never
    score into the BM25 ranking that feeds this stage."""
    from cflux_spark.extensions.dedup import shingles

    # the BM25 ranking feeds pos/cand/involved — half a dozen subtree
    # references that would each replay the posting-build shuffle and
    # top-k window; the restricted shingle frame likewise feeds both
    # pair sides and the size aggregate. Persist each once (round-12,
    # guide §2.4; session/caller owns unpersist — the pagerank
    # contract). Both are output-sized (|queries|·k rows; shingles of
    # ≤ |queries|·k docs), not corpus-sized.
    ranking = bm25_topk(docs, queries, k=k, **bm25_kwargs).persist()
    pos = ranking.filter(F.col("rank") == 1).select(
        "query_id", F.col("doc_id").alias("positive_id")
    )
    cand = ranking.filter(F.col("rank") > 1).join(pos, "query_id")
    involved = (
        cand.select(F.col("positive_id").alias("doc_id"))
        .union(cand.select("doc_id"))
        .distinct()
    )
    sh = shingles(
        docs.join(F.broadcast(involved), "doc_id", "left_semi"), n=shingle_n
    ).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sp = sh.select(F.col("doc_id").alias("positive_id"), "shingle")
    sc = sh.select(F.col("doc_id").alias("doc_id"), "shingle")
    inter = (
        cand.select("query_id", "positive_id", "doc_id")
        .join(sp, "positive_id")
        .join(sc, ["doc_id", "shingle"])
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("n_common"))
    )
    np_ = sizes.select(F.col("doc_id").alias("positive_id"), F.col("n_sh").alias("_np"))
    nc = sizes.select("doc_id", F.col("n_sh").alias("_nc"))
    jac = (
        cand.join(F.broadcast(np_), "positive_id")
        .join(F.broadcast(nc), "doc_id")
        .join(inter, ["query_id", "doc_id"], "left")
        .withColumn(
            "jaccard",
            F.round(
                F.coalesce(F.col("n_common"), F.lit(0))
                / (F.col("_np") + F.col("_nc") - F.coalesce(F.col("n_common"), F.lit(0))),
                round_to,
            ),
        )
    )
    return jac.filter(F.col("jaccard") < jaccard_threshold).select(
        "query_id", "positive_id", "doc_id", "score", "rank", "jaccard"
    )


def reciprocal_rank_at_k(
    ranking: DataFrame,
    qrels: DataFrame,
    round_to: int = 6,
    id_cols: tuple[str, str] = ("query_id", "doc_id"),
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query reciprocal rank (the MRR building block — Voorhees
    1999, TREC): 1 / rank of the FIRST relevant document in the
    ranking, 0.0 when none of the retrieved docs are judged relevant.
    Emitted PER QUERY rather than pre-averaged so the output is a
    pure rational of integers (one correctly-rounded division) — the
    corpus mean would be an order-sensitive double sum; callers
    average downstream (or quantize, the parity.py discipline).

    Scale shape: one (query, doc) join of two output-sized frames +
    one query-keyed min — never corpus-sized. Output: (query_id,
    first_rel_rank, rr); first_rel_rank is NULL when no retrieved doc
    is relevant."""
    qc, dc = id_cols
    hit = (
        ranking.join(qrels.select(qc, dc), [qc, dc])
        .groupBy(qc)
        .agg(F.min(rank_col).alias("first_rel_rank"))
    )
    return (
        ranking.select(qc).distinct()
        .join(hit, qc, "left")
        .select(
            qc,
            "first_rel_rank",
            F.when(
                F.col("first_rel_rank").isNotNull(),
                F.round(F.lit(1.0) / F.col("first_rel_rank"), round_to),
            )
            .otherwise(F.lit(0.0))
            .alias("rr"),
        )
    )
