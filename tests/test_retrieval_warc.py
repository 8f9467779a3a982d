"""Unit tests: BM25/RRF retrieval, WARC codec, HTML extraction (round 10)."""

import math

import pytest
from pyspark.sql import functions as F

from cflux_spark.extensions import warc
from cflux_spark.extensions.retrieval import bm25_scores, bm25_topk, rrf_fuse


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "spark shuffles data fast"),
        (1, "spark spark spark everywhere"),
        (2, "ducks swim in data lakes"),
        (3, ""),  # empty doc still counts toward N / avgdl
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_ref(tf, df, dl, n_docs, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark, tiny_docs):
    qs = spark.createDataFrame([(7, "spark data")], "query_id long, query_text string")
    got = {
        r.doc_id: r.score
        for r in bm25_scores(tiny_docs, qs).collect()
    }
    # corpus stats include the empty doc: N=4, sum_dl=4+4+5+0
    n, avgdl = 4, 13 / 4
    exp0 = round(_bm25_ref(1, 2, 4, n, avgdl) + _bm25_ref(1, 2, 4, n, avgdl), 4)
    exp1 = round(_bm25_ref(3, 2, 4, n, avgdl), 4)
    exp2 = round(_bm25_ref(1, 2, 5, n, avgdl), 4)
    assert got == {0: exp0, 1: exp1, 2: exp2}  # doc 3 has no match → absent


def test_bm25_repeated_query_term_counts_once(spark, tiny_docs):
    q1 = spark.createDataFrame([(0, "spark")], "query_id long, query_text string")
    q2 = spark.createDataFrame([(0, "spark spark spark")], "query_id long, query_text string")
    s1 = sorted(bm25_scores(tiny_docs, q1).collect())
    s2 = sorted(bm25_scores(tiny_docs, q2).collect())
    assert s1 == s2


def test_bm25_topk_rank_and_truncation(spark, tiny_docs):
    qs = spark.createDataFrame([(0, "spark data")], "query_id long, query_text string")
    rows = bm25_topk(tiny_docs, qs, k=2).orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].score >= rows[1].score
    assert len(rows) == 2


def test_bm25_query_side_broadcast(spark, tiny_docs):
    qs = spark.createDataFrame([(0, "spark")], "query_id long, query_text string")
    plan = bm25_scores(tiny_docs, qs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # query terms never shuffle the postings


def test_rrf_fusion_math_and_ties(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id long, doc_id long, rank int"
    )
    got = {r.doc_id: (r.rrf_score, r.rank) for r in rrf_fuse([a, b], k=60).collect()}
    assert got[11] == (round(1 / 62 + 1 / 61, 6), 1)  # in both sources → top
    # docs 10 and 12 tie on score (1/61 vs 1/62? no: 10 has rank1 in a → 1/61;
    # 12 has rank2 in b → 1/62) — distinct scores, rank by score desc
    assert got[10] == (round(1 / 61, 6), 2)
    assert got[12] == (round(1 / 62, 6), 3)


def test_rrf_tie_breaks_on_doc_id(spark):
    a = spark.createDataFrame(
        [(0, 5, 1), (0, 3, 1)], "query_id long, doc_id long, rank int"
    )  # same rank → same score → doc_id ascending wins
    rows = rrf_fuse([a], k=60).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == [3, 5]


def test_rrf_topn(spark):
    a = spark.createDataFrame(
        [(0, i, i) for i in range(1, 9)], "query_id long, doc_id long, rank int"
    )
    assert rrf_fuse([a], topn=3).count() == 3


# ---------------------------------------------------------------- WARC


def test_warc_roundtrip_bytes():
    recs = [("https://x.test/1", b"hello world"), ("https://x.test/2", "caf\xe9".encode())]
    blob = warc.build_warc_gz(recs)
    rows = warc.iter_warc_records(blob)
    assert [r["error"] for r in rows] == [None, None]
    assert [r["target_uri"] for r in rows] == ["https://x.test/1", "https://x.test/2"]
    assert [r["payload"] for r in rows] == [b"hello world", "caf\xe9".encode()]
    assert all(r["warc_type"] == "response" and r["http_status"] == 200 for r in rows)
    # deterministic: same input → same bytes (gzip mtime pinned)
    assert warc.build_warc_gz(recs) == blob


def test_warc_plain_uncompressed():
    blob = warc.build_warc_gz([("u:1", b"abc"), ("u:2", b"def")], compress=False)
    rows = warc.iter_warc_records(blob)
    assert [r["payload"] for r in rows] == [b"abc", b"def"]


def test_warc_corrupt_member_isolates():
    good1 = warc.build_warc_gz([("u:1", b"abc")])
    good2 = warc.build_warc_gz([("u:2", b"def")])
    # flip bytes inside the middle member's deflate stream
    bad = bytearray(warc.build_warc_gz([("u:x", b"zzz")]))
    bad[15:19] = b"\x00\x00\x00\x00"
    rows = warc.iter_warc_records(good1 + bytes(bad) + good2)
    errors = [r["error"] for r in rows]
    payloads = [r["payload"] for r in rows if r["error"] is None]
    assert b"abc" in payloads  # record before the corruption
    assert any(e for e in errors)  # the poisoned member reported
    # NOTE: a corrupt gzip member ends the member scan (deflate gives no
    # resync point) — the error row is the contract, not full recovery.


def test_warc_truncated_body_errors():
    blob = warc.build_warc_gz([("u:1", b"0123456789")], compress=False)
    rows = warc.iter_warc_records(blob[: len(blob) - 30])
    assert rows and rows[-1]["error"]


def test_warc_bad_content_length_errors():
    blob = warc.build_warc_gz([("u:1", b"abc")], compress=False)
    rows = warc.iter_warc_records(blob.replace(b"Content-Length", b"X-Length"))
    assert rows and all(r["error"] for r in rows)


def test_warc_distributed_parse(spark):
    blobs = [
        (0, warc.build_warc_gz([(f"u:{i}", f"doc{i}".encode()) for i in range(3)])),
        (1, warc.build_warc_gz([("u:9", b"doc9")])),
    ]
    df = spark.createDataFrame(blobs, "shard int, warc binary")
    rows = warc.parse_warc_blobs(df, "warc").collect()
    assert sorted(bytes(r.payload).decode() for r in rows) == ["doc0", "doc1", "doc2", "doc9"]
    assert all(r.error is None for r in rows)


def test_warc_read_files(spark, tmp_path):
    for i in range(2):
        (tmp_path / f"seg{i}.warc.gz").write_bytes(
            warc.build_warc_gz([(f"u:{i}", f"payload{i}".encode())])
        )
    rows = warc.read_warc(spark, str(tmp_path)).collect()
    assert sorted(bytes(r.payload).decode() for r in rows) == ["payload0", "payload1"]


def test_warc_shards_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    a = {r.shard: bytes(r.warc) for r in warc.docs_to_warc_shards(docs, n_shards=4).collect()}
    b = {r.shard: bytes(r.warc) for r in warc.docs_to_warc_shards(docs, n_shards=4).collect()}
    assert a == b and len(a) > 1
    out = warc.warc_roundtrip(docs, n_shards=4).collect()
    assert sorted((r.doc_id, r.text) for r in out) == [(i, f"text {i}") for i in range(20)]


# ---------------------------------------------------------------- HTML


def _extract_one(spark, html: str) -> str:
    from cflux_spark.extensions.text import extract_html_text

    df = spark.createDataFrame([(html,)], "h string")
    return df.select(extract_html_text(F.col("h")).alias("t")).first().t


def test_html_strips_head_script_style_comments(spark):
    html = (
        "<html><head><title>T</title><style>p{x:1}</style>"
        "<script>if (1 < 2) alert('</p>');</script></head>"
        "<body><!-- hidden --><p>keep me</p>"
        "<script type='text/js'>leak()</script></body></html>"
    )
    assert _extract_one(spark, html) == "keep me"


def test_html_block_tags_separate_words(spark):
    assert _extract_one(spark, "<p>alpha</p><p>beta</p>") == "alpha beta"
    assert _extract_one(spark, "a<br/>b<li>c</li>") == "a b c"


def test_html_entities(spark):
    got = _extract_one(spark, "x &amp;&lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;y &copy;")
    assert got == "x &<tag> \"q\" 's' y &copy;"


def test_html_escape_unescape_roundtrip(spark):
    from cflux_spark.extensions.text import extract_html_text, wrap_html_page

    nasty = "a & b < c > d &amp; already-escaped"
    df = spark.createDataFrame([(nasty,)], "t string")
    got = df.select(
        extract_html_text(wrap_html_page(F.col("t"))).alias("x")
    ).first().x
    assert got == f"home about {nasty} &copy; corpus"


# ----------------------------------------------------- URL normalization


def _norm_urls(spark, urls):
    from cflux_spark.extensions.text import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r.n for r in df.select(normalize_url(F.col("u")).alias("n")).collect()]


def test_normalize_url_variants_collide(spark):
    variants = [
        "https://WWW.Example.COM:443/p/7",
        "HTTPS://www.example.com/p/7/",
        "https://www.example.com/p/7?utm_source=feed&utm_campaign=x",
        "https://www.example.com/p/7#frag",
    ]
    assert set(_norm_urls(spark, variants)) == {"https://www.example.com/p/7"}


def test_normalize_url_preserves_significant_parts(spark):
    got = _norm_urls(
        spark,
        [
            "http://a.com:8080/x",          # non-default port kept
            "https://a.com/Path/CASE",       # path case kept
            "https://a.com/x?page=2&utm_id=9&q=1",  # real params kept, order kept
            "https://a.com:443x/y",          # :443x is not port 443
            "not a url at all",
        ],
    )
    assert got == [
        "http://a.com:8080/x",
        "https://a.com/Path/CASE",
        "https://a.com/x?page=2&q=1",
        "https://a.com:443x/y",
        "not a url at all",
    ]


def test_normalize_url_root_and_query_edges(spark):
    got = _norm_urls(
        spark,
        [
            "https://a.com/",
            "https://a.com/x/?utm_source=1",
            "https://a.com/x?utm_a=1&utm_b=2",
        ],
    )
    assert got == ["https://a.com", "https://a.com/x", "https://a.com/x"]


# ------------------------------------------------------- HLL sketch rollup


def test_hll_rollup_merge_matches_exact_at_low_cardinality(spark):
    rows = [(d, t, u) for d in range(3) for t in ("a", "b") for u in range(d * 7, d * 7 + 20)]
    df = spark.createDataFrame(rows, "day int, typ string, user_id long")
    daily = df.groupBy("typ", "day").agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    merged = daily.groupBy("typ").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = df.groupBy("typ").agg(F.countDistinct("user_id").alias("n"))
    for r in exact.join(merged, "typ").collect():
        assert abs(r.est - r.n) / r.n <= 0.05, r  # sparse-mode HLL is exact here
