"""Unit tests: DSIR importance resampling, bigram-LM perplexity +
CCNet buckets, perceptual image dedup (dHash + shared Hamming
banding) — round 10 second half."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cflux_spark.extensions import multimodal
from cflux_spark.extensions.dedup import hamming_near_pairs
from cflux_spark.extensions.dsir import dsir_log_weights, dsir_select, hashed_gram_occurrences
from cflux_spark.extensions.text import bigram_logprob, perplexity_buckets

# --------------------------------------------------------------- dHash


def _dhash_ref(gray: np.ndarray) -> int:
    bits = (gray[:, 1:] > gray[:, :-1]).ravel().astype(np.uint64)
    u = np.uint64((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return int(u.astype(np.int64))


def test_image_dhash_matches_reference(spark):
    rng = np.random.default_rng(7)
    imgs = []
    for mid in range(4):
        gray = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
        px = np.repeat(gray[:, :, None], 3, axis=2)
        imgs.append((mid, gray, multimodal.encode_bmp(px)))
    media = spark.createDataFrame(
        [(m, "image", b) for m, _, b in imgs], "media_id long, kind string, content binary"
    )
    got = {r["media_id"]: r["dhash"] for r in multimodal.image_dhash(media).collect()}
    for mid, gray, _ in imgs:
        assert got[mid] == _dhash_ref(gray.astype(np.float64))


def test_image_dhash_resamples_larger_images(spark):
    # 18x16 image downsampled 2x by nearest neighbor == the 9x8 source
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    big = np.repeat(np.repeat(gray, 2, axis=0), 2, axis=1)
    px = np.repeat(big[:, :, None], 3, axis=2)
    media = spark.createDataFrame(
        [(0, "image", multimodal.encode_bmp(px))], "media_id long, kind string, content binary"
    )
    got = multimodal.image_dhash(media).collect()[0]
    assert got["dhash"] == _dhash_ref(gray.astype(np.float64))
    assert got["error"] is None


def test_image_dhash_isolates_corrupt_rows(spark):
    gray = np.full((8, 9, 3), 100, np.uint8)
    media = spark.createDataFrame(
        [(0, "image", multimodal.encode_bmp(gray)), (1, "image", b"BM\x10corrupt body")],
        "media_id long, kind string, content binary",
    )
    rows = {r["media_id"]: r for r in multimodal.image_dhash(media).collect()}
    assert rows[0]["error"] is None and rows[0]["dhash"] is not None
    assert rows[1]["dhash"] is None and rows[1]["error"]


def test_planted_families_pair_within_one_bit(spark):
    docs = spark.range(30).withColumnRenamed("id", "doc_id")
    fp = multimodal.image_dhash(multimodal.synthetic_family_images(docs))
    pairs = hamming_near_pairs(fp, max_hamming=3, fp_col="dhash", id_col="media_id").collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {
        (a, b)
        for a in range(30)
        for b in range(a + 1, 30)
        if a // 5 == b // 5
    }
    assert planted <= got
    assert all(r["hamming"] <= 1 for r in pairs if (r["id_a"], r["id_b"]) in planted)


def test_hamming_keep_all_candidates_returns_verifier_tier(spark):
    # regression: the flag was accepted but the cutoff still applied,
    # so probe "candidates" silently equalled verified pairs
    # band collision with large hamming: low 16 bits equal, rest differ
    fp = spark.createDataFrame(
        [(0, 0x0000_0000_0000_1234), (1, 0x7FFF_FFFF_FFFF_1234)],
        "doc_id long, sig long",
    )
    strict = hamming_near_pairs(fp, max_hamming=3, fp_col="sig").collect()
    assert strict == []
    lax = hamming_near_pairs(fp, max_hamming=3, fp_col="sig", keep_all_candidates=True).collect()
    assert len(lax) == 1 and lax[0]["hamming"] > 3


def test_combination_banding_same_verified_pairs(spark):
    # Manku-style C(6,3) combination keys must find EXACTLY the same
    # hamming<=3 pairs as the minimal 4-block pigeonhole (both exact)
    rng = np.random.default_rng(3)
    sigs = []
    base = int(rng.integers(0, 2**63))
    for i in range(40):
        if i % 4 == 0:
            base = int(rng.integers(0, 2**63))
            v = base
        else:  # flip i%4 bits of the family base
            v = base
            for b in rng.choice(64, size=i % 4, replace=False):
                v ^= 1 << int(b)
        sigs.append((i, v - (1 << 64) if v >= (1 << 63) else v))
    fp = spark.createDataFrame(sigs, "doc_id long, sig long")
    a = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_pairs(fp, max_hamming=3, fp_col="sig").collect()
    }
    b = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_pairs(fp, max_hamming=3, fp_col="sig", n_blocks=6).collect()
    }
    assert a == b and len(a) >= 40 // 4 * 3  # every planted intra-family pair found


def test_combination_banding_shrinks_candidate_tier(spark):
    # many docs sharing one 16-bit block but far apart: single-block
    # keys propose them all; 33-bit combination keys propose none
    # 0x1234 fills the low 16 bits (one shared coarse block); copies of
    # i land inside each of the five higher 11-bit fine blocks, so with
    # n_blocks=6 only block 0 is constant and every 3-block key varies
    rows = [
        (i, 0x1234 | (i << 16) | (i << 22) | (i << 33) | (i << 44) | (i << 55))
        for i in range(40)
    ]
    fp = spark.createDataFrame(rows, "doc_id long, sig long")
    coarse = hamming_near_pairs(
        fp, max_hamming=3, fp_col="sig", keep_all_candidates=True
    ).count()
    fine = hamming_near_pairs(
        fp, max_hamming=3, fp_col="sig", keep_all_candidates=True, n_blocks=6
    ).count()
    assert coarse == 40 * 39 // 2
    assert fine < coarse / 100


def test_banding_guards(spark):
    fp = spark.createDataFrame([(0, 1)], "doc_id long, sig long")
    with pytest.raises(ValueError, match="n_blocks must exceed"):
        hamming_near_pairs(fp, max_hamming=3, fp_col="sig", n_blocks=3)
    with pytest.raises(ValueError, match="does not fit a long"):
        # d=0, one block: the "key" is the whole 64-bit fingerprint
        hamming_near_pairs(fp, max_hamming=0, fp_col="sig", n_blocks=1)
    with pytest.raises(ValueError, match="explode too wide"):
        hamming_near_pairs(fp, max_hamming=8, fp_col="sig", n_blocks=16)
    with pytest.raises(ValueError, match="exceeds the 64 fingerprint bits"):
        hamming_near_pairs(fp, max_hamming=64, fp_col="sig", n_blocks=65)
    # balanced widths: d=1 with 9 blocks keys 8 blocks of 7-8 bits
    # (57 bits max) — the old ceil scheme rejected this as 64 bits
    assert hamming_near_pairs(fp, max_hamming=1, fp_col="sig", n_blocks=9).count() == 0


def test_banding_overhang_blocks_clamp_not_raise(spark):
    # r10 ADVICE: under the old ceil-width scheme (nb-1)*width > bits
    # hit a negative shift count at plan build (e.g. max_hamming=11,
    # n_blocks=12: width 6, block 11 starts at bit 66). The r11
    # balanced _block_widths eliminate the overhang entirely (12
    # blocks of 5-6 bits) — this pins that the formerly-raising
    # configuration now builds and verifies exactly.
    fp = spark.createDataFrame(
        [(0, 5), (1, 5), (2, -1)], "doc_id long, sig long"
    )
    rows = hamming_near_pairs(
        fp, max_hamming=11, fp_col="sig", n_blocks=12
    ).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in rows} == {(0, 1, 0)}


def test_auto_n_blocks_selection():
    from cflux_spark.extensions.dedup import _AUTO_BANDING_THRESHOLD, _auto_n_blocks

    # below the threshold: minimal pigeonhole, smallest explode
    assert _auto_n_blocks(500, 3) == 4
    assert _auto_n_blocks(_AUTO_BANDING_THRESHOLD - 1, 3) == 4
    # the measured-collision regime (50k docs, d=3) → Manku C(6,3):
    # worst keys 31 bits (balanced 11/10 blocks), 20 tables
    assert _auto_n_blocks(50_000, 3) == 6
    # 10^7 docs need wider keys → C(8,5) (40-bit keys, 56 tables; the
    # balanced-width worst-case math rejects C(7,4), whose narrowest
    # combos are 36 bits)
    assert _auto_n_blocks(10_000_000, 3) == 8
    # d=8 exhausts 64 fingerprint bits: no tier meets the bound, so
    # the selector warns and keeps the MINIMAL pigeonhole — measured
    # at sf1 the wider combos cut candidates only 694M→477M while
    # 5×-ing the explode, and the verified path is tier-independent
    with pytest.warns(UserWarning, match="candidate tier may grow"):
        assert _auto_n_blocks(50_000, 8) == 9


def test_auto_banding_kicks_in_past_threshold(spark):
    # corpus_size hint steers the tier without counting; the widened
    # explode must not change the verified pairs (exact recall)
    fp = spark.createDataFrame(
        [(0, 17), (1, 17 ^ (1 << 40)), (2, -12345678)],
        "doc_id long, sig long",
    )
    small = hamming_near_pairs(fp, max_hamming=3, fp_col="sig", corpus_size=100)
    big = hamming_near_pairs(fp, max_hamming=3, fp_col="sig", corpus_size=1_000_000)
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, big.collect())) == [
        (0, 1, 1)
    ]


# ---------------------------------------------------------------- DSIR


def test_nb_classifier_separates_planted_vocabularies(spark):
    # two disjoint vocabularies; the NB model trained on 4 exemplars
    # must score held-out docs of each vocabulary on the right side
    from cflux_spark.extensions.classifier import score_quality, train_nb_weights

    mk = lambda i, t, y: (i, t, y)
    labeled = spark.createDataFrame(
        [
            mk(0, "clean prose reads well and flows nicely", 1.0),
            mk(1, "clean prose flows and reads nicely today", 1.0),
            mk(2, "zxq vbn kjh zxq vbn spam spam", 0.0),
            mk(3, "kjh zxq spam vbn kjh spam spam", 0.0),
        ],
        "doc_id long, text string, label double",
    )
    held_out = spark.createDataFrame(
        [(10, "prose reads nicely and flows"), (11, "spam zxq kjh vbn spam")],
        "doc_id long, text string",
    )
    w, prior = train_nb_weights(labeled)
    got = {r["doc_id"]: r for r in score_quality(held_out, w, prior).collect()}
    assert got[10]["keep"] and got[10]["log_odds"] > 0
    assert not got[11]["keep"] and got[11]["log_odds"] < 0
    assert got[10]["score"] > 0.5 > got[11]["score"]


def test_nb_classifier_unseen_bucket_uses_missing_weight(spark):
    # a scored doc whose grams hit buckets absent from the exemplars
    # must still score (COALESCE to the smoothing-floor log-ratio),
    # landing at bias + n_grams*w_missing, not dropping rows
    from cflux_spark.extensions.classifier import score_quality, train_nb_weights

    labeled = spark.createDataFrame(
        [(0, "aaa bbb", 1.0), (1, "ccc ddd ccc", 0.0)],
        "doc_id long, text string, label double",
    )
    novel = spark.createDataFrame(
        [(9, "qqq www eee")], "doc_id long, text string"
    )
    w, prior = train_nb_weights(labeled)
    rows = score_quality(novel, w, prior).collect()
    assert len(rows) == 1 and rows[0]["n_grams"] == 5  # 3 unigrams + 2 bigrams
    p = prior.collect()[0]
    # fixed-point contract: exact integer dot product, one division
    expected = (p["bias_fixed"] + 5 * p["w_missing_fixed"]) / 1e6
    assert rows[0]["log_odds"] == expected


def test_nb_classifier_log_odds_is_fixed_point(spark, sf_dir):
    # round-12 float-parity contract (VERDICT r11 item 1): every
    # emitted log_odds must be the correctly-rounded double of an
    # integer count of 1e-6 weight quanta — i.e. reconstructible as
    # round(log_odds·1e6)/1e6 — proving no raw accumulated-float
    # transcendental ever reaches the hashed projection. A violation
    # means someone reintroduced double weights into the dot product.
    from cflux_spark.extensions.classifier import FIXED_SCALE, ccnet_quality_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = ccnet_quality_filter(docs).select("log_odds").collect()
    assert len(got) > 0
    for r in got:
        lof = round(r["log_odds"] * FIXED_SCALE)
        assert r["log_odds"] == lof / FIXED_SCALE, r


def test_dsir_weights_zero_when_target_is_raw(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta gamma delta"), (2, "epsilon zeta")],
        "doc_id long, text string",
    )
    w = dsir_log_weights(docs, docs).collect()
    assert len(w) == 3
    for r in w:
        assert r["log_weight"] == pytest.approx(0.0, abs=1e-9)


def test_dsir_weights_prefer_target_vocabulary(spark):
    raw = spark.createDataFrame(
        [(0, "clean prose about science"), (1, "spam spam buy now spam")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "clean prose about science and research")], "doc_id long, text string"
    )
    w = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(raw, target).collect()}
    assert w[0] > w[1]


def test_dsir_gram_occurrences_shape(spark):
    df = spark.createDataFrame([(0, "a b c"), (1, "")], "doc_id long, text string")
    occ = hashed_gram_occurrences(df).collect()
    # 3 unigrams + 2 bigrams; empty doc contributes nothing
    assert len(occ) == 5
    assert all(0 <= r["bucket"] < 4096 for r in occ)


def test_dsir_select_deterministic_topk(spark):
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("token"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    target = docs.filter(F.col("doc_id") % 5 == 0)
    a = sorted(r["doc_id"] for r in dsir_select(docs, target, k=10).collect())
    b = sorted(r["doc_id"] for r in dsir_select(docs, target, k=10).collect())
    assert a == b and len(a) == 10
    assert set(a) <= set(range(50))


# ------------------------------------------------- bigram LM + buckets


def test_bigram_logprob_hand_computed(spark):
    docs = spark.createDataFrame([(0, "a b"), (1, "a c")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob(docs, lam=0.75).collect()}
    # corpus: T=4, c(a)=2 c(b)=1 c(c)=1; bigrams (a,b)=1 (a,c)=1
    p_a = 2 / 4
    p_b = 0.75 * (1 / 2) + 0.25 * (1 / 4)
    expect = round(-(math.log(p_a) + math.log(p_b)) / 2, 4)
    assert got[0]["n_tokens"] == 2
    assert got[0]["avg_neg_logprob"] == pytest.approx(expect, abs=1e-9)
    assert got[1]["avg_neg_logprob"] == pytest.approx(expect, abs=1e-9)  # symmetric corpus


def test_bigram_logprob_single_token_doc_is_unigram(spark):
    docs = spark.createDataFrame([(0, "x"), (1, "x y")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob(docs, lam=0.75).collect()}
    # T=3, c(x)=2: doc0 = -ln(2/3)
    assert got[0]["avg_neg_logprob"] == pytest.approx(round(-math.log(2 / 3), 4), abs=1e-9)


def test_perplexity_buckets_tertiles_and_ties(spark):
    rows = [(i, float(s)) for i, s in enumerate([1, 1, 2, 3, 4, 5, 6, 7, 8])]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    out = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(df, score_col="s").collect()}
    # total 9 → cutoffs at cum>=3 (s=2) and cum>=6 (s=5)
    assert [out[i] for i in range(9)] == [
        "head", "head", "head", "middle", "middle", "middle", "tail", "tail", "tail",
    ]
    # ties stay together: two docs at s=1 share a bucket by construction
    assert out[0] == out[1]


def test_perplexity_buckets_domain_guard(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"), F.col("id").cast("double").alias("s"))
    with pytest.raises(ValueError, match="max_domain"):
        perplexity_buckets(df, score_col="s", max_domain=10)


def test_perplexity_buckets_custom_n(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"), F.col("id").cast("double").alias("s"))
    out = perplexity_buckets(df, score_col="s", n=2, names=("lo", "hi")).collect()
    lo = {r["doc_id"] for r in out if r["bucket"] == "lo"}
    assert lo == {0, 1, 2, 3, 4}


# ------------------------------------------------ MMR / CCNet paragraphs / winnowing


def test_mmr_prefers_diverse_second_pick(spark):
    from cflux_spark.extensions.retrieval import mmr_topk

    # query q; docs 1,2 nearly identical & most relevant, doc 3 diverse
    rows = [
        (0, [1.0, 0.0, 0.0]),        # query
        (1, [0.9, 0.1, 0.0]),
        (2, [0.9, 0.11, 0.0]),
        (3, [0.5, 0.0, 0.8]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = mmr_topk(
        emb.filter(F.col("vec_id") == 0),
        emb.filter(F.col("vec_id") > 0),
        k=3,
        pool=3,
        lam=0.5,  # balanced λ — at 0.75 relevance always wins on this geometry
    ).collect()
    by_rank = {r["rank"]: r["doc_id"] for r in out}
    assert by_rank[1] in (1, 2)           # highest relevance first
    assert by_rank[2] == 3                # diversity beats the near-twin
    assert len(out) == 3


def test_mmr_rank1_is_top_relevance_and_deterministic(spark):
    from cflux_spark.extensions.retrieval import mmr_topk

    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 2)
    a = sorted(map(tuple, mmr_topk(q, emb, k=4, pool=10).collect()))
    b = sorted(map(tuple, mmr_topk(q, emb, k=4, pool=10).collect()))
    assert a == b
    assert len(a) == 8  # 2 queries x 4


def test_dedup_paragraphs_first_occurrence_wins(spark):
    from cflux_spark.extensions.text import dedup_paragraphs

    docs = spark.createDataFrame(
        [(0, "A\nB"), (1, "B\nC"), (2, "B")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in dedup_paragraphs(docs).collect()}
    assert got[0]["clean_text"] == "A\nB" and got[0]["n_kept"] == 2
    assert got[1]["clean_text"] == "C" and got[1]["n_kept"] == 1
    assert got[2]["clean_text"] == "" and got[2]["n_kept"] == 0
    assert got[2]["n_paragraphs"] == 1


def test_dedup_paragraphs_intra_doc_repeat(spark):
    from cflux_spark.extensions.text import dedup_paragraphs

    docs = spark.createDataFrame([(0, "X\nX\nY")], "doc_id long, text string")
    got = dedup_paragraphs(docs).collect()[0]
    assert got["clean_text"] == "X\nY"  # second X dropped, order kept


def _winnow_ref(text, k=5, w=4):
    import hashlib

    toks = [t for t in text.lower().split(" ") if t]
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if len(grams) < w:
        return set()
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:9], 16) for g in grams]
    fps = set()
    for q in range(w - 1, len(hs)):
        lo = q - w + 1
        mn = min(hs[lo : q + 1])
        pos = max(j for j in range(lo, q + 1) if hs[j] == mn)
        fps.add((pos, hs[pos]))
    return fps


def test_winnow_matches_reference(spark):
    from cflux_spark.extensions.text import winnow_fingerprints

    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again today"),
        (1, "a b c d e f g h"),       # exactly k+w-1 tokens -> 1 window
        (2, "too short for grams"),   # < k tokens -> none
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got: dict[int, set] = {0: set(), 1: set(), 2: set()}
    for r in winnow_fingerprints(docs).collect():
        got[r["doc_id"]].add((r["fp_pos"], r["fp_hash"]))
    for did, text in texts:
        assert got[did] == _winnow_ref(text), did


def test_winnow_every_window_covered(spark):
    from cflux_spark.extensions.text import winnow_fingerprints

    text = " ".join(f"tok{i % 13}" for i in range(60))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    pos = sorted(r["fp_pos"] for r in winnow_fingerprints(docs).collect())
    n_grams = 60 - 5 + 1
    for q in range(3, n_grams):
        assert any(q - 3 <= p <= q for p in pos), f"window ending at {q} uncovered"


def test_temperature_sample_rebalances(spark):
    from cflux_spark.extensions.sampling import temperature_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, budget=200, tau=2.0, group_col="lang").collect()
    by = {"big": 0, "small": 0}
    for r in kept:
        by[r["lang"]] += 1
    # natural shares: 90%/10%; sqrt-temperature targets 75%/25%
    assert 0.55 < by["big"] / len(kept) < 0.9
    assert by["small"] / len(kept) > 0.12
    # rates identical for same group, and deterministic end to end
    again = temperature_sample(df, budget=200, tau=2.0, group_col="lang").collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in kept)


def test_temperature_sample_caps_rate_at_one(spark):
    from cflux_spark.extensions.sampling import temperature_sample

    df = spark.createDataFrame([(i, "x") for i in range(10)], "doc_id long, lang string")
    kept = temperature_sample(df, budget=1000, tau=2.0, group_col="lang").collect()
    assert len(kept) == 10 and all(r["rate"] == 1.0 for r in kept)
    with pytest.raises(ValueError, match="budget"):
        temperature_sample(df, budget=0)


def test_ndcg_hand_computed(spark):
    from cflux_spark.extensions.retrieval import ndcg_at_k

    ranking = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 3), (1, 99, 2)], "query_id long, doc_id long, rel int"
    )
    got = ndcg_at_k(ranking, qrels, k=3).collect()
    dcg = (2**1 - 1) / math.log2(2) + 0.0 + (2**3 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    assert got[0]["ndcg"] == pytest.approx(round(dcg / idcg, 6), abs=1e-9)


def test_ndcg_no_relevant_docs_scores_zero(spark):
    from cflux_spark.extensions.retrieval import ndcg_at_k

    ranking = spark.createDataFrame([(1, 10, 1)], "query_id long, doc_id long, rank int")
    qrels = spark.createDataFrame([], "query_id long, doc_id long, rel int")
    got = ndcg_at_k(ranking, qrels, k=3).collect()
    assert got[0]["ndcg"] == 0.0


def test_ndcg_perfect_ranking_is_one(spark):
    from cflux_spark.extensions.retrieval import ndcg_at_k

    ranking = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 1)], "query_id long, doc_id long, rel int"
    )
    got = ndcg_at_k(ranking, qrels, k=5).collect()
    assert got[0]["ndcg"] == 1.0


def test_image_clusters_collapse_planted_families(spark):
    from cflux_spark.extensions.dedup import dedup_clusters, hamming_near_pairs

    docs = spark.range(25).withColumnRenamed("id", "doc_id")
    fp = multimodal.image_dhash(multimodal.synthetic_family_images(docs)).select(
        "media_id", "dhash"
    )
    pairs = hamming_near_pairs(fp, max_hamming=3, fp_col="dhash", id_col="media_id")
    got = {r["media_id"]: r["cluster_id"] for r in dedup_clusters(fp, pairs=pairs, id_col="media_id").collect()}
    for m in range(25):
        assert got[m] == (m // 5) * 5  # min member of the planted family


def test_hard_negatives_excludes_near_dup_of_positive(spark):
    from cflux_spark.extensions.retrieval import mine_hard_negatives

    docs = spark.createDataFrame(
        [
            (0, "spark query engine tuning guide"),          # positive (best match)
            (1, "spark query engine tuning guide extra"),    # near-dup of 0 -> excluded
            (2, "cooking pasta with tomato sauce spark"),    # genuine hard negative
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(7, "spark query engine")], "query_id long, query_text string"
    )
    got = mine_hard_negatives(docs, qs, k=3).collect()
    ids = {r["doc_id"] for r in got}
    assert 1 not in ids and 2 in ids
    for r in got:
        assert r["positive_id"] == 0 and r["rank"] > 1 and r["jaccard"] < 0.2


def test_robots_parse_and_filter(spark):
    from cflux_spark.extensions.text import parse_robots, robots_filter

    robots = spark.createDataFrame(
        [
            (
                "example.com",
                "User-agent: *\nDisallow: /private\nAllow: /private/ok # ok\n"
                "Disallow:\n\nUser-agent: evilbot\nDisallow: /",
            )
        ],
        "host string, robots_txt string",
    )
    rules = {(r["rule_type"], r["path_prefix"]) for r in parse_robots(robots).collect()}
    # evilbot's Disallow:/ must NOT appear; empty Disallow dropped
    assert rules == {("disallow", "/private"), ("allow", "/private/ok")}

    urls = spark.createDataFrame(
        [
            (0, "https://example.com/public/x"),
            (1, "https://example.com/private/secret"),
            (2, "https://example.com/private/ok/page"),
            (3, "https://other.com/private/elsewhere"),  # no rules -> allowed
            (4, "https://example.com"),                  # bare host -> path '/'
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["allowed"] for r in robots_filter(urls, parse_robots(robots)).collect()}
    assert got == {0: True, 1: False, 2: True, 3: True, 4: True}


_AGENT_ROBOTS = (
    "User-agent: *\nDisallow: /private\n\n"
    "User-agent: train\nDisallow: /public\n\n"
    "User-agent: trainbot # specific\nUser-agent: backupbot\n"
    "Disallow: /tmp\nAllow: /tmp/cache\n\n"
    "User-agent: evilbot\nDisallow: /"
)


def test_robots_agent_group_selection(spark):
    # RFC 9309 longest-agent-match: 'trainbot-2.1' selects the
    # 'trainbot' group over both the wildcard and the shorter 'train'
    # prefix decoy; 'backupbot' shares that group's rules via the
    # consecutive-User-agent-lines idiom
    from cflux_spark.extensions.text import parse_robots

    robots = spark.createDataFrame(
        [("example.com", _AGENT_ROBOTS)], "host string, robots_txt string"
    )
    for ua in ("trainbot-2.1", "TrainBot", "backupbot/1.0"):
        rules = {
            (r["rule_type"], r["path_prefix"])
            for r in parse_robots(robots, user_agent=ua).collect()
        }
        assert rules == {("disallow", "/tmp"), ("allow", "/tmp/cache")}, ua
    # 'train-crawler' matches only the 'train' decoy group
    rules = {
        (r["rule_type"], r["path_prefix"])
        for r in parse_robots(robots, user_agent="train-crawler").collect()
    }
    assert rules == {("disallow", "/public")}
    # an unknown crawler falls back to the wildcard group
    rules = {
        (r["rule_type"], r["path_prefix"])
        for r in parse_robots(robots, user_agent="otherbot").collect()
    }
    assert rules == {("disallow", "/private")}


def test_robots_filter_same_length_prefix_tie_deterministic(spark):
    # r10 ADVICE: two equal-length same-type matching prefixes left
    # matched_prefix nondeterministic; the window now tiebreaks on the
    # prefix itself
    from cflux_spark.extensions.text import robots_filter

    rules = spark.createDataFrame(
        [("example.com", "disallow", "/a"), ("example.com", "disallow", "/ab")],
        "host string, rule_type string, path_prefix string",
    )
    urls = spark.createDataFrame(
        [(0, "https://example.com/abc")], "doc_id long, url string"
    )
    # /abc matches both /a and /ab -> longest wins; craft a true tie:
    tie = spark.createDataFrame(
        [("example.com", "disallow", "/ab"), ("example.com", "disallow", "/ac")],
        "host string, rule_type string, path_prefix string",
    )
    both = spark.createDataFrame(
        [(0, "https://example.com/ab"), (1, "https://example.com/ac")],
        "doc_id long, url string",
    )
    r1 = robots_filter(urls, rules).collect()[0]
    assert r1["matched_prefix"] == "/ab" and not r1["allowed"]
    got = {r["doc_id"]: r["matched_prefix"] for r in robots_filter(both, tie).collect()}
    assert got == {0: "/ab", 1: "/ac"}


def test_robots_wildcard_patterns_rfc9309(spark):
    # r12 (VERDICT r11 item 4): '*' any-sequence and trailing '$'
    # end-anchor patterns; regex metachars in patterns stay literal;
    # interior '$' is literal; longest PATTERN wins precedence
    from cflux_spark.extensions.text import robots_filter

    rules = spark.createDataFrame(
        [
            ("h.com", "disallow", "/data/*.json$"),
            ("h.com", "allow", "/data/pub*"),
            ("h.com", "disallow", "/x$"),
            ("h.com", "disallow", "/a+b[1].c*"),
            ("h.com", "disallow", "/we$ird"),
        ],
        "host string, rule_type string, path_prefix string",
    )
    urls = spark.createDataFrame(
        [
            (0, "https://h.com/data/pub0.json"),   # both match; 13 > 10 → disallow
            (1, "https://h.com/data/pub1"),        # allow via /data/pub*
            (2, "https://h.com/data/x2.json"),     # $-anchored disallow
            (3, "https://h.com/data/x3.jsonx"),    # NOT anchored-match → unruled
            (4, "https://h.com/x"),                # exact end anchor
            (5, "https://h.com/xy"),               # anchor must not prefix-match
            (6, "https://h.com/a+b[1].cQQz"),      # metachars literal, '*' wild
            (7, "https://h.com/aXbY1Z.cQQz"),      # '.'/'+'/'[' must NOT be regex
            (8, "https://h.com/we$ird/page"),      # interior '$' literal
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: (r["allowed"], r["matched_prefix"])
        for r in robots_filter(urls, rules).collect()
    }
    assert got[0] == (False, "/data/*.json$")
    assert got[1] == (True, "/data/pub*")
    assert got[2] == (False, "/data/*.json$")
    assert got[3] == (True, None)
    assert got[4] == (False, "/x$")
    assert got[5] == (True, None)
    assert got[6] == (False, "/a+b[1].c*")
    assert got[7] == (True, None)
    assert got[8] == (False, "/we$ird")
