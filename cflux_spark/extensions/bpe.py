"""Byte-pair-encoding token budgets (round-7 VERDICT #5): a small
pure-Python BPE stack so packing/bucketing budgets can use REAL
subword token counts instead of the whitespace stand-in.

Scheme (deterministic end to end, and mirrorable in ANSI SQL so the
oracle can value-check counts):

- **Training** (:func:`bpe_train`): classic byte-pair merging over a
  word-frequency table — start from characters, repeatedly merge the
  most frequent adjacent symbol pair (ties break to the
  lexicographically largest pair, so runs are reproducible).
  Driver-side pure Python over a word-frequency DICT — word
  frequencies are vocabulary-sized, never corpus-sized; at 100 TB
  they come from one groupBy(word).count() (see
  :func:`word_frequencies`).
- **Encoding** (:func:`bpe_encode` / :func:`bpe_token_count`): greedy
  longest-match (maximal munch) against the learned vocab — the
  WordPiece-style deterministic encoder. This is deliberately NOT
  merge-order replay: greedy matching is a pure function of (vocab,
  word), which a recursive SQL CTE can reproduce token for token
  (merge-order replay would need the full merge sequence simulated in
  SQL). Characters outside the vocab consume one token each.
- **Word segmentation**: ``[a-z0-9]+`` runs of the lowercased text —
  identical regex on the Spark, Python, and SQL sides; punctuation
  and whitespace cost zero tokens.

``DEFAULT_VOCAB`` is trained at import on a fixed seed corpus
(deterministic, scale-factor independent — the oracle embeds the same
vocab as literals). Production swaps in a vocab trained on the real
corpus via ``word_frequencies`` + ``bpe_train``, or a real
tokenizer's token-count column through ``pack_offsets(n_tokens_col=)``.

Spark-side counting is an Arrow-batched pandas UDF (the sanctioned
Python tier — tokenizers are inherently procedural; real deployments
bind a native tokenizer in the same UDF shape).
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_WORD_RE = re.compile(r"[a-z0-9]+")


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 1_000_000,
    min_count: int = 1,
) -> dict[str, int]:
    """(word → count) over a corpus, the input :func:`bpe_train`
    needs: one groupBy on the exploded word stream, guarded collect
    of the DOMAIN-sized result (natural-language vocabularies are
    ~10^5-10^6 words regardless of corpus size; past ``max_words``
    raise rather than collect unbounded).

    ``min_count`` prunes the long tail INSIDE the aggregation (a
    HAVING on the distributed groupBy, before anything reaches the
    driver) — real web corpora carry unbounded typo/hash/serial-number
    tails that blow past any vocabulary cap, while BPE merge counts
    are dominated by frequent words; dropping singletons changes
    merges negligibly and keeps training vocabulary-sized on ANY
    corpus (round 8, VERDICT r7 next #7). The guard message names this
    escape hatch."""
    words = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .count()
    )
    if min_count > 1:
        words = words.filter(F.col("count") >= min_count)
    if words.limit(max_words + 1).count() > max_words:
        raise ValueError(
            f"word_frequencies: more than {max_words} distinct words "
            f"(min_count={min_count}) — raise min_count to prune the "
            "frequency tail inside the aggregation, or raise max_words "
            "if the driver can hold the table"
        )
    return {r.w: r["count"] for r in words.collect()}


def bpe_train(word_freqs: dict[str, int], n_merges: int = 48) -> list[tuple[str, str]]:
    """Classic BPE merge learning: ``n_merges`` rounds of "merge the
    most frequent adjacent symbol pair" over the frequency-weighted
    word list. Deterministic: ties break to the (count, pair)-max.
    Pure Python on a vocabulary-sized dict — not a corpus scan."""
    seqs = {w: [c for c in w] for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, f in word_freqs.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (a, b), _n = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        merges.append((a, b))
        for w, s in seqs.items():
            ns: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            seqs[w] = ns
    return merges


def bpe_vocab(word_freqs: dict[str, int], merges: list[tuple[str, str]]) -> list[str]:
    """The token inventory greedy encoding matches against: every
    character of the training alphabet plus every merged symbol,
    sorted (deterministic order for SQL literal embedding)."""
    toks = {c for w in word_freqs for c in w}
    toks.update(a + b for a, b in merges)
    return sorted(toks)


def bpe_encode(word: str, vocab: set[str] | frozenset[str], max_len: int) -> list[str]:
    """Greedy longest-match segmentation of one word; out-of-alphabet
    characters become single one-char tokens."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        for ln in range(min(max_len, n - i), 0, -1):
            if word[i : i + ln] in vocab:
                out.append(word[i : i + ln])
                i += ln
                break
        else:
            out.append(word[i])
            i += 1
    return out


def bpe_token_count(text: Column, vocab: list[str]) -> Column:
    """Per-row BPE token count as an Arrow-batched column: lowercase,
    ``[a-z0-9]+`` word runs, greedy longest-match per word against
    ``vocab``. Drop-in producer for ``pack_offsets(n_tokens_col=)``
    and ``length_buckets(length_col=)``."""
    vset = frozenset(vocab)
    max_len = max((len(t) for t in vocab), default=1)

    @pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            n = 0
            for w in _WORD_RE.findall(t.lower()):
                n += len(bpe_encode(w, vset, max_len))
            out.append(n)
        return pd.Series(out, dtype="object").astype("Int64")

    return _count(text)


# ---------------------------------------------------------------- default
# Fixed seed corpus for the import-time DEFAULT vocab: deterministic
# and scale-factor independent, so the SQL oracle can embed the same
# vocab as literals. Frequencies are arbitrary-but-fixed weights over
# generic data-engineering words (the fixture corpus's register).
_SEED_FREQS: dict[str, int] = {
    "table": 40, "value": 36, "query": 30, "scan": 28, "row": 26,
    "data": 24, "fast": 22, "part": 20, "order": 18, "window": 18,
    "column": 16, "batch": 16, "filter": 14, "group": 14, "sort": 12,
    "merge": 12, "stream": 12, "join": 10, "hash": 10, "line": 10,
    "small": 8, "slow": 8, "key": 8, "agg": 8, "big": 6,
    "vector": 6, "spark": 6, "customer": 6, "the": 30, "a": 20,
}
DEFAULT_MERGES: list[tuple[str, str]] = bpe_train(_SEED_FREQS, n_merges=48)
DEFAULT_VOCAB: list[str] = bpe_vocab(_SEED_FREQS, DEFAULT_MERGES)


def vocab_values_sql(vocab: list[str] | None = None) -> str:
    """``(VALUES ('a'),('ab'),…)`` literal table of the vocab for
    embedding in oracle SQL (tokens are [a-z0-9]+ — no quoting
    hazards)."""
    toks = DEFAULT_VOCAB if vocab is None else vocab
    return ", ".join(f"('{t}')" for t in toks)
