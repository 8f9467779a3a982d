"""Measured probe: BPE word_frequencies at corpus scale (round 8,
VERDICT r7 next #7) — real web corpora carry unbounded typo/hash/
serial-number tails, so the distinct-word count exceeds any driver
cap even though the USEFUL vocabulary stays ~10^5. This probe
synthesizes that shape executor-side (no driver materialization):
a Zipf-ish head of 90k reusable words plus one md5 singleton per row,
then shows (a) the unpruned collect REFUSES loudly past the cap and
(b) min_count pruning inside the groupBy keeps training
vocabulary-sized at any corpus size.

Usage: python scripts/bpe_vocab_probe.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cflux_spark.extensions.bpe import bpe_train, word_frequencies
from cflux_spark.session import get_spark


def main(n_rows: int = 10_000_000) -> None:
    spark = get_spark("bpe-vocab-probe", cpus=16)
    corpus = spark.range(n_rows).selectExpr(
        # 3 head words (50k/30k/10k distinct — the reusable vocabulary)
        # + 1 md5 singleton per row (the unbounded tail)
        "concat_ws(' ', "
        " concat('word', cast(id % 50000 as string)),"
        " concat('term', cast((id * 7) % 30000 as string)),"
        " concat('item', cast((id * 13) % 10000 as string)),"
        " concat('q', md5(cast(id as string)))"
        ") as text"
    )

    t0 = time.monotonic()
    try:
        word_frequencies(corpus)
        raise AssertionError("unpruned collect must refuse past the cap")
    except ValueError as e:
        guard_dt = time.monotonic() - t0
        print(f"unpruned: refused in {guard_dt:.1f} s ({e})")

    t0 = time.monotonic()
    wf = word_frequencies(corpus, min_count=2)
    prune_dt = time.monotonic() - t0
    print(f"min_count=2: {len(wf)} words collected in {prune_dt:.1f} s")
    assert len(wf) == 90_000, len(wf)  # head only; tail pruned in the agg

    t0 = time.monotonic()
    merges = bpe_train(wf, n_merges=48)
    train_dt = time.monotonic() - t0
    print(f"bpe_train(48 merges over {len(wf)} words): {train_dt:.1f} s")
    print(
        f"RESULT n_rows={n_rows} distinct~={n_rows + 90_000} "
        f"guard={guard_dt:.1f}s prune={prune_dt:.1f}s vocab={len(wf)} "
        f"train={train_dt:.1f}s merges={len(merges)}"
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
