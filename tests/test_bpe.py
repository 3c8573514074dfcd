"""Distributed BPE training/encoding vs a serial reference implementation.

The serial reference defines the semantics the distributed trainer must
reproduce exactly: pair counts over every adjacent symbol position of the
word VOCABULARY weighted by word count (overlapping positions count),
winner by (count DESC, left ASC, right ASC), merges applied
leftmost-first within each word.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa


def _serial_vocab(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        c.update(re.findall(r"\w+", t.lower()))
    return c


def _serial_pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pc: Counter = Counter()
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += n
    return pc


def _serial_apply(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def serial_bpe(texts: list[str], n_merges: int, min_pair_count: int = 2):
    wc = _serial_vocab(texts)
    vocab = {tuple(w): n for w, n in wc.items()}
    merges = []
    for _ in range(n_merges):
        pc = _serial_pair_counts(vocab)
        if not pc:
            break
        (l, r), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_count:
            break
        merges.append((l, r, n))
        vocab = {
            _serial_apply(s, l, r): cnt for s, cnt in vocab.items()
        }
    return merges, vocab


TEXTS = [
    "the cat batted the batter with a bat",
    "a tat tit tot the the the",
    "banana bandana ban ban banana",
    "mississippi is hilly, mississippi is chilly",
    "aaaa aaa aa a aaaaa",  # overlap / run-parity torture
    "",
]


def test_train_bpe_matches_serial(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.bpe import train_bpe

    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": TEXTS,
        }
    )
    got = train_bpe(
        rd.from_arrow(docs).repartition(4), n_merges=12, min_pair_count=2
    )
    exp, _ = serial_bpe(TEXTS, 12, 2)
    rows = list(
        zip(
            got["left"].to_pylist(),
            got["right"].to_pylist(),
            got["count"].to_pylist(),
        )
    )
    assert rows == exp
    assert len(rows) >= 6  # this corpus has plenty of frequent pairs


def test_bpe_encode_counts_matches_serial(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.bpe import bpe_encode_counts, train_bpe

    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": TEXTS,
        }
    )
    ds = rd.from_arrow(docs).repartition(3)
    merges = train_bpe(ds, n_merges=10, min_pair_count=2)
    out = (
        bpe_encode_counts(ds, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    mlist = [(l, r) for l, r in zip(merges["left"].to_pylist(), merges["right"].to_pylist())]
    for i, text in enumerate(TEXTS):
        words = re.findall(r"\w+", text.lower())
        total = 0
        for w in words:
            syms = tuple(w)
            for l, r in mlist:
                syms = _serial_apply(syms, l, r)
            total += len(syms)
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_bpe_tokens"] == total


def test_leftmost_matches_run_parity():
    from ray_ordered_stream.functions.bpe import _leftmost_matches

    sym = np.array(list("aaaa") + list("aaa"), dtype=object)
    word = np.array([0] * 4 + [1] * 3, dtype=np.int64)
    m = _leftmost_matches(sym, word, "a", "a")
    assert list(np.flatnonzero(m)) == [0, 2, 4]
    # distinct pair never overlaps
    sym2 = np.array(list("ababa"), dtype=object)
    word2 = np.zeros(5, dtype=np.int64)
    m2 = _leftmost_matches(sym2, word2, "a", "b")
    assert list(np.flatnonzero(m2)) == [0, 2]
