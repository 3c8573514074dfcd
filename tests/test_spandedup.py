"""Span-level substring dedup (functions/spandedup.py): operator vs brute
force on a planted corpus, edge cases (short docs, no dups, self-repeat)."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_spans(docs: pd.DataFrame, n: int, min_count: int) -> pd.DataFrame:
    toks = {
        r.doc_id: re.findall(r"\w+", r.text.lower()) for r in docs.itertuples()
    }
    cnt = Counter()
    for tk in toks.values():
        for i in range(len(tk) - n + 1):
            cnt[" ".join(tk[i : i + n])] += 1
    rows = []
    for d in sorted(toks):
        tk = toks[d]
        spans = []
        for i in range(len(tk) - n + 1):
            if cnt[" ".join(tk[i : i + n])] >= min_count:
                if spans and i <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], i + n)
                else:
                    spans.append([i, i + n])
        rows += [(d, a, b) for a, b in spans]
    return pd.DataFrame(
        rows, columns=["doc_id", "span_start", "span_end"]
    ).astype("int64")


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = []
    for d in range(30):
        words = list(rng.choice(vocab, size=rng.integers(5, 60)))
        if d % 3 == 0:  # plant shared boilerplate mid-document
            k = rng.integers(0, len(words))
            words[k:k] = boiler.split()
        if d == 7:  # self-repetition inside one document
            words += words[:12]
        docs.append((d, " ".join(words)))
    docs.append((100, ""))  # empty doc
    docs.append((101, "tiny"))  # shorter than n
    return pd.DataFrame(docs, columns=["doc_id", "text"])


def test_duplicated_ngram_spans_vs_bruteforce(corpus, ray_session):
    import ray.data

    from ray_ordered_stream.functions.spandedup import duplicated_ngram_spans

    ds = ray.data.from_pandas(corpus)
    for n in (3, 5):
        got = (
            duplicated_ngram_spans(ds, n=n, min_count=2, num_partitions=3)
            .to_pandas()
            .sort_values(["doc_id", "span_start"])
            .reset_index(drop=True)
        )
        exp = _brute_spans(corpus, n, 2)
        assert len(exp) > 0  # boilerplate must actually collide
        pd.testing.assert_frame_equal(got, exp)
        # the self-repeating doc is caught even with no cross-doc match
        assert 7 in set(exp["doc_id"])


def test_dup_span_stats_keep_rule(corpus, ray_session):
    import ray.data

    from ray_ordered_stream.functions.spandedup import dup_span_stats

    ds = ray.data.from_pandas(corpus)
    got = (
        dup_span_stats(ds, n=3, min_count=2, max_dup_frac=0.3,
                       num_partitions=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # every doc appears, including empty/short ones with zero dup tokens
    assert set(got["doc_id"]) == set(corpus["doc_id"])
    spans = _brute_spans(corpus, 3, 2)
    dupsum = (
        spans.assign(l=spans.span_end - spans.span_start)
        .groupby("doc_id")["l"].sum()
    )
    toks = {
        r.doc_id: len(re.findall(r"\w+", r.text.lower()))
        for r in corpus.itertuples()
    }
    for r in got.itertuples():
        exp_dup = int(dupsum.get(r.doc_id, 0))
        assert r.dup_tokens == exp_dup
        assert r.n_tokens == toks[r.doc_id]
        assert r.keep == (exp_dup * 100 <= 30 * r.n_tokens)
    assert (~got["keep"]).sum() > 0  # the rule must actually reject some


def test_spans_never_cross_document_boundaries(ray_session):
    import ray.data

    from ray_ordered_stream.functions.spandedup import duplicated_ngram_spans

    # the shared phrase straddles two docs only if grams leaked across
    # boundaries; each doc alone is shorter than n so output must be empty
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["a b", "c d", "a b", "c d"]}
    )
    got = duplicated_ngram_spans(
        ray.data.from_pandas(docs), n=3, min_count=2, num_partitions=2
    ).to_pandas()
    assert len(got) == 0
    # but at n=2 the planted two-token docs dedup exactly
    got2 = (
        duplicated_ngram_spans(
            ray.data.from_pandas(docs), n=2, min_count=2, num_partitions=2
        )
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    exp2 = _brute_spans(docs, 2, 2)
    pd.testing.assert_frame_equal(got2, exp2)


def test_strip_duplicated_spans(corpus, ray_session):
    import ray.data

    from ray_ordered_stream.functions.spandedup import strip_duplicated_spans

    got = (
        strip_duplicated_spans(
            ray.data.from_pandas(corpus), n=3, min_count=2, num_partitions=3
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert set(got["doc_id"]) == set(corpus["doc_id"])
    toks = {
        r.doc_id: re.findall(r"\w+", r.text.lower())
        for r in corpus.itertuples()
    }
    spans = _brute_spans(corpus, 3, 2)
    by_doc = {
        d: list(zip(g.span_start, g.span_end))
        for d, g in spans.groupby("doc_id")
    }
    for r in got.itertuples():
        tk = toks[r.doc_id]
        cov = np.zeros(len(tk), dtype=bool)
        for a, b in by_doc.get(r.doc_id, []):
            cov[a:b] = True
        exp = " ".join(np.array(tk, dtype=object)[~cov]) if len(tk) else ""
        assert r.clean_text == exp
    # stripping must actually change the planted-boilerplate docs
    orig = corpus.set_index("doc_id")["text"].str.lower()
    joined = {d: " ".join(toks[d]) for d in toks}
    assert any(got.set_index("doc_id")["clean_text"][d] != joined[d]
               for d in joined)
