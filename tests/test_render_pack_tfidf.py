"""Serial oracles for render_conversations, chunk_and_pack, tfidf_top_terms."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _turns_df(rng, n_convs=12, max_turns=9):
    rows = []
    for c in range(n_convs):
        n = int(rng.integers(1, max_turns))
        for i in range(n):
            rows.append(
                {
                    "conv_id": f"c{c}",
                    "turn_idx": np.int32(i),
                    "role": ["user", "assistant"][i % 2],
                    "text": f"t{c}-{i} " * int(rng.integers(1, 4)),
                }
            )
    df = pd.DataFrame(rows)
    return df.sample(frac=1, random_state=7).reset_index(drop=True)  # shuffle


def test_render_conversations_matches_serial_oracle(ray_session):
    import ray.data

    from ray_ordered_stream.functions.render import render_conversations

    rng = np.random.default_rng(3)
    df = _turns_df(rng)
    got = (
        render_conversations(ray.data.from_pandas(df), num_partitions=3)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )

    def render(g):
        g = g.sort_values("turn_idx")
        return "\n".join(g["role"] + ": " + g["text"])

    exp = (
        df.groupby("conv_id")
        .apply(render, include_groups=False)
        .rename("rendered")
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(got["conv_id"]) == list(exp["conv_id"])
    assert list(got["rendered"]) == list(exp["rendered"])
    assert (got["n_chars"] == got["rendered"].str.len()).all()
    assert (
        got.set_index("conv_id")["n_turns"]
        == df.groupby("conv_id").size().astype("int64")
    ).all()

    # partition invariance
    got1 = (
        render_conversations(ray.data.from_pandas(df), num_partitions=1)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got1[got.columns])


def test_chunk_and_pack_matches_serial_oracle(ray_session):
    import ray.data

    from ray_ordered_stream.functions.pack import chunk_and_pack

    rng = np.random.default_rng(11)
    n = 400
    texts = [
        " ".join(f"w{j}" for j in range(int(rng.integers(0, 40)))) for _ in range(n)
    ]
    ids = rng.permutation(n).astype("int64")  # ids arrive out of order
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    budget = 64
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        chunk_and_pack(ds, budget=budget, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    sdf = df.sort_values("doc_id").reset_index(drop=True)
    n_tok = sdf["text"].map(lambda s: len(re.findall(r"\w+", s))).astype("int64")
    end = n_tok.cumsum()
    begin = end - n_tok
    first = begin // budget
    last = np.where(n_tok > 0, (end - 1) // budget, first)
    chunks = np.where(n_tok > 0, last - first + 1, 0)

    assert (got["doc_id"] == sdf["doc_id"]).all()
    assert (got["n_tokens"] == n_tok).all()
    assert (got["begin_tok"] == begin).all()
    assert (got["end_tok"] == end).all()
    assert (got["first_pack"] == first).all()
    assert (got["last_pack"] == last).all()
    assert (got["n_chunks"] == chunks).all()

    # empty docs exist in the fixture and must report zero chunks
    assert (got.loc[got["n_tokens"] == 0, "n_chunks"] == 0).all()
    assert got["n_tokens"].eq(0).any()

    # partition invariance
    got1 = (
        chunk_and_pack(ds, budget=budget, num_partitions=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got1[got.columns])


def test_tfidf_top_terms_matches_serial_oracle(ray_session):
    import ray.data

    from ray_ordered_stream.functions.tfidf import tfidf_top_terms

    docs = [
        "the cat sat on the mat",
        "the dog ate the bone",
        "cat and dog and bird",
        "bird bird bird",
        "completely unrelated words here",
        "",  # empty doc contributes nothing
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype="int64"), "text": docs})
    k = 2
    got = (
        tfidf_top_terms(ray.data.from_pandas(df).repartition(3), k=k,
                        num_partitions=3)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )

    n_docs = len(docs)
    tf = {
        i: Counter(re.findall(r"\w+", t.lower())) for i, t in enumerate(docs)
    }
    dfreq = Counter()
    for c in tf.values():
        dfreq.update(c.keys())
    exp_rows = []
    for i, c in tf.items():
        scored = sorted(
            (
                (-cnt * math.log(n_docs / dfreq[tok]), tok, cnt)
                for tok, cnt in c.items()
            )
        )[:k]
        for negs, tok, cnt in scored:
            exp_rows.append(
                {
                    "doc_id": i,
                    "token": tok,
                    "tf": cnt,
                    "df": dfreq[tok],
                    "tfidf": -negs,
                }
            )
    exp = (
        pd.DataFrame(exp_rows)
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["token"]) == list(exp["token"])
    assert list(got["tf"]) == list(exp["tf"])
    assert list(got["df"]) == list(exp["df"])
    assert np.allclose(got["tfidf"], exp["tfidf"])


def test_materialize_packs_matches_serial_oracle():
    import hashlib
    import re

    import ray.data

    from ray_ordered_stream.functions.pack import materialize_packs

    rng = np.random.default_rng(17)
    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [
        " ".join(rng.choice(words, size=int(n)))
        for n in rng.integers(1, 9, size=40)
    ]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype="int64"), "text": texts})
    V, B = 97, 7  # budget far below per-partition tokens AND above some

    # serial oracle: global id-ordered token stream -> fixed-B packs
    stream = []
    for t in texts:
        for w in re.findall(r"\w+", t):
            stream.append(int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % V)
    exp = [
        (k, stream[k * B : (k + 1) * B])
        for k in range(-(-len(stream) // B))
    ]

    for P in (1, 4, 16):  # 16 partitions of ~12 tokens: packs span many
        got = (
            materialize_packs(
                ray.data.from_pandas(df).repartition(5),
                budget=B, vocab_size=V, num_partitions=P,
            )
            .to_pandas()
            .sort_values("pack_id")
            .reset_index(drop=True)
        )
        assert got["pack_id"].tolist() == [k for k, _ in exp]
        for (_k, toks), row in zip(exp, got.itertuples(index=False)):
            assert list(row.token_ids) == toks, (P, _k)
            assert row.n_tokens == len(toks)
        # every pack but the last is exactly B
        assert (got["n_tokens"].iloc[:-1] == B).all()
