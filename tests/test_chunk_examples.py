"""Unit tests for functions/chunk.py and render.next_turn_examples
against serial Python oracles (edge cases the sf oracles don't plant)."""

import re

import numpy as np
import pandas as pd
import pytest
import ray.data


def test_chunk_documents_matches_serial_oracle():
    from ray_ordered_stream.functions.chunk import chunk_documents

    texts = [
        "one two three four five six seven",        # n=7: 2 chunks @ 4/3
        "a-b,c!d",                                    # punctuation splits
        "",                                           # empty: 0 chunks
        "short",                                      # n=1: single chunk
        " leading  and trailing  ",                   # boundary empties
    ]
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(5, dtype="int64"), "text": texts})
    )
    got = (
        chunk_documents(docs, size=4, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )

    rows = []
    for i, t in enumerate(texts):
        toks = re.findall(r"\w+", t)
        n = len(toks)
        if n == 0:
            continue
        nc = (n - 4 + 2) // 3 + 1 if n > 4 else 1
        for c in range(nc):
            b, e = c * 3, min(c * 3 + 4, n)
            rows.append((i, c, b, e, e - b, " ".join(toks[b:e])))
    exp = pd.DataFrame(
        rows,
        columns=[
            "doc_id", "chunk_idx", "begin_tok", "end_tok",
            "n_chunk_tokens", "chunk_text",
        ],
    ).astype({c: "int64" for c in [
        "doc_id", "chunk_idx", "begin_tok", "end_tok", "n_chunk_tokens"]})
    pd.testing.assert_frame_equal(got, exp)
    # the last window always reaches the final token
    tail = got.groupby("doc_id").tail(1)
    for _, r in tail.iterrows():
        assert r.end_tok == len(re.findall(r"\w+", texts[int(r.doc_id)]))


def test_next_turn_examples_matches_serial_oracle():
    from ray_ordered_stream.functions.render import next_turn_examples

    # two conversations, out-of-order input rows (the exchange must sort)
    turns = pd.DataFrame(
        {
            "conv_id": ["b", "a", "a", "a", "b", "a", "a"],
            "turn_idx": [0, 2, 0, 1, 1, 3, 4],
            "role": ["user", "user", "assistant", "user", "assistant",
                     "assistant", "assistant"],
            "text": ["b0", "a2", "a0", "a1", "b1", "a3", "a4"],
        }
    )
    got = (
        next_turn_examples(
            ray.data.from_pandas(turns), key="conv_id", seq="turn_idx", k=2
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    rows = []
    for conv, g in turns.sort_values(["conv_id", "turn_idx"]).groupby(
        "conv_id"
    ):
        g = g.reset_index(drop=True)
        lines = (g.role + ": " + g.text).tolist()
        for i in range(len(g)):
            if g.role[i] == "assistant" and i >= 1:
                rows.append(
                    (conv, int(g.turn_idx[i]),
                     "\n".join(lines[max(0, i - 2):i]), g.text[i])
                )
    exp = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "context", "target"]
    ).astype({"turn_idx": "int64"})
    pd.testing.assert_frame_equal(got, exp)
    # turn 0 of conv a is an assistant turn with NO context: must be absent
    assert not ((got.conv_id == "a") & (got.turn_idx == 0)).any()
    # k clips: turn 4's context starts at turn 2, not turn 0
    ctx4 = got[(got.conv_id == "a") & (got.turn_idx == 4)].context.iloc[0]
    assert ctx4 == "user: a2\nassistant: a3"


def test_centroid_cohesion_matches_numpy_oracle():
    from ray_ordered_stream.functions.embed import (
        centroid_cohesion,
        label_centroids,
    )

    rng = np.random.default_rng(7)
    n, dim = 200, 8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 4, size=n).astype(np.int32)
    ds = ray.data.from_pandas(
        pd.DataFrame({"label": labels, "embedding": list(vecs)})
    ).repartition(5)

    cents = label_centroids(ds)
    for lab in np.unique(labels):
        exp = vecs[labels == lab].astype(np.float64).mean(axis=0)
        np.testing.assert_allclose(cents[int(lab)][1], exp, rtol=1e-12)
        assert cents[int(lab)][0] == int((labels == lab).sum())

    got = (
        centroid_cohesion(ds)
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        m = vecs[labels == r.label].astype(np.float64)
        c = m.mean(axis=0)
        cos = (m @ c) / (np.linalg.norm(m, axis=1) * np.linalg.norm(c))
        assert r.n == len(m)
        assert r.mean_cos == pytest.approx(cos.mean(), abs=2e-6)
        assert r.min_cos == pytest.approx(cos.min(), abs=2e-6)


def test_global_rank_and_curriculum_match_numpy():
    from ray_ordered_stream.functions.rank import curriculum_shards, global_rank

    rng = np.random.default_rng(9)
    n = 700
    # heavy ties: metric range much smaller than n, so tie-groups span
    # sampled range bounds if routing were by (metric, id)
    m = rng.integers(0, 20, size=n).astype("int64")
    ids = rng.permutation(n).astype("int64")
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": ids, "m": m})
    ).repartition(5)

    ranked, total = global_rank(ds, "m", num_partitions=4)
    assert total == n
    got = ranked.to_pandas().sort_values("rank").reset_index(drop=True)
    order = np.lexsort((ids, m))
    np.testing.assert_array_equal(got["doc_id"].to_numpy(), ids[order])
    np.testing.assert_array_equal(got["rank"].to_numpy(), np.arange(n))

    shards = (
        curriculum_shards(ds, "m", k=4, num_partitions=4)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        shards["shard"].to_numpy(), (np.arange(n) * 4) // n
    )
    # equal shard sizes (floor buckets differ by at most 1)
    sizes = shards.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1


def test_random_projection_matches_numpy():
    from ray_ordered_stream.functions.embed import (
        projection_matrix,
        random_projection,
    )

    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(50, dtype="int64"), "embedding": list(vecs)}
        )
    ).repartition(3)
    got = (
        random_projection(ds, in_dim=16, out_dim=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    R = projection_matrix(16, 4)
    exp = np.round(vecs.astype(np.float64) @ R.T, 6)
    for j in range(4):
        np.testing.assert_allclose(got[f"d{j}"].to_numpy(), exp[:, j])
    # determinism across calls (same seed -> same matrix)
    np.testing.assert_array_equal(R, projection_matrix(16, 4))


def test_global_rank_with_empty_blocks():
    # repartition far beyond the row count emits empty (schema-less)
    # blocks; the bound sampler must skip them (regression)
    from ray_ordered_stream.functions.rank import global_rank

    df = pd.DataFrame(
        {"doc_id": np.arange(7, dtype="int64"),
         "m": np.array([3, 1, 4, 1, 5, 9, 2], dtype="int64")}
    )
    ranked, total = global_rank(
        ray.data.from_pandas(df).repartition(20), "m", num_partitions=3
    )
    assert total == 7
    got = ranked.to_pandas().sort_values("rank")
    order = np.lexsort((df["doc_id"], df["m"]))
    np.testing.assert_array_equal(
        got["doc_id"].to_numpy(), df["doc_id"].to_numpy()[order]
    )


def test_gram_matrix_int_matches_serial(ray_session):
    """Block-partitioned exact gram == one serial quantized matmul."""
    import ray

    from ray_ordered_stream.functions.embed import gram_matrix_int

    rng = np.random.default_rng(13)
    V = rng.normal(0, 0.3, (400, 8)).astype(np.float32)
    df = pd.DataFrame({"embedding": list(map(list, V))})
    got = (
        gram_matrix_int(
            ray.data.from_pandas(df).repartition(7), "embedding", scale=1000
        )
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    Q = np.floor(V.astype(np.float64) * 1000.0)
    G = (Q.T @ Q).astype(np.int64)
    iu, ju = np.triu_indices(8)
    assert len(got) == len(iu)
    assert (got["i"].to_numpy() == iu).all()
    assert (got["j"].to_numpy() == ju).all()
    assert (got["s"].to_numpy() == G[iu, ju]).all()


def test_int8_quantize_stats_serial_and_zero_vector(ray_session):
    import ray

    from ray_ordered_stream.functions.embed import int8_quantize_stats

    rng = np.random.default_rng(17)
    V = rng.normal(0, 0.3, (50, 6)).astype(np.float32)
    V[7] = 0.0  # zero vector -> scale 0, all-zero codes
    df = pd.DataFrame(
        {"vec_id": np.arange(50, dtype=np.int64),
         "embedding": list(map(list, V))}
    )
    got = (
        int8_quantize_stats(
            ray.data.from_pandas(df).repartition(4), "vec_id", "embedding"
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    W = V.astype(np.float64)
    amax = np.abs(W).max(axis=1)
    sc = amax / 127.0
    safe = np.where(sc > 0, sc, 1.0)
    codes = np.floor(W / safe[:, None] + 0.5)
    codes[sc == 0] = 0.0
    assert (got["scale"].to_numpy() == sc).all()
    assert (got["code_sum"].to_numpy() == codes.sum(1).astype(np.int64)).all()
    assert np.abs(codes).max() <= 127  # half-up floor never overshoots
    assert got.loc[7, "code_sum"] == 0 and got.loc[7, "scale"] == 0.0
    # every vector's max-|x| element saturates (by construction of scale)
    assert (got["n_sat"] >= 1).sum() == 49
