"""Unit tests for the training-data operators: dedup (exact/minhash/simhash/
embedding), similarity search (brute-force + IVF), text stats, multimodal
plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    words = np.array(["alpha", "bravo", "china", "delta", "echo", "fox", "golf",
                      "hotel", "india", "jazz", "kilo", "lima"])
    texts = [" ".join(rng.choice(words, size=30)) for _ in range(40)]
    texts[10] = texts[3]                         # exact dup
    near = texts[5].split()
    near[2] = "zulu"                             # near dup of doc 5
    texts[20] = " ".join(near)
    df = pd.DataFrame({"doc_id": np.arange(40, dtype="int64"), "text": texts})
    return df, rd.from_pandas(df).repartition(3)


def test_exact_dedup(docs_with_dups):
    from ray_ordered_stream.functions.dedup import exact_dedup, exact_dedup_groups

    df, ds = docs_with_dups
    groups = exact_dedup_groups(ds).to_pandas()
    assert len(groups) == 39  # one exact dup pair
    assert groups.loc[groups["n_docs"] == 2, "keep_id"].iloc[0] == 3
    kept = exact_dedup(ds).to_pandas()
    assert len(kept) == 39
    assert 10 not in set(kept["doc_id"])
    assert 3 in set(kept["doc_id"])


def test_minhash_near_dups(docs_with_dups):
    from ray_ordered_stream.functions.dedup import near_dup_pairs, ngram_jaccard

    df, ds = docs_with_dups
    pairs = near_dup_pairs(ds, threshold=0.6).to_pandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (3, 10) in found          # exact dup pair
    assert (5, 20) in found          # planted near dup
    # pairs are exact-verified: reported jaccard IS the exact n-gram jaccard
    exact = ngram_jaccard(df.text[5], df.text[20], k=7)
    got = pairs.set_index(["id_a", "id_b"]).loc[(5, 20), "jaccard"]
    assert abs(got - exact) < 1e-6


def test_simhash_similarity(docs_with_dups):
    from ray_ordered_stream.functions.dedup import SimHasher, simhash

    df, ds = docs_with_dups
    out = simhash(ds).to_pandas().set_index("doc_id")
    h5 = np.uint64(out.loc[5, "simhash"])
    h20 = np.uint64(out.loc[20, "simhash"])
    h7 = np.uint64(out.loc[7, "simhash"])
    d_near = bin(int(h5) ^ int(h20)).count("1")
    d_far = bin(int(h5) ^ int(h7)).count("1")
    assert d_near < d_far
    assert out.loc[3, "simhash"] == out.loc[10, "simhash"]  # exact dup


@pytest.fixture(scope="module")
def embeddings(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    v = rng.standard_normal((200, 32)).astype(np.float32)
    v[50] = v[7] + rng.standard_normal(32).astype(np.float32) * 0.01  # near dup
    df = pd.DataFrame(
        {"vec_id": np.arange(200, dtype="int64"), "embedding": list(v)}
    )
    return v, rd.from_pandas(df).repartition(4)


def test_knn_bruteforce_matches_numpy(embeddings):
    from ray_ordered_stream.functions.similarity import knn_bruteforce

    v, ds = embeddings
    q = v[:3].astype(np.float64)
    got = knn_bruteforce(ds, q, np.arange(3), k=5)
    vn = v.astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sim = qn @ vn.T
    for qi in range(3):
        s = sim[qi].copy()
        s[qi] = -np.inf  # exclude self
        order = np.lexsort((np.arange(len(s)), -s))[:5]
        exp = list(order)
        gqi = got[got["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        assert gqi == exp


def test_knn_ivf_recall(embeddings):
    from ray_ordered_stream.functions.similarity import (
        knn_bruteforce,
        knn_ivf,
        train_centroids,
    )

    v, ds = embeddings
    q = v[:5].astype(np.float64)
    cent = train_centroids(ds, n_centroids=8, max_sample=500)
    exact = knn_bruteforce(ds, q, np.arange(5), k=5)
    approx = knn_ivf(ds, q, np.arange(5), cent, k=5, n_probe=4)
    # recall@5 of IVF with half the lists probed should be high on n=200
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    recall = np.mean([len(e[i] & a.get(i, set())) / 5 for i in range(5)])
    assert recall >= 0.6


def test_knn_lsh_recall_and_pruning(embeddings):
    from ray_ordered_stream.functions.similarity import (
        knn_bruteforce,
        knn_lsh,
        lsh_codes,
        lsh_planes,
    )

    v, ds = embeddings
    q = v[:5].astype(np.float64)
    exact = knn_bruteforce(ds, q, np.arange(5), k=5)
    approx = knn_lsh(ds, q, np.arange(5), k=5)
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    recall = np.mean([len(e[i] & a.get(i, set())) / 5 for i in range(5)])
    assert recall >= 0.6
    # determinism: seeded planes -> identical result on a second run
    again = knn_lsh(ds, q, np.arange(5), k=5)
    pd.testing.assert_frame_equal(
        approx.reset_index(drop=True), again.reset_index(drop=True)
    )
    # every returned neighbor must be a genuine bucket-collision candidate
    planes = lsh_planes(v.shape[1])
    vn = v.astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    codes = lsh_codes(vn, planes)
    qc = codes[:5]
    for _, r in approx.iterrows():
        cq, cn = qc[int(r["query_id"])], codes[int(r["neighbor_id"])]
        # flip-1 multiprobe: some table within Hamming distance 1
        assert any(
            bin(int(cq[l]) ^ int(cn[l])).count("1") <= 1
            for l in range(codes.shape[1])
        )


def test_lsh_codes_collision_law():
    """Identical vectors collide in every table; a vector and its negation
    collide in none (sign-LSH P[bit agrees] = 1 - angle/pi)."""
    from ray_ordered_stream.functions.similarity import lsh_codes, lsh_planes

    rng = np.random.default_rng(0)
    v = rng.standard_normal((4, 16))
    planes = lsh_planes(16, n_tables=6, n_bits=8, seed=1)
    c1 = lsh_codes(v, planes)
    c2 = lsh_codes(v.copy(), planes)
    assert (c1 == c2).all()
    cneg = lsh_codes(-v, planes)
    assert (c1 != cneg).all()


def test_embedding_near_dups(embeddings):
    from ray_ordered_stream.functions.dedup import embedding_near_dups

    v, ds = embeddings
    pairs = embedding_near_dups(ds, threshold=0.95).to_pandas()
    assert (7, 50) in set(map(tuple, pairs[["id_a", "id_b"]].values))


def test_textstats(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.textstats import lang_id, token_count

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the cat and the dog sat in the house",
                "der hund und die katze ist nicht da",
                "le chat et le chien est dans la maison",
                "xyzzy plugh 42",
            ],
        }
    )
    ds = rd.from_pandas(df)
    toks = token_count(ds).to_pandas().set_index("doc_id")
    assert toks.loc[0, "n_tokens"] == 9
    langs = lang_id(ds).to_pandas().set_index("doc_id")
    assert langs.loc[0, "lang_guess"] == "en"
    assert langs.loc[1, "lang_guess"] == "de"
    assert langs.loc[2, "lang_guess"] == "fr"
    assert langs.loc[3, "lang_guess"] == "und"


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.multimodal import (
        ImageDecodeStage,
        decode_images,
        sample_frames,
        synth_media_table,
    )

    t = synth_media_table(24)
    ds = rd.from_arrow(t)
    feats = decode_images(ds, feat_dim=8, batch_size=8, concurrency=2).to_pandas()
    assert len(feats) == 24
    assert all(len(f) == 8 for f in feats["feature"])
    # determinism: same payload -> same feature
    again = decode_images(rd.from_arrow(t), feat_dim=8, batch_size=8, concurrency=2).to_pandas()
    f1 = feats.sort_values("media_id")["feature"].tolist()
    f2 = again.sort_values("media_id")["feature"].tolist()
    assert all(np.allclose(a, b) for a, b in zip(f1, f2))

    frames = sample_frames(ds, n_samples=3).to_pandas()
    assert len(frames) == 72
    assert set(frames["frame_idx"]) == {0, 1, 2}

    with pytest.raises(NotImplementedError):
        ImageDecodeStage(strict=True)(t)


def test_simhash_near_dups(docs_with_dups):
    from ray_ordered_stream.functions.dedup import simhash_near_dups

    df, ds = docs_with_dups
    pairs = simhash_near_dups(ds, max_hamming=8).to_pandas()
    found = {tuple(r) for r in pairs[["id_a", "id_b"]].values}
    assert (3, 10) in found  # exact dup: hamming 0
    h = pairs.set_index(["id_a", "id_b"]).loc[(3, 10), "hamming"]
    assert h == 0
    assert (5, 20) in found  # planted near dup: few differing words


def test_pii_scrub(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.textstats import pii_scrub

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "mail me at jane.doe+x@ex-ample.co.uk or call 555 1234",
                "no pii here at all",
                "ids 42 and 7 and 2024; a@b.io",
                "",
            ],
        }
    )
    out = (
        pii_scrub(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "scrubbed"] == "mail me at <EMAIL> or call <NUM> <NUM>"
    assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_numbers"] == 2
    assert out.loc[1, "scrubbed"] == "no pii here at all"
    assert out.loc[1, "n_emails"] == 0 and out.loc[1, "n_numbers"] == 0
    # single digits survive; digits inside an email are not double-counted
    assert out.loc[2, "scrubbed"] == "ids <NUM> and 7 and <NUM>; <EMAIL>"
    assert out.loc[2, "n_numbers"] == 2
    assert out.loc[3, "scrubbed"] == ""


def test_hash_sample_deterministic(ray_session):
    import hashlib

    import ray.data as rd

    from ray_ordered_stream.functions.sample import hash_sample

    df = pd.DataFrame({"doc_id": np.arange(2000, dtype="int64")})
    got = set(hash_sample(rd.from_pandas(df), 0.25, "doc_id").to_pandas()["doc_id"])
    # oracle: same rule computed serially
    exp = {
        i
        for i in range(2000)
        if hashlib.md5(str(i).encode()).hexdigest()[:8] < "40000000"
    }
    assert got == exp
    assert 0.18 < len(got) / 2000 < 0.32  # ~25%
    # invariant under partition count (the scale property)
    again = set(
        hash_sample(rd.from_pandas(df).repartition(7), 0.25, "doc_id")
        .to_pandas()["doc_id"]
    )
    assert again == exp


def test_stratified_sample_exact_n(ray_session):
    import hashlib

    import ray.data as rd

    from ray_ordered_stream.functions.sample import stratified_sample

    rng = np.random.default_rng(11)
    n = 300
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": [f"doc number {i} body {rng.integers(1000)}" for i in range(n)],
            "source": [f"s{i % 5}" for i in range(n)],
        }
    )
    out = stratified_sample(
        rd.from_pandas(df).repartition(4), "source", 7, "text", "doc_id"
    ).to_pandas()
    assert out.groupby("source").size().tolist() == [7] * 5
    # matches the serial oracle: first 7 per source by (md5(text), doc_id)
    md5 = df["text"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    exp = (
        df.assign(_m=md5)
        .sort_values(["_m", "doc_id"])
        .groupby("source")
        .head(7)["doc_id"]
    )
    assert set(out["doc_id"]) == set(exp)
    # a stratum smaller than n returns all of it
    small = df[df["source"] == "s0"].head(3)
    out2 = stratified_sample(
        rd.from_pandas(small), "source", 7, "text", "doc_id"
    ).to_pandas()
    assert len(out2) == 3


def test_vocab_counts(ray_session):
    import collections
    import re

    import ray.data as rd

    from ray_ordered_stream.functions.textstats import vocab_counts

    texts = [
        "The cat sat on the mat",
        "the DOG ate the cat's food",
        "mat mat mat!",
        "",
    ]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(3)
    full = vocab_counts(ds).to_pandas()
    exp = collections.Counter(
        w for t in texts for w in re.findall(r"\w+", t.lower())
    )
    assert dict(zip(full["token"], full["n"])) == dict(exp)
    top = vocab_counts(ds, top_k=3).to_pandas()
    # count desc, token asc tie-break ("mat" and "the" tie at 4)
    assert top["token"].tolist() == ["mat", "the", "cat"]
    assert top["n"].tolist() == [4, 4, 2]


def test_train_centroids_distributed(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.similarity import (
        train_centroids_distributed,
    )

    rng = np.random.default_rng(7)
    means = np.array([[0.0] * 8, [10.0] * 8, [-10.0] * 8])
    x = np.concatenate(
        [m + rng.normal(0, 0.5, size=(200, 8)) for m in means]
    )
    order = rng.permutation(len(x))
    df = pd.DataFrame({"embedding": list(x[order].astype("float32"))})
    ds = rd.from_pandas(df).repartition(5)
    cent = train_centroids_distributed(ds, n_centroids=3, iters=8, init_sample=600)
    # every blob mean is recovered by some centroid
    for m in means:
        d = np.linalg.norm(cent - m, axis=1).min()
        assert d < 1.0, (m, cent)


def test_shuffle_rank(ray_session):
    import hashlib

    import ray.data as rd

    from ray_ordered_stream.functions.sample import shuffle_rank

    n = 5000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64")})
    out = (
        shuffle_rank(rd.from_pandas(df).repartition(6), "doc_id", seed=0)
        .to_pandas()
        .sort_values("shuffle_pos")
        .reset_index(drop=True)
    )
    assert len(out) == n
    assert out["shuffle_pos"].tolist() == list(range(n))  # a permutation
    # matches the serial oracle order
    exp = sorted(
        range(n),
        key=lambda i: (hashlib.md5(f"0:{i}".encode()).hexdigest(), i),
    )
    assert out["doc_id"].tolist() == exp
    # invariant under partition count; different seed -> different order
    again = (
        shuffle_rank(rd.from_pandas(df).repartition(2), "doc_id", seed=0,
                     num_partitions=3)
        .to_pandas()
        .sort_values("shuffle_pos")
    )
    assert again["doc_id"].tolist() == exp
    other = (
        shuffle_rank(rd.from_pandas(df), "doc_id", seed=1)
        .to_pandas()
        .sort_values("shuffle_pos")
    )
    assert other["doc_id"].tolist() != exp


def test_mix_corpora(ray_session):
    import hashlib

    import ray.data as rd

    from ray_ordered_stream.functions.sample import mix_corpora

    a = pd.DataFrame({"id": np.arange(1000, dtype="int64"), "text": "a"})
    b = pd.DataFrame({"id": np.arange(1000, dtype="int64"), "text": "b"})
    out = mix_corpora(
        [("A", rd.from_pandas(a), 0.5), ("B", rd.from_pandas(b), 0.25)], "id"
    ).to_pandas()

    def picked(name, frac):
        thr = format(int(frac * 16**8), "08x")
        return {
            i
            for i in range(1000)
            if hashlib.md5(f"{name}:{i}".encode()).hexdigest()[:8] < thr
        }

    got_a = set(out.loc[out["mix_source"] == "A", "id"])
    got_b = set(out.loc[out["mix_source"] == "B", "id"])
    assert got_a == picked("A", 0.5)
    assert got_b == picked("B", 0.25)
    # salted per source: same id space draws INDEPENDENT samples
    assert got_a != got_b and len(got_b) < len(got_a)


def test_shuffle_rank_string_ids(ray_session):
    import hashlib

    import ray.data as rd

    from ray_ordered_stream.functions.sample import shuffle_rank

    ids = [f"doc-{i:04d}" for i in range(800)]
    df = pd.DataFrame({"doc_id": ids})
    out = (
        shuffle_rank(rd.from_pandas(df).repartition(3), "doc_id", seed=2)
        .to_pandas()
        .sort_values("shuffle_pos")
    )
    exp = sorted(ids, key=lambda s: (hashlib.md5(f"2:{s}".encode()).hexdigest(), s))
    assert out["doc_id"].tolist() == exp


def test_hash_sample_salted_and_null_ids(ray_session):
    import hashlib

    import ray.data as rd

    from ray_ordered_stream.functions.sample import hash_sample

    # salted draw matches the serial oracle; NULL ids never pass (SQL
    # semantics: md5(NULL || id) is NULL, so the WHERE drops the row)
    ids = [str(i) for i in range(500)]
    t = pa.table({"doc_id": pa.array(ids + [None], pa.string())})
    got = set(
        hash_sample(rd.from_arrow(t), 0.5, "doc_id", salt="s:")
        .to_pandas()["doc_id"]
    )
    exp = {
        s
        for s in ids
        if hashlib.md5(("s:" + s).encode()).hexdigest()[:8] < "80000000"
    }
    assert got == exp
    assert None not in got


def test_vocab_bigrams(ray_session):
    import collections
    import re

    import ray.data as rd

    from ray_ordered_stream.functions.textstats import vocab_counts

    texts = ["the cat sat", "sat the cat", "x", ""]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(2)
    got = vocab_counts(ds, ngram=2).to_pandas()
    exp = collections.Counter()
    for t in texts:
        ws = re.findall(r"\w+", t.lower())
        exp.update(" ".join(p) for p in zip(ws, ws[1:]))
    assert dict(zip(got["token"], got["n"])) == dict(exp)
    # bigrams never bridge documents: "sat sat" (doc1 end -> doc2 start)
    # must be absent
    assert "sat sat" not in set(got["token"])


def test_repetition_stats(ray_session):
    import re
    from collections import Counter

    import ray.data

    from ray_ordered_stream.functions.textstats import repetition_stats

    texts = [
        "the cat sat on the mat the cat sat again",   # repeated tokens+bigrams
        "a b c d e f g h i j",                        # all distinct
        "spam spam spam spam spam",                   # one degenerate token
        "",                                           # empty
        "Word word WORD word!",                       # case-folded repeats
    ]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                      "text": texts})
    )
    got = (
        repetition_stats(ds).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )

    for i, text in enumerate(texts):
        toks = re.findall(r"\w+", text.lower())
        tc = Counter(toks)
        grams = Counter(zip(toks, toks[1:]))
        row = got.iloc[i]
        assert row.n_tokens == len(toks)
        assert row.n_distinct == len(tc)
        assert row.top_count == (max(tc.values()) if tc else 0)
        assert row.n_bigrams == max(0, len(toks) - 1)
        assert row.n_dup_bigrams == sum(c for c in grams.values() if c > 1)
        exp_keep = (
            len(toks) >= 30
            and 5 * len(tc) >= 2 * len(toks)
            and 8 * max(tc.values()) <= len(toks)
            and 8 * row.n_dup_bigrams <= row.n_bigrams
        ) if tc else False
        assert bool(row.keep) == exp_keep


def test_decontaminate(ray_session):
    import ray.data

    from ray_ordered_stream.functions.decontam import decontaminate

    bench_texts = ["the quick brown fox jumps", "alpha beta gamma delta"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype="int64"),
            "text": [
                "we saw the quick brown fox jumps high",  # 3 hit positions
                "nothing in common here at all",
                "alpha beta gamma",      # its single trigram is a bench gram
                "x alpha beta gamma delta y",             # 2 hit positions
                "the quick brown the quick brown fox",    # repeated gram hits
            ],
        }
    )
    got = (
        decontaminate(
            ray.data.from_pandas(docs),
            ray.data.from_pandas(pd.DataFrame({"text": bench_texts})),
            n=3,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_ngrams"].tolist() == [6, 4, 1, 4, 5]
    assert got["n_contaminated"].tolist() == [3, 0, 1, 2, 3]
    assert got["contaminated"].tolist() == [True, False, True, True, True]


def test_jaccard_pair_scores_matches_serial_sets():
    import ray.data

    from ray_ordered_stream.functions.dedup import jaccard_pair_scores

    texts = [
        "The  Quick Brown Fox",   # normalization: lower + ws collapse
        "the quick brown fox",    # identical after normalization
        "completely different words here",
        "zzz qqq xxx",
    ]
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(4, dtype="int64"), "text": texts})
    )
    pairs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "id_a": np.array([0, 1, 2, 3], dtype="int64"),
                "id_b": np.array([1, 2, 3, 99], dtype="int64"),  # 99 absent
            }
        )
    )
    got = (
        jaccard_pair_scores(docs, pairs, k=1)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # missing partner drops (inner join-back)
    assert got["id_a"].tolist() == [0, 1, 2]

    def norm(s):
        return " ".join(s.split()).lower()

    for _, row in got.iterrows():
        a, b = set(norm(texts[int(row.id_a)])), set(norm(texts[int(row.id_b)]))
        assert row.jaccard == pytest.approx(len(a & b) / len(a | b), abs=1e-6)
    assert got.loc[0, "jaccard"] == 1.0


def test_ivf_materialized_index_prunes_io_and_matches_scan(
    embeddings, tmp_path
):
    # VERDICT r2 #2: the materialized index must (a) read ONLY the probed
    # list partitions and (b) return exactly what the scan-based IVF
    # returns for the same centroids + probe set.
    from ray_ordered_stream.functions.similarity import (
        build_ivf_index,
        ivf_probe_plan,
        knn_ivf,
        knn_ivf_index,
        train_centroids,
    )

    v, ds = embeddings
    q = v[:4].astype(np.float64)
    cent = train_centroids(ds, n_centroids=8, max_sample=500)
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, centroids=cent)

    from pathlib import Path

    all_lists = sorted(p.name for p in Path(idx).glob("list_id=*"))
    _, probe, dirs = ivf_probe_plan(idx, q, n_probe=2)
    probed_lists = sorted(Path(d).name for d in dirs)
    # with 8 lists and n_probe=2 over 4 queries, some list must be skipped
    assert set(probed_lists) <= set(all_lists)
    assert len(probed_lists) < len(all_lists), (
        "probe read every partition — no I/O pruning"
    )

    got = knn_ivf_index(idx, q, np.arange(4), k=5, n_probe=2)
    exp = knn_ivf(ds, q, np.arange(4), cent, k=5, n_probe=2)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


def test_ivf_index_survives_session_boundary_metadata(embeddings, tmp_path):
    # centroids + meta persist on disk: a probe in a later session needs
    # no re-training and no access to the source dataset.
    import json
    from pathlib import Path

    from ray_ordered_stream.functions.similarity import (
        build_ivf_index,
        knn_ivf_index,
        train_centroids,
    )

    v, ds = embeddings
    cent = train_centroids(ds, n_centroids=4, max_sample=500)
    idx = str(tmp_path / "ivf2")
    build_ivf_index(ds, idx, centroids=cent)
    meta = json.loads((Path(idx) / "meta.json").read_text())
    assert meta["n_centroids"] == 4 and meta["dim"] == 32
    out = knn_ivf_index(idx, v[:2].astype(np.float64), np.arange(2), k=3,
                        n_probe=4)
    assert set(out.columns) == {"query_id", "neighbor_id", "rank"}
    assert (out.groupby("query_id")["rank"].max() == 3).all()


def test_builtin_codecs_roundtrip():
    # round-3: REAL builtin codecs (stdlib-only) behind the optional-import
    # preference for PIL/soundfile
    from ray_ordered_stream.functions.multimodal import (
        AudioCodec,
        ImageCodec,
        decode_bmp,
        decode_png,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_png,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (13, 17, 3)).astype(np.uint8)
    assert (decode_bmp(encode_bmp(arr)) == arr).all()
    assert (decode_ppm(encode_ppm(arr)) == arr).all()
    assert (decode_png(encode_png(arr)) == arr).all()
    gray = rng.integers(0, 256, (9, 11)).astype(np.uint8)
    assert (decode_png(encode_png(gray))[:, :, 0] == gray).all()
    s = (rng.standard_normal(500) * 0.2).astype(np.float32)
    dec, rate = decode_wav(encode_wav(s, 12345))
    assert rate == 12345 and len(dec) == 500
    assert np.abs(dec - np.clip(s, -1, 1)).max() < 1 / 16384
    ic, ac = ImageCodec(), AudioCodec()
    # magic-byte dispatch covers all three image formats
    for enc in (encode_bmp, encode_ppm, encode_png):
        assert (ic.decode(enc(arr)) == arr).all()
    d2, r2 = ac.decode(encode_wav(s, 8000))
    assert r2 == 8000 and len(d2) == 500


def test_png_unfilter_sub_up_paeth():
    # decode_png must undo filters our encoder never emits (real PNGs use
    # them): craft filtered scanlines by hand and check reconstruction.
    import struct
    import zlib

    from ray_ordered_stream.functions.multimodal import decode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)
    h, w, c = img.shape
    raw = bytearray()
    for y in range(h):
        f = [0, 1, 2, 3, 4, 1][y]
        raw.append(f)
        prev = img[y - 1].astype(np.int16).ravel() if y else np.zeros(w * c, np.int16)
        cur = img[y].astype(np.int16).ravel()
        line = np.zeros(w * c, dtype=np.int16)
        for x in range(w * c):
            a = int(cur[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(img[y - 1].ravel()[x - c]) if (x >= c and y) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pcc) else (b if pb <= pcc else cc)
            line[x] = (cur[x] - pred) & 0xFF
        raw += line.astype(np.uint8).tobytes()

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == img).all()


def test_real_media_stages_match_closed_forms(ray_session):
    import ray.data as rd
    import pyarrow.compute as _pc

    from ray_ordered_stream.functions.multimodal import (
        audio_stats,
        image_stats,
        synth_real_media_table,
    )

    media = synth_real_media_table(48)
    images = media.filter(_pc.equal(media["media_type"], "image"))
    out = (
        image_stats(rd.from_arrow(images), batch_size=8, concurrency=2)
        .to_pandas()
        .sort_values("media_id")
    )
    i = out["media_id"].to_numpy()
    assert (out["mean_val"].to_numpy() == (i * 7) % 256).all()
    assert (out["width"].to_numpy() == 16 + (i % 8) * 4).all()
    assert (out["height"].to_numpy() == 12 + (i % 5) * 4).all()
    assert (out["channels"] == 3).all()

    audio = media.filter(_pc.equal(media["media_type"], "audio"))
    aout = (
        audio_stats(rd.from_arrow(audio), batch_size=8, concurrency=2)
        .to_pandas()
        .sort_values("media_id")
    )
    j = aout["media_id"].to_numpy()
    assert (aout["n_samples"].to_numpy() == 100 + (j % 10) * 10).all()
    assert (aout["sample_rate"].to_numpy() == 8000 + (j % 3) * 4000).all()
    k = (j * 11) % 1000
    exp = np.floor((k * 32767 // 10000) / 32768.0 * 10000 + 0.5).astype("int64")
    assert (aout["mean_amp_1e4"].to_numpy() == exp).all()


def test_unigram_lm_stats_matches_serial(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.textstats import unigram_lm_stats

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "the cat sat on the mat",
                "the dog sat",
                "zyzzyva qwerty the",  # two rare tokens out of three
                "the the the",
            ],
        }
    )
    stats, thr = unigram_lm_stats(
        rd.from_arrow(docs).repartition(3), rare_q=0.25, max_rare_ratio=(1, 2)
    )
    out = stats.to_pandas().sort_values("doc_id").reset_index(drop=True)

    # serial reference
    toks = {
        1: "the cat sat on the mat".split(),
        2: "the dog sat".split(),
        3: "zyzzyva qwerty the".split(),
        4: "the the the".split(),
    }
    from collections import Counter

    counts = Counter(w for ws in toks.values() for w in ws)
    svals = sorted(counts.values())
    exp_thr = svals[int(0.25 * (len(svals) - 1))]
    assert thr == exp_thr
    for i, (d, ws) in enumerate(sorted(toks.items())):
        row = out.iloc[i]
        assert row["doc_id"] == d
        assert row["n_tokens"] == len(ws)
        assert row["freq_sum"] == sum(counts[w] for w in ws)
        rare = sum(1 for w in ws if counts[w] <= exp_thr)
        assert row["rare_count"] == rare
        assert bool(row["keep"]) == (rare * 2 <= len(ws))


def test_semantic_dedup_matches_serial_rule(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.dedup import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    # a transitive chain: b ~ a, c ~ b but c !~ a — the rule drops ANY
    # vector with a smaller-id >=t neighbour, dropped-or-not
    a = base[0]
    b = (0.9 * a + 0.45 * base[1]).astype(np.float32)
    c = (0.9 * b / np.linalg.norm(b) * np.linalg.norm(a) + 0.45 * base[2]).astype(
        np.float32
    )
    vecs = np.concatenate([base, [a * 1.5, b, c]], axis=0)
    ids = np.arange(len(vecs), dtype=np.int64)

    t = pa.table(
        {"vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]}
    )
    thr = 0.8
    kept, drops = semantic_dedup(
        rd.from_arrow(t).repartition(4),
        threshold=thr,
        n_clusters=1,  # cluster-blind => the serial rule is global
        id_col="vec_id",
        chunk=3,  # force the chunked matmul path
        num_partitions=3,
    )
    got = sorted(kept.to_pandas()["vec_id"].tolist())
    dropped = sorted(drops.to_pandas()["drop_id"].tolist())

    nv = vecs.astype(np.float64)
    nv = nv / np.linalg.norm(nv, axis=1, keepdims=True)
    sims = nv @ nv.T
    exp_drop = [
        int(i)
        for i in ids
        if any(sims[i, j] >= thr for j in range(i))
    ]
    exp_keep = [int(i) for i in ids if int(i) not in exp_drop]
    assert dropped == exp_drop and len(exp_drop) >= 2
    assert got == exp_keep


def test_semantic_dedup_multicluster_keeps_planted_rule(ray_session):
    import ray.data as rd

    from ray_ordered_stream.functions.dedup import semantic_dedup

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 8)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(60, dtype=np.int64)),
            "embedding": [list(map(float, v)) for v in vecs],
        }
    )
    ds = rd.from_arrow(t)

    def copy(tb: pa.Table) -> pa.Table:
        import pyarrow.compute as pcc

        return pa.table(
            {"vec_id": pcc.add(tb["vec_id"], 1000), "embedding": tb["embedding"]}
        )

    both = ds.union(ds.map_batches(copy, batch_format="pyarrow"))
    kept, drops = semantic_dedup(
        both, threshold=0.95, n_clusters=4, id_col="vec_id", num_partitions=3
    )
    assert sorted(kept.to_pandas()["vec_id"].tolist()) == list(range(60))
    assert sorted(drops.to_pandas()["drop_id"].tolist()) == [
        1000 + i for i in range(60)
    ]


def test_normalize_text_unicode_and_ws(ray_session):
    import duckdb
    import ray.data as rd

    from ray_ordered_stream.functions.textstats import normalize_text

    rows = [
        "  Hello   WORLD  ",
        "Café de  Flore",   # combining acute -> NFC composes to é
        "tabs\tand\nnewlines",
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": rows})
    out = (
        normalize_text(rd.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")["norm_text"]
        .tolist()
    )
    exp = [
        duckdb.sql(
            "SELECT trim(regexp_replace(lower(nfc_normalize(?)), '\\s+', ' ', 'g'))",
            params=[s],
        ).fetchone()[0]
        for s in rows
    ]
    assert out == exp
    assert out[1] == "café de flore"


def test_matrix_handles_every_embedding_shape(ray_session):
    """_matrix must normalize chunked / fixed_size_list / sliced / empty /
    tensor-extension vector columns itself — call sites carry no guards
    (r5 review: knn_bruteforce crashed on a fixed_size_list column)."""
    from ray_ordered_stream.functions.embed import _matrix

    base = np.arange(12, dtype=np.float64).reshape(4, 3)
    lst = pa.array(list(base), pa.list_(pa.float64()))
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(base.ravel(), pa.float64()), 3
    )
    chunked = pa.chunked_array([lst.slice(0, 2), lst.slice(2)])
    for col in [lst, fsl, chunked, lst.slice(1, 2), fsl.slice(1, 2)]:
        got = _matrix(col)
        n = len(col)
        exp = base[1 : 1 + n] if n == 2 and col.offset else base[:n]
        np.testing.assert_array_equal(got, exp)
        assert got.dtype == np.float64
    # empty: every layout returns (0, 0) instead of raising
    assert _matrix(lst.slice(0, 0)).shape == (0, 0)
    assert _matrix(fsl.slice(0, 0)).shape == (0, 0)
    assert _matrix(pa.chunked_array([], pa.list_(pa.float64()))).shape == (0, 0)


def test_knn_bruteforce_fixed_size_list(ray_session):
    """End-to-end: the embedding column arrives as fixed_size_list (Ray's
    tensor-ish layout) — must match the plain-list result."""
    import ray.data as rd

    from ray_ordered_stream.functions.similarity import knn_bruteforce

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 8))
    q = vecs[:3]
    t_list = pa.table(
        {"vec_id": pa.array(range(50), pa.int64()),
         "embedding": pa.array(list(vecs), pa.list_(pa.float64()))}
    )
    t_fsl = pa.table(
        {"vec_id": pa.array(range(50), pa.int64()),
         "embedding": pa.FixedSizeListArray.from_arrays(
             pa.array(vecs.ravel(), pa.float64()), 8)}
    )
    a = knn_bruteforce(rd.from_arrow(t_list), q, np.arange(3), k=4)
    b = knn_bruteforce(rd.from_arrow(t_fsl), q, np.arange(3), k=4)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_token_count_null_and_empty_text(ray_session):
    """NULL text counts 0 tokens (SQL-oracle NULL semantics; the old pandas
    path coerced NaN to the 1-token string 'nan')."""
    import ray.data as rd

    from ray_ordered_stream.functions.textstats import token_count

    t = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": pa.array(["two words", None, ""], pa.string())}
    )
    out = token_count(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out["n_tokens"].tolist() == [2, 0, 0]
    assert out["n_subwords_est"].tolist() == [3, 0, 0]


def test_weighted_hash_sample(ray_session):
    import hashlib

    import ray.data as rd

    from ray_ordered_stream.functions.sample import weighted_hash_sample

    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "w": rng.integers(1, 2000, n).astype(np.int64),
        }
    )
    rate, scale = 0.4, 800.0

    def serial_keep(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        p = min(1.0, rate * w / scale)
        thr = min(np.floor(p * 4294967296.0), 4294967295.0)
        return h < thr

    exp_ids = [
        int(i) for i, w in zip(df["doc_id"], df["w"]) if serial_keep(i, w)
    ]
    for P in (1, 6):
        got = (
            weighted_hash_sample(
                rd.from_pandas(df).repartition(P),
                id_col="doc_id", weight_col="w", rate=rate, scale=scale,
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert got["doc_id"].tolist() == exp_ids  # partition-invariant
    # weight 0 never kept; huge weight ~always kept (p == 1 keeps all but
    # the top hash value, which is absent among 2000 uniform draws)
    edge = pd.DataFrame(
        {"doc_id": np.arange(200, dtype=np.int64),
         "w": np.array([0] * 100 + [10**9] * 100, dtype=np.int64)}
    )
    got = weighted_hash_sample(
        rd.from_pandas(edge), "doc_id", "w", rate, scale
    ).to_pandas()
    assert (got["w"] > 0).all() and len(got) == 100
    # NULL ids never pass
    nulls = pd.DataFrame(
        {"doc_id": pd.array([1, None, 3], dtype="Int64"),
         "w": np.array([10**9] * 3, dtype=np.int64)}
    )
    got = weighted_hash_sample(
        rd.from_pandas(nulls), "doc_id", "w", rate, scale
    ).to_pandas()
    assert got["doc_id"].notna().all()


def test_zipf_fit_matches_serial(ray_session):
    import re as _re

    import ray.data as rd

    from ray_ordered_stream.functions.textstats import zipf_fit

    rng = np.random.default_rng(31)
    # zipf-ish corpus: token t_k drawn with prob ~ 1/(k+1)
    vocab = [f"tok{k}" for k in range(60)]
    probs = 1.0 / np.arange(1, 61)
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, size=50, p=probs)) for _ in range(80)
    ]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(5)
    out = zipf_fit(ds)
    # serial oracle: same tokenization (\w+ on lower), same ranking, same
    # closed-form least squares
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update(_re.findall(r"\w+", t.lower()))
    items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(items) + 1, dtype=np.float64))
    y = np.log(np.array([n for _t, n in items], dtype=np.float64))
    cnt = float(len(items))
    sx, sy, sxx, sxy = x.sum(), y.sum(), (x * x).sum(), (x * y).sum()
    slope = (cnt * sxy - sx * sy) / (cnt * sxx - sx * sx)
    intercept = (sy - slope * sx) / cnt
    assert int(out["v_size"].iloc[0]) == len(items)
    assert abs(out["slope"].iloc[0] - slope) < 1e-9
    assert abs(out["intercept"].iloc[0] - intercept) < 1e-9
    assert -1.6 < slope < -0.4  # zipf-ish corpus fits a negative power law


def test_pmi_collocations_matches_serial(ray_session):
    """Ratio-form PMI over within-document bigrams == a serial Counter
    replay (same tokenizer, same min-count floor, same tie order)."""
    import re
    from collections import Counter

    from ray_ordered_stream.functions.textstats import pmi_collocations

    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(3, 40)))
        for _ in range(120)
    ] + ["", "???", None]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(5)
    got = pmi_collocations(ds, top_k=15, min_count=3).to_pandas()

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = re.findall(r"\w+", (t or "").lower())
        uni.update(toks)
        bi.update(" ".join(p) for p in zip(toks, toks[1:]))
    n_total = sum(bi.values())
    rows = []
    for tok, n in bi.items():
        if n < 3:
            continue
        w1, w2 = tok.split(" ")
        rows.append(
            (tok, n, uni[w1], uni[w2],
             (float(n) * float(n_total)) / (float(uni[w1]) * float(uni[w2])))
        )
    rows.sort(key=lambda r: (-r[4], r[0]))
    want = rows[:15]
    assert len(got) == len(want)
    for i, (tok, n, c1, c2, ratio) in enumerate(want):
        assert got["token"].iloc[i] == tok
        assert int(got["n"].iloc[i]) == n
        assert int(got["c1"].iloc[i]) == c1
        assert int(got["c2"].iloc[i]) == c2
        assert got["pmi_ratio"].iloc[i] == ratio


def test_pmi_collocations_empty_corpus(ray_session):
    from ray_ordered_stream.functions.textstats import pmi_collocations

    ds = ray.data.from_pandas(pd.DataFrame({"text": ["", None, "x"]}))
    got = pmi_collocations(ds, top_k=5, min_count=1)
    assert got.count() == 0
    # Ray's to_pandas() drops columns from fully-empty datasets; the
    # DATASET schema is the stable surface
    assert [f for f in got.schema().names] == [
        "token", "n", "c1", "c2", "pmi_ratio",
    ]
