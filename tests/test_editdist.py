"""Bit-parallel Levenshtein kernel vs a serial DP + DuckDB's byte-based
levenshtein(); edit_distance_pairs end-to-end over the exchange."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ray_ordered_stream.functions.editdist import (
    edit_distance_pairs,
    levenshtein_batch,
)


def _dp(a: bytes, b: bytes) -> int:
    m, n = len(a), len(b)
    row = list(range(n + 1))
    for i in range(1, m + 1):
        prev, row[0] = row[0], i
        for j in range(1, n + 1):
            cur = row[j]
            row[j] = min(row[j] + 1, row[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return row[n]


def test_kernel_matches_dp_and_duckdb():
    rng = np.random.default_rng(11)
    alpha = list("abcdef -")
    pairs = []
    for _ in range(400):
        la, lb = rng.integers(0, 65), rng.integers(0, 65)
        pairs.append(
            (
                "".join(rng.choice(alpha, la)),
                "".join(rng.choice(alpha, lb)),
            )
        )
    pairs += [("", ""), ("a", ""), ("", "b"), ("kitten", "sitting"),
              ("same", "same"), ("a" * 64, "a" * 63 + "b")]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    dist, la, lb = levenshtein_batch(a, b)
    exp = np.array([_dp(x.encode(), y.encode()) for x, y in pairs])
    assert (dist == exp).all()
    con = duckdb.connect()
    dd = np.array(
        [con.execute("select levenshtein(?, ?)", [x, y]).fetchone()[0]
         for x, y in pairs]
    )
    assert (dist == dd).all()
    assert (la == np.array([len(x.encode()) for x in a])).all()
    assert (lb == np.array([len(y.encode()) for y in b])).all()


def test_kernel_byte_semantics_and_truncation():
    # byte-based like DuckDB: café vs cafe = 2 byte edits
    d, la, lb = levenshtein_batch(["café"], ["cafe"], max_chars=32)
    assert d[0] == 2 and la[0] == 5 and lb[0] == 4
    # truncation is by characters before encoding
    d, la, lb = levenshtein_batch(["abcdef"], ["abcxyz"], max_chars=3)
    assert d[0] == 0 and la[0] == 3
    with pytest.raises(ValueError):
        levenshtein_batch(["x"], ["y"], max_chars=65)
    with pytest.raises(ValueError):  # 33 2-byte chars > 64 bytes
        levenshtein_batch(["é" * 33], ["e"], max_chars=64)


def test_edit_distance_pairs_end_to_end(ray_session):
    rng = np.random.default_rng(5)
    texts = ["".join(rng.choice(list("abcd "), 40)) for _ in range(60)]
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": texts})
    ).repartition(4)
    prs = pd.DataFrame(
        {"id_a": np.arange(59, dtype=np.int64),
         "id_b": np.arange(1, 60, dtype=np.int64)}
    )
    # absent partner (id 60) must drop via the inner join-back
    prs = pd.concat(
        [prs, pd.DataFrame({"id_a": [59], "id_b": [60]})], ignore_index=True
    )
    out = (
        edit_distance_pairs(
            docs, ray.data.from_pandas(prs), max_chars=64, num_partitions=4
        )
        .to_pandas()
        .sort_values("id_a")
        .reset_index(drop=True)
    )
    assert len(out) == 59
    exp = np.array(
        [_dp(texts[i].encode(), texts[i + 1].encode()) for i in range(59)]
    )
    assert (out["edit_distance"].values == exp).all()
    denom = np.array(
        [max(len(texts[i]), len(texts[i + 1]), 1) for i in range(59)],
        dtype=np.float64,
    )
    assert np.allclose(out["norm_sim"].values, np.round(1 - exp / denom, 6))
    # max_dist filter
    capped = edit_distance_pairs(
        docs, ray.data.from_pandas(prs), max_chars=64, num_partitions=4,
        max_dist=int(np.median(exp)),
    ).to_pandas()
    assert (capped["edit_distance"] <= int(np.median(exp))).all()
    assert len(capped) == int((exp <= int(np.median(exp))).sum())
