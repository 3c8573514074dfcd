"""Edit-distance (Levenshtein) scoring of candidate pairs — fuzzy dedup's
verify stage for OCR noise / boilerplate drift, where token-set measures
(Jaccard, SimHash) under-count single-character corruption.

Kernel: Myers' bit-parallel algorithm (Myers, JACM 1999) vectorized ACROSS
pairs — the pattern's match positions live in one uint64 lane per pair, the
text drives a single Python loop of length ``max(len_b)`` whose body is a
handful of numpy uint64 bitwise ops over all pairs at once. Cost is
O(max_len × n_pairs) word operations with no per-pair Python, versus the
O(len² × n_pairs) classic DP.

Semantics pinned to the DuckDB oracle (`levenshtein()`): distances count
UTF-8 BYTE edits (DuckDB's levenshtein is byte-based), while truncation is
by CHARACTERS (mirroring SQL ``substr``). The single-word kernel requires
the truncated pattern to fit 64 bytes, so ``max_chars`` ≤ 64 and non-ASCII
text (where chars ≠ bytes) must stay under the word size — same ASCII-corpus
precondition the textstats RE2 kernels document. Oversized patterns raise.

Scale shape: identical to ``dedup.jaccard_pair_scores`` — texts join back to
the pair list per side via the shared id-hash exchange (two co-partitioned
merges, only (id, text) rows move), then scoring is a pure map_batches
stage. Candidate generation is whoever you like (MinHash bands, SimHash
buckets, adjacent ids); this module only scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def levenshtein_batch(
    texts_a, texts_b, max_chars: int = 64
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Byte-level Levenshtein distance for each (texts_a[i], texts_b[i])
    pair after character-truncation to ``max_chars``. Returns
    ``(dist, len_a, len_b)`` int64 arrays (lengths are the truncated BYTE
    lengths, the denominators a normalized-similarity mirror needs)."""
    if max_chars > 64:
        raise ValueError("single-word Myers kernel: max_chars must be <= 64")
    n = len(texts_a)
    if n != len(texts_b):
        raise ValueError("texts_a and texts_b must align")
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z.copy(), z.copy()

    def encode(texts):
        mat = np.zeros((n, 64), dtype=np.uint8)
        lens = np.zeros(n, dtype=np.int64)
        for i, s in enumerate(texts):
            b = ("" if s is None else str(s))[:max_chars].encode("utf-8")
            if len(b) > 64:
                raise ValueError(
                    "truncated pattern exceeds 64 bytes (non-ASCII text "
                    "with max_chars too large for the single-word kernel)"
                )
            lens[i] = len(b)
            mat[i, : len(b)] = np.frombuffer(b, np.uint8)
        return mat, lens

    a_mat, len_a = encode(texts_a)
    b_mat, len_b = encode(texts_b)

    ones = np.uint64(1)
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    bitpos = (ones << np.arange(64, dtype=np.uint64))[None, :]  # (1, 64)

    # score starts at len_a; pairs with an empty pattern are pure inserts
    score = len_a.copy()
    Pv = np.full(n, full, dtype=np.uint64)
    Mv = np.zeros(n, dtype=np.uint64)
    # the bit watching row m-1 (pattern end); undefined lanes (m == 0)
    # are masked out of every update below
    has_a = len_a > 0
    last = np.zeros(n, dtype=np.uint64)
    last[has_a] = ones << (len_a[has_a] - 1).astype(np.uint64)

    max_b = int(len_b.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(max_b):
            active = (j < len_b) & has_a
            if not active.any():
                break
            c = b_mat[:, j]
            # Eq lane: bit i set where a[i] == b[j], packed across 64 cols
            eq_bits = (a_mat == c[:, None]).astype(np.uint64) * bitpos
            Eq = eq_bits.sum(axis=1, dtype=np.uint64)
            Xv = Eq | Mv
            Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq
            Ph = Mv | ~(Xh | Pv)
            Mh = Pv & Xh
            inc = (Ph & last) != 0
            dec = (Mh & last) != 0
            score = np.where(active & inc, score + 1, score)
            score = np.where(active & dec, score - 1, score)
            Ph = (Ph << ones) | ones
            Mh = Mh << ones
            nPv = Mh | ~(Xv | Ph)
            nMv = Ph & Xv
            Pv = np.where(active, nPv, Pv)
            Mv = np.where(active, nMv, Mv)
    # empty pattern: distance is the text length
    score = np.where(has_a, score, len_b)
    return score.astype(np.int64), len_a, len_b


def edit_distance_pairs(
    ds,
    pairs,
    id_col: str = "doc_id",
    max_chars: int = 64,
    num_partitions: int = 8,
    max_dist: int | None = None,
):
    """Score an explicit candidate-pair Dataset (columns ``id_a``/``id_b``)
    with byte-Levenshtein over the char-truncated texts. Output columns:
    ``id_a, id_b, edit_distance, norm_sim`` where ``norm_sim`` is
    ``1 - dist / max(len_a, len_b, 1)`` (rounded to 6, byte lengths of the
    truncated texts). Pairs whose partner id is absent drop (inner
    join-back); ``max_dist`` keeps only pairs at or under the cutoff."""
    import ray.data

    from .dedup import _exchange_merge

    docs = ds.select_columns([id_col, "text"])
    c_refs = list(pairs.to_arrow_refs())
    d_refs = list(docs.to_arrow_refs())
    stage1 = _exchange_merge(
        c_refs, d_refs, "id_a", id_col, "text_a", num_partitions
    )
    stage2 = _exchange_merge(
        stage1, d_refs, "id_b", id_col, "text_b", num_partitions
    )

    def score(b: pd.DataFrame) -> pd.DataFrame:
        dist, la, lb = levenshtein_batch(
            b["text_a"].tolist(), b["text_b"].tolist(), max_chars
        )
        denom = np.maximum(np.maximum(la, lb), 1).astype(np.float64)
        out = pd.DataFrame(
            {
                "id_a": b["id_a"].astype("int64"),
                "id_b": b["id_b"].astype("int64"),
                "edit_distance": dist,
                "norm_sim": np.round(1.0 - dist / denom, 6),
            }
        )
        return out if max_dist is None else out[out["edit_distance"] <= max_dist]

    return ray.data.from_arrow_refs(stage2).map_batches(
        score, batch_format="pandas"
    )
